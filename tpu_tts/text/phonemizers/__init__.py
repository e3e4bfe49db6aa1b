"""Phonemizer registry + language→default-phonemizer map.

Mirrors /root/reference/TTS/tts/utils/text/phonemizers/__init__.py with an
extra built-in `en_rules` fallback (this host ships no espeak/gruut binaries).
Language-specific phonemizers that need external packages (ja/ko/zh/bn/be) are
gated and raise a helpful error at construction.
"""

from typing import Dict

from tpu_tts.text.phonemizers.base import BasePhonemizer
from tpu_tts.text.phonemizers.en_rules import EnglishRules
from tpu_tts.text.phonemizers.espeak_wrapper import ESpeak
from tpu_tts.text.phonemizers.gruut_wrapper import GRUUT_LANGS, Gruut


def _gated(name: str, package: str):
    """Build a placeholder phonemizer class for an unavailable backend."""

    class _Gated(BasePhonemizer):
        def __init__(self, *args, **kwargs):  # pylint: disable=super-init-not-called
            raise RuntimeError(f" [!] Phonemizer `{name}` requires the `{package}` package which is not installed.")

        @staticmethod
        def name():
            return name

        @classmethod
        def is_available(cls):
            return False

        @classmethod
        def version(cls):
            return "not installed"

        @staticmethod
        def supported_languages():
            return []

        def _phonemize(self, text, separator):
            raise NotImplementedError

    _Gated.__name__ = f"Gated_{name}"
    return _Gated


try:
    from tpu_tts.text.phonemizers.zh_cn_phonemizer import ZH_CN_Phonemizer
except ImportError:
    ZH_CN_Phonemizer = _gated("zh_cn_phonemizer", "pypinyin")
try:
    from tpu_tts.text.phonemizers.ko_kr_phonemizer import KO_KR_Phonemizer
except ImportError:
    KO_KR_Phonemizer = _gated("ko_kr_phonemizer", "g2pkk/jamo")
try:
    from tpu_tts.text.phonemizers.ja_jp_phonemizer import JA_JP_Phonemizer
except ImportError:
    JA_JP_Phonemizer = _gated("ja_jp_phonemizer", "mecab/cutlet")
try:
    from tpu_tts.text.phonemizers.bn_phonemizer import BN_Phonemizer
except ImportError:
    BN_Phonemizer = _gated("bn_phonemizer", "bangla")
try:
    from tpu_tts.text.phonemizers.be_phonemizer import BEL_Phonemizer
except ImportError:
    BEL_Phonemizer = _gated("be_phonemizer", "belarusian text normalizer")


PHONEMIZERS = {
    b.name(): b
    for b in (ESpeak, Gruut, EnglishRules, KO_KR_Phonemizer, BN_Phonemizer, ZH_CN_Phonemizer, JA_JP_Phonemizer, BEL_Phonemizer)
}

ESPEAK_LANGS = list(ESpeak.supported_languages().keys())

# default phonemizer per language: gruut first, espeak overrides, then specials
DEF_LANG_TO_PHONEMIZER: Dict[str, str] = {}
DEF_LANG_TO_PHONEMIZER.update({lang: Gruut.name() for lang in GRUUT_LANGS if Gruut.is_available()})
DEF_LANG_TO_PHONEMIZER.update({lang: ESpeak.name() for lang in ESPEAK_LANGS})
for _lang in ("en", "en-us", "en-gb"):
    if _lang not in DEF_LANG_TO_PHONEMIZER:
        DEF_LANG_TO_PHONEMIZER[_lang] = EnglishRules.name()
if "en-us" in DEF_LANG_TO_PHONEMIZER:
    DEF_LANG_TO_PHONEMIZER["en"] = DEF_LANG_TO_PHONEMIZER["en-us"]
DEF_LANG_TO_PHONEMIZER["zh-cn"] = ZH_CN_Phonemizer.name()
DEF_LANG_TO_PHONEMIZER["ko-kr"] = KO_KR_Phonemizer.name()
DEF_LANG_TO_PHONEMIZER["ja-jp"] = JA_JP_Phonemizer.name()
DEF_LANG_TO_PHONEMIZER["bn"] = BN_Phonemizer.name()
DEF_LANG_TO_PHONEMIZER["be"] = BEL_Phonemizer.name()


def get_phonemizer_by_name(name: str, **kwargs) -> BasePhonemizer:
    """Build a phonemizer by registry name (ref phonemizers/__init__.py:49)."""
    if name == "espeak":
        return ESpeak(**kwargs)
    if name == "gruut":
        return Gruut(**kwargs)
    if name == "en_rules":
        return EnglishRules(**kwargs)
    if name == "zh_cn_phonemizer":
        kwargs.pop("language", None)
        return ZH_CN_Phonemizer(**kwargs)
    if name == "ja_jp_phonemizer":
        kwargs.pop("language", None)
        return JA_JP_Phonemizer(**kwargs)
    if name == "ko_kr_phonemizer":
        kwargs.pop("language", None)
        return KO_KR_Phonemizer(**kwargs)
    if name == "bn_phonemizer":
        kwargs.pop("language", None)
        return BN_Phonemizer(**kwargs)
    if name == "be_phonemizer":
        kwargs.pop("language", None)
        return BEL_Phonemizer(**kwargs)
    raise ValueError(f"Phonemizer {name} not found")


__all__ = [
    "BasePhonemizer",
    "ESpeak",
    "Gruut",
    "EnglishRules",
    "PHONEMIZERS",
    "DEF_LANG_TO_PHONEMIZER",
    "get_phonemizer_by_name",
]
