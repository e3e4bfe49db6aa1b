"""Multilingual text frontend tests (ref tests/text_tests/)."""

import numpy as np
import pytest


def test_chinese_number_expansion():
    from tpu_tts.text.chinese_mandarin.numbers import _num2chinese, replace_numbers_to_characters_in_text

    assert _num2chinese("0") == "零"
    assert _num2chinese("10") == "十"
    assert _num2chinese("14") == "十四"
    assert _num2chinese("123") == "一百二十三"
    assert _num2chinese("1000") == "一千"
    assert _num2chinese("10000") == "一万"
    assert _num2chinese("100000014") == "一亿零十四"
    assert _num2chinese("3.5") == "三点五"
    assert replace_numbers_to_characters_in_text("我有2个") == "我有二个"


def test_pinyin_to_ipa():
    from tpu_tts.text.chinese_mandarin.pinyin_ipa import build_pinyin_dict, pinyin_to_ipa

    assert pinyin_to_ipa("ma") == "ma"
    assert pinyin_to_ipa("zhong") == "ʈʂʊŋ"
    assert pinyin_to_ipa("xue") == "ɕɥɛ"
    assert pinyin_to_ipa("shi") == "ʂʐ̩"
    assert pinyin_to_ipa("si") == "sz̩"
    assert pinyin_to_ipa("yuan") == "ɥɛn"
    table = build_pinyin_dict()
    assert len(table) > 300


def test_korean_jamo_native():
    from tpu_tts.text.korean.phonemizer import hangul_to_jamo, korean_text_to_phonemes

    jamo = hangul_to_jamo("하늘")
    assert [hex(ord(c)) for c in jamo] == ["0x1112", "0x1161", "0x1102", "0x1173", "0x11af"]
    out = korean_text_to_phonemes("하늘")
    assert all(0x1100 <= ord(c) <= 0x11FF for c in out)


def test_korean_normalize():
    from tpu_tts.text.korean.korean import normalize

    assert normalize("IT 1+1") == "아이티 원플러스원"


def test_japanese_phonemizer_native():
    from tpu_tts.text.japanese.phonemizer import hira2kata, japanese_text_to_phonemes, kata2phoneme

    assert hira2kata("こんにちは") == "コンニチハ"
    assert kata2phoneme("キャット") == "kya t to"
    assert kata2phoneme("シャ ジュ チョ") == "sha   ju   cho"
    assert japanese_text_to_phonemes("こんにちは") == "koNnichiha"
    # numbers via the native sino-japanese reader
    assert "hyakunijuusaN" in japanese_text_to_phonemes("123")
    # chōon lengthens, sokuon geminates
    assert japanese_text_to_phonemes("ラーメン") == "raameN"


def test_french_cleaner_abbreviations():
    from tpu_tts.text.cleaners import french_cleaners

    out = french_cleaners("M. Dupont et Mme Martin")
    assert "monsieur" in out and "madame" in out


def test_chinese_cleaner():
    from tpu_tts.text.cleaners import chinese_mandarin_cleaners

    assert chinese_mandarin_cleaners("有3个") == "有三个"


def test_phonemizer_registry_multilingual():
    from tpu_tts.text.phonemizers import DEF_LANG_TO_PHONEMIZER, PHONEMIZERS, get_phonemizer_by_name

    for name in ("ko_kr_phonemizer", "ja_jp_phonemizer", "bn_phonemizer", "zh_cn_phonemizer", "be_phonemizer"):
        assert name in PHONEMIZERS, name
    for lang in ("zh-cn", "ko-kr", "ja-jp", "bn", "be"):
        assert lang in DEF_LANG_TO_PHONEMIZER, lang
    ko = get_phonemizer_by_name("ko_kr_phonemizer")
    assert ko.phonemize("하늘", separator="")
    ja = get_phonemizer_by_name("ja_jp_phonemizer")
    assert ja.phonemize("こんにちは", separator="") == "koNnichiha"


def test_bangla_passthrough_without_packages():
    from tpu_tts.text.bangla.phonemizer import bangla_text_to_phonemes

    # without optional deps it should still normalize whitespace and keep bangla
    out = bangla_text_to_phonemes("আমি   ভাত খাই")
    assert out == "আমি ভাত খাই"
