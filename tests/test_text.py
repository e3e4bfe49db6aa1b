from dataclasses import dataclass, field
from typing import List, Optional

import pytest

from tpu_tts.config.base import Coqpit
from tpu_tts.config.shared_configs import BaseDatasetConfig
from tpu_tts.text.characters import BaseCharacters, CharactersConfig, Graphemes, IPAPhonemes
from tpu_tts.text.cleaners import english_cleaners, phoneme_cleaners
from tpu_tts.text.english.number_norm import normalize_numbers, number_to_words, ordinal_to_words
from tpu_tts.text.phonemizers import DEF_LANG_TO_PHONEMIZER, get_phonemizer_by_name
from tpu_tts.text.punctuation import Punctuation
from tpu_tts.text.tokenizer import TTSTokenizer


def test_graphemes_vocab_layout():
    g = Graphemes()
    # [pad][eos][bos][blank] + sorted chars + punctuations
    assert g.vocab[0] == "<PAD>"
    assert g.vocab[1] == "<EOS>"
    assert g.vocab[2] == "<BOS>"
    assert g.vocab[3] == "<BLNK>"
    assert g.pad_id == 0 and g.eos_id == 1 and g.bos_id == 2 and g.blank_id == 3
    assert g.char_to_id("A") == 4  # sorted uppercase first
    assert g.id_to_char(g.char_to_id("z")) == "z"
    # punctuations at the end
    assert g.vocab[-1] in "!'(),-.:;? "


def test_ipa_phonemes_vocab():
    p = IPAPhonemes()
    assert p.num_chars > 100
    assert p.char_to_id("ə") > 3
    with pytest.raises(KeyError):
        p.char_to_id("€")


def test_characters_config_round_trip():
    g = Graphemes()
    cfg = g.to_config()
    g2 = Graphemes(**{k: getattr(cfg, k) for k in ("characters", "punctuations", "pad", "eos", "bos", "blank", "is_unique", "is_sorted")})
    assert g2.vocab == g.vocab


def test_number_norm():
    assert number_to_words(0) == "zero"
    assert number_to_words(21) == "twenty-one"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(1234567) == "one million two hundred thirty-four thousand five hundred sixty-seven"
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(22) == "twenty-second"
    assert ordinal_to_words(30) == "thirtieth"
    assert normalize_numbers("I have 3 cats") == "I have three cats"
    assert "nineteen eighty four" in normalize_numbers("in 1984 there")
    assert "two dollars, fifty cents" in normalize_numbers("$2.50")
    assert "three point one four" in normalize_numbers("3.14")
    assert "one thousand" in normalize_numbers("1,000 things")


def test_english_cleaners():
    out = english_cleaners("Dr. Smith has 2 cats & 1 dog.")
    assert out == "doctor smith has two cats and one dog."
    out = phoneme_cleaners("It costs $5!")
    assert "five dollars" in out


def test_punctuation_strip_restore():
    punc = Punctuation()
    text = "This is. example !"
    assert punc.strip(text) == "This is example"
    chunks, pmap = punc.strip_to_restore(text)
    assert chunks == ["This is", "example "] or chunks == ["This is", "example"]
    restored = Punctuation.restore(chunks, pmap)
    assert restored[0].replace(" ", "") == text.replace(" ", "")


def test_tokenizer_grapheme_round_trip():
    tok = TTSTokenizer(use_phonemes=False, characters=Graphemes())
    text = "Hello world!"
    ids = tok.text_to_ids(text)
    assert tok.ids_to_text(ids) == text


def test_tokenizer_blank_and_eos_bos():
    tok = TTSTokenizer(use_phonemes=False, characters=Graphemes(), add_blank=True, use_eos_bos=True)
    ids = tok.text_to_ids("ab")
    # blank interspersed: [blank a blank b blank] + bos/eos = 7
    assert len(ids) == 7
    assert ids[0] == tok.characters.bos_id
    assert ids[-1] == tok.characters.eos_id
    assert ids[1] == tok.characters.blank_id


def test_tokenizer_oov_discard(capsys):
    tok = TTSTokenizer(use_phonemes=False, characters=Graphemes())
    ids = tok.text_to_ids("a€b")
    assert tok.ids_to_text(ids) == "ab"
    assert "€" in tok.not_found_characters


def test_en_rules_phonemizer():
    ph = get_phonemizer_by_name("en_rules", language="en")
    out = ph.phonemize("hello world", separator="")
    assert len(out) > 4
    # output symbols must be in the IPA vocabulary (+ space/puncs)
    p = IPAPhonemes()
    for ch in out:
        assert ch in p.vocab, f"{ch!r} not in IPA vocab"
    # punctuation preserved
    out2 = ph.phonemize("hello, world!", separator="")
    assert "," in out2 and "!" in out2


def test_def_lang_map_has_english():
    assert "en" in DEF_LANG_TO_PHONEMIZER


@dataclass
class _TokCfg(Coqpit):
    text_cleaner: str = "english_cleaners"
    use_phonemes: bool = True
    phoneme_language: str = "en-us"
    phonemizer: Optional[str] = None
    add_blank: bool = False
    enable_eos_bos_chars: bool = False
    characters: Optional[CharactersConfig] = None
    datasets: List[BaseDatasetConfig] = field(default_factory=list)


def test_tokenizer_init_from_config():
    cfg = _TokCfg()
    tok, new_cfg = TTSTokenizer.init_from_config(cfg)
    assert tok.use_phonemes
    ids = tok.text_to_ids("Hello there, friend!")
    assert len(ids) > 5
    assert new_cfg.characters is not None
    assert new_cfg.characters.characters_class.endswith("IPAPhonemes")

    # grapheme config path
    cfg2 = _TokCfg(use_phonemes=False)
    tok2, _ = TTSTokenizer.init_from_config(cfg2)
    ids2 = tok2.text_to_ids("Hello")
    assert tok2.ids_to_text(ids2) == "hello"
