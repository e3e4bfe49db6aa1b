from tpu_tts.text.characters import BaseCharacters, BaseVocabulary, Graphemes, IPAPhonemes
from tpu_tts.text.tokenizer import TTSTokenizer

__all__ = ["BaseCharacters", "BaseVocabulary", "Graphemes", "IPAPhonemes", "TTSTokenizer"]
