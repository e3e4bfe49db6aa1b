"""Tortoise VoiceBpeTokenizer (ref TTS/tts/layers/tortoise/tokenizer.py:13).

Wraps a HuggingFace `tokenizers` BPE vocab (the reference ships
`utils/assets/tortoise/tokenizer.json`); text goes through english cleaning,
spaces become `[SPACE]` tokens. Falls back cleanly when no vocab file is
given — the model then uses byte ids."""

from typing import List, Optional

from tpu_tts.text.cleaners import english_cleaners


class VoiceBpeTokenizer:
    def __init__(self, vocab_file: Optional[str] = None, vocab_str: Optional[str] = None):
        from tokenizers import Tokenizer

        if vocab_file is not None:
            self.tokenizer = Tokenizer.from_file(vocab_file)
        elif vocab_str is not None:
            self.tokenizer = Tokenizer.from_str(vocab_str)
        else:
            raise ValueError("need vocab_file or vocab_str")

    def preprocess_text(self, txt: str) -> str:
        return english_cleaners(txt)

    def encode(self, txt: str) -> List[int]:
        txt = self.preprocess_text(txt)
        txt = txt.replace(" ", "[SPACE]")
        return self.tokenizer.encode(txt).ids

    def decode(self, seq) -> str:
        txt = self.tokenizer.decode(list(seq), skip_special_tokens=False).replace(" ", "")
        txt = txt.replace("[SPACE]", " ").replace("[STOP]", "").replace("[UNK]", "")
        return txt
