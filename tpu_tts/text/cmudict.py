"""CMU pronouncing dictionary wrapper (mirror of /root/reference/TTS/tts/
utils/text/cmudict.py). Loads the standard cmudict text format and looks up
ARPAbet pronunciations; `{WORD}` curly-brace markup is produced by
`get_arpabet` for mixed grapheme/ARPAbet training."""

import re
from typing import List, Optional

# standard ARPAbet phone set with stress markers
_VOWELS = ["AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY", "IH", "IY", "OW", "OY", "UH", "UW"]
_CONSONANTS = [
    "B", "CH", "D", "DH", "F", "G", "HH", "JH", "K", "L", "M", "N", "NG",
    "P", "R", "S", "SH", "T", "TH", "V", "W", "Y", "Z", "ZH",
]
VALID_SYMBOLS = sorted(
    _CONSONANTS + [v + s for v in _VOWELS for s in ("", "0", "1", "2")]
)
_VALID_SET = set(VALID_SYMBOLS)
_ALT_RE = re.compile(r"\([0-9]+\)")


def _get_pronunciation(s: str) -> Optional[str]:
    parts = s.strip().split(" ")
    for part in parts:
        if part not in _VALID_SET:
            return None
    return " ".join(parts)


def _parse_cmudict(file) -> dict:
    entries = {}
    for line in file:
        if line and ("A" <= line[0] <= "Z" or line[0] == "'"):
            parts = line.split("  ")
            if len(parts) < 2:
                continue
            word = _ALT_RE.sub("", parts[0])
            pron = _get_pronunciation(parts[1])
            if pron:
                entries.setdefault(word, []).append(pron)
    return entries


class CMUDict:
    """ARPAbet lookup over a cmudict file or file-like object (ref :92)."""

    def __init__(self, file_or_path, keep_ambiguous: bool = True):
        if isinstance(file_or_path, str):
            with open(file_or_path, encoding="latin-1") as f:
                entries = _parse_cmudict(f)
        else:
            entries = _parse_cmudict(file_or_path)
        if not keep_ambiguous:
            entries = {w: p for w, p in entries.items() if len(p) == 1}
        self._entries = entries

    def __len__(self):
        return len(self._entries)

    def lookup(self, word: str) -> Optional[List[str]]:
        """All ARPAbet pronunciations of `word`, or None."""
        return self._entries.get(word.upper())

    @staticmethod
    def get_arpabet(word: str, cmudict: "CMUDict", punctuation_symbols) -> str:
        """`word` → `{ARPABET}` markup keeping leading/trailing punctuation."""
        first, last = "", ""
        if word and word[0] in punctuation_symbols:
            first, word = word[0], word[1:]
        if word and word[-1] in punctuation_symbols:
            last, word = word[-1], word[:-1]
        pron = cmudict.lookup(word)
        if pron is not None:
            return first + "{%s}" % pron[0] + last
        return first + word + last
