"""Tortoise audio↔text alignment and `[bracketed]` redaction.

Behavioral mirror of /root/reference/TTS/tts/layers/tortoise/
wav2vec_alignment.py (`max_alignment`:6, `Wav2VecAlignment.align`:55,
`redact`:125): a CTC wav2vec2 model timestamps every character of the spoken
text; spans the prompt engineering wrapped in `[...]` (emotion cues etc.) are
then cut out of the waveform. The alignment DP here is an iterative LCS
(the reference's recursive scorer optimizes the same objective); the CTC
model/tokenizer are injectable so no-egress deployments can pass local
checkpoints and tests can use stubs.
"""

from typing import List, Optional

import numpy as np

W2V_MODEL = "jbetker/wav2vec2-large-robust-ft-libritts-voxpopuli"
W2V_TOKENIZER = "jbetker/tacotron-symbols"


def _resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return x
    import math

    from scipy.signal import resample_poly

    g = math.gcd(int(orig_sr), int(target_sr))
    return resample_poly(x, target_sr // g, orig_sr // g, axis=-1).astype(np.float32)


def max_alignment(s1: str, s2: str, skip_character: str = "~") -> str:
    """Align `s1` onto `s2`, replacing every character of `s1` that cannot be
    matched (in order) with `skip_character`. Maximizes the number of kept
    characters — an LCS backtrace."""
    assert skip_character not in s1, f"Found the skip character {skip_character} in the provided string, {s1}"
    n, m = len(s1), len(s2)
    if n == 0:
        return ""
    if m == 0:
        return skip_character * n
    # LCS table
    dp = np.zeros((n + 1, m + 1), dtype=np.int32)
    for i in range(1, n + 1):
        c = s1[i - 1]
        row, prev = dp[i], dp[i - 1]
        for j in range(1, m + 1):
            row[j] = prev[j - 1] + 1 if c == s2[j - 1] else max(prev[j], row[j - 1])
    # backtrace: mark kept positions of s1
    keep = [False] * n
    i, j = n, m
    while i > 0 and j > 0:
        if s1[i - 1] == s2[j - 1] and dp[i][j] == dp[i - 1][j - 1] + 1:
            keep[i - 1] = True
            i -= 1
            j -= 1
        elif dp[i - 1][j] >= dp[i][j - 1]:
            i -= 1
        else:
            j -= 1
    return "".join(ch if k else skip_character for ch, k in zip(s1, keep))


class Wav2VecAlignment:
    """Character-level audio↔text alignment via a CTC wav2vec2 model."""

    def __init__(self, model=None, tokenizer=None, device: str = "cpu"):
        self.device = device
        self._model = model
        self._tokenizer = tokenizer

    @property
    def model(self):
        if self._model is None:
            from transformers import Wav2Vec2ForCTC

            self._model = Wav2Vec2ForCTC.from_pretrained(W2V_MODEL).cpu().eval()
        return self._model

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            from transformers import Wav2Vec2CTCTokenizer

            self._tokenizer = Wav2Vec2CTCTokenizer.from_pretrained(W2V_TOKENIZER)
        return self._tokenizer

    def _logits(self, audio: np.ndarray, audio_sample_rate: int) -> np.ndarray:
        import torch

        wav_np = _resample(np.asarray(audio, dtype=np.float32), audio_sample_rate, 16000)
        wav = torch.as_tensor(wav_np)
        if wav.dim() == 1:
            wav = wav[None]
        wav = (wav - wav.mean()) / torch.sqrt(wav.var() + 1e-7)
        with torch.no_grad():
            return self.model(wav).logits[0].cpu().numpy()

    def align(self, audio: np.ndarray, expected_text: str, audio_sample_rate: int = 24000) -> List[int]:
        """Return, per character of `expected_text`, its start sample in
        `audio` (ref wav2vec_alignment.py:55)."""
        audio = np.asarray(audio)
        orig_len = audio.shape[-1]
        logits = self._logits(audio, audio_sample_rate)
        pred_ids = logits.argmax(-1)
        pred_string = self.tokenizer.decode(pred_ids.tolist())

        fixed = max_alignment(expected_text.lower(), pred_string)
        w2v_compression = orig_len // logits.shape[0]
        expected_tokens = list(self.tokenizer.encode(fixed))
        expected_chars = list(fixed)
        if len(expected_tokens) <= 1:
            return [0] * len(expected_text)
        # the first char anchors at sample 0
        expected_tokens.pop(0)
        expected_chars.pop(0)

        alignments = [0]

        def next_matchable():
            while expected_chars:
                tok = expected_tokens.pop(0)
                ch = expected_chars.pop(0)
                if ch != "~":
                    return tok
                alignments.append(-1)
            return None

        want = next_matchable()
        for i, top in enumerate(pred_ids):
            if want is None:
                break
            if int(top) == int(want):
                alignments.append(i * w2v_compression)
                want = next_matchable()
        # unmatched tail
        while want is not None:
            alignments.append(-1)
            want = next_matchable()
        if len(alignments) != len(expected_text):
            raise RuntimeError(
                f"alignment failed: got {len(alignments)} anchors for {len(expected_text)} chars"
            )
        # interpolate the skipped (-1) positions between their neighbors
        alignments.append(orig_len)
        i = 0
        while i < len(alignments):
            if alignments[i] == -1:
                j = i
                while alignments[j] == -1:
                    j += 1
                left = alignments[i - 1] if i > 0 else 0
                gap = alignments[j] - left
                for k in range(i, j):
                    alignments[k] = left + (k - i + 1) * gap // (j - i + 1)
                i = j
            i += 1
        return alignments[:-1]

    def redact(self, audio: np.ndarray, expected_text: str, audio_sample_rate: int = 24000) -> np.ndarray:
        """Cut every `[bracketed]` span of `expected_text` out of `audio`
        (ref wav2vec_alignment.py:125)."""
        audio = np.asarray(audio)
        if "[" not in expected_text:
            return audio
        splitted = expected_text.split("[")
        fully_split = [splitted[0]]
        for spl in splitted[1:]:
            assert "]" in spl, 'Every "[" character must be paired with a "]" with no nesting.'
            fully_split.extend(spl.split("]"))
        # even indices are kept, odd indices are redacted
        non_redacted = []
        cursor = 0
        for i, part in enumerate(fully_split):
            if i % 2 == 0:
                non_redacted.append((cursor, max(0, cursor + len(part) - 1)))
            cursor += len(part)
        bare_text = "".join(fully_split)
        alignments = self.align(audio, bare_text, audio_sample_rate)
        pieces = [audio[..., alignments[s]: alignments[e]] for s, e in non_redacted]
        return np.concatenate(pieces, axis=-1)
