"""Synthetic LJSpeech-format micro-fixture for train smoke tests.

The reference ships a 128-clip LJSpeech subset (tests/data/ljspeech); this
build generates an equivalent-layout synthetic dataset (harmonic tones with
varying f0/length so mels have structure) — nothing is copied from upstream.
"""

import os

import numpy as np
import scipy.io.wavfile

_SENTENCES = [
    "the quick brown fox jumps over the lazy dog",
    "she sells sea shells by the sea shore",
    "a stitch in time saves nine",
    "all that glitters is not gold",
    "actions speak louder than words",
    "practice makes perfect every day",
    "the early bird catches the worm",
    "better late than never they say",
    "birds of a feather flock together",
    "every cloud has a silver lining",
    "fortune favors the bold and brave",
    "honesty is the best policy always",
    "knowledge is power said the teacher",
    "laughter is the best medicine",
    "no news is good news for now",
    "curiosity killed the cat long ago",
]


def ensure_ljspeech_fixture(root: str, n: int = 16, sr: int = 22050, seed: int = 0) -> str:
    """Create `<root>/ljspeech/{wavs/*.wav, metadata.csv}` if missing."""
    base = os.path.join(root, "ljspeech")
    wav_dir = os.path.join(base, "wavs")
    meta = os.path.join(base, "metadata.csv")
    if os.path.exists(meta):
        return base
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(n):
        text = _SENTENCES[i % len(_SENTENCES)]
        dur = 0.5 + 0.08 * (i % 7)
        t = np.arange(int(sr * dur)) / sr
        f0 = 120 + 15 * (i % 5)
        sig = np.zeros_like(t)
        for h in range(1, 6):
            sig += (0.4 / h) * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi))
        env = np.minimum(1.0, 10 * t) * np.minimum(1.0, 10 * (dur - t))
        sig = sig * env + 0.01 * rng.standard_normal(len(t))
        sig = (sig / np.abs(sig).max() * 0.8 * 32767).astype(np.int16)
        name = f"LJ001-{i:04d}"
        scipy.io.wavfile.write(os.path.join(wav_dir, name + ".wav"), sr, sig)
        lines.append(f"{name}|{text}|{text}")
    with open(meta, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return base
