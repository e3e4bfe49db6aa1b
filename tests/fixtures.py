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


def tiny_bark_config():
    """A scaled-down Bark config exercising the exact reference id layout
    (all generation constants shrunk proportionally)."""
    from tpu_tts.config import register_config
    from tpu_tts.models.bark import BarkArgs, BarkEncodecArgs, BarkFineGPTArgs, BarkGPTArgs

    cfg = register_config("bark")()
    cfg.model_args = BarkArgs(
        semantic_config=BarkGPTArgs(
            block_size=128, input_vocab_size=80, output_vocab_size=80,
            n_layer=1, n_head=2, n_embd=16),
        coarse_config=BarkGPTArgs(
            block_size=128, input_vocab_size=60, output_vocab_size=60,
            n_layer=1, n_head=2, n_embd=16),
        fine_config=BarkFineGPTArgs(
            block_size=32, input_vocab_size=10, output_vocab_size=10,
            n_layer=1, n_head=2, n_embd=16, n_codes_total=4, n_codes_given=1),
        encodec_config=BarkEncodecArgs(
            hidden_size=8, num_filters=2, num_quantizers=8, codebook_size=8,
            upsampling_ratios=(4, 2)),
    )
    cfg.TEXT_CONTEXT = 8
    cfg.SEMANTIC_STEPS = 12
    cfg.SEMANTIC_VOCAB_SIZE = 32
    cfg.SEMANTIC_PAD_TOKEN = 32
    cfg.TEXT_PAD_TOKEN = 75
    cfg.TEXT_ENCODING_OFFSET = 0
    cfg.SEMANTIC_INFER_TOKEN = 79
    cfg.CODEBOOK_SIZE = 8
    cfg.N_COARSE_CODEBOOKS = 2
    cfg.N_FINE_CODEBOOKS = 4
    cfg.COARSE_SEMANTIC_PAD_TOKEN = 50
    cfg.COARSE_INFER_TOKEN = 52
    cfg.CONTEXT_WINDOW_SIZE = 32
    cfg.sample_rate = 24000
    return cfg
