"""Tortoise wav2vec alignment + redaction (ref wav2vec_alignment.py), with a
stubbed CTC model so no checkpoints are needed."""

import numpy as np
import pytest

from tpu_tts.layers.tortoise_align import Wav2VecAlignment, max_alignment


def test_max_alignment_basic():
    assert max_alignment("abc", "abc") == "abc"
    assert max_alignment("abc", "xxaxxbxxcxx") == "abc"
    assert max_alignment("abc", "") == "~~~"
    assert max_alignment("", "xyz") == ""
    out = max_alignment("hello world", "helo wrld")
    # every kept char appears, skipped ones are ~
    assert len(out) == len("hello world")
    assert out.replace("~", "") and all(c in "helo wrld~" for c in out)


class _StubTokenizer:
    """Char-level CTC tokenizer: id 0 = blank, chars map to ord offsets."""

    def __init__(self, alphabet="abcdefghijklmnopqrstuvwxyz "):
        self.alphabet = alphabet
        self.char_to_id = {c: i + 1 for i, c in enumerate(alphabet)}

    def encode(self, text):
        return [self.char_to_id.get(c, 0) for c in text]

    def decode(self, ids):
        out = []
        prev = 0
        for i in ids:
            if i != prev and i != 0:
                out.append(self.alphabet[i - 1])
            prev = i
        return "".join(out)


class _StubModel:
    """Emits one high logit per scheduled (frame, token) pair."""

    def __init__(self, schedule, n_frames, vocab):
        self.schedule = schedule  # list of (frame_idx, token_id)
        self.n_frames = n_frames
        self.vocab = vocab

    def __call__(self, wav):
        import torch

        logits = torch.zeros((1, self.n_frames, self.vocab))
        for f, t in self.schedule:
            logits[0, f, t] = 10.0
        class R:  # noqa: N801
            pass
        r = R()
        r.logits = logits
        return r


def _aligner_for(text, n_frames=20, sr=24000, n_samples=24000):
    tok = _StubTokenizer()
    ids = tok.encode(text)
    # spread the characters evenly over the frames
    schedule = [(2 + i * ((n_frames - 4) // max(len(ids), 1)), t) for i, t in enumerate(ids)]
    model = _StubModel(schedule, n_frames, vocab=30)
    return Wav2VecAlignment(model=model, tokenizer=tok)


def test_align_monotonic():
    pytest.importorskip("torch")
    text = "hello"
    al = _aligner_for(text)
    wav = np.random.default_rng(0).standard_normal(24000).astype(np.float32)
    marks = al.align(wav, text, 24000)
    assert len(marks) == len(text)
    assert marks == sorted(marks)
    assert all(0 <= m <= 24000 for m in marks)


def test_redact_removes_bracketed_span():
    pytest.importorskip("torch")
    text = "[I am sad,] hello"
    bare = "I am sad, hello"
    al = _aligner_for(bare.lower())
    wav = np.random.default_rng(0).standard_normal(24000).astype(np.float32)
    out = al.redact(wav, text, 24000)
    assert out.shape[-1] < wav.shape[-1]
    no_brackets = al.redact(wav, "hello", 24000)
    assert no_brackets.shape == wav.shape


def test_tortoise_wav_output():
    jax = pytest.importorskip("jax")
    from tpu_tts.config.base import Coqpit
    from tpu_tts.models.tortoise import Tortoise, TortoiseArgs

    cfg = Coqpit()
    cfg.model_args = TortoiseArgs(
        num_chars=32, mel_code_vocab=24, gpt_layers=1, gpt_heads=2, gpt_channels=16,
        clvp_dim=16, clvp_layers=1, diff_channels=16, diff_layers=1, out_channels=8,
        kv_cache_len=64, num_ar_samples=2, diffusion_steps=2,
        vocoder_upsample_factors=(4, 4),
    )
    m = Tortoise(cfg)
    m.init_params(jax.random.PRNGKey(0))
    out = m.inference(np.arange(1, 6, dtype=np.int32), max_code_tokens=8)
    assert "wav" in out and np.isfinite(out["wav"]).all()
    assert out["wav"].shape[0] == out["model_outputs"].shape[1] * 16
