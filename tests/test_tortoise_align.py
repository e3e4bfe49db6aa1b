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
        ar_layers=1, ar_model_dim=32, ar_heads=2, ar_number_text_tokens=32,
        ar_start_text_token=32, ar_number_mel_codes=24, ar_start_mel_token=22,
        ar_stop_mel_token=23,
        diff_model_channels=32, diff_num_layers=1, diff_in_channels=8,
        diff_out_channels=16, diff_in_latent_channels=32, diff_in_tokens=25,
        diff_num_heads=2,
        clvp_dim_text=16, clvp_dim_speech=16, clvp_dim_latent=16,
        clvp_num_text_tokens=33, clvp_text_enc_depth=1, clvp_text_heads=2,
        clvp_num_speech_tokens=24, clvp_speech_enc_depth=1, clvp_speech_heads=2,
        voc_noise_dim=4, voc_channel_size=4, voc_strides=(4, 4), voc_n_mel_channels=8,
        calm_token=5, pad_fill_token=5, tail_tokens=(3, 3, 7),
    )
    m = Tortoise(cfg)
    m.init_params(jax.random.PRNGKey(0))
    out = m.inference(np.arange(1, 6, dtype=np.int32), num_autoregressive_samples=2,
                      max_mel_tokens=8, diffusion_iterations=2)
    assert "wav" in out and np.isfinite(out["wav"]).all()
    assert out["wav"].shape[0] == out["model_outputs"].shape[1] * 16


def test_voice_bpe_tokenizer_roundtrip():
    """VoiceBpeTokenizer over a minimal BPE vocab (ref layers/tortoise/
    tokenizer.py:13: english cleaning + [SPACE] substitution)."""
    import tempfile

    from tpu_tts.layers.tortoise_tokenizer import VoiceBpeTokenizer

    from tokenizers import Tokenizer
    from tokenizers.models import BPE

    vocab = {ch: i for i, ch in enumerate(
        ["[STOP]", "[UNK]", "[SPACE]"] + list("abcdefghijklmnopqrstuvwxyz"))}
    t = Tokenizer(BPE(vocab=vocab, merges=[], unk_token="[UNK]"))
    t.add_special_tokens(["[SPACE]", "[STOP]", "[UNK]"])
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        path = f.name
    t.save(path)
    tok = VoiceBpeTokenizer(vocab_file=path)
    ids = tok.encode("Hello there")
    assert all(isinstance(i, int) for i in ids) and len(ids) > 5
    assert tok.decode(ids) == "hello there"
