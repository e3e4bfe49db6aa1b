"""Bark voice cloning: quantizer module, voice resolution, prompt-conditioned
cascade (ref TTS/tts/layers/bark/{hubert/*,inference_funcs.py})."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tpu_tts.layers.bark_voice_clone import (  # noqa: E402
    build_hubert_tokenizer_torch,
    get_voices,
    load_npz,
    load_voice,
)
from tpu_tts.models.bark import Bark  # noqa: E402
from tests.fixtures import tiny_bark_config  # noqa: E402


def _tiny_bark(tokenizer=None):
    cfg = tiny_bark_config()
    m = Bark(cfg, tokenizer=tokenizer)
    m.init_params(jax.random.PRNGKey(0))
    return m


def test_hubert_tokenizer_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")

    tok = build_hubert_tokenizer_torch(hidden_size=32, input_size=16, output_size=20, version=1)
    x = torch.randn(5, 16)
    ids = tok.get_token(x)
    assert ids.shape == (5,) and int(ids.max()) < 20
    # state-dict round trip through the loader's fallback (no .info zip)
    p = tmp_path / "quantizer.pth"
    torch.save(tok.state_dict(), p)
    tok2 = build_hubert_tokenizer_torch(hidden_size=32, input_size=16, output_size=20, version=1)
    tok2.load_state_dict(torch.load(p, weights_only=False))
    assert torch.equal(tok2.get_token(x), ids)


def _make_voice_dir(tmp_path, name="alice"):
    d = tmp_path / "voices" / name
    d.mkdir(parents=True)
    sem = np.arange(10) % 32
    coarse = (np.arange(24) % 8).reshape(2, 12)
    fine = (np.arange(48) % 8).reshape(4, 12)
    np.savez(d / "alice.npz", semantic_prompt=sem, coarse_prompt=coarse, fine_prompt=fine)
    return str(tmp_path / "voices")


def test_load_voice_npz(tmp_path):
    vdir = _make_voice_dir(tmp_path)
    voices = get_voices([vdir])
    assert "alice" in voices and voices["alice"][0].endswith(".npz")
    sem, coarse, fine = load_voice(None, "alice", [vdir])
    assert sem.shape == (10,) and coarse.shape == (2, 12) and fine.shape == (4, 12)
    assert load_voice(None, "random", [vdir]) == (None, None, None)
    s2, c2, f2 = load_npz(voices["alice"][0])
    np.testing.assert_array_equal(s2, sem)


def test_generate_audio_with_history():
    m = _tiny_bark()
    hist = (
        np.arange(10) % 32,
        (np.arange(24) % 8).reshape(2, 12),
        (np.arange(48) % 8).reshape(4, 12),
    )
    wav, sem, codes = m.generate_audio(
        np.arange(1, 7, dtype=np.int32), history_prompt=hist,
        max_coarse_history=20, sliding_window_len=6,
    )
    assert wav.ndim == 1 and np.isfinite(wav).all()
    assert codes.shape[-1] == 4
    # history frames must not leak into the output codes: the coarse stage
    # emits floor(len(sem) * ratio / NC) frames for the NEW semantics only
    ratio = m.COARSE_RATE_HZ / m.SEMANTIC_RATE_HZ * m.N_COARSE_CODEBOOKS
    assert codes.shape[0] == int(np.floor(len(sem) * ratio / 2))


def test_synthesize_with_cloned_voice(tmp_path):
    class ByteTok:
        def encode(self, text):
            return [b % 70 for b in text.encode("utf-8")][:8]

    m = _tiny_bark(tokenizer=ByteTok())
    vdir = _make_voice_dir(tmp_path)
    out = m.synthesize("hi there", m.config, speaker_id="alice", voice_dirs=vdir,
                       max_coarse_history=20, sliding_window_len=6)
    assert np.isfinite(out["wav"]).all() and out["text_inputs"] == "hi there"
