"""Batched DP serving over the 8-virtual-device mesh."""

import jax
import numpy as np
import pytest

from tpu_tts.infer.serving import BatchedSynthesizer


def test_batched_synthesizer_fans_out():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_vits import _tiny_config

    from tpu_tts.models.vits import Vits

    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    model = Vits(_tiny_config())
    model.init_params(jax.random.PRNGKey(0))
    model.ap = None

    bs = BatchedSynthesizer(model, text_bucket=16, mel_bucket=64)
    rng = np.random.default_rng(0)
    reqs = [rng.integers(1, 30, size=n).astype(np.int32) for n in (5, 9, 7)]
    wavs = bs.synthesize_batch(reqs)
    assert len(wavs) == 3
    for w in wavs:
        assert w.ndim == 1 and len(w) > 0
        assert np.isfinite(w).all()


def test_batched_synthesizer_2d_mesh_matches_1d():
    """data × model serving: the time-sharded decoder must produce the same
    audio as plain DP serving."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_vits import _tiny_config

    from tpu_tts.models.vits import Vits

    model = Vits(_tiny_config())
    model.init_params(jax.random.PRNGKey(0))
    model.ap = None

    rng = np.random.default_rng(0)
    reqs = [rng.integers(1, 30, size=n).astype(np.int32) for n in (5, 9, 7)]
    ref = BatchedSynthesizer(model, text_bucket=16, mel_bucket=64).synthesize_batch(reqs)
    got = BatchedSynthesizer(model, text_bucket=16, mel_bucket=64, model_shards=2).synthesize_batch(reqs)
    assert len(got) == len(ref)
    for w_ref, w_got in zip(ref, got):
        assert w_got.shape == w_ref.shape
        np.testing.assert_allclose(w_got, w_ref, atol=3e-5)


def test_synthesizer_dispatches_model_synthesize():
    """Self-contained pipelines (Bark/Tortoise) route through
    model.synthesize with voice_dirs (ref synthesizer.py:385)."""
    import jax

    from tests.fixtures import tiny_bark_config
    from tpu_tts.infer.synthesizer import Synthesizer
    from tpu_tts.models import setup_model

    cfg = tiny_bark_config()
    model = setup_model(cfg)
    model.init_params(jax.random.PRNGKey(0))

    s = Synthesizer.__new__(Synthesizer)
    s.tts_model = model
    s.tts_config = cfg
    s.vocoder_model = None
    s.speaker_manager = None
    s.language_manager = None
    s.voice_dir = None
    s.output_sample_rate = cfg.SAMPLE_RATE
    wav = s.tts("hi", split_sentences=False)
    assert len(wav) > 0
    assert np.isfinite(np.asarray(wav, dtype=np.float32)).all()


def test_scaling_bench_harness():
    """scripts/scaling_bench.py (SURVEY.md §7.8) runs the data-sharded
    inference program at several device counts and reports efficiency."""
    import json
    import subprocess
    import sys
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "scaling_bench.py"),
         "--virtual", "2", "--devices", "1,2", "--mode", "infer", "--iters", "1"],
        capture_output=True, text=True, timeout=600, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert {r["devices"] for r in rows} == {1, 2}
    for r in rows:
        assert r["audio_s_per_s"] > 0 and r["efficiency"] > 0
