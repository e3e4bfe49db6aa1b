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
