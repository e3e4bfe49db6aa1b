"""VITS serving-path text bucketing (VERDICT r3 #1a).

`Vits.inference` right-pads token ids to the TEXT_BUCKET grid so a cold
server compiles once per bucket instead of once per sentence length (the
reference's dynamic-shape runtime serves any length with zero recompiles,
ref TTS/utils/synthesizer.py:294). The `x_lengths` masks must make the
padded run numerically identical to the exact-length run, and two lengths
in the same bucket must share one compiled stage-1 program.
"""

import jax
import numpy as np
import pytest

jnp = jax.numpy

from tests.test_vits import _tiny_config
from tpu_tts.models.vits import Vits


@pytest.fixture(scope="module")
def model():
    m = Vits(_tiny_config())
    m.init_params(jax.random.PRNGKey(0))
    return m


def _infer(model, n, seed=0):
    ids = np.arange(1, n + 1, dtype=np.int32) % 20
    out = model.inference(ids, aux_input={"seed": seed})
    y = int(np.asarray(out["y_lengths"])[0])
    return np.asarray(out["model_outputs"])[0, : y * 1, :]  # [T, 1] wave frames


def test_bucketed_matches_exact(model):
    """Padding to the bucket grid must not change the audio: compare the
    bucketed run against a TEXT_BUCKET=1 (no padding) run."""
    model._infer_cache.clear()
    bucketed = _infer(model, 9)

    model._infer_cache = {}
    model.TEXT_BUCKET = 1  # instance attr shadows the class default
    try:
        exact = _infer(model, 9)
    finally:
        del model.TEXT_BUCKET
        model._infer_cache = {}
    assert bucketed.shape == exact.shape
    np.testing.assert_allclose(bucketed, exact, atol=1e-5)


def test_same_bucket_shares_stage1_compile(model):
    model._infer_cache.clear()
    for n in (5, 9, 17, 31):
        out = model.inference(np.arange(1, n + 1, dtype=np.int32) % 20)
        assert np.isfinite(np.asarray(out["model_outputs"])).all()
    stage1_keys = [k for k in model._infer_cache if k[0] == "stage1"]
    assert len(stage1_keys) == 1, f"expected one bucketed stage-1 compile, got {stage1_keys}"
    assert stage1_keys[0][1][1] == Vits.TEXT_BUCKET
