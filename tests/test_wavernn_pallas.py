"""Pallas fused WaveRNN sampler vs the flax cell, greedy-decode equivalence
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_tts.ops.wavernn_pallas import PallasWavernnSampler
from tpu_tts.vocoder.configs.wavegrad_config import WavernnConfig
from tpu_tts.vocoder.models.wavernn import Wavernn, WavernnArgs, WavernnNet


def _flax_greedy(model, mels_up, aux, T):
    """Reference greedy decode through the flax cell, step by step."""
    cell_apply = lambda h1, h2, x_prev, mel_t, aux_t: model.net.apply(
        {"params": model.params},
        h1, h2, x_prev, mel_t, aux_t,
        method=lambda net, *a: net.cell(*a),
    )
    B = mels_up.shape[0]
    R = model.args.rnn_dims
    h1 = jnp.zeros((B, R))
    h2 = jnp.zeros((B, R))
    sample = jnp.zeros((B, 1))
    C = 2 ** int(model.args.mode)
    outs = []
    for t in range(T):
        h1, h2, logits = cell_apply(h1, h2, sample, mels_up[:, t], aux[:, t])
        idx = jnp.argmax(logits, axis=-1)
        sample = (2.0 * idx.astype(jnp.float32) / (C - 1.0) - 1.0)[:, None]
        outs.append(sample[:, 0])
    return np.stack([np.asarray(o) for o in outs], axis=1)


@pytest.fixture(scope="module")
def small_wavernn():
    cfg = WavernnConfig()
    cfg.model_args = WavernnArgs(
        rnn_dims=16, fc_dims=16, compute_dims=8, res_out_dims=8, num_res_blocks=1,
        upsample_factors=[2, 2], mode="7", mulaw=False, pad=2,
    )
    m = Wavernn(cfg)
    m.init_params(jax.random.PRNGKey(0))
    return m


def test_pallas_matches_flax_greedy(small_wavernn):
    m = small_wavernn
    rng = np.random.default_rng(0)
    B, T = 2, 12
    mels_up = jnp.asarray(rng.standard_normal((B, T, 80)), dtype=jnp.float32)
    aux = jnp.asarray(rng.standard_normal((B, T, 8)), dtype=jnp.float32)

    ref = _flax_greedy(m, mels_up, aux, T)

    sampler = PallasWavernnSampler.from_flax_params(m.params, m.args)
    sampler.interpret = True
    sampler.greedy = True
    sampler.time_chunk = 8  # force multi-grid-step carry
    out = np.asarray(sampler(mels_up, aux))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_wavernn_inference_use_pallas(small_wavernn):
    """End-to-end `Wavernn.inference(use_pallas=True)`: upsample net + fused
    kernel, folded decode, full-length waveform out."""
    m = small_wavernn
    rng = np.random.default_rng(2)
    mels = rng.standard_normal((20, 80)).astype(np.float32)
    hop = int(np.prod(m.args.upsample_factors))
    wav = m.inference(mels, batched=True, target=8 * hop, overlap=2 * hop, use_pallas=True)
    assert wav.shape == (20 * hop,)
    assert np.isfinite(wav).all()


def test_pallas_sampled_mode_runs(small_wavernn):
    m = small_wavernn
    rng = np.random.default_rng(1)
    mels_up = jnp.asarray(rng.standard_normal((2, 10, 80)), dtype=jnp.float32)
    aux = jnp.asarray(rng.standard_normal((2, 10, 8)), dtype=jnp.float32)
    sampler = PallasWavernnSampler.from_flax_params(m.params, m.args)
    sampler.interpret = True
    out = np.asarray(sampler(mels_up, aux, seed=3))
    assert out.shape == (2, 10)
    assert np.isfinite(out).all()
    assert (out >= -1).all() and (out <= 1).all()
