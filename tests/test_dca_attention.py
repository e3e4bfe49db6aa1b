"""Dynamic convolution attention tests (ref tacotron/attentions.py:323)."""

import jax
import jax.numpy as jnp
import numpy as np


def _attn():
    from tpu_tts.layers.tacotron import MonotonicDynamicConvolutionAttention

    return MonotonicDynamicConvolutionAttention(query_dim=32, embedding_dim=16, attention_dim=24)


def test_dca_step_shapes_and_monotonic_prior():
    attn = _attn()
    B, T, D = 2, 12, 16
    rng = jax.random.PRNGKey(0)
    inputs = jax.random.normal(rng, (B, T, D))
    query = jax.random.normal(jax.random.PRNGKey(1), (B, 32))
    state = attn.init_state(B, T)
    assert np.allclose(np.asarray(state["attention_weights"][:, 0]), 1.0)
    params = attn.init(rng, query, inputs, None, None, state)["params"]
    ctx, new_state = attn.apply({"params": params}, query, inputs, None, None, state)
    assert ctx.shape == (B, D)
    w = np.asarray(new_state["attention_weights"])
    assert w.shape == (B, T)
    assert np.allclose(w.sum(-1), 1.0, atol=1e-5)
    # beta-binomial prior is causal: mass cannot jump far ahead of position 0
    assert w[:, : attn.prior_filter_len].sum(-1).min() > 0.99


def test_dca_mask_floor():
    attn = _attn()
    B, T, D = 1, 10, 16
    inputs = jnp.ones((B, T, D))
    query = jnp.ones((B, 32))
    state = attn.init_state(B, T)
    mask = jnp.arange(T)[None, :] < 6
    params = attn.init(jax.random.PRNGKey(0), query, inputs, None, mask, state)["params"]
    _, ns = attn.apply({"params": params}, query, inputs, None, mask, state)
    w = np.asarray(ns["attention_weights"])
    assert (w[:, 6:] == 1e-8).all()


def test_dca_prior_matches_scipy_betabinom():
    from tpu_tts.layers.tacotron import _betabinom_pmf

    scipy = __import__("importlib").util.find_spec("scipy")
    if scipy is None:
        return
    from scipy.stats import betabinom

    ours = _betabinom_pmf(10, 0.1, 0.9)
    ref = betabinom.pmf(range(11), 10, 0.1, 0.9)
    assert np.allclose(ours, ref, atol=1e-10)


def test_dca_in_tacotron2_decoder_cell():
    from tpu_tts.layers.tacotron import Tacotron2DecoderCell

    cell = Tacotron2DecoderCell(
        frame_channels=8,
        r=1,
        encoder_dim=16,
        attn_rnn_dim=32,
        decoder_rnn_dim=32,
        prenet_dims=(16, 16),
        attn_type="dynamic_convolution",
    )
    assert cell is not None
