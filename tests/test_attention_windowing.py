"""Eval-time attention windowing + forward-attention masking
(ref tacotron/attentions.py:245-272)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.layers.tacotron import OriginalAttention


def _bind(attn, rng, query, inputs, state):
    def full(mdl):
        return mdl(query, inputs, mdl.preprocess_inputs(inputs), None, state)

    variables = attn.init(rng, method=full)
    processed = attn.apply(variables, inputs, method=OriginalAttention.preprocess_inputs)
    return variables, processed


def test_windowing_confines_alignment():
    B, T, D = 2, 20, 16
    attn = OriginalAttention(query_dim=32, embedding_dim=D, attention_dim=24, windowing=True)
    rng = jax.random.PRNGKey(0)
    inputs = jax.random.normal(rng, (B, T, D))
    query = jax.random.normal(jax.random.PRNGKey(1), (B, 32))
    state = attn.init_state(B, T)
    assert state["win_idx"].shape == (B,) and int(state["win_idx"][0]) == -1
    variables, processed = _bind(attn, rng, query, inputs, state)

    # first eval step: window is [-1-2, -1+6) -> only positions 0..4 reachable
    _, s1 = attn.apply(variables, query, inputs, processed, None, state, train=False)
    w1 = np.asarray(s1["attention_weights"])
    assert (w1[:, 5:] < 1e-6).all()
    assert np.allclose(w1.sum(-1), 1.0, atol=1e-5)
    idx1 = np.asarray(s1["win_idx"])
    assert (idx1 >= 0).all() and (idx1 < 5).all()

    # subsequent steps stay inside [idx-2, idx+6)
    _, s2 = attn.apply(variables, query, inputs, processed, None, s1, train=False)
    w2 = np.asarray(s2["attention_weights"])
    pos = np.arange(T)[None, :]
    outside = (pos < idx1[:, None] - 2) | (pos >= idx1[:, None] + 6)
    assert (w2[outside] < 1e-6).all()


def test_windowing_inactive_in_training():
    B, T, D = 2, 20, 16
    attn = OriginalAttention(query_dim=32, embedding_dim=D, attention_dim=24, windowing=True)
    rng = jax.random.PRNGKey(0)
    inputs = jax.random.normal(rng, (B, T, D))
    query = jax.random.normal(jax.random.PRNGKey(1), (B, 32))
    state = attn.init_state(B, T)
    variables, processed = _bind(attn, rng, query, inputs, state)
    _, s_tr = attn.apply(variables, query, inputs, processed, None, state, train=True)
    # training step must not move the window index and weights span freely
    assert int(s_tr["win_idx"][0]) == -1
    plain = OriginalAttention(query_dim=32, embedding_dim=D, attention_dim=24)
    pstate = plain.init_state(B, T)
    pv, pp = _bind(plain, rng, query, inputs, pstate)
    _, s_plain = plain.apply(pv, query, inputs, pp, None, pstate, train=True)
    assert np.allclose(
        np.asarray(s_tr["attention_weights"]), np.asarray(s_plain["attention_weights"]), atol=1e-6
    )


def test_forward_attn_mask_forces_incremental():
    B, T, D = 1, 20, 16
    attn = OriginalAttention(
        query_dim=32, embedding_dim=D, attention_dim=24, forward_attn=True, forward_attn_mask=True
    )
    rng = jax.random.PRNGKey(0)
    inputs = jax.random.normal(rng, (B, T, D))
    query = jax.random.normal(jax.random.PRNGKey(1), (B, 32))
    state = attn.init_state(B, T)
    # put the running alpha peak mid-sequence so the mask window is interior
    alpha = np.full((B, T), 1e-7, np.float32)
    alpha[:, 8] = 1.0
    state = dict(state, alpha=jnp.asarray(alpha) / jnp.sum(jnp.asarray(alpha)))
    variables, processed = _bind(attn, rng, query, inputs, state)
    _, s = attn.apply(variables, query, inputs, processed, None, state, train=False)
    w = np.asarray(s["alpha"])[0]
    # shifted peak lands at n=9: zeros before n-1=8 (except the smoothing tap
    # at n-2=7) and at/after n+3=12
    assert (w[:7] == 0).all()
    assert (w[12:] == 0).all()
    assert w[7] > 0  # 0.01 * max smoothing tap
    assert abs(w.sum() - 1.0) < 1e-5


def test_windowing_in_decoder_inference():
    """End-to-end: Tacotron2 decoder inference with windowing on runs and
    yields a valid alignment path."""
    from tpu_tts.layers.tacotron import Tacotron2Decoder

    B, T_en, D = 1, 12, 32
    dec = Tacotron2Decoder(
        frame_channels=8,
        r=2,
        encoder_dim=D,
        attn_rnn_dim=32,
        decoder_rnn_dim=32,
        prenet_dims=(16, 16),
        attn_kwargs=(("attention_dim", 16), ("windowing", True)),
        max_decoder_steps=20,
    )
    inputs = jax.random.normal(jax.random.PRNGKey(0), (B, T_en, D))
    memories = jax.random.normal(jax.random.PRNGKey(1), (B, 10, 8))
    variables = dec.init(jax.random.PRNGKey(2), inputs, memories, None, train=False)
    frames, stops, attns, lengths = dec.apply(
        variables, inputs, method=Tacotron2Decoder.inference, rngs={"dropout": jax.random.PRNGKey(3)}
    )
    assert frames.shape == (B, 20, 8)
    w = np.asarray(attns)  # [B, steps, T_en]
    assert np.all(np.isfinite(w))
