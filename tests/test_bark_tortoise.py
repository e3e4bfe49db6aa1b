import jax
import numpy as np
import pytest

from tpu_tts.config import register_config
from tpu_tts.models import setup_model
from tpu_tts.models.tortoise import TortoiseArgs
from tests.fixtures import tiny_bark_config


def test_bark_cascade():
    cfg = tiny_bark_config()
    m = setup_model(cfg)
    m.init_params(jax.random.PRNGKey(0))
    wav, sem, codes = m.generate_audio(np.arange(1, 7, dtype=np.int32))
    assert wav.ndim == 1 and np.isfinite(wav).all()
    assert codes.shape[-1] == cfg.N_FINE_CODEBOOKS
    assert (codes >= 0).all() and (codes <= cfg.CODEBOOK_SIZE).all()
    with pytest.raises(NotImplementedError):
        m.loss_fn(None, None, None)


def test_tortoise_pipeline():
    cfg = register_config("tortoise")()
    cfg.model_args = TortoiseArgs(
        ar_layers=2, ar_model_dim=32, ar_heads=2, ar_max_text_tokens=40,
        ar_max_mel_tokens=60, ar_number_text_tokens=40, ar_start_text_token=40,
        ar_number_mel_codes=30, ar_start_mel_token=28, ar_stop_mel_token=29,
        diff_model_channels=32, diff_num_layers=2, diff_in_channels=20,
        diff_out_channels=40, diff_in_latent_channels=32, diff_in_tokens=31,
        diff_num_heads=2,
        clvp_dim_text=16, clvp_dim_speech=16, clvp_dim_latent=16,
        clvp_num_text_tokens=41, clvp_text_enc_depth=1, clvp_text_heads=2,
        clvp_num_speech_tokens=30, clvp_speech_enc_depth=1, clvp_speech_heads=2,
        voc_noise_dim=4, voc_channel_size=4, voc_strides=(4, 4), voc_n_mel_channels=20,
        calm_token=5, pad_fill_token=5, tail_tokens=(3, 3, 7),
    )
    t = setup_model(cfg)
    t.init_params(jax.random.PRNGKey(0))
    out = t.inference(np.arange(1, 7, dtype=np.int32), num_autoregressive_samples=3,
                      max_mel_tokens=12, diffusion_iterations=4)
    assert out["model_outputs"].shape[0] == 1 and out["model_outputs"].shape[2] == 20
    assert np.isfinite(out["model_outputs"]).all()
    assert np.isfinite(out["wav"]).all()
    assert out["clvp_scores"].shape == (3,)
    assert 0 <= out["best_candidate"] < 3
    assert out["gpt_codes"].shape == (3, 12)


def test_gst_and_capacitron():
    import jax.numpy as jnp

    from tpu_tts.layers.gst import GST, CapacitronVAE, capacitron_kl_loss

    gst = GST(num_style_tokens=4, gst_embedding_dim=32, num_heads=2)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 80))
    params = gst.init(jax.random.PRNGKey(1), style_mel=mel)
    emb = gst.apply(params, style_mel=mel)
    assert emb.shape == (2, 32)

    cap = CapacitronVAE(capacitron_VAE_embedding_dim=16, text_summary_embedding_dim=8)
    text = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 12))
    pc = cap.init({"params": jax.random.PRNGKey(3), "capacitron": jax.random.PRNGKey(4)},
                  reference_mel=mel, text_summary=text)
    z, mu, logvar, beta_raw = cap.apply(pc, reference_mel=mel, text_summary=text,
                                        rngs={"capacitron": jax.random.PRNGKey(5)})
    assert z.shape == (2, 16)
    assert abs(float(jax.nn.softplus(beta_raw)[0]) - 1.0) < 1e-5
    loss, kl = capacitron_kl_loss(mu, logvar, capacity=5.0, beta=jnp.asarray(1.0))
    assert np.isfinite(float(loss)) and np.isfinite(float(kl))


def test_bark_gpt_decode_matches_teacher_forced():
    """Incremental decode_step must reproduce the teacher-forced forward
    per position — the invariant that catches the scalar-position
    phantom-forward class of bug (see xtts gpt.py:decode_step)."""
    import jax.numpy as jnp

    from tpu_tts.layers.bark_gpt import BarkGPT

    gpt = BarkGPT(input_vocab_size=50, output_vocab_size=50, n_layer=2, n_head=2,
                  n_embd=32, block_size=64)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(1, 50, (2, 9)), dtype=jnp.int32)
    params = gpt.init(jax.random.PRNGKey(0), idx)["params"]
    full = np.asarray(gpt.apply({"params": params}, idx), dtype=np.float32)  # [B, 9, V]

    T_pre, T_max = 5, 16
    cache = gpt.init_cache(2, T_max)
    cache, hidden = gpt.apply({"params": params}, idx[:, :T_pre], cache, method=BarkGPT.prefill)
    logits_pre = gpt.apply({"params": params}, hidden[:, -1], method=BarkGPT.logits_at)
    np.testing.assert_allclose(np.asarray(logits_pre), full[:, T_pre - 1], atol=2e-4)
    for t in range(T_pre, idx.shape[1]):
        logits, cache = gpt.apply(
            {"params": params}, idx[:, t], jnp.full((2,), t), cache, t,
            method=BarkGPT.decode_step,
        )
        np.testing.assert_allclose(np.asarray(logits), full[:, t], atol=2e-4,
                                   err_msg=f"step {t}")


def test_tortoise_ar_decode_matches_teacher_forced():
    """UnifiedVoice incremental decode vs teacher-forced mel logits: prefill
    logits == mel_logits[:, 0]; decode_step(code_i, pos=i+1) == mel_logits
    [:, i+1] (same start/stop framing as ref inference_speech)."""
    import jax.numpy as jnp

    from tpu_tts.layers.tortoise_ar import UnifiedVoice

    uv = UnifiedVoice(layers=2, model_dim=32, heads=2, max_text_tokens=40,
                      max_mel_tokens=60, number_text_tokens=40,
                      start_text_token=40, number_mel_codes=30,
                      start_mel_token=28, stop_mel_token=29)
    rng = np.random.default_rng(1)
    B, T_t, M = 2, 6, 5
    cond = jnp.asarray(rng.standard_normal((B, 32)) * 0.1, dtype=jnp.float32)
    text = jnp.asarray(rng.integers(1, 40, (B, T_t)), dtype=jnp.int32)
    mel = jnp.asarray(rng.integers(0, 28, (B, M)), dtype=jnp.int32)
    params = uv.init(jax.random.PRNGKey(0), cond, text, mel)["params"]
    _, mel_logits = uv.apply({"params": params}, cond, text, mel)
    mel_logits = np.asarray(mel_logits, dtype=np.float32)  # [B, M+2, V]

    cache = uv.init_cache(B, 40)
    cache, P, logits0 = uv.apply({"params": params}, cond, text, cache,
                                 method=UnifiedVoice.prefill)
    np.testing.assert_allclose(np.asarray(logits0), mel_logits[:, 0], atol=2e-4)
    for i in range(M):
        logits, cache = uv.apply(
            {"params": params}, mel[:, i], jnp.full((B,), i + 1), cache, P + i,
            method=UnifiedVoice.decode_step,
        )
        np.testing.assert_allclose(np.asarray(logits), mel_logits[:, i + 1], atol=2e-4,
                                   err_msg=f"step {i}")
