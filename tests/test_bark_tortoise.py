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
        num_chars=40, mel_code_vocab=30, gpt_layers=2, gpt_heads=2, gpt_channels=32,
        clvp_dim=16, clvp_layers=1, diff_channels=16, diff_layers=2, out_channels=20,
        kv_cache_len=96, num_ar_samples=3, diffusion_steps=4,
    )
    t = setup_model(cfg)
    t.init_params(jax.random.PRNGKey(0))
    out = t.inference(np.arange(1, 7, dtype=np.int32), max_code_tokens=12)
    assert out["model_outputs"].shape == (1, 12, 20)
    assert np.isfinite(out["model_outputs"]).all()
    assert out["clvp_scores"].shape == (3,)
    assert 0 <= out["best_candidate"] < 3


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
