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
