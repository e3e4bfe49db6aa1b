import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_tts.configs.tacotron2_config import Tacotron2Config
from tpu_tts.models.tacotron2 import Tacotron2


def _cfg(**kw):
    cfg = Tacotron2Config(num_chars=24, r=2, max_decoder_steps=40)
    cfg.audio.num_mels = 20
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _small_model(cfg):
    m = Tacotron2(cfg)
    # shrink the net for test speed
    m.net = type(m.net)(
        num_chars=24, out_channels=20, r=cfg.r, encoder_dim=64,
        attn_type="original", attn_kwargs=(("attention_dim", 32),),
        max_decoder_steps=cfg.max_decoder_steps,
        use_ddc=getattr(cfg, "double_decoder_consistency", False), ddc_r=4,
    )
    # shrink the internal decoder dims
    return m


def _batch(B=2, T_en=7, T_de=12, mels=20, r=2):
    rng = np.random.default_rng(0)
    stop_t = np.zeros((B, T_de // r), dtype=np.float32)
    stop_t[:, -2:] = 1.0
    return {
        "text_input": jnp.asarray(rng.integers(1, 24, (B, T_en)), dtype=jnp.int32),
        "text_lengths": jnp.array([T_en, T_en - 2], dtype=jnp.int32),
        "mel_input": jnp.asarray(rng.standard_normal((B, T_de, mels)), dtype=jnp.float32),
        "mel_lengths": jnp.array([T_de, T_de - 4], dtype=jnp.int32),
        "stop_targets": jnp.asarray(stop_t),
    }


def test_tacotron2_train_loss():
    import optax

    model = _small_model(_cfg())
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch()
    (loss, logs), grads = jax.jit(jax.value_and_grad(
        lambda p: model.loss_fn(p, batch, jax.random.PRNGKey(1)), has_aux=True
    ))(params)
    assert np.isfinite(float(loss)), logs
    assert float(optax.global_norm(grads)) > 0
    assert {"decoder_loss", "postnet_loss", "stopnet_loss", "ga_loss"} <= set(logs)


def test_tacotron2_ddc():
    model = _small_model(_cfg(double_decoder_consistency=True))
    params = model.init_params(jax.random.PRNGKey(0))
    loss, logs = model.loss_fn(params, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "decoder_coarse_loss" in logs


def test_tacotron2_inference():
    model = _small_model(_cfg())
    model.init_params(jax.random.PRNGKey(0))
    out = model.inference(np.arange(1, 8, dtype=np.int32))
    mel = np.asarray(out["model_outputs"])
    assert mel.shape[0] == 1 and mel.shape[2] == 20
    assert mel.shape[1] == 40  # max_decoder_steps
    assert np.isfinite(mel).all()
    assert np.asarray(out["alignments"]).shape[1] == 20  # steps = max/r


def test_tacotron2_forward_attention():
    model = Tacotron2(_cfg(use_forward_attn=True, transition_agent=True))
    model.net = type(model.net)(
        num_chars=24, out_channels=20, r=2, encoder_dim=64,
        attn_type="original",
        attn_kwargs=(("attention_dim", 32), ("forward_attn", True), ("trans_agent", True)),
        max_decoder_steps=40,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    loss, _ = model.loss_fn(params, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_tacotron2_gst():
    from tpu_tts.configs.tacotron2_config import GSTConfig

    model = Tacotron2(_cfg(use_gst=True, gst=GSTConfig(gst_embedding_dim=32, gst_num_heads=2)))
    model.net = type(model.net)(
        num_chars=24, out_channels=20, r=2, encoder_dim=64,
        attn_type="original", attn_kwargs=(("attention_dim", 32),), max_decoder_steps=40,
        use_gst=True, gst=(("gst_embedding_dim", 32), ("gst_num_heads", 2), ("gst_num_style_tokens", 4)),
    )
    params = model.init_params(jax.random.PRNGKey(0))
    assert "gst_layer" in params
    loss, _ = model.loss_fn(params, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # styled + unstyled inference through the wrapper
    out_styled = model.inference(
        np.arange(1, 8, dtype=np.int32), aux_input={"style_mel": np.zeros((12, 20), np.float32)}
    )
    out_plain = model.inference(np.arange(1, 8, dtype=np.int32))
    assert np.asarray(out_styled["model_outputs"]).shape == np.asarray(out_plain["model_outputs"]).shape


def test_tacotron2_capacitron():
    from tpu_tts.configs.tacotron2_config import CapacitronVAEConfig

    model = Tacotron2(_cfg(use_capacitron_vae=True, capacitron_vae=CapacitronVAEConfig()))
    model.net = type(model.net)(
        num_chars=24, out_channels=20, r=2, encoder_dim=64,
        attn_type="original", attn_kwargs=(("attention_dim", 32),), max_decoder_steps=40,
        use_capacitron=True, capacitron=(("capacitron_VAE_embedding_dim", 16),),
    )
    params = model.init_params(jax.random.PRNGKey(0))
    assert "capacitron_vae_layer" in params
    loss, logs = model.loss_fn(params, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "capacitron_kl" in logs
    assert abs(float(logs["capacitron_beta"]) - 1.0) < 1e-4
    # beta leaf gets gradient from the Lagrangian term
    g = jax.jit(jax.grad(lambda p: model.loss_fn(p, _batch(), jax.random.PRNGKey(1))[0]))(params)
    assert float(np.abs(np.asarray(g["capacitron_vae_layer"]["beta"])).sum()) > 0
    # dual optimizer: beta routed to SGD via multi_transform
    import optax
    opt = model.get_optimizer()
    state = opt.init(params)
    upd, _ = opt.update(g, state, params)
    assert np.isfinite(np.asarray(upd["capacitron_vae_layer"]["beta"])).all()
