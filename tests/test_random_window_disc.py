"""RandomWindowDiscriminator tests (ref vocoder/models/random_window_discriminator.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _make(hop=64):
    from tpu_tts.vocoder.models.random_window_discriminator import RandomWindowDiscriminator

    return RandomWindowDiscriminator(
        cond_channels=20,
        hop_length=hop,
        window_sizes=(256, 512),
        cond_disc_downsample_factors=((4, 4, 2), (4, 4)),
        cond_disc_out_channels=((64, 128), (128,)),
        uncond_disc_downsample_factors=(4, 2),
    )


def test_rwd_forward_shapes():
    d = _make()
    B, T = 2, 2048
    x = jnp.zeros((B, T, 1))
    c = jnp.zeros((B, T // 64, 20))
    params = d.init(jax.random.PRNGKey(0), x, c, None)["params"]
    scores, feats = d.apply({"params": params}, x, c, jax.random.PRNGKey(1))
    assert len(scores) == 4  # 2 uncond + 2 cond
    assert feats == []
    for s in scores:
        assert np.isfinite(np.asarray(s)).all()


def test_rwd_random_windows_jit_once():
    d = _make()
    B, T = 1, 2048
    x = jnp.ones((B, T, 1))
    c = jnp.ones((B, T // 64, 20))
    params = d.init(jax.random.PRNGKey(0), x, c, None)["params"]
    fn = jax.jit(lambda p, x, c, r: d.apply({"params": p}, x, c, r)[0])
    s1 = fn(params, x, c, jax.random.PRNGKey(1))
    s2 = fn(params, x, c, jax.random.PRNGKey(2))  # different windows, same trace
    assert len(s1) == len(s2)


def test_rwd_via_gan_registry():
    from tpu_tts.vocoder.configs.shared_configs import BaseGANVocoderConfig as GanConfig
    from tpu_tts.vocoder.models import setup_discriminator

    cfg = GanConfig(
        generator_model="melgan_generator",
        discriminator_model="random_window_discriminator",
        discriminator_model_params={"window_sizes": [256, 512]},
    )
    # default cond schedules have 5 entries; with 2 windows init would assert —
    # just check registry construction + window override
    d = setup_discriminator(cfg)
    assert tuple(d.window_sizes) == (256, 512)


def test_pwgan_discriminator_registry():
    from tpu_tts.vocoder.configs.shared_configs import BaseGANVocoderConfig as GanConfig
    from tpu_tts.vocoder.models import setup_discriminator

    cfg = GanConfig(
        generator_model="parallel_wavegan_generator",
        discriminator_model="parallel_wavegan_discriminator",
    )
    d = setup_discriminator(cfg)
    x = jnp.zeros((2, 256, 1))
    params = d.init(jax.random.PRNGKey(0), x)["params"]
    score, feats = d.apply({"params": params}, x)
    assert score.shape[0] == 2 and len(feats) > 0
