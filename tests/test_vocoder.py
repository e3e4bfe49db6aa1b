import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_tts.vocoder.layers.pqmf import PQMF
from tpu_tts.vocoder.models.hifigan_generator import HifiganGenerator
from tpu_tts.vocoder.models.hifigan_discriminator import HifiganDiscriminator
from tpu_tts.vocoder.models.melgan_generator import MelganGenerator


def _small_hifigan():
    return HifiganGenerator(
        in_channels=80,
        upsample_initial_channel=32,
        upsample_factors=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )


def test_hifigan_generator_shapes():
    gen = _small_hifigan()
    mel = jnp.zeros((2, 10, 80))
    params = gen.init(jax.random.PRNGKey(0), mel)
    y = gen.apply(params, mel)
    assert y.shape == (2, 10 * 256, 1)  # 8*8*2*2 = 256 upsampling
    assert np.abs(np.asarray(y)).max() <= 1.0


def test_hifigan_resblock2():
    gen = HifiganGenerator(
        in_channels=80, upsample_initial_channel=16, upsample_factors=(4, 4),
        upsample_kernel_sizes=(8, 8), resblock_type="2",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    mel = jnp.zeros((1, 6, 80))
    params = gen.init(jax.random.PRNGKey(0), mel)
    y = gen.apply(params, mel)
    assert y.shape == (1, 6 * 16, 1)


def test_hifigan_discriminator():
    disc = HifiganDiscriminator()
    y = jax.random.normal(jax.random.PRNGKey(0), (1, 2048, 1))
    params = disc.init(jax.random.PRNGKey(1), y)
    scores, feats = disc.apply(params, y)
    assert len(scores) == 8  # 5 MPD + 3 MSD
    assert len(feats) == 8
    for s in scores:
        assert np.isfinite(np.asarray(s)).all()


def test_melgan_generator_shapes():
    gen = MelganGenerator(in_channels=80, base_channels=32, upsample_factors=(8, 8, 2, 2), num_res_blocks=2)
    mel = jnp.zeros((2, 7, 80))
    params = gen.init(jax.random.PRNGKey(0), mel)
    y = gen.apply(params, mel)
    assert y.shape == (2, 7 * 256, 1)


def test_pqmf_reconstruction():
    sr = 22050
    t = np.arange(sr // 4) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None, :, None]
    pqmf = PQMF(N=4)
    sub = pqmf.analysis(jnp.asarray(x))
    assert sub.shape[2] == 4
    rec = np.asarray(pqmf.synthesis(sub))[0, :, 0]
    x0 = x[0, :, 0]
    # compensate group delay, compare interior
    n = min(len(rec), len(x0))
    best = max(
        np.corrcoef(x0[64 : n - 128], rec[64 + d : n - 128 + d])[0, 1] for d in range(-40, 40)
    )
    assert best > 0.99


def test_gan_model_train_steps():
    import optax

    from tpu_tts.vocoder.configs.gan_configs import HifiganConfig
    from tpu_tts.vocoder.models.gan import GAN

    cfg = HifiganConfig(
        generator_model_params={
            "upsample_factors": [4, 4, 2],
            "upsample_kernel_sizes": [8, 8, 4],
            "upsample_initial_channel": 16,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
            "resblock_type": "2",
        },
        seq_len=1024,
        batch_size=2,
        l1_spec_loss_params={
            "use_mel": True, "sample_rate": 22050, "n_fft": 512, "hop_length": 32,
            "win_length": 512, "n_mels": 40, "mel_fmin": 0.0, "mel_fmax": None,
        },
    )
    cfg.audio.num_mels = 80
    cfg.audio.hop_length = 32  # match 4*4*2 upsampling
    cfg.audio.fft_size = 512
    cfg.audio.win_length = 512
    cfg.audio.mel_fmax = 8000.0
    model = GAN.init_from_config(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    rngk = np.random.default_rng(0)
    batch = {
        "mel_input": jnp.asarray(rngk.standard_normal((2, 32, 80)), dtype=jnp.float32),
        "waveform": jnp.asarray(rngk.standard_normal((2, 1024, 1)) * 0.3, dtype=jnp.float32),
    }
    opts = model.get_optimizer()
    assert len(opts) == 2
    states = [opts[i].init(model.param_partition(params, i)) for i in range(2)]

    for idx in range(2):
        sub = model.param_partition(params, idx)

        def loss_sub(s):
            merged = model.param_merge(params, s, idx)
            return model.loss_fn(merged, batch, jax.random.PRNGKey(1), optimizer_idx=idx)

        # jit: the eager MPD+MSD backward dispatches thousands of ops on
        # XLA:CPU (this test alone was 530 s in the r3 suite)
        (loss, logs), grads = jax.jit(jax.value_and_grad(loss_sub, has_aux=True))(sub)
        assert np.isfinite(float(loss)), f"opt {idx} loss not finite"
        gnorm = optax.global_norm(grads)
        assert float(gnorm) > 0, f"opt {idx} zero grads"
        # D pass must not leak grads into G params and vice versa is handled
        # by partitioning itself
        updates, _ = opts[idx].update(grads, states[idx], sub)
        sub2 = optax.apply_updates(sub, updates)
        params = model.param_merge(params, sub2, idx)

    # inference produces a waveform
    wav = model.inference(np.asarray(batch["mel_input"])[0])
    assert wav.shape == (1, 32 * 32, 1)
