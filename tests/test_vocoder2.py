import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_parallel_wavegan_generator():
    from tpu_tts.vocoder.models.parallel_wavegan import ParallelWaveganGenerator

    gen = ParallelWaveganGenerator(num_res_blocks=6, stacks=2, res_channels=8, gate_channels=16,
                                   skip_channels=8, upsample_factors=(4, 4))
    mel = jnp.zeros((2, 6, 80))
    params = gen.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel)
    y = gen.apply(params, mel, rngs={"noise": jax.random.PRNGKey(2)})
    assert y.shape == (2, 6 * 16, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_parallel_wavegan_discriminator():
    from tpu_tts.vocoder.models.parallel_wavegan import ParallelWaveganDiscriminator

    d = ParallelWaveganDiscriminator(num_layers=4, conv_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 1))
    params = d.init(jax.random.PRNGKey(1), x)
    score, feats = d.apply(params, x)
    assert np.isfinite(np.asarray(score)).all()
    assert len(feats) == 4


def test_wavegrad_train_and_infer():
    from tpu_tts.vocoder.configs.wavegrad_config import WavegradConfig
    from tpu_tts.vocoder.models.wavegrad import Wavegrad, WavegradArgs

    cfg = WavegradConfig()
    cfg.model_args = WavegradArgs(
        y_conv_channels=4,
        x_conv_channels=8,
        dblock_out_channels=[4, 4, 8, 8],
        ublock_out_channels=[8, 8, 4, 4, 4],
        upsample_factors=[2, 2, 2, 2, 2],
        upsample_dilations=[[1, 2, 1, 2]] * 5,
    )
    cfg.train_noise_schedule = {"min_val": 1e-6, "max_val": 1e-2, "num_steps": 10}
    model = Wavegrad(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = {
        "waveform": jnp.asarray(np.random.default_rng(0).standard_normal((2, 8 * 32, 1)) * 0.3, dtype=jnp.float32),
        "mel_input": jnp.zeros((2, 8, 80)),
    }
    loss, _ = model.loss_fn(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    wav = model.inference(np.zeros((4, 80), dtype=np.float32))
    assert wav.shape == (1, 4 * 32, 1)
    assert np.isfinite(wav).all()


def test_speaker_encoders():
    from tpu_tts.encoder.configs import SpeakerEncoderConfig
    from tpu_tts.encoder.models import setup_encoder_model

    cfg = SpeakerEncoderConfig()
    cfg.model_params = {"model_name": "lstm", "input_dim": 80, "proj_dim": 32, "lstm_dim": 32, "num_lstm_layers": 1}
    cfg.audio.mel_fmax = 8000.0
    model = setup_encoder_model(cfg)
    model.init_params(jax.random.PRNGKey(0))
    wav = np.random.default_rng(0).standard_normal(22050).astype(np.float32) * 0.3
    emb = model.compute_embedding(wav)
    assert emb.shape == (32,)
    assert np.isfinite(emb).all()
    # l2 normalized
    assert abs(np.linalg.norm(emb) - 1.0) < 0.2  # mean of normalized windows


def test_resnet_encoder():
    from tpu_tts.encoder.models import ResNetSpeakerEncoder

    enc = ResNetSpeakerEncoder(proj_dim=32, layers=(1, 1, 1, 1), num_filters=(4, 4, 8, 8))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 64))
    params = enc.init(jax.random.PRNGKey(1), x)
    d = enc.apply(params, x)
    assert d.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-4)


def test_encoder_losses():
    from tpu_tts.encoder.losses import angle_proto_loss, ge2e_loss

    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal((4, 5, 16)), dtype=jnp.float32)
    w, b = jnp.array(10.0), jnp.array(-5.0)
    l1 = ge2e_loss(d, w, b)
    l2 = angle_proto_loss(d, w, b)
    assert np.isfinite(float(l1)) and float(l1) > 0
    assert np.isfinite(float(l2)) and float(l2) > 0
    # identical embeddings per speaker -> lower loss than random
    ident = jnp.repeat(jnp.asarray(rng.standard_normal((4, 1, 16)), dtype=jnp.float32), 5, axis=1)
    assert float(ge2e_loss(ident, w, b)) < float(l1)
