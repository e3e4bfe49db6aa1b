import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_tts.configs.forward_tts_configs import FastPitchConfig, FastSpeechConfig, SpeedySpeechConfig
from tpu_tts.models.forward_tts import ForwardTTS


def _small(cfg_cls, **kw):
    cfg = cfg_cls()
    cfg.model_args.num_chars = 32
    cfg.model_args.hidden_channels = 64
    cfg.model_args.encoder_params = dict(cfg.model_args.encoder_params)
    cfg.model_args.decoder_params = dict(cfg.model_args.decoder_params)
    if cfg.model_args.encoder_type == "fftransformer":
        cfg.model_args.encoder_params.update({"num_layers": 2, "hidden_channels_ffn": 64})
        cfg.model_args.decoder_params.update({"num_layers": 2, "hidden_channels_ffn": 64})
    cfg.model_args.duration_predictor_hidden_channels = 32
    cfg.model_args.pitch_predictor_hidden_channels = 32
    cfg.model_args.energy_predictor_hidden_channels = 32
    for k, v in kw.items():
        setattr(cfg.model_args, k, v)
    return cfg


def _batch(B=2, T_en=9, T_de=24, with_pitch=False, with_energy=False):
    rng = np.random.default_rng(0)
    b = {
        "text_input": jnp.asarray(rng.integers(1, 32, (B, T_en)), dtype=jnp.int32),
        "text_lengths": jnp.array([T_en, T_en - 3], dtype=jnp.int32),
        "mel_input": jnp.asarray(rng.standard_normal((B, T_de, 80)), dtype=jnp.float32),
        "mel_lengths": jnp.array([T_de, T_de - 5], dtype=jnp.int32),
    }
    if with_pitch:
        b["pitch"] = jnp.asarray(np.abs(rng.standard_normal((B, T_de))) * 100, dtype=jnp.float32)
    if with_energy:
        b["energy"] = jnp.asarray(np.abs(rng.standard_normal((B, T_de))), dtype=jnp.float32)
    return b


def test_fast_pitch_loss_and_grads():
    import optax

    model = ForwardTTS(_small(FastPitchConfig))
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(with_pitch=True)
    (loss, logs), grads = jax.jit(jax.value_and_grad(
        lambda p: model.loss_fn(p, batch, jax.random.PRNGKey(1)), has_aux=True
    ))(params)
    assert np.isfinite(float(loss)), logs
    assert float(optax.global_norm(grads)) > 0
    assert {"loss_spec", "loss_dur", "loss_pitch", "loss_aligner"} <= set(logs)


def test_fast_speech_no_pitch():
    model = ForwardTTS(_small(FastSpeechConfig))
    params = model.init_params(jax.random.PRNGKey(0))
    loss, logs = model.loss_fn(params, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "loss_pitch" not in logs


def test_speedy_speech_conv_encoder():
    model = ForwardTTS(_small(SpeedySpeechConfig))
    params = model.init_params(jax.random.PRNGKey(0))
    loss, _ = model.loss_fn(params, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_forward_tts_inference():
    model = ForwardTTS(_small(FastPitchConfig))
    model.init_params(jax.random.PRNGKey(0))
    out = model.inference(np.arange(1, 10, dtype=np.int32))
    mel = np.asarray(out["model_outputs"])
    assert mel.shape[0] == 1 and mel.shape[2] == 80
    assert np.isfinite(mel).all()
    assert int(out["y_lengths"][0]) >= 9  # at least 1 frame per char


def test_forward_tts_external_durations():
    cfg = _small(FastSpeechConfig, use_aligner=False)
    model = ForwardTTS(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch()
    T_en = batch["text_input"].shape[1]
    durs = jnp.full((2, T_en), 2.0)
    batch["durations"] = durs
    loss, logs = model.loss_fn(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "loss_aligner" not in logs
