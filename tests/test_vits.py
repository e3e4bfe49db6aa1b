import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_tts.configs.vits_config import VitsArgs, VitsAudioConfig, VitsConfig
from tpu_tts.models.vits import Vits


def _tiny_config(**args_kw):
    args = VitsArgs(
        num_chars=32,
        out_channels=129,  # fft 256 -> 129 bins
        spec_segment_size=8,
        hidden_channels=32,
        hidden_channels_ffn_text_encoder=32,
        num_heads_text_encoder=2,
        num_layers_text_encoder=1,
        num_layers_posterior_encoder=2,
        num_layers_flow=2,
        upsample_rates_decoder=[4, 4],
        upsample_kernel_sizes_decoder=[8, 8],
        upsample_initial_channel_decoder=16,
        resblock_kernel_sizes_decoder=[3],
        resblock_dilation_sizes_decoder=[[1, 3]],
        resblock_type_decoder="2",
        periods_multi_period_discriminator=[2, 3],
        **args_kw,
    )
    audio = VitsAudioConfig(
        fft_size=256, sample_rate=22050, win_length=256, hop_length=16, num_mels=40, mel_fmax=8000.0
    )
    return VitsConfig(model_args=args, audio=audio)


def _batch(B=2, T_en=9, T_spec=24, hop=16):
    rng = np.random.default_rng(0)
    return {
        "text_input": jnp.asarray(rng.integers(1, 32, (B, T_en)), dtype=jnp.int32),
        "text_lengths": jnp.array([T_en, T_en - 2], dtype=jnp.int32),
        "mel_lengths": jnp.array([T_spec, T_spec - 4], dtype=jnp.int32),
        "waveform": jnp.asarray(rng.standard_normal((B, T_spec * hop, 1)) * 0.2, dtype=jnp.float32),
    }


@pytest.fixture(scope="module")
def vits_model():
    model = Vits(_tiny_config())
    model.init_params(jax.random.PRNGKey(0))
    return model


def test_vits_both_losses_finite(vits_model):
    batch = _batch()
    for idx in (0, 1):
        loss, logs = vits_model.loss_fn(vits_model.params, batch, jax.random.PRNGKey(1), optimizer_idx=idx)
        assert np.isfinite(float(loss)), f"opt {idx}: {logs}"
    assert {"loss_mel", "loss_kl", "loss_feat", "loss_gen", "loss_duration"} <= set(logs)


def test_vits_grads_partitioned(vits_model):
    import optax

    batch = _batch()
    params = vits_model.params
    for idx in (0, 1):
        sub = vits_model.param_partition(params, idx)

        def loss_sub(s):
            merged = vits_model.param_merge(params, s, idx)
            return vits_model.loss_fn(merged, batch, jax.random.PRNGKey(2), optimizer_idx=idx)[0]

        # jit: the eager GAN backward dispatches thousands of ops on XLA:CPU
        grads = jax.jit(jax.grad(loss_sub))(sub)
        assert float(optax.global_norm(grads)) > 0, f"opt {idx} got zero grads"


def test_vits_inference(vits_model):
    out = vits_model.inference(np.arange(1, 10, dtype=np.int32))
    wav = np.asarray(out["model_outputs"])
    assert wav.ndim == 3 and wav.shape[-1] == 1
    assert wav.shape[1] % 16 == 0
    assert np.isfinite(wav).all()
    assert int(out["y_lengths"][0]) > 0


def test_vits_dp_variant():
    model = Vits(_tiny_config(use_sdp=False))
    model.init_params(jax.random.PRNGKey(0))
    batch = _batch()
    loss, logs = model.loss_fn(model.params, batch, jax.random.PRNGKey(1), optimizer_idx=1)
    assert np.isfinite(float(loss))
    out = model.inference(np.arange(1, 8, dtype=np.int32))
    assert np.isfinite(np.asarray(out["model_outputs"])).all()


def test_vits_multispeaker():
    model = Vits(_tiny_config(use_speaker_embedding=True, num_speakers=4, speaker_embedding_channels=16))
    model.init_params(jax.random.PRNGKey(0))
    batch = _batch()
    batch["speaker_ids"] = jnp.array([0, 3], dtype=jnp.int32)
    for idx in (0, 1):
        loss, _ = model.loss_fn(model.params, batch, jax.random.PRNGKey(1), optimizer_idx=idx)
        assert np.isfinite(float(loss))
    out = model.inference(
        np.arange(1, 8, dtype=np.int32), aux_input={"speaker_ids": jnp.array([1], dtype=jnp.int32)}
    )
    assert np.isfinite(np.asarray(out["model_outputs"])).all()


def test_vits_voice_conversion():
    model = Vits(_tiny_config(use_speaker_embedding=True, num_speakers=4, speaker_embedding_channels=16))
    model.init_params(jax.random.PRNGKey(0))
    wav = np.random.default_rng(0).standard_normal(16 * 50).astype(np.float32) * 0.2
    out = model.voice_conversion(wav, 0, 2)
    assert out.ndim == 1
    assert np.isfinite(out).all()


def test_vits_spline_flow_invertible():
    """SDP's spline must invert: forward(z) then reverse gives z back."""
    from tpu_tts.layers.vits import piecewise_rational_quadratic_transform as prqt

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-4, 4, (2, 6, 1)), dtype=jnp.float32)
    uw = jnp.asarray(rng.standard_normal((2, 6, 1, 10)), dtype=jnp.float32)
    uh = jnp.asarray(rng.standard_normal((2, 6, 1, 10)), dtype=jnp.float32)
    ud = jnp.asarray(rng.standard_normal((2, 6, 1, 9)), dtype=jnp.float32)
    y, ld = prqt(x, uw, uh, ud, inverse=False)
    x2, ld2 = prqt(y, uw, uh, ud, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=1e-4)


def test_vits_encoder_sample_rate():
    """encoder_sample_rate variant: posterior at half rate, z upsampled 2x
    before the decoder (ref vits.py:809)."""
    cfg = _tiny_config(encoder_sample_rate=11025, interpolate_z=True)
    model = Vits(cfg)
    assert model.net.interp_factor == 2
    model.init_params(jax.random.PRNGKey(0))
    batch = _batch()
    for idx in (0, 1):
        loss, logs = model.loss_fn(model.params, batch, jax.random.PRNGKey(1), optimizer_idx=idx)
        assert np.isfinite(float(loss)), logs
    out = model.inference(np.arange(1, 8, dtype=np.int32), bucket=16)
    wav = np.asarray(out["model_outputs"])
    y_len = int(np.asarray(out["y_lengths"])[0])
    # y_lengths are decoder frames (already x2); true audio fits the bucket
    assert y_len * 16 <= wav.shape[1]  # decoder hop = prod(upsample_rates) = 16
    assert np.isfinite(wav).all()


def test_vits_speaker_consistency_loss():
    """SCL: cosine loss between speaker-encoder embeddings of GT and
    generated segments (ref vits.py:1047)."""
    cfg = _tiny_config(use_speaker_encoder_as_loss=True)
    model = Vits(cfg)
    model.init_params(jax.random.PRNGKey(0))

    # attach a tiny LSTM speaker encoder through a stub manager
    from tpu_tts.encoder.configs import SpeakerEncoderConfig
    from tpu_tts.encoder.models import setup_encoder_model

    ecfg = SpeakerEncoderConfig()
    ecfg.model_params = {"model_name": "lstm", "input_dim": 20, "proj_dim": 16,
                         "lstm_dim": 16, "num_lstm_layers": 1}
    ecfg.audio = {"fft_size": 128, "num_mels": 20, "sample_rate": 22050,
                  "hop_length": 64, "win_length": 128}
    enc = setup_encoder_model(ecfg)
    enc.params = enc.net.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 20)))["params"]

    class _Mgr:
        encoder = enc

    model.speaker_manager = _Mgr()
    loss, logs = model.loss_fn(model.params, _batch(), jax.random.PRNGKey(1), optimizer_idx=1)
    assert "loss_spk_encoder" in logs
    assert np.isfinite(float(loss))
    assert -1.0 <= float(logs["loss_spk_encoder"]) <= 1.0


def test_vits_multilingual():
    """Language embedding widens the text-encoder transformer to hidden+lang
    (ref networks.py:62-64) and conditions the duration predictor."""
    model = Vits(
        _tiny_config(
            use_speaker_embedding=True,
            num_speakers=4,
            speaker_embedding_channels=16,
            use_language_embedding=True,
            num_languages=3,
            embedded_language_dim=4,
        )
    )
    model.init_params(jax.random.PRNGKey(0))
    batch = _batch()
    batch["speaker_ids"] = jnp.array([0, 3], dtype=jnp.int32)
    batch["language_ids"] = jnp.array([0, 2], dtype=jnp.int32)
    for idx in (0, 1):
        loss, _ = model.loss_fn(model.params, batch, jax.random.PRNGKey(1), optimizer_idx=idx)
        assert np.isfinite(float(loss))
    out = model.inference(
        np.arange(1, 8, dtype=np.int32),
        aux_input={
            "speaker_ids": jnp.array([1], dtype=jnp.int32),
            "language_ids": jnp.array([2], dtype=jnp.int32),
        },
    )
    assert np.isfinite(np.asarray(out["model_outputs"])).all()
    # different language id → different audio (embedding actually used)
    out2 = model.inference(
        np.arange(1, 8, dtype=np.int32),
        aux_input={
            "speaker_ids": jnp.array([1], dtype=jnp.int32),
            "language_ids": jnp.array([0], dtype=jnp.int32),
        },
    )
    a, b = np.asarray(out["model_outputs"]), np.asarray(out2["model_outputs"])
    n = min(a.size, b.size)
    assert not np.allclose(a.ravel()[:n], b.ravel()[:n])
