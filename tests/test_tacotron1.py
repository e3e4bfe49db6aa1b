"""Tacotron v1 tests (ref tests/tts_tests/test_tacotron_model.py)."""

import jax
import numpy as np
import pytest

from tpu_tts.configs.tacotron2_config import TacotronConfig


def _cfg(**kw):
    cfg = TacotronConfig(r=5, **kw)
    cfg.audio.num_mels = 20
    return cfg


def _model(**kw):
    from tpu_tts.models.tacotron import Tacotron

    model = Tacotron(_cfg(**kw))
    net = model.net
    model.net = type(net)(
        num_chars=24, decoder_output_dim=20, out_channels=33, r=5,
        max_decoder_steps=20,
        use_gst=net.use_gst, gst=net.gst,
        use_capacitron=net.use_capacitron, capacitron=(("capacitron_VAE_embedding_dim", 16),)
        if net.use_capacitron else None,
    )
    return model


def _batch(B=2, T_en=8, T_de=10):
    rng = np.random.default_rng(0)
    stop = np.zeros((B, T_de // 5 + 1), np.float32)
    return {
        "text_input": rng.integers(1, 24, (B, T_en)).astype(np.int32),
        "text_lengths": np.array([T_en, T_en - 2], np.int32),
        "mel_input": rng.standard_normal((B, T_de, 20)).astype(np.float32),
        "mel_lengths": np.array([T_de, T_de - 3], np.int32),
        "linear_input": rng.standard_normal((B, T_de, 33)).astype(np.float32),
        "stop_targets": stop,
    }


@pytest.mark.slow
def test_tacotron1_train_and_infer():
    model = _model()
    params = model.init_params(jax.random.PRNGKey(0))
    loss, logs = model.loss_fn(params, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    out = model.inference(np.arange(1, 8, dtype=np.int32))
    assert np.isfinite(np.asarray(out["model_outputs"])).all()


def test_tacotron1_capacitron():
    from tpu_tts.configs.tacotron2_config import CapacitronVAEConfig

    model = _model(use_capacitron_vae=True, capacitron_vae=CapacitronVAEConfig())
    params = model.init_params(jax.random.PRNGKey(0))
    assert "capacitron_vae_layer" in params
    # ONE jitted value_and_grad compile (an eager loss_fn + a separate grad
    # trace each paid the full AR-scan compile; this test dominated the suite)
    (loss, logs), g = jax.jit(
        jax.value_and_grad(
            lambda p: model.loss_fn(p, _batch(), jax.random.PRNGKey(1)), has_aux=True
        )
    )(params)
    assert np.isfinite(float(loss))
    assert abs(float(logs["capacitron_beta"]) - 1.0) < 1e-4
    assert float(np.abs(np.asarray(g["capacitron_vae_layer"]["beta"])).sum()) > 0
    opt = model.get_optimizer()
    state = opt.init(params)
    upd, _ = opt.update(g, state, params)
    assert np.isfinite(np.asarray(upd["capacitron_vae_layer"]["beta"])).all()


def test_tacotron1_ddc():
    """DDC coarse decoder (ref base_tacotron.py:207) produces a matching-length
    coarse output and a consistency loss term."""
    model = _model(double_decoder_consistency=True, ddc_r=5)
    model.net = model.net.clone(use_ddc=True, ddc_r=5)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch()
    loss, logs = model.loss_fn(params, batch, jax.random.PRNGKey(1))
    assert "decoder_coarse_loss" in logs
    assert np.isfinite(float(loss))
