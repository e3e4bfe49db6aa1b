"""Gradual-training (reduction-factor) schedule for the Tacotron family
(ref TTS/utils/training.py:33 + base_tacotron on_epoch_start + tacotron2
`set_r`/`r_init` param-stable r switching)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tpu_tts.train.training import gradual_training_scheduler  # noqa: E402


class _Cfg:
    gradual_training = [[0, 6, 32], [100, 4, 32], [200, 2, 16]]


def test_scheduler_picks_latest_threshold():
    assert gradual_training_scheduler(0, _Cfg(), num_devices=1) == (6, 32)
    assert gradual_training_scheduler(150, _Cfg(), num_devices=1) == (4, 32)
    assert gradual_training_scheduler(250, _Cfg(), num_devices=1) == (2, 16)
    # device scaling advances the schedule proportionally
    assert gradual_training_scheduler(60, _Cfg(), num_devices=2) == (4, 32)


def _tiny_taco2(r=4):
    from tpu_tts.configs.tacotron2_config import Tacotron2Config
    from tpu_tts.models.tacotron2 import Tacotron2

    cfg = Tacotron2Config()
    cfg.r = r
    cfg.num_chars = 24
    cfg.audio.num_mels = 8
    cfg.batch_size = 2
    m = Tacotron2(cfg)
    m.init_params(jax.random.PRNGKey(0))
    return m


def _loss(m, T_de=8):
    rng = jax.random.PRNGKey(1)
    r = m.net.r
    batch = {
        "text_input": np.tile(np.arange(1, 7, dtype=np.int32), (2, 1)),
        "text_lengths": np.array([6, 4], dtype=np.int32),
        "mel_input": np.random.default_rng(0).standard_normal((2, T_de, 8)).astype(np.float32),
        "mel_lengths": np.array([T_de, T_de - 2], dtype=np.int32),
        "stop_targets": np.zeros((2, max(T_de // r, 1)), dtype=np.float32),
    }
    loss, _ = m.loss_fn(m.params, batch, rng, 0)
    return float(loss)


def test_set_r_reuses_params():
    m = _tiny_taco2(r=4)
    params_before = m.params
    l4 = _loss(m)
    assert np.isfinite(l4)
    m.set_r(2)
    assert m.net.r == 2 and m.net.r_init == 4
    # SAME param tree must drive the smaller-r graph
    m.params = params_before
    l2 = _loss(m)
    assert np.isfinite(l2)
    with pytest.raises(ValueError):
        m.set_r(8)


def test_on_epoch_start_applies_schedule():
    m = _tiny_taco2(r=6)
    m.config.gradual_training = [[0, 6, 2], [10, 2, 4]]

    class _Trainer:
        total_steps_done = 50

    changed = m.on_epoch_start(_Trainer())
    assert changed and m.net.r == 2 and m.config.batch_size == 4
    # no-op when already at schedule values
    assert m.on_epoch_start(_Trainer()) is False


def test_inference_after_set_r():
    m = _tiny_taco2(r=4)
    m.set_r(2)
    out = m.inference(np.arange(1, 6, dtype=np.int32))
    assert np.isfinite(np.asarray(out["model_outputs"])).all()
