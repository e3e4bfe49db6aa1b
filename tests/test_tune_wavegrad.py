"""Smoke test for the WaveGrad noise-schedule search tool (mirror of the
reference's TTS/bin/tune_wavegrad.py usage on an untrained tiny model)."""

import os

import jax
import numpy as np
import pytest

from tests.conftest import get_tests_data_path
from tests.fixtures import ensure_ljspeech_fixture


@pytest.mark.slow
def test_tune_wavegrad_schedule_search(tmp_path):
    from tpu_tts.train.checkpoint import save_checkpoint
    from tpu_tts.vocoder.configs import WavegradConfig
    from tpu_tts.vocoder.models.wavegrad import Wavegrad, WavegradArgs

    fixture = ensure_ljspeech_fixture(get_tests_data_path())
    cfg = WavegradConfig(
        model_args=WavegradArgs(
            y_conv_channels=4,
            x_conv_channels=8,
            dblock_out_channels=[4, 4, 8, 8],
            ublock_out_channels=[8, 8, 8, 4, 4],
            upsample_factors=[4, 4, 4, 2, 2],
            upsample_dilations=[[1, 2, 1, 2]] * 5,
        ).to_dict(),
        output_path=str(tmp_path),
    )
    cfg.audio.mel_fmax = 8000.0
    cfg_path = str(tmp_path / "config.json")
    cfg.save_json(cfg_path)

    model = Wavegrad(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    out_dir = str(tmp_path / "run")
    os.makedirs(out_dir, exist_ok=True)
    save_checkpoint({"model": jax.device_get(params), "step": 0}, out_dir, 0, cfg)
    ckpt = os.path.join(out_dir, "checkpoint_0")
    assert os.path.exists(ckpt)

    from tpu_tts.bin.tune_wavegrad import main as tune_main

    sched_path = str(tmp_path / "best_noise_schedule.npy")
    tune_main(
        [
            "--model_path", ckpt,
            "--config_path", cfg_path,
            "--data_path", os.path.join(fixture, "wavs"),
            "--num_iter", "3",
            "--search_depth", "2",
            "--num_samples", "1",
            "--output_path", sched_path,
        ]
    )
    sched = np.load(sched_path, allow_pickle=True).item()
    beta = np.asarray(sched["beta"])
    assert beta.shape == (3,)
    assert np.all(beta > 0) and np.all(np.diff(beta) > 0)
