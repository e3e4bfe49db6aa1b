"""Trainer-driven smoke tests for the non-GAN vocoders (WaveRNN, WaveGrad) —
the reference trains both through the Trainer (ref vocoder_tests/
test_wavernn_train.py, test_wavegrad_train.py)."""

import glob
import os

import pytest

from tests.conftest import get_tests_data_path
from tests.fixtures import ensure_ljspeech_fixture


@pytest.mark.slow
def test_wavernn_trainer_smoke(tmp_path):
    from tpu_tts.vocoder.configs.wavegrad_config import WavernnConfig

    fixture = ensure_ljspeech_fixture(get_tests_data_path())
    out_dir = str(tmp_path / "wavernn_out")
    cfg = WavernnConfig(
        batch_size=2,
        eval_batch_size=2,
        epochs=1,
        seq_len=256,
        eval_split_size=2,
        data_path=os.path.join(fixture, "wavs"),
        output_path=out_dir,
        print_step=1,
        save_step=10000,
        run_eval=False,
        model_args={
            "rnn_dims": 16,
            "fc_dims": 16,
            "compute_dims": 16,
            "res_out_dims": 16,
            "num_res_blocks": 2,
            "mode": 9,
            "pad": 2,
        },
    )
    cfg.audio.do_trim_silence = False
    cfg_path = str(tmp_path / "config.json")
    cfg.save_json(cfg_path)

    from tpu_tts.bin.train_vocoder import main as train_main

    train_main(["--config_path", cfg_path])
    ckpts = glob.glob(os.path.join(out_dir, "checkpoint_*"))
    assert ckpts, "no wavernn checkpoint written"
    # the BatchNorm running stats must have been threaded + persisted
    from tpu_tts.train.checkpoint import load_checkpoint

    state = load_checkpoint(ckpts[0])
    assert "model_state" in state, "wavernn batch_stats missing from checkpoint"
    import numpy as np

    stats = state["model_state"]["batch_stats"]
    leaves = [v for v in _leaves(stats)]
    assert leaves and any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


@pytest.mark.slow
def test_wavegrad_trainer_smoke(tmp_path):
    from tpu_tts.vocoder.configs.wavegrad_config import WavegradConfig

    fixture = ensure_ljspeech_fixture(get_tests_data_path())
    out_dir = str(tmp_path / "wavegrad_out")
    cfg = WavegradConfig(
        batch_size=2,
        eval_batch_size=2,
        epochs=1,
        seq_len=1024,
        eval_split_size=2,
        data_path=os.path.join(fixture, "wavs"),
        output_path=out_dir,
        print_step=1,
        save_step=10000,
        run_eval=False,
        model_args={
            "in_channels": 80,
            "out_channels": 1,
            "upsample_factors": [4, 4, 4, 2, 2],
            "upsample_dilations": [[1, 2, 1, 2], [1, 2, 1, 2], [1, 2, 4, 8], [1, 2, 4, 8], [1, 2, 4, 8]],
        },
    )
    cfg.audio.do_trim_silence = False
    cfg_path = str(tmp_path / "config.json")
    cfg.save_json(cfg_path)

    from tpu_tts.bin.train_vocoder import main as train_main

    train_main(["--config_path", cfg_path])
    ckpts = glob.glob(os.path.join(out_dir, "checkpoint_*"))
    assert ckpts, "no wavegrad checkpoint written"
