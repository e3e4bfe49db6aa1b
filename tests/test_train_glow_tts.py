"""End-to-end train smoke: Glow-TTS on the synthetic LJSpeech fixture via the
CLI entry, then continue from checkpoint, then synthesize from it — the
reference's dominant integration pattern (tests/tts_tests/test_glow_tts_train.py)."""

import glob
import json
import os
import sys

import numpy as np
import pytest

from tests.conftest import get_tests_data_path, get_tests_output_path
from tests.fixtures import ensure_ljspeech_fixture


def _make_config(fixture_path, output_path):
    from tpu_tts.configs.glow_tts_config import GlowTTSConfig
    from tpu_tts.config.shared_configs import BaseDatasetConfig

    cfg = GlowTTSConfig(
        run_name="smoke",
        batch_size=4,
        eval_batch_size=4,
        num_loader_workers=0,
        text_cleaner="english_cleaners",
        use_phonemes=True,
        phoneme_language="en-us",
        run_eval=True,
        test_delay_epochs=-1,
        epochs=1,
        print_step=1,
        save_step=10000,
        print_eval=True,
        output_path=output_path,
        datasets=[
            BaseDatasetConfig(
                formatter="ljspeech", meta_file_train="metadata.csv", path=fixture_path, dataset_name="fix"
            )
        ],
        eval_split_size=0.25,
        # tiny model
        hidden_channels_enc=32,
        hidden_channels_dec=32,
        hidden_channels_dp=16,
        num_flow_blocks_dec=2,
        num_block_layers=1,
        encoder_params={
            "kernel_size": 3,
            "dropout_p": 0.1,
            "num_layers": 1,
            "num_heads": 2,
            "hidden_channels_ffn": 32,
        },
        data_dep_init_steps=0,
        test_sentences=["hello world"],
        mixed_precision=False,
    )
    cfg.audio.do_trim_silence = False
    cfg.audio.mel_fmax = 8000.0
    return cfg


@pytest.mark.slow
def test_glow_tts_train_continue_infer(tmp_path):
    fixture = ensure_ljspeech_fixture(get_tests_data_path())
    out_dir = str(tmp_path / "train_out")
    os.makedirs(out_dir, exist_ok=True)
    cfg = _make_config(fixture, out_dir)
    cfg_path = str(tmp_path / "config.json")
    cfg.save_json(cfg_path)

    from tpu_tts.bin.train_tts import main as train_main

    # 1 epoch train
    train_main(["--config_path", cfg_path])
    ckpts = glob.glob(os.path.join(out_dir, "checkpoint_*"))
    assert ckpts, "no checkpoint written"
    assert os.path.exists(os.path.join(out_dir, "config.json"))

    # continue training from the run dir
    train_main(["--continue_path", out_dir])

    # load checkpoint and synthesize
    from tpu_tts.config import load_config
    from tpu_tts.models import setup_model
    from tpu_tts.train.checkpoint import get_last_checkpoint, load_checkpoint

    config = load_config(os.path.join(out_dir, "config.json"))
    model = setup_model(config)
    last, best = get_last_checkpoint(out_dir)
    state = load_checkpoint(last)
    model.params = state["model"]
    assert int(state["step"]) > 0
    ids = model.tokenizer.text_to_ids("hello world")
    out = model.inference(np.asarray(ids, dtype=np.int32))
    mel = np.asarray(out["model_outputs"])
    assert np.isfinite(mel).all()
