"""End-to-end CLI train smoke for FastPitch (VERDICT r1 next-round #2; mirror
of the reference's tests/tts_tests2/test_fast_pitch_train.py): tiny config →
1 epoch via the CLI → continue → synthesize. Exercises the ForwardTTS family
with the aligner network + pitch predictor + F0 cache path."""

import glob
import os

import numpy as np
import pytest

from tests.conftest import get_tests_data_path
from tests.fixtures import ensure_ljspeech_fixture


def _make_config(fixture_path, output_path, tmp_path):
    from tpu_tts.config.shared_configs import BaseDatasetConfig
    from tpu_tts.configs.forward_tts_configs import FastPitchConfig

    cfg = FastPitchConfig(
        run_name="fast_pitch_smoke",
        batch_size=4,
        eval_batch_size=4,
        num_loader_workers=0,
        text_cleaner="english_cleaners",
        use_phonemes=False,
        run_eval=True,
        test_delay_epochs=-1,
        epochs=1,
        print_step=1,
        save_step=10000,
        f0_cache_path=str(tmp_path / "f0_cache"),
        output_path=output_path,
        datasets=[
            BaseDatasetConfig(
                formatter="ljspeech", meta_file_train="metadata.csv", path=fixture_path, dataset_name="fix"
            )
        ],
        eval_split_size=0.25,
        test_sentences=["hello world"],
        mixed_precision=False,
    )
    cfg.model_args.hidden_channels = 64
    cfg.model_args.encoder_params = dict(cfg.model_args.encoder_params)
    cfg.model_args.decoder_params = dict(cfg.model_args.decoder_params)
    if cfg.model_args.encoder_type == "fftransformer":
        cfg.model_args.encoder_params.update({"num_layers": 1, "hidden_channels_ffn": 64})
        cfg.model_args.decoder_params.update({"num_layers": 1, "hidden_channels_ffn": 64})
    cfg.model_args.duration_predictor_hidden_channels = 32
    cfg.model_args.pitch_predictor_hidden_channels = 32
    cfg.audio.do_trim_silence = False
    cfg.audio.mel_fmax = 8000.0
    return cfg


@pytest.mark.slow
def test_fast_pitch_train_continue_infer(tmp_path):
    fixture = ensure_ljspeech_fixture(get_tests_data_path())
    out_dir = str(tmp_path / "train_out")
    os.makedirs(out_dir, exist_ok=True)
    cfg = _make_config(fixture, out_dir, tmp_path)
    cfg_path = str(tmp_path / "config.json")
    cfg.save_json(cfg_path)

    from tpu_tts.bin.train_tts import main as train_main

    train_main(["--config_path", cfg_path])
    assert glob.glob(os.path.join(out_dir, "checkpoint_*")), "no checkpoint written"
    assert os.path.isdir(str(tmp_path / "f0_cache")), "F0 cache not materialized"

    train_main(["--continue_path", out_dir])

    from tpu_tts.config import load_config
    from tpu_tts.models import setup_model
    from tpu_tts.train.checkpoint import get_last_checkpoint, load_checkpoint

    config = load_config(os.path.join(out_dir, "config.json"))
    model = setup_model(config)
    last, _ = get_last_checkpoint(out_dir)
    state = load_checkpoint(last)
    model.params = state["model"]
    assert int(state["step"]) > 0
    ids = model.tokenizer.text_to_ids("hello world")
    out = model.inference(np.asarray(ids, dtype=np.int32))
    mel = np.asarray(out["model_outputs"])
    assert mel.shape[-1] == config.audio.num_mels
    assert np.isfinite(mel).all()
