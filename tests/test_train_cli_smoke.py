"""Train-CLI smoke tests for the vocoder GAN and the speaker encoder
(ref tests/vocoder_tests/test_hifigan_train.py, aux_tests/
test_speaker_encoder_train.py)."""

import csv
import glob
import os

import numpy as np
import pytest

from tests.conftest import get_tests_data_path
from tests.fixtures import ensure_ljspeech_fixture


@pytest.mark.slow
def test_hifigan_vocoder_train_continue_infer(tmp_path):
    from tpu_tts.vocoder.configs.gan_configs import HifiganConfig

    fixture = ensure_ljspeech_fixture(get_tests_data_path())
    wav_dir = os.path.join(fixture, "wavs")
    out_dir = str(tmp_path / "voc_out")
    cfg = HifiganConfig(
        batch_size=2,
        eval_batch_size=2,
        epochs=1,
        seq_len=2048,
        eval_split_size=2,
        data_path=wav_dir,
        output_path=out_dir,
        print_step=1,
        save_step=10000,
        run_eval=True,
        generator_model_params={
            "upsample_factors": [8, 8, 2, 2],
            "upsample_kernel_sizes": [16, 16, 4, 4],
            "upsample_initial_channel": 16,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
        },
    )
    cfg.audio.do_trim_silence = False
    cfg_path = str(tmp_path / "voc_config.json")
    cfg.save_json(cfg_path)

    from tpu_tts.bin.train_vocoder import main as train_main

    train_main(["--config_path", cfg_path])
    ckpts = glob.glob(os.path.join(out_dir, "checkpoint_*"))
    assert ckpts, "no vocoder checkpoint written"

    # continue + load checkpoint and vocode a mel
    train_main(["--continue_path", out_dir])
    from tpu_tts.config import load_config
    from tpu_tts.train.checkpoint import get_last_checkpoint, load_checkpoint
    from tpu_tts.vocoder.models import setup_model

    config = load_config(os.path.join(out_dir, "config.json"))
    model = setup_model(config)
    last, _ = get_last_checkpoint(out_dir)
    state = load_checkpoint(last)
    model.params = state["model"]
    mel = np.zeros((1, 8, config.audio.num_mels), dtype=np.float32)
    wav = model.inference(mel)
    assert np.isfinite(np.asarray(wav)).all()


@pytest.mark.slow
def test_speaker_encoder_train(tmp_path):
    from tpu_tts.config.shared_configs import BaseDatasetConfig
    from tpu_tts.encoder.configs import SpeakerEncoderConfig

    fixture = ensure_ljspeech_fixture(get_tests_data_path())
    # two-speaker view over the single-speaker fixture via the coqui formatter
    rows = []
    with open(os.path.join(fixture, "metadata.csv")) as f:
        for i, line in enumerate(f):
            parts = line.strip().split("|")
            if len(parts) < 2:
                continue
            rows.append((os.path.join("wavs", parts[0] + ".wav"), parts[1], f"spk{i % 2}"))
    meta = os.path.join(fixture, "metadata_2spk.csv")
    with open(meta, "w", newline="") as f:
        w = csv.writer(f, delimiter="|")
        w.writerow(["audio_file", "text", "speaker_name"])
        w.writerows(rows)

    out_dir = str(tmp_path / "enc_out")
    cfg = SpeakerEncoderConfig(
        output_path=out_dir,
        epochs=1,
        num_classes_in_batch=2,
        num_utter_per_class=2,
        voice_len=1.0,
        print_step=1,
        save_step=100,
        model_params={
            "model_name": "lstm",
            "input_dim": 80,
            "proj_dim": 32,
            "lstm_dim": 32,
            "num_lstm_layers": 1,
            "use_lstm_with_projection": True,
        },
        datasets=[
            BaseDatasetConfig(formatter="coqui", meta_file_train="metadata_2spk.csv", path=fixture, dataset_name="fix")
        ],
    )
    cfg.audio.do_trim_silence = False
    cfg_path = str(tmp_path / "enc_config.json")
    cfg.save_json(cfg_path)

    from tpu_tts.bin.train_encoder import main as train_main

    train_main(["--config_path", cfg_path, "--max_steps", "2"])
    ckpts = glob.glob(os.path.join(out_dir, "checkpoint_*"))
    assert ckpts, "no encoder checkpoint written"
