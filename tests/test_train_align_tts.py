"""End-to-end train smoke: AlignTTS on the synthetic LJSpeech fixture via the
CLI entry, then continue from checkpoint, then synthesize from it — mirror of
the reference's tests/tts_tests2/test_align_tts_train.py integration pattern.
Phase boundaries are compressed so one epoch walks all 4 training phases
(ref AlignTTSLoss phase schedule, losses.py:564)."""

import glob
import os

import numpy as np
import pytest

from tests.conftest import get_tests_data_path
from tests.fixtures import ensure_ljspeech_fixture


def _make_config(fixture_path, output_path):
    from tpu_tts.config.shared_configs import BaseDatasetConfig
    from tpu_tts.configs import AlignTTSConfig

    cfg = AlignTTSConfig(
        run_name="smoke",
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
        output_path=output_path,
        datasets=[
            BaseDatasetConfig(
                formatter="ljspeech", meta_file_train="metadata.csv", path=fixture_path, dataset_name="fix"
            )
        ],
        eval_split_size=0.25,
        phase_start_steps=[0, 1, 2, 3, 4],
        test_sentences=["hello world"],
        mixed_precision=False,
    )
    cfg.model_args.hidden_channels = 32
    cfg.model_args.hidden_channels_dp = 16
    cfg.model_args.encoder_params = {"hidden_channels_ffn": 32, "num_heads": 2, "num_layers": 1, "dropout_p": 0.1}
    cfg.model_args.decoder_params = {"hidden_channels_ffn": 32, "num_heads": 2, "num_layers": 1, "dropout_p": 0.1}
    cfg.audio.do_trim_silence = False
    cfg.audio.mel_fmax = 8000.0
    return cfg


@pytest.mark.slow
def test_align_tts_train_continue_infer(tmp_path):
    fixture = ensure_ljspeech_fixture(get_tests_data_path())
    out_dir = str(tmp_path / "train_out")
    os.makedirs(out_dir, exist_ok=True)
    cfg = _make_config(fixture, out_dir)
    cfg_path = str(tmp_path / "config.json")
    cfg.save_json(cfg_path)

    from tpu_tts.bin.train_tts import main as train_main

    train_main(["--config_path", cfg_path])
    assert glob.glob(os.path.join(out_dir, "checkpoint_*")), "no checkpoint written"

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
    assert np.isfinite(mel).all()

    # teacher-forced spectrogram dump for vocoder fine-tuning
    # (ref bin/extract_tts_spectrograms.py)
    from tpu_tts.bin.extract_tts_spectrograms import main as extract_main

    spec_dir = str(tmp_path / "specs")
    extract_main(["--config_path", os.path.join(out_dir, "config.json"),
                  "--checkpoint_path", last, "--output_path", spec_dir, "--debug"])
    meta = open(os.path.join(spec_dir, "metadata.txt")).read().strip().splitlines()
    assert meta, "no spectrograms dumped"
    wav_path, npy_path = meta[0].split("|")
    feats = np.load(npy_path)
    assert feats.shape[0] == 80 and np.isfinite(feats).all()

    # attention-mask dump (teacher durations, ref bin/compute_attention_masks.py)
    from tpu_tts.bin.compute_attention_masks import main as attn_main

    attn_dir = str(tmp_path / "attn")
    attn_main(["--model_path", last, "--config_path", os.path.join(out_dir, "config.json"),
               "--output_path", attn_dir])
    attn_meta = open(os.path.join(attn_dir, "metadata_attn_mask.txt")).read().strip().splitlines()
    assert attn_meta, "no attention masks dumped"
    align = np.load(attn_meta[0].split("|")[1])
    assert align.ndim == 2 and np.isfinite(align).all()
