"""End-to-end train smoke: DelightfulTTS (GAN, 2-opt) on the LJSpeech fixture
via the CLI entry, then synthesize from the checkpoint (reference pattern
tests/tts_tests2/test_delightful_tts_train.py)."""

import glob
import os

import numpy as np
import pytest

from tests.conftest import get_tests_data_path
from tests.fixtures import ensure_ljspeech_fixture


@pytest.mark.slow
def test_delightful_tts_train_and_infer(tmp_path):
    from tpu_tts.config.shared_configs import BaseDatasetConfig
    from tpu_tts.configs.delightful_tts_config import DelightfulTTSConfig, VocoderConfig
    from tpu_tts.models.delightful_tts import DelightfulTtsArgs

    fixture = ensure_ljspeech_fixture(get_tests_data_path())
    out_dir = str(tmp_path / "train_out")
    os.makedirs(out_dir, exist_ok=True)

    args = DelightfulTtsArgs(
        n_hidden_conformer_encoder=32,
        n_layers_conformer_encoder=1,
        n_heads_conformer_encoder=2,
        n_hidden_conformer_decoder=32,
        n_layers_conformer_decoder=1,
        n_heads_conformer_decoder=2,
        bottleneck_size_u_reference_encoder=32,
        ref_enc_filters_reference_encoder=[4, 4, 8, 8, 16, 16],
        n_hidden_variance_adaptor=32,
        spec_segment_size=8,
    )
    voc = VocoderConfig(
        upsample_rates_decoder=[8, 8, 4],
        upsample_kernel_sizes_decoder=[16, 16, 8],
        upsample_initial_channel_decoder=16,
        resblock_kernel_sizes_decoder=[3],
        resblock_dilation_sizes_decoder=[[1, 3]],
    )
    cfg = DelightfulTTSConfig(
        run_name="smoke",
        model_args=args,
        vocoder=voc,
        batch_size=2,
        eval_batch_size=2,
        num_loader_workers=0,
        text_cleaner="english_cleaners",
        use_phonemes=False,
        compute_f0=True,
        f0_cache_path=str(tmp_path / "f0_cache"),
        run_eval=True,
        test_delay_epochs=-1,
        epochs=1,
        print_step=1,
        save_step=10000,
        print_eval=True,
        output_path=out_dir,
        datasets=[
            BaseDatasetConfig(
                formatter="ljspeech", meta_file_train="metadata.csv", path=fixture, dataset_name="fix"
            )
        ],
        eval_split_size=0.25,
        binary_align_loss_alpha=0.0,
        use_attn_priors=False,
        mixed_precision=False,
    )
    cfg.audio.do_trim_silence = False
    cfg.audio.mel_fmax = 8000.0
    cfg_path = str(tmp_path / "config.json")
    cfg.save_json(cfg_path)

    from tpu_tts.bin.train_tts import main as train_main

    train_main(["--config_path", cfg_path])
    assert glob.glob(os.path.join(out_dir, "checkpoint_*")), "no checkpoint written"

    from tpu_tts.config import load_config
    from tpu_tts.models import setup_model
    from tpu_tts.train.checkpoint import get_last_checkpoint, load_checkpoint

    config = load_config(os.path.join(out_dir, "config.json"))
    model = setup_model(config)
    last, _ = get_last_checkpoint(out_dir)
    state = load_checkpoint(last)
    model.params = state["model"]
    ids = model.tokenizer.text_to_ids("hello world")
    out = model.inference(np.asarray(ids, dtype=np.int32))
    wav = np.asarray(out["model_outputs"])
    assert np.isfinite(wav).all() and wav.size > 0
