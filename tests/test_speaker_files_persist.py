"""Trainer init persists speakers.pth / language_ids.json and updates the
config (ref tts/models/base_tts.py:420-441 on_init_start)."""

import os

import numpy as np

from tests.conftest import get_tests_data_path
from tests.fixtures import ensure_ljspeech_fixture


def test_trainer_init_saves_speaker_and_language_files(tmp_path):
    from tpu_tts.config.shared_configs import BaseDatasetConfig
    from tpu_tts.configs.vits_config import VitsConfig
    from tpu_tts.data import load_tts_samples
    from tpu_tts.models.vits import Vits
    from tpu_tts.train import Trainer, TrainerArgs

    fixture = ensure_ljspeech_fixture(get_tests_data_path())
    out_dir = str(tmp_path / "out")
    cfg = VitsConfig(
        batch_size=2, eval_batch_size=2, epochs=0, output_path=out_dir,
        text_cleaner="english_cleaners", use_phonemes=False,
        use_speaker_embedding=True,
        datasets=[BaseDatasetConfig(
            formatter="coqui", meta_file_train="metadata_2spk.csv", path=fixture, dataset_name="fix",
            language="en",
        )],
    )
    a = cfg.model_args
    a.use_speaker_embedding = True
    a.use_language_embedding = True
    a.embedded_language_dim = 2
    a.hidden_channels = 32
    a.hidden_channels_ffn_text_encoder = 64
    a.num_layers_text_encoder = 1
    a.num_heads_text_encoder = 2
    a.num_layers_flow = 1
    a.upsample_initial_channel_decoder = 16
    cfg.audio.do_trim_silence = False
    os.makedirs(out_dir, exist_ok=True)

    train, ev = load_tts_samples(cfg.datasets, eval_split=True, eval_split_size=0.25)
    model = Vits.init_from_config(cfg, samples=train + ev)
    assert model.speaker_manager.num_speakers == 2
    Trainer(TrainerArgs(), cfg, out_dir, model=model, train_samples=train, eval_samples=ev)

    spk_path = os.path.join(out_dir, "speakers.pth")
    assert os.path.isfile(spk_path)
    assert cfg.model_args.speakers_file == spk_path
    lang_path = os.path.join(out_dir, "language_ids.json")
    assert os.path.isfile(lang_path)

    import json
    with open(lang_path) as f:
        assert "en" in json.load(f)
