"""Speaker-encoder toolchain smoke: train_encoder → compute_embeddings →
eval_encoder, on the 2-speaker LJSpeech fixture (mirror of the reference's
bin/train_encoder.py + bin/compute_embeddings.py + bin/eval_encoder.py flow
that produces `speakers.pth` for YourTTS/VITS d-vector training)."""

import glob
import os

import numpy as np
import pytest

from tests.conftest import get_tests_data_path
from tests.fixtures import ensure_ljspeech_fixture


@pytest.mark.slow
def test_encoder_train_embed_eval(tmp_path):
    from tpu_tts.config.shared_configs import BaseDatasetConfig
    from tpu_tts.encoder.configs import SpeakerEncoderConfig

    fixture = ensure_ljspeech_fixture(get_tests_data_path())
    out_dir = str(tmp_path / "enc_out")
    cfg = SpeakerEncoderConfig(
        output_path=out_dir,
        run_name="enc_smoke",
        epochs=1,
        num_classes_in_batch=2,
        num_utter_per_class=2,
        voice_len=0.8,
        save_step=1,
        print_step=1,
        lr=1e-3,
        datasets=[
            BaseDatasetConfig(
                formatter="ljspeech_test",
                meta_file_train="metadata.csv",
                path=fixture,
                dataset_name="fix",
            )
        ],
    )
    cfg.model_params.update({"proj_dim": 16, "lstm_dim": 32, "num_lstm_layers": 1})
    cfg.audio.mel_fmax = 8000.0
    cfg_path = str(tmp_path / "enc_config.json")
    cfg.save_json(cfg_path)

    from tpu_tts.bin.train_encoder import main as train_main

    train_main(["--config_path", cfg_path, "--max_steps", "2"])
    ckpts = sorted(glob.glob(os.path.join(out_dir, "**", "checkpoint_*"), recursive=True)) or sorted(
        glob.glob(os.path.join(out_dir, "checkpoint_*"))
    )
    assert ckpts, "train_encoder wrote no checkpoint"
    ckpt = ckpts[-1]
    run_cfg = os.path.join(os.path.dirname(ckpt), "config.json")
    if not os.path.exists(run_cfg):
        run_cfg = cfg_path

    # compute_embeddings → speakers.json consumed by d_vector_file configs
    from tpu_tts.bin.compute_embeddings import compute_embeddings

    emb_path = str(tmp_path / "speakers.json")
    compute_embeddings(
        model_path=ckpt,
        config_path=run_cfg,
        output_path=emb_path,
        config_dataset_path=cfg_path,
        no_eval=True,
    )
    assert os.path.exists(emb_path)
    import json

    embs = json.load(open(emb_path))
    assert len(embs) > 0
    first = next(iter(embs.values()))
    assert len(first["embedding"]) == 16
    assert np.isfinite(np.asarray(first["embedding"])).all()
    assert all(v["name"].startswith("ljspeech-") for v in embs.values())
    assert len({v["name"] for v in embs.values()}) >= 2

    # eval_encoder runs end-to-end and prints class separation stats
    from tpu_tts.bin.eval_encoder import main as eval_main

    eval_main([ckpt, run_cfg, cfg_path])
