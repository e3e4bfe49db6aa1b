"""WaveRNN/WaveGrad datasets + preprocess (ref vocoder/datasets/*)."""

import os

import jax
import numpy as np
import pytest

from tests.conftest import get_tests_data_path
from tests.fixtures import ensure_ljspeech_fixture


def _ap_and_wavs():
    from tpu_tts.audio.processor import AudioProcessor
    from tpu_tts.config.shared_configs import BaseAudioConfig
    from tpu_tts.vocoder.datasets import find_wav_files

    fixture = ensure_ljspeech_fixture(get_tests_data_path())
    wavs = find_wav_files(fixture)
    assert wavs
    ap = AudioProcessor(**BaseAudioConfig(do_trim_silence=False).to_dict())
    return ap, wavs


def test_wavernn_dataset_and_loss():
    from tpu_tts.vocoder.configs.wavegrad_config import WavernnConfig
    from tpu_tts.vocoder.datasets.wavernn_dataset import WaveRNNDataLoader, WaveRNNDataset
    from tpu_tts.vocoder.models.wavernn import Wavernn

    ap, wavs = _ap_and_wavs()
    cfg = WavernnConfig(
        seq_len=ap.hop_length * 4,
        batch_size=2,
        model_args={"rnn_dims": 16, "fc_dims": 16, "compute_dims": 16, "res_out_dims": 16, "num_res_blocks": 1, "mode": 9, "mulaw": True, "pad": 2, "feat_dims": ap.num_mels, "upsample_factors": [4, 8, 8]},
        mode=9,
    )
    model = Wavernn(cfg)
    loader = model.get_data_loader(cfg, None, False, wavs, False, 1)
    batch = next(iter(loader))
    mel_win = cfg.seq_len // ap.hop_length + 2 * model.args.pad
    assert batch["waveform_coarse"].shape == (2, cfg.seq_len)
    assert batch["waveform_target"].shape == (2, cfg.seq_len)
    assert batch["mel_input"].shape == (2, mel_win, ap.num_mels)
    # encoded signal is in [-1, 1]
    assert np.abs(batch["waveform_coarse"]).max() <= 1.0
    params = model.init_params(jax.random.PRNGKey(0))
    loss, logs = model.loss_fn(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_wavegrad_dataset_and_loss():
    from tpu_tts.vocoder.configs.wavegrad_config import WavegradConfig
    from tpu_tts.vocoder.models.wavegrad import Wavegrad

    ap, wavs = _ap_and_wavs()
    cfg = WavegradConfig(
        seq_len=ap.hop_length * 8,
        batch_size=2,
        model_args={"in_channels": ap.num_mels, "upsample_factors": [4, 4, 4, 4], "upsample_dilations": [[1, 2, 1, 2]] * 4, "y_conv_channels": 32, "dblock_out_channels": [64, 64, 128], "ublock_out_channels": [128, 64, 64, 32], "x_conv_channels": 64},
    )
    model = Wavegrad(cfg)
    loader = model.get_data_loader(cfg, None, False, wavs, False, 1)
    batch = next(iter(loader))
    assert batch["waveform"].shape == (2, cfg.seq_len, 1)
    assert batch["mel_input"].shape[1] == cfg.seq_len // ap.hop_length
    params = model.init_params(jax.random.PRNGKey(0))
    loss, _ = model.loss_fn(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_wavegrad_collate_full_clips():
    from tpu_tts.vocoder.datasets.wavegrad_dataset import WaveGradDataset

    ap, wavs = _ap_and_wavs()
    ds = WaveGradDataset(ap=ap, items=wavs, seq_len=ap.hop_length * 8, hop_len=ap.hop_length, pad_short=0, return_segments=False)
    batch = WaveGradDataset.collate_full_clips([ds[0], ds[1]])
    assert batch["mel_input"].ndim == 3 and batch["waveform"].ndim == 3


def test_preprocess_wav_files(tmp_path):
    from tpu_tts.vocoder.configs.wavegrad_config import WavernnConfig
    from tpu_tts.vocoder.datasets import load_wav_feat_data, preprocess_wav_files
    from tpu_tts.vocoder.datasets.wavernn_dataset import WaveRNNDataset

    ap, wavs = _ap_and_wavs()
    cfg = WavernnConfig(mode=9, data_path=os.path.dirname(wavs[0]))
    preprocess_wav_files(str(tmp_path), cfg, ap)
    n = len(wavs)
    assert len(os.listdir(tmp_path / "mel")) == n
    assert len(os.listdir(tmp_path / "quant")) == n
    # feature-path ingest branch
    eval_items, train_items = load_wav_feat_data(cfg.data_path, str(tmp_path / "quant"), 2)
    ds = WaveRNNDataset(ap=ap, items=train_items, seq_len=ap.hop_length * 4, hop_len=ap.hop_length, pad=2, mode=9, mulaw=True)
    mel, x, _ = ds.load_item(0)
    assert mel.shape[1] == ap.num_mels and np.abs(x).max() <= 1.0
