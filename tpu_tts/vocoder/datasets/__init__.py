"""Vocoder dataset helpers (mirror of /root/reference/TTS/vocoder/datasets/
preprocess.py + __init__.py)."""

import glob
import os
from typing import List, Tuple

import numpy as np


def find_wav_files(data_path: str) -> List[str]:
    return sorted(glob.glob(os.path.join(data_path, "**", "*.wav"), recursive=True))


def find_feat_files(data_path: str) -> List[str]:
    return sorted(glob.glob(os.path.join(data_path, "**", "*.npy"), recursive=True))


def load_wav_data(data_path: str, eval_split_size: int) -> Tuple[List[str], List[str]]:
    """Recursive wav glob → (train, eval) lists (ref preprocess.py:35)."""
    wav_paths = find_wav_files(data_path)
    assert len(wav_paths) > 0, f" [!] {data_path} is empty."
    np.random.RandomState(0).shuffle(wav_paths)
    return wav_paths[:-eval_split_size], wav_paths[-eval_split_size:]


def load_wav_feat_data(data_path: str, feat_path: str, eval_split_size: int):
    wav_paths = find_wav_files(data_path)
    feat_paths = find_feat_files(feat_path)
    wav_paths.sort(key=lambda x: os.path.splitext(os.path.basename(x))[0])
    feat_paths.sort(key=lambda x: os.path.splitext(os.path.basename(x))[0])
    assert len(wav_paths) == len(feat_paths), " [!] wav and feature file counts mismatch."
    items = list(zip(wav_paths, feat_paths))
    np.random.RandomState(0).shuffle(items)
    return items[:-eval_split_size], items[-eval_split_size:]


def preprocess_wav_files(out_path: str, config, ap):
    """Precompute mel + quantized signal `.npy`s for WaveRNN (ref preprocess.py:13)."""
    from tpu_tts.audio.numpy_transforms import mulaw_encode, quantize

    os.makedirs(os.path.join(out_path, "quant"), exist_ok=True)
    os.makedirs(os.path.join(out_path, "mel"), exist_ok=True)
    wav_files = find_wav_files(config.data_path)
    mode = getattr(config, "mode", None)
    for path in wav_files:
        name = os.path.splitext(os.path.basename(path))[0]
        y = np.asarray(ap.load_wav(path), dtype=np.float32)
        mel = ap.melspectrogram(y)
        np.save(os.path.join(out_path, "mel", name + ".npy"), mel)
        if isinstance(mode, int) or (isinstance(mode, str) and str(mode).isdigit()):
            bits = int(mode)
            mulaw = getattr(config, "mulaw", True)
            quant = mulaw_encode(wav=y, mulaw_qc=bits) if mulaw else quantize(x=y, quantize_bits=bits)
            np.save(os.path.join(out_path, "quant", name + ".npy"), quant.astype(np.int64))
    return wav_files


def setup_dataset(config, ap, is_eval, samples, verbose=False):
    """Model-name → dataset registry (ref vocoder/datasets/__init__.py:13)."""
    name = config.model.lower()
    if name in ("gan", "hifigan", "melgan", "fullband_melgan", "multiband_melgan", "parallel_wavegan", "univnet"):
        from tpu_tts.vocoder.datasets.gan_dataset import GANDataset

        return GANDataset(
            ap=ap,
            items=samples,
            seq_len=config.seq_len,
            hop_len=ap.hop_length,
            pad_short=config.pad_short,
            conv_pad=config.conv_pad,
            return_pairs=getattr(config, "diff_samples_for_G_and_D", False),
            is_training=not is_eval,
            use_noise_augment=config.use_noise_augment and not is_eval,
            use_cache=config.use_cache,
        )
    if name == "wavegrad":
        from tpu_tts.vocoder.datasets.wavegrad_dataset import WaveGradDataset

        return WaveGradDataset(
            ap=ap,
            items=samples,
            seq_len=config.seq_len,
            hop_len=ap.hop_length,
            pad_short=config.pad_short,
            conv_pad=config.conv_pad,
            is_training=not is_eval,
            use_noise_augment=config.use_noise_augment and not is_eval,
            use_cache=config.use_cache,
        )
    if name == "wavernn":
        from tpu_tts.vocoder.datasets.wavernn_dataset import WaveRNNDataset

        ma = config.model_args or {}
        return WaveRNNDataset(
            ap=ap,
            items=samples,
            seq_len=config.seq_len,
            hop_len=ap.hop_length,
            pad=ma.get("pad", 2),
            mode=ma.get("mode", config.mode),
            mulaw=ma.get("mulaw", getattr(config, "mulaw", True)),
            is_training=not is_eval,
        )
    raise ValueError(f" [!] Dataset for model {config.model} cannot be found.")
