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
