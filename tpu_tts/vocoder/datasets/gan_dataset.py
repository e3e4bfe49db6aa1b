"""GAN vocoder dataset: random (mel segment, audio segment) pairs.

Mirror of /root/reference/TTS/vocoder/datasets/gan_dataset.py:11 with a
numpy collate producing fixed `[B, seq_len/hop, C]` mel and `[B, seq_len, 1]`
waveforms — fixed shapes by construction (seq_len is constant), so the GAN
train step compiles exactly once.
"""

import os
from typing import Dict, List

import threading

import numpy as np


class GANDataset:
    def __init__(
        self,
        ap,
        items: List,
        seq_len: int,
        hop_len: int,
        pad_short: int = 0,
        conv_pad: int = 2,
        return_pairs: bool = False,
        is_training: bool = True,
        use_noise_augment: bool = False,
        use_cache: bool = False,
        seed: int = 0,
    ):
        self.ap = ap
        self.items = items
        self.seq_len = seq_len
        self.hop_len = hop_len
        self.pad_short = pad_short
        self.conv_pad = conv_pad
        self.return_pairs = return_pairs
        self.is_training = is_training
        self.use_noise_augment = use_noise_augment
        self.use_cache = use_cache
        self.feat_frame_len = seq_len // hop_len + (2 * conv_pad)
        self.rng = np.random.default_rng(seed)
        # loader worker threads share this generator; numpy Generators are
        # not thread-safe, so draws are serialized (they are tiny vs IO/DSP)
        self._rng_lock = threading.Lock()
        self._cache: Dict[int, np.ndarray] = {}
        assert seq_len % hop_len == 0, " [!] seq_len must be a multiple of hop_len."

    def __len__(self):
        return len(self.items)

    def _load_wav(self, idx: int) -> np.ndarray:
        if self.use_cache and idx in self._cache:
            return self._cache[idx]
        path = self.items[idx][0] if isinstance(self.items[idx], (list, tuple)) else self.items[idx]
        wav = np.asarray(self.ap.load_wav(path), dtype=np.float32)
        if len(wav) < self.seq_len + self.pad_short:
            wav = np.pad(wav, (0, self.seq_len + self.pad_short - len(wav)))
        if self.use_cache:
            self._cache[idx] = wav
        return wav

    def _sample_segment(self, wav: np.ndarray):
        if self.is_training:
            max_start = len(wav) - self.seq_len - 1
            with self._rng_lock:
                start = int(self.rng.integers(0, max(max_start, 1)))
        else:
            start = 0
        seg = wav[start : start + self.seq_len]
        mel = self.ap.melspectrogram(seg).astype(np.float32).T  # [T, C]
        mel = mel[: self.seq_len // self.hop_len]
        if self.use_noise_augment:
            with self._rng_lock:
                noise = self.rng.standard_normal(len(seg)).astype(np.float32)
            seg = seg + (1.0 / 32768.0) * noise
        return mel, seg.astype(np.float32)

    def __getitem__(self, idx: int) -> Dict:
        wav = self._load_wav(idx)
        mel, seg = self._sample_segment(wav)
        item = {"mel": mel, "waveform": seg}
        if self.return_pairs:
            mel2, seg2 = self._sample_segment(wav)
            item["mel_G"] = mel2
            item["waveform_G"] = seg2
        return item

    def collate(self, batch: List[Dict]) -> Dict:
        T_mel = min(m["mel"].shape[0] for m in batch)
        out = {
            "mel_input": np.stack([b["mel"][:T_mel] for b in batch]),
            "waveform": np.stack([b["waveform"] for b in batch])[:, :, None],
        }
        if self.return_pairs:
            out["mel_input_G"] = np.stack([b["mel_G"][:T_mel] for b in batch])
            out["waveform_G"] = np.stack([b["waveform_G"] for b in batch])[:, :, None]
        return out


class GANDataLoader:
    def __init__(self, dataset: GANDataset, batch_size: int, shuffle=True, drop_last=True, seed=0,
                 num_shards=1, shard_id=0, num_workers=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.num_shards = max(int(num_shards), 1)
        self.shard_id = int(shard_id)
        self.num_workers = int(num_workers or 0)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else int(np.ceil(n / self.batch_size))

    def _make_batch(self, chunk):
        from tpu_tts.data import shard_batch_indices

        chunk = shard_batch_indices(chunk, self.num_shards, self.shard_id)
        if chunk is None:
            return None
        return self.dataset.collate([self.dataset[int(i)] for i in chunk])

    def __iter__(self):
        from tpu_tts.data import prefetch_batches

        idxs = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idxs)
        chunks = [idxs[s : s + self.batch_size] for s in range(0, len(idxs), self.batch_size)]
        if self.drop_last and chunks and len(chunks[-1]) < self.batch_size:
            chunks = chunks[:-1]
        yield from prefetch_batches(self._make_batch, chunks, self.num_workers)
