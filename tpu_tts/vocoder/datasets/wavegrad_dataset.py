"""WaveGrad dataset: random fixed-length (audio, mel) segment pairs.

Behavior spec: /root/reference/TTS/vocoder/datasets/wavegrad_dataset.py:12.
TPU redesign: segments are constant-length (`seq_len` from config) so the
diffusion train step compiles once; `collate_full_clips` (ref :136) pads to the
batch max only for the host-side schedule search in `tune_wavegrad`.
"""

from typing import List, Tuple

import threading

import numpy as np


class WaveGradDataset:
    def __init__(
        self,
        ap,
        items,
        seq_len: int,
        hop_len: int,
        pad_short: int,
        conv_pad: int = 2,
        is_training: bool = True,
        return_segments: bool = True,
        use_noise_augment: bool = False,
        use_cache: bool = False,
        seed: int = 0,
    ):
        self.ap = ap
        self.item_list = items
        self.seq_len = seq_len
        self.hop_len = hop_len
        self.pad_short = pad_short
        self.conv_pad = conv_pad
        self.is_training = is_training
        self.return_segments = return_segments
        self.use_noise_augment = use_noise_augment
        self.use_cache = use_cache
        self.rng = np.random.default_rng(seed)
        # loader worker threads share this generator; numpy Generators are
        # not thread-safe, so draws are serialized (they are tiny vs IO/DSP)
        self._rng_lock = threading.Lock()
        self._cache = {}
        if return_segments:
            assert seq_len % hop_len == 0, " [!] seq_len has to be a multiple of hop_len."

    def __len__(self):
        return len(self.item_list)

    def _load_audio(self, idx: int) -> np.ndarray:
        if self.use_cache and idx in self._cache:
            return self._cache[idx]
        audio = np.asarray(self.ap.load_wav(self.item_list[idx]), dtype=np.float32)
        if self.return_segments and audio.shape[-1] < self.seq_len + self.pad_short:
            audio = np.pad(audio, (0, self.seq_len + self.pad_short - len(audio)))
        # pad up to a hop multiple (ref :111)
        p = (audio.shape[-1] // self.hop_len + 1) * self.hop_len - audio.shape[-1]
        audio = np.pad(audio, (0, p))
        if self.use_cache:
            self._cache[idx] = audio
        return audio

    def load_item(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """(mel `[T_mel, C]`, audio `[T]`) — ref :92."""
        audio = self._load_audio(idx)
        if self.return_segments:
            max_start = len(audio) - self.seq_len
            if self.is_training:
                with self._rng_lock:
                    start = int(self.rng.integers(0, max(max_start, 1)))
            else:
                start = 0
            audio = audio[start : start + self.seq_len]
        if self.use_noise_augment and self.is_training and self.return_segments:
            with self._rng_lock:
                noise = self.rng.standard_normal(len(audio)).astype(np.float32)
            audio = audio + (1.0 / 32768.0) * noise
        mel = self.ap.melspectrogram(audio).astype(np.float32).T  # [T, C]
        mel = mel[: len(audio) // self.hop_len]  # drop the stft padding frame (ref :132)
        return mel, audio.astype(np.float32)

    def __getitem__(self, idx: int):
        return self.load_item(idx)

    def load_test_samples(self, num_samples: int) -> List[Tuple]:
        prev = self.return_segments
        self.return_segments = False
        samples = [list(self.load_item(i)) for i in range(min(num_samples, len(self)))]
        self.return_segments = prev
        return samples

    def collate(self, batch):
        T_mel = min(m.shape[0] for m, _ in batch)
        return {
            "mel_input": np.stack([m[:T_mel] for m, _ in batch]),
            "waveform": np.stack([a for _, a in batch])[:, :, None],
        }

    @staticmethod
    def collate_full_clips(batch):
        """Pad full clips to batch max (ref :136); used by tune_wavegrad."""
        max_mel = max(m.shape[0] for m, _ in batch)
        max_audio = max(a.shape[0] for _, a in batch)
        mels = np.zeros((len(batch), max_mel, batch[0][0].shape[1]), dtype=np.float32)
        audios = np.zeros((len(batch), max_audio), dtype=np.float32)
        for i, (m, a) in enumerate(batch):
            mels[i, : m.shape[0]] = m
            audios[i, : a.shape[0]] = a
        return {"mel_input": mels, "waveform": audios[:, :, None]}


class WaveGradDataLoader:
    def __init__(self, dataset: WaveGradDataset, batch_size: int, shuffle=True, drop_last=True, seed=0,
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
