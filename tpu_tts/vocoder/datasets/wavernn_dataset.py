"""WaveRNN dataset: (prev-sample, target-sample, mel window) triplets.

Behavior spec: /root/reference/TTS/vocoder/datasets/wavernn_dataset.py:8
(on-the-fly mel + mu-law/quantize, `collate`:96 random mel-window crops).
TPU redesign: the collate emits fixed `[B, seq_len]` / `[B, mel_win, C]`
arrays every batch (seq_len and pad are config constants), so the WaveRNN
train step compiles exactly once.

For integer modes the waveform is companded (mu-law when `mulaw` else linear
quantize) and rescaled to [-1, 1]; `Wavernn.loss_fn` recovers the class labels
exactly from that scaling, matching the reference's `x_input` normalization
(ref :113-115).
"""

import threading

import numpy as np

from tpu_tts.audio.numpy_transforms import mulaw_encode, quantize


class WaveRNNDataset:
    def __init__(
        self,
        ap,
        items,
        seq_len: int,
        hop_len: int,
        pad: int,
        mode,
        mulaw: bool,
        is_training: bool = True,
        return_segments: bool = True,
        seed: int = 0,
    ):
        self.ap = ap
        self.compute_feat = not isinstance(items[0], (tuple, list))
        self.item_list = items
        self.seq_len = seq_len
        self.hop_len = hop_len
        self.mel_len = seq_len // hop_len
        self.pad = pad
        self.mode = mode
        self.mulaw = mulaw
        self.is_training = is_training
        self.return_segments = return_segments
        self.rng = np.random.default_rng(seed)
        # loader worker threads share this generator; numpy Generators are
        # not thread-safe, so draws are serialized (they are tiny vs IO/DSP)
        self._rng_lock = threading.Lock()
        assert self.seq_len % self.hop_len == 0

    def __len__(self):
        return len(self.item_list)

    def _encode(self, audio: np.ndarray) -> np.ndarray:
        """waveform → model input domain (float in [-1, 1])."""
        if self.mode in ("gauss", "mold"):
            return audio.astype(np.float32)
        bits = int(self.mode)
        coarse = (
            mulaw_encode(wav=audio, mulaw_qc=bits) if self.mulaw else quantize(x=audio, quantize_bits=bits)
        )
        return (2.0 * coarse.astype(np.float32) / (2**bits - 1.0) - 1.0).astype(np.float32)

    def load_item(self, index: int):
        """(mel `[T_mel, C]`, encoded signal `[T]`, wavpath) — ref :50."""
        if self.compute_feat:
            wavpath = self.item_list[index]
            audio = np.asarray(self.ap.load_wav(wavpath), dtype=np.float32)
            if self.return_segments:
                min_audio_len = 2 * self.seq_len + (2 * self.pad * self.hop_len)
            else:
                min_audio_len = audio.shape[0] + (2 * self.pad * self.hop_len)
            if audio.shape[0] < min_audio_len:
                audio = np.pad(audio, [0, min_audio_len - audio.shape[0] + self.hop_len])
            mel = self.ap.melspectrogram(audio).astype(np.float32).T  # [T, C]
            x = self._encode(audio)
        else:
            wavpath, feat_path = self.item_list[index]
            mel = np.load(feat_path.replace("/quant/", "/mel/")).astype(np.float32).T
            if self.mode in ("gauss", "mold"):
                x = np.asarray(self.ap.load_wav(wavpath), dtype=np.float32)
            else:
                bits = int(self.mode)
                coarse = np.load(feat_path.replace("/mel/", "/quant/"))
                x = (2.0 * coarse.astype(np.float32) / (2**bits - 1.0) - 1.0).astype(np.float32)
        return mel, x, wavpath

    def __getitem__(self, index: int):
        return self.load_item(index)

    def load_test_samples(self, num_samples: int):
        prev = self.return_segments
        self.return_segments = False
        samples = []
        for idx in range(min(num_samples, len(self))):
            mel, x, _ = self.load_item(idx)
            samples.append([mel, x])
        self.return_segments = prev
        return samples

    def collate(self, batch):
        """Random fixed-size window per item (ref :96)."""
        mel_win = self.mel_len + 2 * self.pad
        mels, xs, ys = [], [], []
        for mel, sig, _ in batch:
            max_offset = mel.shape[0] - (mel_win + 2 * self.pad)
            if self.is_training:
                with self._rng_lock:
                    mel_offset = int(self.rng.integers(0, max(max_offset, 1)))
            else:
                mel_offset = 0
            sig_offset = (mel_offset + self.pad) * self.hop_len
            mels.append(mel[mel_offset : mel_offset + mel_win])
            window = sig[sig_offset : sig_offset + self.seq_len + 1]
            if len(window) < self.seq_len + 1:
                window = np.pad(window, (0, self.seq_len + 1 - len(window)))
            xs.append(window[: self.seq_len])
            ys.append(window[1:])
        return {
            "waveform_coarse": np.stack(xs).astype(np.float32),
            "waveform_target": np.stack(ys).astype(np.float32),
            "mel_input": np.stack(mels).astype(np.float32),
        }


class WaveRNNDataLoader:
    def __init__(self, dataset: WaveRNNDataset, batch_size: int, shuffle=True, drop_last=True, seed=0,
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
