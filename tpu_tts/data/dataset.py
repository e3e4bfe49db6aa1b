"""TTSDataset: host-side featurization + fixed-shape batching for TPU.

Role of /root/reference/TTS/tts/datasets/dataset.py:56 (`TTSDataset`,
`PhonemeDataset`:577, `F0Dataset`:672, `EnergyDataset`), re-designed for XLA:
the collate pads **to shape buckets** (next multiple of `text_bucket` /
`mel_bucket`) instead of per-batch max, so a training run sees a handful of
compiled shapes instead of a retrace per batch. Everything is numpy; arrays
cross into jax at the jit boundary.
"""

import os
import threading
from typing import Dict, List, Optional

import numpy as np

from tpu_tts.data import get_audio_size


def _bucket(n: int, step: int) -> int:
    return int(np.ceil(max(n, 1) / step)) * step


def noise_augment_audio(wav):
    return wav + (1.0 / 32768.0) * np.random.rand(*wav.shape)


def string2filename(string: str) -> str:
    import base64

    return base64.urlsafe_b64encode(string.encode("utf-8")).decode("utf8", "ignore")


class FeatureCache:
    """Compute-or-load per-clip features cached as .npy (pattern of the
    reference's PhonemeDataset/F0Dataset)."""

    def __init__(self, cache_path: Optional[str], suffix: str):
        self.cache_path = cache_path
        self.suffix = suffix
        if cache_path:
            os.makedirs(cache_path, exist_ok=True)

    def get(self, key: str, compute_fn):
        if not self.cache_path:
            return compute_fn()
        path = os.path.join(self.cache_path, string2filename(key) + self.suffix)
        if os.path.exists(path):
            try:
                return np.load(path, allow_pickle=False)
            except (OSError, ValueError):
                pass
        value = compute_fn()
        # atomic publish: loader workers / training processes may share the
        # cache dir, and a reader must never see a half-written .npy
        tmp = path + f".tmp{os.getpid()}-{threading.get_ident()}"
        with open(tmp, "wb") as f:
            np.save(f, value, allow_pickle=False)
        os.replace(tmp, path)
        return value


class TTSDataset:
    def __init__(
        self,
        outputs_per_step: int = 1,
        compute_linear_spec: bool = False,
        ap=None,
        samples: Optional[List[Dict]] = None,
        tokenizer=None,
        compute_f0: bool = False,
        compute_energy: bool = False,
        f0_cache_path: Optional[str] = None,
        energy_cache_path: Optional[str] = None,
        return_wav: bool = False,
        batch_group_size: int = 0,
        min_text_len: int = 0,
        max_text_len: float = float("inf"),
        min_audio_len: int = 0,
        max_audio_len: float = float("inf"),
        phoneme_cache_path: Optional[str] = None,
        precompute_num_workers: int = 0,
        speaker_id_mapping: Optional[Dict] = None,
        d_vector_mapping: Optional[Dict] = None,
        language_id_mapping: Optional[Dict] = None,
        use_noise_augment: bool = False,
        use_attn_prior: bool = False,
        attn_prior_cache_path: Optional[str] = None,
        start_by_longest: bool = False,
        text_bucket: int = 32,
        mel_bucket: int = 64,
        wav_bucket: Optional[int] = None,
        verbose: bool = False,
    ):
        self.samples = samples or []
        self.outputs_per_step = outputs_per_step
        self.compute_linear_spec = compute_linear_spec
        self.compute_f0 = compute_f0
        self.compute_energy = compute_energy
        self.return_wav = return_wav
        self.batch_group_size = batch_group_size
        self.min_audio_len = min_audio_len
        self.max_audio_len = max_audio_len
        self.min_text_len = min_text_len
        self.max_text_len = max_text_len
        self.ap = ap
        self.tokenizer = tokenizer
        self.speaker_id_mapping = speaker_id_mapping
        self.d_vector_mapping = d_vector_mapping
        self.language_id_mapping = language_id_mapping
        self.use_noise_augment = use_noise_augment
        self.use_attn_prior = use_attn_prior
        self.attn_prior_cache = FeatureCache(attn_prior_cache_path, "_attn_prior.npy")
        self.start_by_longest = start_by_longest
        self.text_bucket = text_bucket
        self.mel_bucket = max(mel_bucket, outputs_per_step)
        self.wav_bucket = wav_bucket
        self.verbose = verbose
        self.rescue_item_idx = 1
        self.phoneme_cache = FeatureCache(phoneme_cache_path, "_phoneme.npy")
        self.f0_cache = FeatureCache(f0_cache_path, "_f0.npy")
        self.energy_cache = FeatureCache(energy_cache_path, "_energy.npy")
        self._token_cache: Dict[int, np.ndarray] = {}

    # ------------------------------------------------------------------ sizes
    def __len__(self):
        return len(self.samples)

    @property
    def lengths(self) -> List[int]:
        lens = []
        for item in self.samples:
            try:
                lens.append(get_audio_size(item["audio_file"]))
            except (OSError, ValueError):
                lens.append(0)
        return lens

    # ------------------------------------------------------------- tokenizing
    def get_token_ids(self, idx: int, text: str) -> np.ndarray:
        if idx in self._token_cache:
            return self._token_cache[idx]
        language = self.samples[idx].get("language") or None

        def compute():
            return np.asarray(self.tokenizer.text_to_ids(text, language=language), dtype=np.int32)

        if self.tokenizer.use_phonemes and self.phoneme_cache.cache_path:
            ids = self.phoneme_cache.get(self.samples[idx]["audio_unique_name"], compute)
        else:
            ids = compute()
        ids = np.asarray(ids, dtype=np.int32)
        self._token_cache[idx] = ids
        return ids

    # ------------------------------------------------------------------ items
    def load_item(self, idx: int) -> Dict:
        item = self.samples[idx]
        raw_text = item["text"]
        wav = np.asarray(self.ap.load_wav(item["audio_file"]), dtype=np.float32)
        if len(wav) == 0:
            return self.load_item(self.rescue_item_idx)
        if self.use_noise_augment:
            wav = noise_augment_audio(wav)
        token_ids = self.get_token_ids(idx, item["text"])
        f0 = None
        energy = None
        if self.compute_f0:
            f0 = self.f0_cache.get(item["audio_unique_name"], lambda: self.ap.compute_f0(wav).astype(np.float32))
        if self.compute_energy:
            energy = self.energy_cache.get(
                item["audio_unique_name"], lambda: self.ap.compute_energy(wav).astype(np.float32)
            )
        return {
            "raw_text": raw_text,
            "token_ids": token_ids,
            "wav": wav,
            "pitch": f0,
            "energy": energy,
            "item_idx": item["audio_file"],
            "speaker_name": item.get("speaker_name"),
            "language_name": item.get("language"),
            "wav_file_name": os.path.basename(item["audio_file"]),
            "audio_unique_name": item["audio_unique_name"],
        }

    def __getitem__(self, idx):
        return self.load_item(idx)

    # -------------------------------------------------------------- filtering
    def preprocess_samples(self):
        """Length-filter + sort samples (ref dataset.py:353)."""
        new_samples = []
        lengths = []
        for item in self.samples:
            try:
                audio_len = get_audio_size(item["audio_file"])
            except (OSError, ValueError):
                continue
            text_len = len(item["text"])
            if (
                self.min_text_len <= text_len <= self.max_text_len
                and self.min_audio_len <= audio_len <= self.max_audio_len
            ):
                new_samples.append(item)
                lengths.append(audio_len)
        if not new_samples:
            raise RuntimeError(" [!] No samples left after filtering by length.")
        order = np.argsort(lengths)
        if self.start_by_longest:
            order = order[::-1]
        self.samples = [new_samples[i] for i in order]
        if self.verbose:
            print(f" | > Preprocessed {len(self.samples)} samples.")

    # --------------------------------------------------- multi-process hints
    def mel_frames_upper_bound(self, idx: int) -> int:
        """Upper bound on mel frames for sample `idx` from the wav header
        alone (no decode): used to agree on bucket shapes across processes.
        Trimming only shortens audio, so header length is a safe bound."""
        import scipy.io.wavfile

        item = self.samples[idx]
        try:
            sr, data = scipy.io.wavfile.read(item["audio_file"], mmap=True)
        except (OSError, ValueError):
            return self.mel_bucket
        n = data.shape[0]
        if sr != self.ap.sample_rate:
            n = int(np.ceil(n * self.ap.sample_rate / sr))
        return n // self.ap.hop_length + 2

    def shard_pad_hint(self, global_batch_idx: List[int]) -> tuple:
        """(min T_text, min T_mel) every process must pad its shard of this
        global batch to — a deterministic function of global metadata, so all
        shards produce identical bucketed shapes for
        `jax.make_array_from_process_local_data`."""
        t_text = max(
            len(self.get_token_ids(i, self.samples[i]["text"])) for i in global_batch_idx
        )
        t_mel = max(self.mel_frames_upper_bound(i) for i in global_batch_idx)
        return t_text, t_mel

    # ---------------------------------------------------------------- collate
    def collate_fn(self, batch: List[Dict], pad_to: Optional[tuple] = None) -> Dict:
        """Pad to bucketed shapes and build the training batch dict.

        Output key naming follows the reference trainer contract
        (base_tts.py:163 `format_batch`): text_input, text_lengths, mel_input,
        mel_lengths, stop_targets, speaker_ids/d_vectors, ...

        `pad_to=(t_text, t_mel)` forces minimum pre-bucket pad lengths — used
        by sharded loaders so every process's shard lands in the same bucket.
        """
        B = len(batch)
        token_lens = np.array([len(d["token_ids"]) for d in batch], dtype=np.int32)
        mels = [self.ap.melspectrogram(d["wav"]).astype(np.float32).T for d in batch]  # [T, C]
        mel_lens = np.array([m.shape[0] for m in mels], dtype=np.int32)

        t_text_raw, t_mel_raw = int(token_lens.max()), int(mel_lens.max())
        if pad_to is not None:
            t_text_raw = max(t_text_raw, pad_to[0])
            t_mel_raw = max(t_mel_raw, pad_to[1])
        T_text = _bucket(t_text_raw, self.text_bucket)
        T_mel = _bucket(t_mel_raw, self.mel_bucket)
        r = self.outputs_per_step
        if T_mel % r != 0:
            T_mel += r - T_mel % r

        text_input = np.zeros((B, T_text), dtype=np.int32)
        mel_input = np.zeros((B, T_mel, mels[0].shape[1]), dtype=np.float32)
        stop_targets = np.zeros((B, T_mel // r), dtype=np.float32)
        for i, d in enumerate(batch):
            text_input[i, : token_lens[i]] = d["token_ids"]
            mel_input[i, : mel_lens[i]] = mels[i]
            stop_targets[i, (mel_lens[i] - 1) // r :] = 1.0

        out = {
            "text_input": text_input,
            "text_lengths": token_lens,
            "mel_input": mel_input,
            "mel_lengths": mel_lens,
            "stop_targets": stop_targets,
            "item_idxs": [d["item_idx"] for d in batch],
            "speaker_names": [d["speaker_name"] for d in batch],
            "raw_text": [d["raw_text"] for d in batch],
            "audio_unique_names": [d["audio_unique_name"] for d in batch],
        }

        if self.compute_linear_spec:
            linears = [self.ap.spectrogram(d["wav"]).astype(np.float32).T for d in batch]
            linear_input = np.zeros((B, T_mel, linears[0].shape[1]), dtype=np.float32)
            for i, sp in enumerate(linears):
                linear_input[i, : sp.shape[0]] = sp[:T_mel]
            out["linear_input"] = linear_input

        if self.return_wav:
            wav_lens = np.array([len(d["wav"]) for d in batch], dtype=np.int32)
            T_wav = T_mel * self.ap.hop_length
            waveform = np.zeros((B, T_wav), dtype=np.float32)
            for i, d in enumerate(batch):
                w = d["wav"][:T_wav]
                waveform[i, : len(w)] = w
            out["waveform"] = waveform[:, :, None]
            out["waveform_lengths"] = np.minimum(wav_lens, T_wav)

        if self.use_attn_prior:
            # beta-binomial aligner prior [B, T_mel, T_text]
            # (ref delightful_tts.py ForwardTTSE2eDataset.load_or_compute_attn_prior:438)
            from tpu_tts.ops.helpers import compute_attn_prior

            priors = np.zeros((B, T_mel, T_text), dtype=np.float32)
            for i, d in enumerate(batch):
                key = d["audio_unique_name"]
                pr = self.attn_prior_cache.get(
                    key, lambda: compute_attn_prior(int(token_lens[i]), int(mel_lens[i])).astype(np.float32)
                )
                priors[i, : pr.shape[0], : pr.shape[1]] = pr[:T_mel, :T_text]
            out["attn_priors"] = priors

        for key, feat_t in (("pitch", "pitch"), ("energy", "energy")):
            if batch[0][feat_t] is not None:
                arr = np.zeros((B, T_mel), dtype=np.float32)
                for i, d in enumerate(batch):
                    f = d[feat_t][:T_mel]
                    arr[i, : len(f)] = f
                out[key] = arr

        if self.speaker_id_mapping:
            out["speaker_ids"] = np.array(
                [self.speaker_id_mapping[d["speaker_name"]] for d in batch], dtype=np.int32
            )
        if self.d_vector_mapping:
            out["d_vectors"] = np.array(
                [np.asarray(self.d_vector_mapping[d["speaker_name"]][0], dtype=np.float32) for d in batch]
            )
        if self.language_id_mapping:
            out["language_ids"] = np.array(
                [self.language_id_mapping[d["language_name"]] for d in batch], dtype=np.int32
            )
        return out


class TTSDataLoader:
    """Batched iterator over a TTSDataset: length-sorted batches, shuffled
    batch order, bucketed collate (replaces torch DataLoader + samplers for
    the single-host path). With `weights`, samples items by importance
    (speaker/language/length balancing — ref WeightedRandomSampler use).

    Multi-process: with `num_shards > 1` every process computes the SAME
    global batch schedule (same seed) and materializes only its contiguous
    `batch_size // num_shards` slice of each batch — the JAX counterpart of
    the reference's `DistributedSampler` (ref base_tts.py:274-276); the
    trainer reassembles the global batch with
    `jax.make_array_from_process_local_data`."""

    def __init__(
        self,
        dataset: TTSDataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        weights: Optional[np.ndarray] = None,
        num_shards: int = 1,
        shard_id: int = 0,
        num_workers: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = int(num_workers or 0)
        self.rng = np.random.default_rng(seed)
        self.weights = None
        if weights is not None:
            w = np.asarray(weights, dtype=np.float64)
            self.weights = w / w.sum()
        self.num_shards = max(int(num_shards), 1)
        self.shard_id = int(shard_id)
        if self.num_shards > 1 and batch_size % self.num_shards != 0:
            print(
                f" [!] batch_size {batch_size} not divisible by {self.num_shards} processes — "
                f"each global batch is trimmed to {batch_size // self.num_shards * self.num_shards}"
            )
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return int(np.ceil(n / self.batch_size))

    def _batch_indices(self) -> List[List[int]]:
        if self.weights is not None:
            n = len(self.dataset)
            idxs = list(self.rng.choice(n, size=n, replace=True, p=self.weights))
            idxs.sort()  # keep length-sorted batching for bucket efficiency
        else:
            idxs = list(range(len(self.dataset)))
        # group-local shuffle preserving length sorting (ref batch_group_size)
        if self.shuffle and self.dataset.batch_group_size > 0:
            g = self.dataset.batch_group_size
            for s in range(0, len(idxs), g):
                chunk = idxs[s : s + g]
                self.rng.shuffle(chunk)
                idxs[s : s + g] = chunk
        batches = [idxs[i : i + self.batch_size] for i in range(0, len(idxs), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches = batches[:-1]
        if self.shuffle:
            self.rng.shuffle(batches)
        return batches

    def _make_batch(self, batch_idx):
        if self.num_shards > 1:
            per = len(batch_idx) // self.num_shards
            if per == 0:
                return None  # identical skip on every process
            full = batch_idx[: per * self.num_shards]
            pad_to = self.dataset.shard_pad_hint(full)
            shard = full[self.shard_id * per : (self.shard_id + 1) * per]
            items = [self.dataset[i] for i in shard]
            return self.dataset.collate_fn(items, pad_to=pad_to)
        items = [self.dataset[i] for i in batch_idx]
        return self.dataset.collate_fn(items)

    def __iter__(self):
        from tpu_tts.data import prefetch_batches

        self.epoch += 1
        yield from prefetch_batches(self._make_batch, self._batch_indices(), self.num_workers)
