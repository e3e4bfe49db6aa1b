"""XTTS GPT fine-tuning dataset + loader.

Host-side pipeline mirroring /root/reference/TTS/tts/layers/xtts/trainer/
dataset.py:51 `XTTSDataset`: BPE-tokenized text, target wav, and a random
conditioning slice per item (get_prompt_slice:26). TPU-first deviations:
every batch is padded to the SAME static shapes (`max_text_length` tokens,
`max_wav_length` samples, `max_conditioning_length` samples) so the jitted
train step compiles once; per-sample true lengths travel alongside for
masking. Mel + DVAE code extraction happens on device inside the loss
(role of gpt_trainer.py:258 format_batch_on_device).
"""

import random
from typing import Dict, List, Optional

import numpy as np

from tpu_tts.audio.numpy_transforms import load_wav


def get_prompt_slice(
    wav: np.ndarray, max_len: int, min_len: int, rng: random.Random, is_eval: bool = False
) -> np.ndarray:
    """Random conditioning slice of `wav` (ref dataset.py:26): a uniform
    length in [min_len, max_len] at a uniform offset; eval uses the
    deterministic midpoint half."""
    if is_eval:
        n = min(len(wav), max_len)
        lo = max(0, (len(wav) - n) // 2)
        return wav[lo : lo + n]
    n = min(len(wav), rng.randint(min_len, max_len))
    lo = rng.randint(0, max(0, len(wav) - n))
    return wav[lo : lo + n]


class XttsDataset:
    """Sample dicts {text, audio_file, language} → fixed-shape training items."""

    def __init__(
        self,
        samples: List[Dict],
        tokenizer,  # VoiceBpeTokenizer
        sample_rate: int,
        max_text_length: int = 200,
        max_wav_length: int = 255995,
        min_conditioning_length: int = 66150,
        max_conditioning_length: int = 132300,
        is_eval: bool = False,
        seed: int = 0,
    ):
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.max_text_length = max_text_length
        self.max_wav_length = max_wav_length
        self.min_cond = min_conditioning_length
        self.max_cond = max_conditioning_length
        self.is_eval = is_eval
        self.rng = random.Random(seed)
        self.samples = [s for s in samples if s.get("text") and s.get("audio_file")]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx) -> Optional[Dict]:
        s = self.samples[idx]
        lang = s.get("language") or "en"
        ids = np.asarray(self.tokenizer.encode(s["text"], lang), dtype=np.int32)
        wav = load_wav(filename=s["audio_file"], sample_rate=self.sample_rate, resample=False)
        # skip overruns like the reference (dataset.py:120-133 re-samples;
        # we truncate — static shapes make partial clips still trainable)
        if len(ids) > self.max_text_length:
            ids = ids[: self.max_text_length]
        if len(wav) > self.max_wav_length:
            wav = wav[: self.max_wav_length]
        cond = get_prompt_slice(wav, self.max_cond, min(self.min_cond, len(wav)), self.rng, self.is_eval)
        return {
            "text_tokens": ids,
            "text_length": len(ids),
            "wav": wav.astype(np.float32),
            "wav_length": len(wav),
            "cond_wav": cond.astype(np.float32),
            "cond_length": len(cond),
        }

    def collate(self, items: List[Dict]) -> Dict:
        B = len(items)
        text = np.zeros((B, self.max_text_length), dtype=np.int32)
        wav = np.zeros((B, self.max_wav_length), dtype=np.float32)
        cond = np.zeros((B, self.max_cond), dtype=np.float32)
        tl = np.zeros((B,), dtype=np.int32)
        wl = np.zeros((B,), dtype=np.int32)
        cl = np.zeros((B,), dtype=np.int32)
        for i, it in enumerate(items):
            text[i, : it["text_length"]] = it["text_tokens"]
            wav[i, : it["wav_length"]] = it["wav"]
            cond[i, : it["cond_length"]] = it["cond_wav"]
            tl[i], wl[i], cl[i] = it["text_length"], it["wav_length"], it["cond_length"]
        return {
            "text_tokens": text,
            "text_lengths": tl,
            "wav": wav,
            "wav_lengths": wl,
            "cond_wav": cond,
            "cond_lengths": cl,
        }


class XttsDataLoader:
    """Shuffled fixed-shape batches over an XttsDataset."""

    def __init__(self, dataset: XttsDataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, num_shards: int = 1, shard_id: int = 0,
                 num_workers: int = 0):
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

    def _make_batch(self, idxs):
        from tpu_tts.data import shard_batch_indices

        idxs = shard_batch_indices(idxs, self.num_shards, self.shard_id)
        if idxs is None:
            return None
        items = [self.dataset[int(i)] for i in idxs]
        return self.dataset.collate([it for it in items if it is not None])

    def __iter__(self):
        from tpu_tts.data import prefetch_batches

        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        chunks = [order[b * self.batch_size : (b + 1) * self.batch_size] for b in range(len(self))]
        yield from prefetch_batches(self._make_batch, chunks, self.num_workers)
