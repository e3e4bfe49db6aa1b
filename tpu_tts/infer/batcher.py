"""Micro-batching queue for blocking batch-model requests (`/api/tts`).

The reference server serializes whole requests behind one global lock
(ref server/server.py:188) — at B=1 the TPU decoder runs far below its
throughput knee (850x realtime at B=8 vs 2333x at B=128, README
benchmarks). `TTSMicroBatcher` gives concurrent blocking requests the
batched path with NATURAL batching: the first request executes immediately
(plus an optional tiny gather window); requests arriving while a batch is
in flight queue up and form the next batch. Under no concurrency the
latency is the single-request latency; under load the decode cost is
amortized across every queued request.

Batch construction: each request's text splits into sentences (same as
`Synthesizer.tts`); ALL queued sentences stack into one `[B, T]` id batch —
rows right-padded to the longest row (then to the model's TEXT_BUCKET grid
inside `inference`) with per-row `x_lengths` masks, speaker/d-vector/
language conditioning per ROW, and the batch padded to a power of two
(duplicated rows, output dropped) so compiled program shapes stay bounded
at log2(max_batch) per text bucket. One `model.inference` call serves
everything; outputs crop per row at `y_lengths` and reassemble per request
with the same inter-sentence silence the blocking path inserts.

Only end-to-end batch models qualify (VITS family: waveform out of
`inference`, no `synthesize` pipeline); everything else falls back to the
reference-style locked path in the server.
"""

import queue
import threading
import time
from typing import List, Optional

import numpy as np

from tpu_tts.infer.synthesis import trim_silence


class _Job:
    __slots__ = ("sent_ids", "speaker_id", "d_vector", "language_id", "out")

    def __init__(self, sent_ids, speaker_id, d_vector, language_id):
        self.sent_ids = sent_ids  # list of np int32 [T_i] (one per sentence)
        self.speaker_id = speaker_id
        self.d_vector = d_vector
        self.language_id = language_id
        self.out: "queue.Queue" = queue.Queue()


def _pow2_ceil(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class TTSMicroBatcher:
    def __init__(self, synthesizer, max_batch: int = 16, gather_window_s: float = 0.0):
        self.synth = synthesizer
        self.model = synthesizer.tts_model
        self.max_batch = int(max_batch)
        self.gather_window_s = float(gather_window_s)
        # observability: a serial fallback would show batches == sentences
        self.batches_run = 0
        self.rows_run = 0
        self._in: "queue.Queue[Optional[_Job]]" = queue.Queue()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # end-to-end models whose `inference` honors per-row `x_lengths` masks —
    # the requirement for batching MIXED-length rows (delightful_tts pads all
    # rows to one assumed length, so it stays on the locked path)
    BATCHABLE_MODELS = {"vits", "yourtts"}

    @classmethod
    def supports(cls, synthesizer) -> bool:
        """End-to-end batch models only: `inference` returns waveform for a
        whole `[B, T]` id batch with per-row length masks, and there is no
        per-request `synthesize` pipeline (AR/cloning models stream through
        XttsStreamPool instead)."""
        model = getattr(synthesizer, "tts_model", None)
        cfg = getattr(synthesizer, "tts_config", None)
        return (
            model is not None
            and not hasattr(model, "synthesize")
            and hasattr(model, "inference")
            and str(getattr(cfg, "model", "")).lower() in cls.BATCHABLE_MODELS
        )

    # ------------------------------------------------------------------- api
    def tts(self, text: str, speaker_name: str = "", language_name: str = "",
            speaker_wav=None) -> np.ndarray:
        """Blocking: returns the full float32 waveform for `text`. Safe to
        call from many server threads — concurrent calls share one batch."""
        if self._closed:
            raise RuntimeError("batcher is closed")
        speaker_id, d_vector = self.synth.resolve_speaker(speaker_name, speaker_wav)
        language_id = self.synth.resolve_language(language_name)
        lang = None
        if language_id is not None and self.model.language_manager is not None:
            names = [k for k, v in self.model.language_manager.name_to_id.items()
                     if v == language_id]
            lang = names[0] if names else None
        sents = self.synth.split_into_sentences(text)
        sent_ids = [
            np.asarray(self.model.tokenizer.text_to_ids(s, language=lang), dtype=np.int32)
            for s in sents
        ]
        job = _Job(sent_ids, speaker_id, d_vector, language_id)
        self._in.put(job)
        result = job.out.get()
        if isinstance(result, Exception):
            raise result
        return result

    def close(self):
        self._closed = True
        self._in.put(None)
        self._worker.join(timeout=30)

    # ---------------------------------------------------------------- worker
    def _run(self):
        while True:
            job = self._in.get()
            if job is None:
                return
            jobs = [job]
            deadline = time.monotonic() + self.gather_window_s
            # natural batching: drain everything already queued (and anything
            # arriving inside the optional window) into this batch
            while sum(len(j.sent_ids) for j in jobs) < self.max_batch:
                t = deadline - time.monotonic()
                try:
                    nxt = self._in.get(timeout=t) if t > 0 else self._in.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    self._in.put(None)
                    break
                jobs.append(nxt)
            try:
                self._serve(jobs)
            except Exception as e:
                for j in jobs:
                    j.out.put(e)

    def _serve(self, jobs: List[_Job]):
        import jax.numpy as jnp

        model, cfg = self.model, self.synth.tts_config
        rows = [(j, ids) for j in jobs for ids in j.sent_ids]
        hop = model.ap.hop_length
        do_trim = bool(getattr(cfg.audio, "do_trim_silence", False)) and model.ap is not None
        waves = {id(j): [] for j in jobs}
        for start in range(0, len(rows), self.max_batch):
            chunk = rows[start : start + self.max_batch]
            B = _pow2_ceil(len(chunk))
            T = max(ids.shape[0] for _, ids in chunk)
            x = np.zeros((B, T), dtype=np.int32)
            x_lengths = np.zeros((B,), dtype=np.int32)
            for i in range(B):
                j, ids = chunk[i if i < len(chunk) else 0]  # pad rows replicate row 0
                x[i, : ids.shape[0]] = ids
                x_lengths[i] = ids.shape[0]
            aux = {"x_lengths": jnp.asarray(x_lengths)}
            picked = [chunk[i if i < len(chunk) else 0][0] for i in range(B)]
            if any(j.speaker_id is not None for j in picked):
                aux["speaker_ids"] = jnp.asarray(
                    np.array([j.speaker_id or 0 for j in picked], dtype=np.int32)
                )
            if any(j.d_vector is not None for j in picked):
                dim = next(np.asarray(j.d_vector).size for j in picked if j.d_vector is not None)
                aux["d_vectors"] = jnp.asarray(np.stack([
                    np.asarray(j.d_vector, dtype=np.float32).reshape(-1)
                    if j.d_vector is not None else np.zeros((dim,), np.float32)
                    for j in picked
                ]))
            if any(j.language_id is not None for j in picked):
                aux["language_ids"] = jnp.asarray(
                    np.array([j.language_id or 0 for j in picked], dtype=np.int32)
                )
            out = model.inference(jnp.asarray(x), aux_input=aux)
            wav = np.asarray(out["model_outputs"])  # [B, T_samples, 1]
            y_lengths = np.asarray(out.get("y_lengths", np.full((B,), wav.shape[1] // hop)))
            self.batches_run += 1
            self.rows_run += len(chunk)
            for i, (j, _ids) in enumerate(chunk):
                w = wav[i, : int(y_lengths[i]) * hop, 0].astype(np.float32)
                if do_trim:
                    w = trim_silence(w, model.ap)
                waves[id(j)].append(w)
        silence = np.zeros((10000,), dtype=np.float32)  # inter-sentence gap (ref :441)
        for j in jobs:
            parts = []
            for w in waves[id(j)]:
                parts += [w, silence]
            j.out.put(np.concatenate(parts) if parts else np.zeros((0,), np.float32))
