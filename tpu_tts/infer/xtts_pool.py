"""Multi-stream XTTS streaming serving — lockstep batched decoding.

The reference serves XTTS streams one at a time (`inference_stream`,
ref xtts.py:611). On TPU the GPT decode step at B=1 is weight-streaming
bound, so B concurrent streams cost barely more than one: `XttsStreamPool`
batches up to `max_streams` requests on the leading axis and runs them
through the SAME three compiled programs the single-stream path uses
(stream_prefill / stream_chunk / decode_latents), yielding audio to every
caller after each chunk. Measured on v5e (scripts/xtts_stream_latency.py
multistream mode): batching multiplies aggregate audio-s/s near-linearly
until the first chunk crosses the 200 ms target.

Batching rules:
- Requests whose text-token counts fall in the SAME length bucket
  (`Xtts.TEXT_BUCKET`-grid, matching the single-stream path) batch together:
  rows are right-padded to the bucket and a key-side attention mask hides
  the pad rows (models/xtts.py stream_prefill), so mixed-length requests
  share one compiled program set. A gather window collects same-bucket
  requests before launching a round.
- A round runs until every stream in it stops. Rows that stop early ride
  along until enough have stopped, then the round COMPACTS: live rows are
  gathered into the next power-of-two batch (cache rows included) so the
  remaining streams stop paying for dead ones. Compaction needs one
  compiled chunk-program per (chunk size, batch size) pair — power-of-two
  steps bound that at log2(max_streams) programs per chunk size, warmed
  once and shared via the persistent compile cache.

With `top_k=1` (greedy) the sampled codes are batch-size invariant, so a
pooled stream reproduces the single-stream output bit for bit even across
compactions — tested in tests/test_xtts_pool.py. With sampling (top_k>1)
streams stay correct draws but are not bitwise-reproducible against an
uncompacted run (the batch PRNG shape changes at a compaction boundary).
"""

import queue
import threading
import time
from typing import Iterator, Optional

import numpy as np


class _Request:
    __slots__ = ("text_tokens", "cond", "spk", "max_tokens", "out")

    def __init__(self, text_tokens, cond, spk, max_tokens=None):
        self.text_tokens = text_tokens  # np [T]
        self.cond = cond  # np/jnp [1, n_cond, C]
        self.spk = spk  # np/jnp [1, d]
        self.max_tokens = max_tokens  # per-request decode budget (None = pool default)
        self.out: "queue.Queue" = queue.Queue()


class XttsStreamPool:
    def __init__(
        self,
        model,
        max_streams: int = 4,
        stream_chunk_size: int = 20,
        first_chunk_size: int = 8,
        overlap_latents: int = 4,
        max_new_tokens: int = 256,
        temperature: float = 0.75,
        top_k: int = 50,
        gather_window_s: float = 0.02,
        seed: int = 0,
        compact: bool = True,
    ):
        import jax

        from tpu_tts.models.xtts import XttsNet

        self.model = model
        self.max_streams = int(max_streams)
        self.chunk = int(stream_chunk_size)
        self.first_chunk = int(first_chunk_size)
        self.overlap = int(overlap_latents)
        self.max_new_tokens = int(max_new_tokens)
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.gather_window_s = float(gather_window_s)
        self.seed = int(seed)
        self.compact = bool(compact)
        self._jax = jax
        self._net_cls = XttsNet
        self._pf = jax.jit(
            lambda p, c, t, tl: model.net.apply(
                {"params": p}, c, t, tl, method=XttsNet.stream_prefill
            )
        )
        self._dec = jax.jit(
            lambda p, l, s: model.net.apply({"params": p}, l, s, method=XttsNet.decode_latents)
        )
        # row-gather for compaction: jit handles the per-(B_old,B_new) shapes
        self._gather_rows = jax.jit(
            lambda cache, code, stop, tl, spk, idx: (
                jax.tree.map(lambda a: jnp_take(a, idx, 1), cache),
                code[idx], stop[idx], tl[idx], spk[idx],
            ),
            # no donation: the gathered cache is SMALLER than the input, so
            # XLA could not reuse the buffer anyway (it would just warn)
        )
        self._chunk_fns = {}
        self._in: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------- api
    def submit(
        self,
        text: str = None,
        language: str = "en",
        gpt_cond_latent=None,
        speaker_embedding=None,
        text_tokens=None,
        max_tokens: Optional[int] = None,
    ) -> Iterator[np.ndarray]:
        """Enqueue one stream; returns an iterator of waveform chunks.
        `max_tokens` caps THIS request's decode budget below the pool's
        `max_new_tokens` — the row is evicted (compaction) once it hits the
        cap, so one short request doesn't ride a long round to the end."""
        if self._closed:
            raise RuntimeError("pool is closed")
        if text_tokens is None:
            text_tokens = np.asarray(self.model.bpe.encode(text, language), dtype=np.int32)
        req = _Request(np.asarray(text_tokens, dtype=np.int32).reshape(-1),
                       gpt_cond_latent, speaker_embedding, max_tokens)
        self._in.put(req)

        def gen():
            while True:
                item = req.out.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item

        return gen()

    def close(self):
        self._closed = True
        self._in.put(None)
        self._worker.join(timeout=30)

    # ---------------------------------------------------------------- worker
    def _chunk_fn(self, n_steps: int, n_cond: int):
        key = (n_steps, n_cond)
        if key not in self._chunk_fns:
            jax, XttsNet, model = self._jax, self._net_cls, self.model
            # donated KV cache: avoids a 128 MB-per-stream copy every chunk
            # (see models/xtts.py chunk_fn)
            self._chunk_fns[key] = jax.jit(
                lambda p, cache, pl, code, stop, r, i0, tl: model.net.apply(
                    {"params": p}, cache, pl, code, stop, r, i0,
                    n_steps, self.temperature, self.top_k, tl, n_cond,
                    method=XttsNet.stream_chunk,
                ),
                donate_argnums=(1,),
            )
        return self._chunk_fns[key]

    def _bucket(self, n_tokens: int) -> int:
        """Same grid as the single-stream path (Xtts._bucket_text)."""
        from tpu_tts.utils.generic_utils import bucket_len

        m = self.model
        return bucket_len(n_tokens, m.TEXT_BUCKET, cap=m.args.gpt_max_text_tokens + 2)

    @staticmethod
    def _n_cond(req: _Request) -> int:
        return int(np.asarray(req.cond).shape[1])

    def _gather(self, first: _Request):
        """Collect batchable requests for up to `gather_window_s` — mixed
        true text lengths batch together; the padded bucket AND the
        conditioning-latent width must match (rows are concatenated on the
        batch axis, so a different n_cond cannot share a round)."""
        batch = [first]
        bucket = self._bucket(first.text_tokens.shape[0])
        n_cond = self._n_cond(first)
        deadline = time.monotonic() + self.gather_window_s
        leftover = []
        while len(batch) < self.max_streams:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                req = self._in.get(timeout=timeout)
            except queue.Empty:
                break
            if req is None:
                self._in.put(None)  # re-signal shutdown after this round
                break
            if self._bucket(req.text_tokens.shape[0]) == bucket and self._n_cond(req) == n_cond:
                batch.append(req)
            else:
                leftover.append(req)  # different bucket/width → next round
        for req in leftover:
            self._in.put(req)
        return batch, bucket

    def _run(self):
        jax = self._jax
        import jax.numpy as jnp

        while True:
            first = self._in.get()
            if first is None:
                return
            batch, bucket = self._gather(first)
            try:
                self._serve_round(batch, bucket, jnp)
            except Exception as e:  # surface the error to every caller
                for req in batch:
                    req.out.put(e)
                    req.out.put(None)

    def _serve_round(self, batch, bucket, jnp):
        model = self.model
        B = len(batch)
        text = jnp.asarray(np.stack([
            np.pad(r.text_tokens, (0, bucket - r.text_tokens.shape[0])) for r in batch
        ]))
        text_lengths = jnp.asarray(
            np.array([r.text_tokens.shape[0] for r in batch], dtype=np.int32)
        )
        cond = jnp.concatenate([jnp.asarray(r.cond) for r in batch], axis=0)
        spk = jnp.concatenate([jnp.asarray(r.spk) for r in batch], axis=0)

        cache, prompt_len, code = self._pf(model.params, cond, text, text_lengths)
        stopped = jnp.zeros((B,), dtype=bool)
        rng = self._jax.random.PRNGKey(self.seed)
        # row → request mapping; compaction shrinks `rows` with the batch
        rows = list(batch)
        done = {id(r): False for r in batch}
        hist = {id(r): None for r in batch}  # per-stream latent history (np [n, C])
        emitted = {id(r): 0 for r in batch}  # decoded tokens per stream
        budget = {
            id(r): min(r.max_tokens or self.max_new_tokens, self.max_new_tokens)
            for r in batch
        }
        i0 = 0
        while i0 < self.max_new_tokens:
            size = min(self.first_chunk if i0 == 0 else self.chunk, self.max_new_tokens)
            n_steps = min(size, self.max_new_tokens - i0)
            (cache, code, stopped, rng), (codes, lats, valid) = self._chunk_fn(
                size, int(cond.shape[1])
            )(
                model.params, cache, prompt_len, code, stopped, rng,
                jnp.int32(i0), text_lengths,
            )
            lats_np = np.asarray(lats, dtype=np.float32)  # [B, size, C]
            valid_full = np.asarray(valid, dtype=np.float32)  # [B, size]
            valid_full[:, n_steps:] = 0.0
            # per-request budget caps the valid mask BEFORE decoding (not
            # just the emitted crop): latents past the cap must be zeroed
            # like any other invalid tail, below
            for i, req in enumerate(rows):
                allowed = max(0, budget[id(req)] - emitted[id(req)])
                valid_full[i, allowed:] = 0.0
            # zero the INVALID tail latents before decoding: the conv
            # decoder's receptive field leaks them into the last valid
            # samples otherwise (the single-stream path zero-pads the tail
            # chunk the same way — models/xtts.py inference_stream)
            lats_np = lats_np * valid_full[:, :, None]
            valid_np = valid_full[:, :n_steps] > 0
            # fixed decode shape: 2 programs per batch size (first / steady) —
            # per-stream crop happens on host
            if i0 == 0:
                chunk_lat, lead_rows = lats_np, [0] * len(rows)
            else:
                ctxs = []
                for r in rows:
                    h = hist[id(r)]
                    if h is None or h.shape[0] < self.overlap:
                        h = np.zeros((self.overlap, lats_np.shape[2]), np.float32)
                    ctxs.append(h[-self.overlap :])
                chunk_lat = np.concatenate([np.stack(ctxs), lats_np], axis=1)
                lead_rows = [model._n_samples(self.overlap)] * len(rows)
            wav = np.asarray(self._dec(model.params, jnp.asarray(chunk_lat), spk))
            stopped_np = np.asarray(stopped)
            for i, req in enumerate(rows):
                if done[id(req)]:
                    continue
                nv = int(valid_np[i].sum())  # already budget-capped above
                if nv > 0:
                    new_lat = lats_np[i, :nv]
                    h = hist[id(req)]
                    hist[id(req)] = new_lat if h is None else np.concatenate([h, new_lat], axis=0)
                    emitted[id(req)] += nv
                    req.out.put(wav[i, lead_rows[i] : lead_rows[i] + model._n_samples(nv), 0])
                if nv < n_steps or bool(stopped_np[i]) or emitted[id(req)] >= budget[id(req)]:
                    done[id(req)] = True
                    req.out.put(None)
            live_idx = [i for i, r in enumerate(rows) if not done[id(r)]]
            if not live_idx:
                break
            i0 += size
            if self.compact and len(rows) > 1 and len(live_idx) <= len(rows) // 2:
                newB = len(rows) // 2
                while newB // 2 >= len(live_idx):
                    newB //= 2
                # keep live rows first; pad the gather index with dead rows so
                # the batch stays a power-of-two step (their output is dropped)
                dead_idx = [i for i in range(len(rows)) if i not in live_idx]
                idx = (live_idx + dead_idx)[:newB]
                cache, code, stopped, text_lengths, spk = self._gather_rows(
                    cache, code, stopped, text_lengths, spk, jnp.asarray(idx, jnp.int32)
                )
                rows = [rows[i] for i in idx]
        for req in batch:
            if not done[id(req)]:
                req.out.put(None)


def jnp_take(a, idx, axis):
    import jax.numpy as jnp

    return jnp.take(a, idx, axis=axis)
