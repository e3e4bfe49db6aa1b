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

Lockstep constraints (documented, enforced):
- Only requests with the SAME text-token length batch together (the GPT
  prefill has no per-row attention mask; padding would pollute the prompt).
  Requests are grouped into per-length queues; a gather window collects
  same-length requests before launching a round.
- A round runs until every stream in it stops; a stream that stops early
  rides along as a dead row (its outputs are discarded).

With `top_k=1` (greedy) the sampled codes are batch-size invariant, so a
pooled stream reproduces the single-stream output — tested in
tests/test_xtts_pool.py.
"""

import queue
import threading
import time
from typing import Iterator, Optional

import numpy as np


class _Request:
    __slots__ = ("text_tokens", "cond", "spk", "out")

    def __init__(self, text_tokens, cond, spk):
        self.text_tokens = text_tokens  # np [T]
        self.cond = cond  # np/jnp [1, n_cond, C]
        self.spk = spk  # np/jnp [1, d]
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
        self._jax = jax
        self._net_cls = XttsNet
        self._pf = jax.jit(
            lambda p, c, t: model.net.apply({"params": p}, c, t, method=XttsNet.stream_prefill)
        )
        self._dec = jax.jit(
            lambda p, l, s: model.net.apply({"params": p}, l, s, method=XttsNet.decode_latents)
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
    ) -> Iterator[np.ndarray]:
        """Enqueue one stream; returns an iterator of waveform chunks."""
        if self._closed:
            raise RuntimeError("pool is closed")
        if text_tokens is None:
            text_tokens = np.asarray(self.model.bpe.encode(text, language), dtype=np.int32)
        req = _Request(np.asarray(text_tokens, dtype=np.int32).reshape(-1),
                       gpt_cond_latent, speaker_embedding)
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
    def _chunk_fn(self, n_steps: int):
        if n_steps not in self._chunk_fns:
            jax, XttsNet, model = self._jax, self._net_cls, self.model
            # donated KV cache: avoids a 128 MB-per-stream copy every chunk
            # (see models/xtts.py chunk_fn)
            self._chunk_fns[n_steps] = jax.jit(
                lambda p, cache, pl, code, stop, r, i0: model.net.apply(
                    {"params": p}, cache, pl, code, stop, r, i0,
                    n_steps, self.temperature, self.top_k,
                    method=XttsNet.stream_chunk,
                ),
                donate_argnums=(1,),
            )
        return self._chunk_fns[n_steps]

    def _gather(self, first: _Request):
        """Collect same-text-length requests for up to `gather_window_s`."""
        batch = [first]
        t_len = first.text_tokens.shape[0]
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
            if req.text_tokens.shape[0] == t_len:
                batch.append(req)
            else:
                leftover.append(req)  # different bucket → next round
        for req in leftover:
            self._in.put(req)
        return batch

    def _run(self):
        jax = self._jax
        import jax.numpy as jnp

        while True:
            first = self._in.get()
            if first is None:
                return
            batch = self._gather(first)
            try:
                self._serve_round(batch, jnp)
            except Exception as e:  # surface the error to every caller
                for req in batch:
                    req.out.put(e)
                    req.out.put(None)

    def _serve_round(self, batch, jnp):
        model = self.model
        B = len(batch)
        text = jnp.asarray(np.stack([r.text_tokens for r in batch]))
        cond = jnp.concatenate([jnp.asarray(r.cond) for r in batch], axis=0)
        spk = jnp.concatenate([jnp.asarray(r.spk) for r in batch], axis=0)

        cache, prompt_len, code = self._pf(model.params, cond, text)
        stopped = jnp.zeros((B,), dtype=bool)
        rng = self._jax.random.PRNGKey(self.seed)
        done = [False] * B
        hist = [None] * B  # per-stream valid latent history (np [n, C])
        i0 = 0
        while i0 < self.max_new_tokens:
            size = min(self.first_chunk if i0 == 0 else self.chunk, self.max_new_tokens)
            n_steps = min(size, self.max_new_tokens - i0)
            (cache, code, stopped, rng), (codes, lats, valid) = self._chunk_fn(size)(
                model.params, cache, prompt_len, code, stopped, rng, jnp.int32(i0)
            )
            lats_np = np.asarray(lats, dtype=np.float32)  # [B, size, C]
            valid_np = np.asarray(valid)[:, :n_steps]
            # fixed decode shape: 2 programs total (first / steady), like the
            # single-stream path — per-stream crop happens on host
            if i0 == 0:
                chunk_lat, lead_rows = lats_np, [0] * B
            else:
                ctx = np.stack([
                    (hist[i] if hist[i] is not None and hist[i].shape[0] >= self.overlap
                     else np.zeros((self.overlap, lats_np.shape[2]), np.float32))[-self.overlap:]
                    for i in range(B)
                ])
                chunk_lat = np.concatenate([ctx, lats_np], axis=1)
                lead_rows = [model._n_samples(self.overlap)] * B
            wav = np.asarray(self._dec(model.params, jnp.asarray(chunk_lat), spk))
            any_alive = False
            for i, req in enumerate(batch):
                if done[i]:
                    continue
                nv = int(valid_np[i].sum())
                if nv > 0:
                    new_lat = lats_np[i, :nv]
                    hist[i] = new_lat if hist[i] is None else np.concatenate([hist[i], new_lat], axis=0)
                    req.out.put(wav[i, lead_rows[i] : lead_rows[i] + model._n_samples(nv), 0])
                if nv < n_steps or bool(np.asarray(stopped[i])):
                    done[i] = True
                    req.out.put(None)
                else:
                    any_alive = True
            if not any_alive:
                break
            i0 += size
        for i, req in enumerate(batch):
            if not done[i]:
                req.out.put(None)
