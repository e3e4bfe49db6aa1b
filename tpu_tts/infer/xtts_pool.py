"""Multi-stream XTTS streaming serving — continuous batched decoding.

The reference serves XTTS streams one at a time (`inference_stream`,
ref xtts.py:611, behind the server's global lock, ref server/server.py:188).
On TPU the GPT decode step at B=1 is weight-streaming bound, so B concurrent
streams cost barely more than one: `XttsStreamPool` batches requests on the
leading axis and runs them through the SAME compiled programs the
single-stream path uses (stream_prefill / stream_chunk / decode_latents),
yielding audio to every caller after each chunk.

Serving model (r5 — open-loop continuous batching):
- A round starts from the oldest queued request plus everything compatible
  gathered in a short window, padded up to a power-of-two batch.
- Requests keep arriving DURING a round: at every chunk boundary the pool
  admits compatible queued requests into the live batch — newcomers are
  prefilled, their KV rows spliced into free (finished/padding) slots, the
  batch grown to the next power of two when full. A spliced row carries
  `audio_start = i0`: its audio positions are relative to its own start
  while cache writes share the round's absolute index, so the batch keeps
  one contiguous time-major cache write per step (models/xtts.py
  stream_chunk). A request therefore waits at most one chunk (~tens of ms),
  not a whole round.
- Compatibility: same text-length bucket (`Xtts.TEXT_BUCKET` grid — rows are
  right-padded and key-masked) and conditioning width ≤ the round's width
  grid (`num_cond_latents` multiples — rows are right-padded on the latent
  axis and masked via `cond_lengths`, so single- and multi-reference
  speakers batch together). Incompatible requests wait for the next round; a
  request deferred `max_deferrals` times seeds the next round itself, so
  minority-bucket traffic cannot starve.
- Audio emission is PER-ROW PHASE-ALIGNED: each row buffers its valid GPT
  latents and emits in its own [first_chunk, chunk, chunk, ...] cadence from
  its own start, decoded with the same `overlap_latents` left-context scheme
  the single-stream path uses. A row admitted mid-round therefore reproduces
  its solo `inference_stream` output exactly (greedy: bit for bit) — chunk
  boundaries, overlap context, and tail padding all match.
- Rows that finish free their slots for admission; with nothing waiting, the
  round COMPACTS live rows into half-size power-of-two batches so remaining
  streams stop paying for dead ones. Batch sizes are powers of two
  throughout, bounding the compiled programs at log2(max batch) per chunk
  size, warmed once and shared via the persistent compile cache.

With `top_k=1` (greedy) the sampled codes are batch-size invariant, so a
pooled stream reproduces the single-stream output bit for bit even across
admissions and compactions — tested in tests/test_xtts_pool.py. With
sampling (top_k>1) streams stay correct draws but are not bitwise-
reproducible against a solo run (the shared batch PRNG differs).
"""

import os
import queue
import threading
import time
from typing import Iterator, List, Optional

import numpy as np

# TPU_TTS_POOL_TRACE=1: print per-chunk phase timings (admit/chunk/store/
# fetch/emit) to stderr — serving-loop diagnosis on real hardware
_TRACE = os.environ.get("TPU_TTS_POOL_TRACE", "0") == "1"


def _pow2_ceil(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class _Request:
    __slots__ = ("text_tokens", "cond", "spk", "max_tokens", "out", "deferrals", "t_submit")

    def __init__(self, text_tokens, cond, spk, max_tokens=None):
        self.text_tokens = text_tokens  # np [T]
        self.cond = cond  # np/jnp [1, n_cond, C]
        self.spk = spk  # np/jnp [1, d]
        self.max_tokens = max_tokens  # per-request decode budget (None = pool default)
        self.out: "queue.Queue" = queue.Queue()
        self.deferrals = 0  # rounds started without this request (starvation guard)
        self.t_submit = time.monotonic()


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
        admit_mid_round: bool = True,
        max_deferrals: int = 2,
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
        if self.first_chunk < self.overlap:
            raise ValueError(
                f"first_chunk_size ({self.first_chunk}) must be >= overlap_latents "
                f"({self.overlap}): the device-resident emission slices its overlap "
                "context from the row's own emitted history"
            )
        self.admit_mid_round = bool(admit_mid_round)
        self.max_deferrals = int(max_deferrals)
        # observability: tests pin the batching invariant on these (a serial
        # fallback would show rounds_served == n_requests, admissions == 0)
        self.rounds_served = 0
        self.admissions = 0
        self._jax = jax
        self._net_cls = XttsNet
        self._pf_fns = {}

        def _pf_for(cache_len=None):
            # cache_len None -> full decode cache (round start); an int ->
            # prompt-rows-only cache (admission prefill: ~300x less memory
            # churn per admission, the splice copies only those rows)
            if cache_len not in self._pf_fns:
                self._pf_fns[cache_len] = jax.jit(
                    lambda p, c, t, tl, cl: model.net.apply(
                        {"params": p}, c, t, tl, cl, cache_len,
                        method=XttsNet.stream_prefill,
                    )
                )
            return self._pf_fns[cache_len]

        self._pf_for = _pf_for
        self._pf = _pf_for(None)
        # row-gather for compaction/growth: jit handles the (B_old, B_new)
        # shapes; no donation — the gathered cache has a different batch
        # size, so XLA could not reuse the buffer anyway (it would just warn)
        self._gather_rows = jax.jit(
            lambda cache, code, stop, tl, cl, ast, spk, idx: (
                jax.tree.map(lambda a: jnp_take(a, idx, 1), cache),
                code[idx], stop[idx], tl[idx], cl[idx], ast[idx], spk[idx],
            ),
        )

        # row-splice for admission: scatter the newcomers' prefilled KV rows
        # (first k rows of their power-of-two prefill batch) into the chosen
        # slots of the live round's cache. The live cache is donated — the
        # splice updates k batch columns in place instead of copying the
        # whole (B x 128 MB) buffer. The reused slots' latent-history rows
        # are ZEROED: stale latents there would otherwise leak into the
        # newcomer's zero-pad regions (the zeros ARE the pad semantics).
        def _splice(cache, ncache, hist, code, ncode, stop, tl, ntl, cl, ncl,
                    ast, spk, nspk, slots, hrows, i0):
            k = slots.shape[0]

            def upd(a, n):
                # k chained dynamic-update-slices (one batch column each,
                # PROMPT rows only — n comes from a prompt-length prefill)
                # instead of one scatter: XLA lowers DUS on the DONATED
                # buffer to an in-place partial-column write, where the
                # scatter form serialized over the whole (B x 128 MB) cache —
                # measured as the admission bottleneck in open-loop serving.
                # The destination column's stale audio rows stay — the
                # spliced row's audio_start key mask hides them.
                zero = jnp_int0()
                for j in range(k):
                    a = jax.lax.dynamic_update_slice(
                        a, n[:, j : j + 1], (zero, slots[j], zero, zero)
                    )
                return a

            spliced = jax.tree.map(upd, cache, ncache)
            return (
                spliced,
                hist.at[hrows].set(0.0),
                code.at[slots].set(ncode[:k]),
                stop.at[slots].set(False),
                tl.at[slots].set(ntl[:k]),
                cl.at[slots].set(ncl[:k]),
                ast.at[slots].set(i0),
                spk.at[slots].set(nspk[:k]),
            )

        self._splice = jax.jit(_splice, donate_argnums=(0, 2))

        # timeline REBASE: the lockstep design writes all rows at one shared
        # absolute cache index, so a long-lived round would exhaust
        # kv_cache_len and stall admissions while it drains (measured ~10 s
        # admission blackouts every ~1000 steps). Because every live row's
        # RELATIVE history is <= max_new_tokens, shifting the last
        # W_keep = max_new_tokens + chunk audio rows down to the prompt
        # boundary (one contiguous block move, ~0.5 GB at B=16) frees the
        # rest of the timeline; audio_start shifts with it and the causal
        # limit hides the stale tail. Rounds become immortal under
        # continuous traffic.
        W_keep = self.max_new_tokens + self.chunk

        def _rebase(cache, ast, plen, shift):
            def mv(a):
                import jax.numpy as jnp

                zero = jnp.int32(0)
                blk = jax.lax.dynamic_slice(
                    a, (plen + shift, zero, zero, zero),
                    (W_keep,) + a.shape[1:],
                )
                return jax.lax.dynamic_update_slice(a, blk, (plen, zero, zero, zero))

            return jax.tree.map(mv, cache), ast - shift

        self._rebase = jax.jit(_rebase, donate_argnums=(0,))
        self._w_keep = W_keep

        # batch growth B -> 2B: pad columns replicate column 0 — a cheap
        # concat instead of a gather over the whole cache
        def _grow(cache, code, stop, tl, cl, ast, spk):
            import jax.numpy as jnp

            g2 = lambda a: jnp.concatenate(
                [a, jnp.repeat(a[:, :1], a.shape[1], axis=1)], axis=1
            )
            g1 = lambda v: jnp.concatenate(
                [v, jnp.repeat(v[:1], v.shape[0], axis=0)], axis=0
            )
            return (
                jax.tree.map(g2, cache),
                g1(code), g1(stop), g1(tl), g1(cl), g1(ast), g1(spk),
            )

        self._grow = jax.jit(_grow)

        # device-resident latent history (r5): each chunk's VALID latents are
        # scattered into a per-row [H_max, C] buffer at that row's write
        # offset; emission windows are sliced out ON DEVICE. The old path
        # bounced latents through host numpy every chunk (3 host↔device
        # round-trips); now the host fetches only (valid, stopped) per chunk
        # and one waveform per emission group. Invalid/budget-capped steps
        # store zeros, and unwritten history IS zeros — so tail windows read
        # exactly the zero-padding the single-stream path applies.
        # `hist` stays at a FIXED B_max+1 rows for the pool's lifetime (it is
        # tiny — ~9 MB at full size): each request owns one persistent row
        # (allocator in _serve_round_inner), the last row is a trash target
        # for dead/pad slots, and NO emission/store program shape depends on
        # the current cache batch size. Without this, emit programs keyed by
        # (group size, live batch size) compiled mid-traffic — an open-loop
        # run spent minutes inside XLA (measured p50 ~207 s from exactly
        # that); with it the warmup ladder covers every reachable shape.
        def _store(hist, lats, valid, offsets, allowed, rows):
            import jax.numpy as jnp

            mask = valid & (jnp.arange(lats.shape[1])[None] < allowed[:, None])
            latsm = lats * mask[:, :, None].astype(lats.dtype)
            sub = hist[rows]

            def put(h, l, o):
                return jax.lax.dynamic_update_slice(h, l, (o, 0))

            sub = jax.vmap(put)(sub, latsm, offsets)
            return hist.at[rows].set(sub)

        self._store = jax.jit(_store, donate_argnums=(0,))
        self._emit_fns = {}
        self._chunk_fns = {}
        self._in: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._closed = False
        self._stop = False
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
        `max_new_tokens` — the row frees its slot once it hits the cap, so
        one short request doesn't ride a long round to the end."""
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

    # ---------------------------------------------------------------- warmup
    def warmup(self, n_text: int = 30, width: int = None, verbose: bool = False):
        """Compile the FULL serving program ladder up front: prefill / chunk /
        store / emission / admission-splice / growth / compaction programs at
        every power-of-two batch size the pool can reach. Without this, a
        cold server pays each compile the first time live traffic hits that
        shape — an open-loop measurement (or a production cold start) then
        spends its first minutes inside XLA instead of serving (observed:
        p50 first-chunk ~59 s on a cold v5e tunnel vs ~0.2 s warm). All
        programs land in the persistent compile cache, so later processes
        warm in seconds."""
        import sys as _sys
        import time as _time

        import jax.numpy as jnp

        from tpu_tts.utils.generic_utils import bucket_len

        m = self.model
        a = m.args
        t0 = _time.monotonic()
        bucket = bucket_len(n_text, m.TEXT_BUCKET, cap=a.gpt_max_text_tokens + 2)
        W = int(width or a.num_cond_latents)
        dt = self._jax.tree_util.tree_leaves(m.params)[0].dtype
        C = int(a.gpt_n_model_channels)
        H_max = self.max_new_tokens + self.chunk
        ladder, b = [], 1
        while b <= self.max_streams:
            ladder.append(b)
            b *= 2
        B_MAX = _pow2_ceil(self.max_streams)
        hist = jnp.zeros((B_MAX + 1, H_max, C), dt)  # FIXED shape, like serving
        d_spk = int(a.d_vector_dim)
        for B in ladder:
            text = jnp.ones((B, bucket), jnp.int32)
            tl = jnp.full((B,), min(n_text, bucket), jnp.int32)
            cond = jnp.zeros((B, W, C), dt)
            cl = jnp.full((B,), W, jnp.int32)
            spk = jnp.zeros((B, d_spk), dt)
            cache, plen, code = self._pf(m.params, cond, text, tl, cl)
            stopped = jnp.zeros((B,), bool)
            ast = jnp.zeros((B,), jnp.int32)
            rng = self._jax.random.PRNGKey(0)
            i0 = 0
            for size in (self.first_chunk, self.chunk):
                (cache, code, stopped, rng), (codes, lats, valid) = self._chunk_fn(size, W)(
                    m.params, cache, plen, code, stopped, rng, jnp.int32(i0), tl, cl, ast
                )
                hist = self._store(
                    hist, lats, valid, jnp.zeros((B,), jnp.int32),
                    jnp.full((B,), size, jnp.int32),
                    jnp.asarray(list(range(B)), jnp.int32),
                )
                i0 += size
            rows = jnp.zeros((B,), jnp.int32)
            for esize, first in ((self.first_chunk, True), (self.chunk, False)):
                eptrs = jnp.full((B,), 0 if first else self.first_chunk, jnp.int32)
                self._emit_fn(B, esize, first)(
                    m.params, hist, rows, eptrs, jnp.zeros((B, d_spk), dt)
                ).block_until_ready()
            # growth (B -> 2B), compaction (B -> B/2) and rebase programs
            cache, ast = self._rebase(cache, ast, plen, jnp.int32(0))
            self._grow(cache, code, stopped, tl, cl, ast, spk)
            self._gather_rows(cache, code, stopped, tl, cl, ast, spk,
                              jnp.asarray([0] * max(1, B // 2), jnp.int32))
            # admission splices: every newcomer power-of-two k into batch B
            # (fresh prefill per k — the chunk programs donated the earlier
            # caches, so saved references would be dead buffers)
            for k in [x for x in ladder if x <= B]:
                ncache, _np, _nc = self._pf_for(W + bucket)(
                    m.params, jnp.zeros((k, W, C), dt), jnp.ones((k, bucket), jnp.int32),
                    jnp.full((k,), min(n_text, bucket), jnp.int32),
                    jnp.full((k,), W, jnp.int32),
                )
                ncode = jnp.zeros((k,), jnp.int32)
                (cache, hist, code, stopped, tl, cl, ast, spk) = self._splice(
                    cache, ncache, hist, code, ncode, stopped, tl,
                    jnp.ones((k,), jnp.int32), cl, jnp.full((k,), W, jnp.int32),
                    ast, spk, jnp.zeros((k, d_spk), dt),
                    jnp.asarray(list(range(k)), jnp.int32),
                    jnp.asarray(list(range(k)), jnp.int32), jnp.int32(i0),
                )
            if verbose:
                print(f"[pool.warmup] B={B} done at {_time.monotonic()-t0:.1f}s",
                      file=_sys.stderr, flush=True)
        # one REAL dry round through the serving path, INCLUDING a mid-round
        # admission: the raw-program ladder above leaves large one-time
        # first-execution costs on the first live round and the first
        # admission splice (measured 44.6 s and 11.4 s on a v5e tunnel —
        # program load/device residency, not compilation); exercising both
        # here means the first real request is served at steady-state speed
        rng = np.random.default_rng(0)

        def _submit_dry(budget):
            return self.submit(
                text_tokens=rng.integers(
                    1, max(2, int(a.gpt_number_text_tokens) - 1), (min(n_text, bucket),)
                ).astype(np.int32),
                gpt_cond_latent=np.zeros((1, W, C), np.float32),
                speaker_embedding=np.zeros((1, int(a.d_vector_dim)), np.float32),
                max_tokens=budget,
            )

        half = max(1, self.max_streams // 2)
        its = [_submit_dry(self.first_chunk + 3 * self.chunk) for _ in range(half)]
        next(iter(its[0]))  # round is live — the rest arrive mid-round
        its += [_submit_dry(self.first_chunk + self.chunk)
                for _ in range(self.max_streams - half)]
        for it in its:
            for _ in it:
                pass
        if verbose:
            print(f"[pool.warmup] dry round done at {_time.monotonic()-t0:.1f}s",
                  file=_sys.stderr, flush=True)
        return _time.monotonic() - t0

    # ---------------------------------------------------------------- worker
    def _chunk_fn(self, n_steps: int, n_cond: int):
        key = (n_steps, n_cond)
        if key not in self._chunk_fns:
            jax, XttsNet, model = self._jax, self._net_cls, self.model
            # donated KV cache: avoids a 128 MB-per-stream copy every chunk
            # (see models/xtts.py chunk_fn)
            self._chunk_fns[key] = jax.jit(
                lambda p, cache, pl, code, stop, r, i0, tl, cl, ast: model.net.apply(
                    {"params": p}, cache, pl, code, stop, r, i0,
                    n_steps, self.temperature, self.top_k, tl, n_cond, cl, ast,
                    method=XttsNet.stream_chunk,
                ),
                donate_argnums=(1,),
            )
        return self._chunk_fns[key]

    def _emit_fn(self, k: int, esize: int, first: bool):
        """Batched device-side emission: gather `k` rows' decode windows
        (overlap context + `esize` latents, zeros where unwritten) out of the
        device history buffer and decode them in one call."""
        key = (k, esize, first)
        if key not in self._emit_fns:
            jax, XttsNet, model = self._jax, self._net_cls, self.model
            ovl = self.overlap
            L = esize if (first or not ovl) else ovl + esize

            def run(p, hist, rows, eptrs, spk_g):
                h = hist[rows]  # [k, H_max, C]

                def win(hr, e):
                    start = e if first else e - ovl
                    return jax.lax.dynamic_slice(hr, (start, 0), (L, hr.shape[1]))

                x = jax.vmap(win)(h, eptrs)
                # spk_g is the PER-GROUP [k, d] speaker batch built on host
                # from each request's own embedding — indexing the round's
                # [B, d] array here would couple this program's shape to the
                # live batch size and reintroduce the compile explosion
                wav = model.net.apply(
                    {"params": p}, x, spk_g, method=XttsNet.decode_latents
                )
                return wav[:, :, 0]

            self._emit_fns[key] = jax.jit(run)
        return self._emit_fns[key]

    def _bucket(self, req: _Request) -> int:
        """Same grid as the single-stream path (Xtts._bucket_text)."""
        from tpu_tts.utils.generic_utils import bucket_len

        m = self.model
        return bucket_len(req.text_tokens.shape[0], m.TEXT_BUCKET,
                          cap=m.args.gpt_max_text_tokens + 2)

    def _width(self, req: _Request) -> int:
        """Conditioning width, bucketed to the model's latent-count grid
        (multi-reference speakers stack k x num_cond_latents latents,
        ref xtts.py:326 get_conditioning_latents)."""
        from tpu_tts.utils.generic_utils import bucket_len

        w0 = int(self.model.args.num_cond_latents)
        return bucket_len(int(np.asarray(req.cond).shape[1]), w0)

    def _budget(self, req: _Request) -> int:
        return min(req.max_tokens or self.max_new_tokens, self.max_new_tokens)

    # ------------------------------------------------------------- main loop
    def _drain(self, pending: List[_Request], timeout: float = 0.0):
        """Move queued arrivals into `pending`; flips `_stop` on shutdown."""
        deadline = time.monotonic() + timeout
        while True:
            t = deadline - time.monotonic()
            try:
                req = self._in.get(timeout=t) if t > 0 else self._in.get_nowait()
            except queue.Empty:
                return
            if req is None:
                self._stop = True
                return
            pending.append(req)

    def _select_round(self, pending: List[_Request]):
        """Pick the next round's batch: the oldest request — or a starved one
        past `max_deferrals` — seeds it, joined by every same-bucket request
        (the round's cond width is the max width bucket among them)."""
        seed = next((r for r in pending if r.deferrals >= self.max_deferrals), pending[0])
        bucket = self._bucket(seed)
        batch = [seed] + [
            r for r in pending if r is not seed and self._bucket(r) == bucket
        ][: self.max_streams - 1]
        for r in pending:
            if r not in batch:
                r.deferrals += 1
        return [r for r in pending if r not in batch], batch, bucket

    def _run(self):
        import jax.numpy as jnp

        pending: List[_Request] = []
        while True:
            if self._stop:
                self._drain(pending)  # requests still queued must not strand
                for r in pending:
                    r.out.put(None)
                return
            if not pending:
                req = self._in.get()  # block until there is work
                if req is None:
                    self._stop = True
                    continue
                pending.append(req)
            self._drain(pending, timeout=self.gather_window_s)
            if not pending:
                continue
            pending, batch, bucket = self._select_round(pending)
            self._serve_round(batch, bucket, pending, jnp)

    # ------------------------------------------------------------- one round
    def _prefill_batch(self, reqs: List[_Request], B: int, bucket: int, W: int, jnp,
                       cache_len: int = None):
        """Right-pad `reqs` to a [B, bucket] text / [B, W] cond batch
        (padding slots replicate row 0 — they are masked and marked done)
        and run the shared prefill program. Returns device state."""
        model = self.model
        n = len(reqs)
        pad = lambda r: np.pad(r.text_tokens, (0, bucket - r.text_tokens.shape[0]))
        text = np.stack([pad(reqs[i if i < n else 0]) for i in range(B)])
        text_lengths = np.array(
            [reqs[i if i < n else 0].text_tokens.shape[0] for i in range(B)], dtype=np.int32
        )
        conds, cond_lengths, spks = [], [], []
        for i in range(B):
            r = reqs[i if i < n else 0]
            c = np.asarray(r.cond, dtype=np.float32)[0]  # [w, C]
            cond_lengths.append(c.shape[0])
            conds.append(np.pad(c, ((0, W - c.shape[0]), (0, 0))))
            spks.append(np.asarray(r.spk, dtype=np.float32).reshape(-1))
        # match the parameter dtype: host-side repacking must not promote a
        # bf16 model's prefill to f32 (the KV cache dtype follows the params)
        dt = self._jax.tree_util.tree_leaves(model.params)[0].dtype
        cond = jnp.asarray(np.stack(conds), dtype=dt)
        spk = jnp.asarray(np.stack(spks), dtype=dt)
        text_lengths = jnp.asarray(text_lengths)
        cond_lengths = jnp.asarray(np.array(cond_lengths, dtype=np.int32))
        cache, prompt_len, code = self._pf_for(cache_len)(
            model.params, cond, jnp.asarray(text), text_lengths, cond_lengths
        )
        return cache, prompt_len, code, text_lengths, cond_lengths, spk

    def _serve_round(self, batch, bucket, pending, jnp):
        self.rounds_served += 1
        all_reqs = list(batch)
        closed = set()

        def close(req, err=None):
            if id(req) not in closed:
                closed.add(id(req))
                if err is not None:
                    req.out.put(err)
                req.out.put(None)

        try:
            self._serve_round_inner(batch, bucket, pending, jnp, all_reqs, close)
        except Exception as e:  # surface the error to every caller in the round
            for req in all_reqs:
                close(req, err=e)

    def _serve_round_inner(self, batch, bucket, pending, jnp, all_reqs, close):
        model = self.model
        W = max(self._width(r) for r in batch)
        B = _pow2_ceil(len(batch))
        slots: List[Optional[_Request]] = list(batch) + [None] * (B - len(batch))
        cache, prompt_len, code, text_lengths, cond_lengths, spk = self._prefill_batch(
            batch, B, bucket, W, jnp
        )
        stopped = jnp.asarray(np.array([s is None for s in slots]))
        audio_start = jnp.zeros((B,), dtype=jnp.int32)
        rng = self._jax.random.PRNGKey(self.seed)
        # capacity of the shared absolute timeline: admission must not
        # truncate a newcomer's budget, so a request only joins while its
        # full budget still fits (audio positions are per-row RELATIVE, so
        # only the cache length binds, not the position-embedding table)
        cache_cap = int(model.args.kv_cache_len) - (W + bucket)
        # device latent history: FIXED B_max+1 rows (one persistent row per
        # request, last row = trash for dead/pad slots) so no emission/store
        # program shape depends on the live batch size; +chunk headroom keeps
        # every emission window in-bounds (dynamic_slice clamps, and a
        # clamped start would misalign windows)
        dt = self._jax.tree_util.tree_leaves(model.params)[0].dtype
        C = int(model.args.gpt_n_model_channels)
        H_max = self.max_new_tokens + self.chunk
        B_MAX = _pow2_ceil(self.max_streams)
        hist_dev = jnp.zeros((B_MAX + 1, H_max, C), dt)
        hist_free = list(range(B_MAX))
        hrow = {}  # id(req) -> its persistent history row

        # host-side per-request bookkeeping
        done, eptr, emitted, budget, first_emit = {}, {}, {}, {}, {}

        def track(req):
            all_reqs.append(req)
            done[id(req)] = False
            eptr[id(req)] = 0  # latents emitted (decoded to audio) so far
            emitted[id(req)] = 0  # valid latents stored so far
            budget[id(req)] = self._budget(req)
            first_emit[id(req)] = True  # next emission is this row's first chunk
            hrow[id(req)] = hist_free.pop()

        for r in batch:
            track(r)

        i0 = 0
        while True:
            _t0 = time.monotonic()
            just_admitted = False
            # ---- admission: splice compatible queued requests into free slots
            if self.admit_mid_round and not self._stop:
                self._drain(pending)
                adm0 = self.admissions
                (cache, hist_dev, code, stopped, text_lengths, cond_lengths,
                 audio_start, spk, slots) = self._admit(
                    pending, slots, bucket, W, i0, cache_cap,
                    cache, hist_dev, code, stopped, text_lengths, cond_lengths,
                    audio_start, spk, track, done, hrow, jnp,
                )
                just_admitted = self.admissions > adm0
            live = [s for s in slots if s is not None and not done[id(s)]]
            if not live:
                break
            # a small chunk right after an admission gets the newcomers'
            # first audio out in first_chunk steps instead of a full chunk —
            # emission is per-row phase-aligned, so the GPT chunk size is
            # free to vary without touching any row's output cadence
            size = self.first_chunk if (i0 == 0 or just_admitted) else self.chunk
            if i0 + size > cache_cap:
                shift = i0 - self._w_keep
                if shift <= 0:
                    break  # cache shorter than one budget window: drain
                # rebase the shared timeline instead of draining the round:
                # every live row's relative history fits in W_keep rows
                cache, audio_start = self._rebase(
                    cache, audio_start, prompt_len, jnp.int32(shift)
                )
                i0 = self._w_keep
            _t1 = time.monotonic()
            (cache, code, stopped, rng), (codes, lats, valid) = self._chunk_fn(size, W)(
                model.params, cache, prompt_len, code, stopped, rng,
                jnp.int32(i0), text_lengths, cond_lengths, audio_start,
            )
            _t2 = time.monotonic()
            # store each row's budget-capped valid latents at its own offset
            # (dead/pad rows get allowed=0 — they store only zeros); latents
            # past a row's budget never reach a decode window (their conv
            # receptive field would leak into the valid samples)
            offsets = np.array([emitted.get(id(s), 0) if s is not None else 0
                                for s in slots], np.int32)
            allowed = np.array([
                max(0, budget[id(s)] - emitted[id(s)])
                if s is not None and not done[id(s)] else 0
                for s in slots
            ], np.int32)
            hrows = np.array([
                hrow[id(s)] if s is not None and not done[id(s)] else B_MAX
                for s in slots
            ], np.int32)
            hist_dev = self._store(
                hist_dev, lats, valid, jnp.asarray(offsets), jnp.asarray(allowed),
                jnp.asarray(hrows),
            )
            _t3 = time.monotonic()
            # ONE host fetch per chunk (the old path pulled the full latent
            # block through numpy: 3 transfers per chunk)
            valid_h, stopped_np = self._jax.device_get((valid, stopped))
            valid_h = np.asarray(valid_h, dtype=bool)
            _t4 = time.monotonic()
            newly_done = []
            for i, req in enumerate(slots):
                if req is None or done[id(req)]:
                    continue
                nv = min(int(valid_h[i].sum()), int(allowed[i]))
                emitted[id(req)] += nv
                if nv < size or bool(stopped_np[i]) or emitted[id(req)] >= budget[id(req)]:
                    done[id(req)] = True
                    newly_done.append(req)
            _t5 = time.monotonic()
            self._emit(slots, done, emitted, eptr, first_emit, hist_dev, hrow, spk, jnp)
            if _TRACE:
                import sys as _sys
                print(f"[pool.trace] i0={i0} B={len(slots)} size={size} "
                      f"admit={_t1-_t0:.3f} chunk_disp={_t2-_t1:.3f} "
                      f"store={_t3-_t2:.3f} fetch={_t4-_t3:.3f} "
                      f"emit={time.monotonic()-_t5:.3f} total={time.monotonic()-_t0:.3f}",
                      file=_sys.stderr, flush=True)
            for req in newly_done:
                close(req)  # tail (if any) was just emitted above
                hist_free.append(hrow[id(req)])  # row reusable by admissions
            i0 += size
            live_idx = [i for i, s in enumerate(slots) if s is not None and not done[id(s)]]
            if not live_idx:
                if self.admit_mid_round and not self._stop and (pending or not self._in.empty()):
                    continue  # the round stays open for same-bucket admission
                break
            # ---- compaction: drop dead rows once half the batch has finished
            # (skipped while admission traffic could reuse those slots)
            if (
                self.compact and len(slots) > 1 and len(live_idx) <= len(slots) // 2
                and not (self.admit_mid_round and (pending or not self._in.empty()))
            ):
                newB = len(slots) // 2
                while newB // 2 >= len(live_idx):
                    newB //= 2
                dead_idx = [i for i in range(len(slots)) if i not in live_idx]
                idx = (live_idx + dead_idx)[:newB]
                (cache, code, stopped, text_lengths, cond_lengths,
                 audio_start, spk) = self._gather_rows(
                    cache, code, stopped, text_lengths, cond_lengths,
                    audio_start, spk, jnp.asarray(idx, jnp.int32),
                )
                slots = [slots[i] for i in idx]
        # flush buffered tails of truncated rows, then close every stream
        self._emit(slots, done, emitted, eptr, first_emit, hist_dev, hrow, spk, jnp,
                   flush=True)
        for req in all_reqs:
            close(req)

    # -------------------------------------------------------------- admission
    def _admit(self, pending, slots, bucket, W, i0, cache_cap,
               cache, hist, code, stopped, text_lengths, cond_lengths,
               audio_start, spk, track, done, hrow, jnp):
        """Splice compatible pending requests into the live round at absolute
        step `i0`. Slots of finished rows are reused; the batch grows in
        power-of-two steps when no slot is free (bounded by max_streams)."""
        n_live = sum(1 for s in slots if s is not None and not done[id(s)])
        ok = [
            r for r in pending
            if self._bucket(r) == bucket and self._width(r) <= W
            and self._budget(r) + i0 <= cache_cap
        ][: self.max_streams - n_live]
        if not ok:
            return cache, hist, code, stopped, text_lengths, cond_lengths, audio_start, spk, slots
        free = [i for i, s in enumerate(slots) if s is None or done[id(s)]]
        # grow the batch (power-of-two steps) until the newcomers fit
        while len(free) < len(ok) and len(slots) < _pow2_ceil(self.max_streams):
            B_old = len(slots)
            (cache, code, stopped, text_lengths, cond_lengths,
             audio_start, spk) = self._grow(
                cache, code, stopped, text_lengths, cond_lengths,
                audio_start, spk,
            )
            slots = slots + [None] * B_old
            free += list(range(B_old, 2 * B_old))
        take = ok[: len(free)]
        if not take:
            return cache, hist, code, stopped, text_lengths, cond_lengths, audio_start, spk, slots
        for r in take:
            pending.remove(r)
        slot_idx = free[: len(take)]
        k = len(take)
        ncache, _nplen, ncode, ntl, ncl, nspk = self._prefill_batch(
            take, _pow2_ceil(k), bucket, W, jnp, cache_len=W + bucket
        )
        for s_i, r in zip(slot_idx, take):
            slots[s_i] = r
            track(r)  # allocates r's history row (hrow)
        # pad the splice to the prefill's power-of-two batch so its program
        # shape never depends on the raw newcomer count (an odd k would
        # compile mid-traffic — measured as a 9 s admission stall). Pad
        # entries repeat slot 0: the prefill's pad rows replicate request 0,
        # so the duplicate writes are idempotent.
        k_p2 = _pow2_ceil(k)
        slots_pad = slot_idx + [slot_idx[0]] * (k_p2 - k)
        hr = [hrow[id(r)] for r in take]
        nhrows = jnp.asarray(hr + [hr[0]] * (k_p2 - k), jnp.int32)
        (cache, hist, code, stopped, text_lengths, cond_lengths, audio_start,
         spk) = self._splice(
            cache, ncache, hist, code, ncode, stopped, text_lengths, ntl,
            cond_lengths, ncl, audio_start, spk, nspk,
            jnp.asarray(slots_pad, jnp.int32), nhrows, jnp.int32(i0),
        )
        self.admissions += k
        return cache, hist, code, stopped, text_lengths, cond_lengths, audio_start, spk, slots

    # --------------------------------------------------------------- emission
    def _emit(self, slots, done, emitted, eptr, first_emit, hist_dev, hrow, spk, jnp,
              flush=False):
        """Phase-aligned audio emission: each row emits its stored valid
        latents in its own [first_chunk, chunk, ...] cadence with the same
        overlap-context decode the single-stream path uses, so every pooled
        stream matches its solo `inference_stream` output chunk for chunk.
        Decode windows are sliced out of the DEVICE history buffer — rows
        sharing an emission shape decode in ONE batched call, and the only
        host transfer per group is the waveform itself. Chunks are delivered
        to each request strictly in order."""
        model = self.model
        plans = []  # (slot_i, req, esize, n_emit, is_first, seg_start)
        for i, req in enumerate(slots):
            if req is None:
                continue
            while True:
                buffered = emitted[id(req)] - eptr[id(req)]
                esize = self.first_chunk if first_emit[id(req)] else self.chunk
                if buffered >= esize:
                    n_emit = esize
                elif (done[id(req)] or flush) and buffered > 0:
                    n_emit = buffered  # tail: the zeros past it ARE the pad
                else:
                    break
                plans.append((i, req, esize, n_emit, first_emit[id(req)], eptr[id(req)]))
                eptr[id(req)] += n_emit
                first_emit[id(req)] = False
        if not plans:
            return
        # group by decode shape: (emit size, first chunk or overlap context),
        # run one batched decode per group, then deliver in plan order
        groups = {}
        for pi, plan in enumerate(plans):
            groups.setdefault((plan[2], plan[4]), []).append(pi)
        wavs = [None] * len(plans)
        dt = hist_dev.dtype
        d_spk = int(model.args.d_vector_dim)
        for (esize, is_first), idxs in groups.items():
            Bg = _pow2_ceil(len(idxs))
            rows = np.zeros((Bg,), np.int32)
            eptrs = np.zeros((Bg,), np.int32)
            spk_g = np.zeros((Bg, d_spk), np.float32)
            for g, pi in enumerate(idxs):
                rows[g] = hrow[id(plans[pi][1])]
                eptrs[g] = plans[pi][5]
                spk_g[g] = np.asarray(plans[pi][1].spk, np.float32).reshape(-1)
            wav = np.asarray(self._emit_fn(Bg, esize, is_first)(
                model.params, hist_dev, jnp.asarray(rows), jnp.asarray(eptrs),
                jnp.asarray(spk_g, dtype=dt),
            ), dtype=np.float32)
            lead = 0 if is_first else model._n_samples(self.overlap)
            for g, pi in enumerate(idxs):
                n_emit = plans[pi][3]
                wavs[pi] = wav[g, lead : lead + model._n_samples(n_emit)]
        for pi, (_i, req, _esize, _n, _f, _p) in enumerate(plans):
            req.out.put(wavs[pi])


def jnp_take(a, idx, axis):
    import jax.numpy as jnp

    return jnp.take(a, idx, axis=axis)


def jnp_int0():
    import jax.numpy as jnp

    return jnp.int32(0)
