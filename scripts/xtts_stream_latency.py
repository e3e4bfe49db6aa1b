"""Measure XTTS streaming first-chunk latency on the current accelerator.

Reference headline: "<200 ms streaming latency" (/root/reference/README.md:5,
docs/source/models/xtts.md:14). Architecture-level measurement: full-size
XTTS-v2 graph (30-layer/1024ch GPT, HiFi-GAN decoder) with random weights —
latency depends on the program, not the weight values. Reports steady-state
(post-compile) time from text arrival to the first audio chunk, and the
per-chunk cadence after that.

Usage: python scripts/xtts_stream_latency.py  (TPU by default; honours
TPU_TTS_PLATFORM=cpu for a smoke run)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(iters: int = None) -> dict:
    """Build the full-size XTTS streaming graph and measure first-chunk
    latency + cadence; returns the metrics dict (also used by bench.py)."""
    from tpu_tts.parallel import maybe_force_platform

    maybe_force_platform()
    import jax
    import jax.numpy as jnp

    from tpu_tts.parallel.platform import maybe_enable_compile_cache

    maybe_enable_compile_cache()

    from tpu_tts.configs.xtts_config import XttsConfig
    from tpu_tts.models.xtts import Xtts

    cfg = XttsConfig()
    model = Xtts(cfg)
    t0 = time.perf_counter()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])
    if os.environ.get("BENCH_DTYPE", "bf16") == "bf16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
        )
    model.params = params
    print(f"[lat] init {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    a = model.args
    n_text = int(os.environ.get("LAT_TEXT_TOKENS", "30"))
    chunk = int(os.environ.get("LAT_CHUNK", "20"))
    model.bpe.encode = lambda text, lang: list(range(1, n_text + 1))
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((1, a.num_cond_latents, a.gpt_n_model_channels)) * 0.02,
                       jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32)
    spk = jnp.asarray(rng.standard_normal((1, a.d_vector_dim)) * 0.1, cond.dtype)

    def run(max_new_tokens=120):
        stream = model.inference_stream(
            "x", "en", gpt_cond_latent=cond, speaker_embedding=spk,
            stream_chunk_size=chunk, max_new_tokens=max_new_tokens,
        )
        t_start = time.perf_counter()
        marks = []
        for w in stream:
            marks.append((time.perf_counter() - t_start, len(w)))
        return marks

    print("[lat] compiling (prefill + chunk + decode programs)...", file=sys.stderr, flush=True)
    t_c = time.perf_counter()
    run(max_new_tokens=chunk * 2)
    print(f"[lat] compile+warmup {time.perf_counter()-t_c:.1f}s", file=sys.stderr, flush=True)

    firsts, cadences, steady_audio = [], [], []
    for _ in range(iters or int(os.environ.get("LAT_ITERS", "5"))):
        marks = run()
        firsts.append(marks[0][0])
        cadences += [marks[i][0] - marks[i - 1][0] for i in range(1, len(marks))]
        steady_audio += [n for _, n in marks[1:]]
    sr = a.output_sample_rate
    first_audio_ms = marks[0][1] / sr * 1e3
    steady_audio_s = float(np.median(steady_audio)) / sr if steady_audio else None
    return {
        "first_chunk_ms": round(float(np.median(firsts)) * 1e3, 1),
        "first_chunk_audio_ms": round(first_audio_ms, 1),
        "per_chunk_ms": round(float(np.median(cadences)) * 1e3, 1) if cadences else None,
        "chunk_audio_ms": round(steady_audio_s * 1e3, 1) if steady_audio_s else None,
        "rtf_steady": round(steady_audio_s / float(np.median(cadences)), 2) if cadences else None,
        "reference_target_ms": 200,
    }


def measure_multistream(batch_sizes=None, iters: int = None) -> dict:
    """Concurrent XTTS streams per chip (VERDICT r2 next-round #5a): run B
    streams in lockstep through the SAME prefill/chunk/decode programs the
    single-stream path uses, batched on the leading axis — the shape a
    batching serving frontend produces. Reports, per B: first-chunk latency
    and steady-state aggregate audio-seconds/s; plus the largest B whose
    first chunk still lands under the reference's 200 ms target."""
    from tpu_tts.parallel import maybe_force_platform

    maybe_force_platform()
    import jax
    import jax.numpy as jnp

    from tpu_tts.parallel.platform import maybe_enable_compile_cache

    maybe_enable_compile_cache()

    from tpu_tts.configs.xtts_config import XttsConfig
    from tpu_tts.models.xtts import Xtts, XttsNet

    cfg = XttsConfig()
    model = Xtts(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    if dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
        )
    model.params = params

    a = model.args
    n_text = int(os.environ.get("LAT_TEXT_TOKENS", "30"))
    chunk = int(os.environ.get("LAT_CHUNK", "20"))
    first_chunk = 8
    temperature, top_k = 0.75, 50
    iters = iters or int(os.environ.get("LAT_ITERS", "5"))
    # driver default kept small (each batch size compiles its own program set
    # through the tunnel); 16 is the measured <200 ms concurrency knee.
    # Sweep wider with LAT_BATCHES=1,4,8,16,32
    batch_sizes = batch_sizes or [
        int(b) for b in os.environ.get("LAT_BATCHES", "1,16").split(",")
    ]
    sr = a.output_sample_rate

    pf = jax.jit(
        lambda p, c, t, tl: model.net.apply({"params": p}, c, t, tl, method=XttsNet.stream_prefill)
    )
    dec = jax.jit(lambda p, l, s: model.net.apply({"params": p}, l, s, method=XttsNet.decode_latents))

    def chunk_fn(n_steps):
        # donated KV cache (models/xtts.py chunk_fn): without it each call
        # copies 128 MB x B of cache
        return jax.jit(
            lambda p, cache, pl, code, stop, r, i0, tl: model.net.apply(
                {"params": p}, cache, pl, code, stop, r, i0,
                n_steps, temperature, top_k, tl,
                method=XttsNet.stream_chunk,
            ),
            donate_argnums=(1,),
        )

    ck_first, ck_steady = chunk_fn(first_chunk), chunk_fn(chunk)
    rows = []
    rng0 = np.random.default_rng(0)
    for B in batch_sizes:
        # RANDOMIZED per-row text lengths padded to the n_text bucket — the
        # shape real mixed-length traffic produces through XttsStreamPool
        # (rows masked via text_lengths; VERDICT r3 #1c). LAT_FIXED_LEN=1
        # restores the equal-length round for A/B.
        text = jnp.asarray(rng0.integers(1, 200, (B, n_text)), dtype=jnp.int32)
        if os.environ.get("LAT_FIXED_LEN", "0") == "1":
            text_lengths = jnp.full((B,), n_text, dtype=jnp.int32)
        else:
            text_lengths = jnp.asarray(
                rng0.integers(max(1, n_text // 2), n_text + 1, (B,)), dtype=jnp.int32
            )
        cond = jnp.asarray(
            rng0.standard_normal((B, a.num_cond_latents, a.gpt_n_model_channels)) * 0.02, dtype
        )
        spk = jnp.asarray(rng0.standard_normal((B, a.d_vector_dim)) * 0.1, dtype)

        def one_stream_round(key):
            t0 = time.perf_counter()
            cache, pl, code = pf(model.params, cond, text, text_lengths)
            stopped = jnp.zeros((B,), dtype=bool)
            (cache, code, stopped, key), (codes, lats, valid) = ck_first(
                model.params, cache, pl, code, stopped, key, jnp.int32(0), text_lengths
            )
            wav = dec(model.params, lats, spk)
            np.asarray(wav[:, :4, 0])  # host sync = audio delivered
            t_first = time.perf_counter() - t0
            # steady chunks
            t1 = time.perf_counter()
            n_steady = 3
            for j in range(n_steady):
                (cache, code, stopped, key), (codes, lats, valid) = ck_steady(
                    model.params, cache, pl, code, stopped, key,
                    jnp.int32(first_chunk + j * chunk), text_lengths
                )
                wav = dec(model.params, lats, spk)
            np.asarray(wav[:, :4, 0])
            per_chunk = (time.perf_counter() - t1) / n_steady
            return t_first, per_chunk

        one_stream_round(jax.random.PRNGKey(0))  # compile
        firsts, chunks_t = [], []
        for i in range(iters):
            f, c = one_stream_round(jax.random.PRNGKey(i + 1))
            firsts.append(f)
            chunks_t.append(c)
        first_ms = float(np.median(firsts)) * 1e3
        per_chunk_s = float(np.median(chunks_t))
        chunk_audio_s = model._n_samples(chunk) / sr
        rows.append({
            "streams": B,
            "first_chunk_ms": round(first_ms, 1),
            "per_chunk_ms": round(per_chunk_s * 1e3, 1),
            "rtf_per_stream": round(chunk_audio_s / per_chunk_s, 2),
            "aggregate_audio_s_per_s": round(B * chunk_audio_s / per_chunk_s, 1),
        })
        print(f"[multi] {rows[-1]}", file=sys.stderr, flush=True)
    ok = [r for r in rows if r["first_chunk_ms"] < 200.0]
    best = max(ok, key=lambda r: r["streams"]) if ok else None
    return {
        "rows": rows,
        "max_streams_under_200ms": best["streams"] if best else 0,
        "aggregate_audio_s_per_s_at_max": best["aggregate_audio_s_per_s"] if best else None,
        "first_chunk_ms_at_max": best["first_chunk_ms"] if best else None,
    }


def main():
    if os.environ.get("LAT_MULTI"):
        print(json.dumps(measure_multistream()))
    else:
        print(json.dumps(measure()))


if __name__ == "__main__":
    main()
