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

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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


def main():
    print(json.dumps(measure()))


if __name__ == "__main__":
    main()
