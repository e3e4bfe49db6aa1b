"""Trace the full-size XTTS streaming decode chunk (stream_chunk, 20 steps)
and print the per-kernel roofline — the multistream bench showed per-chunk
time scaling LINEARLY with batch (193 ms at B=1 → 8086 ms at B=32), i.e.
the decode runs ~100x below the weight-streaming bound. Find the culprit.

Usage: python scripts/profile_xtts_decode.py [outdir] [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xtts_decode_trace"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
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
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    model.params = params
    a = model.args
    print(f"kv_cache_len={a.kv_cache_len} layers={a.gpt_layers} width={a.gpt_n_model_channels}",
          file=sys.stderr)

    rng0 = np.random.default_rng(0)
    text = jnp.asarray(rng0.integers(1, 200, (B, 30)), dtype=jnp.int32)
    cond = jnp.asarray(rng0.standard_normal((B, a.num_cond_latents, a.gpt_n_model_channels)) * 0.02,
                       jnp.bfloat16)

    pf = jax.jit(lambda p, c, t: model.net.apply({"params": p}, c, t, method=XttsNet.stream_prefill))
    chunk = 20
    ck = jax.jit(
        lambda p, cache, pl, code, stop, r, i0: model.net.apply(
            {"params": p}, cache, pl, code, stop, r, i0, chunk, 0.75, 50,
            method=XttsNet.stream_chunk,
        ),
        donate_argnums=(1,),
    )

    cache, pl, code = pf(model.params, cond, text)
    stopped = jnp.zeros((B,), dtype=bool)
    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    (cache, code, stopped, rng), outs = ck(model.params, cache, pl, code, stopped, rng, jnp.int32(0))
    jax.block_until_ready(outs)
    print(f"compile+warmup {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        (cache, code, stopped, rng), outs = ck(
            model.params, cache, pl, code, stopped, rng, jnp.int32((i + 1) * chunk)
        )
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
    per_chunk = float(np.median(times))
    print(f"B={B}: per-chunk ({chunk} steps) {per_chunk*1e3:.1f} ms -> {per_chunk/chunk*1e3:.2f} ms/step")

    os.makedirs(outdir, exist_ok=True)
    jax.profiler.start_trace(outdir)
    for i in range(2):
        (cache, code, stopped, rng), outs = ck(
            model.params, cache, pl, code, stopped, rng, jnp.int32((10 + i) * chunk)
        )
    jax.block_until_ready(outs)
    jax.profiler.stop_trace()

    from tpu_tts.utils.roofline import profile_report

    profile_report(outdir, top=25)


if __name__ == "__main__":
    main()
