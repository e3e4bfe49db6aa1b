"""Trace the full-size VITS e2e inference iteration (bench.py's rtf stage
shapes: B=128, Y=768, bf16) with jax.profiler and print the roofline report
(`tpu_tts.utils.roofline`) — where the non-decoder time goes.

Usage: python scripts/profile_vits_infer.py [outdir]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vits_infer_trace"
    import jax
    import jax.numpy as jnp

    from tpu_tts.configs.vits_config import VitsConfig
    from tpu_tts.models.vits import Vits, VitsNet

    cfg = VitsConfig()
    cfg.model_args.num_chars = 165
    model = Vits(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = jax.device_get(model.init_params(jax.random.PRNGKey(0)))
    if os.environ.get("BENCH_DTYPE", "bf16") == "bf16":
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if hasattr(a, "dtype") and a.dtype == np.float32 else a,
            params,
        )
    params = jax.device_put(params, jax.devices()[0])

    B, T_en, Y_MAX = int(os.environ.get("BENCH_BATCH", "128")), 128, 768
    x = jnp.asarray(np.random.default_rng(0).integers(1, 160, (B, T_en)), dtype=jnp.int32)
    xl = jnp.full((B,), T_en, dtype=jnp.int32)

    fn = jax.jit(
        lambda p, xi, xli, rng: model.net.apply(
            {"params": p}, xi, xli, Y_MAX,
            method=VitsNet.inference,
            rngs={"noise": rng, "sdp": jax.random.fold_in(rng, 1)},
        )["model_outputs"]
    )
    g = params["generator"]
    t0 = time.perf_counter()
    out = fn(g, x, xl, jax.random.PRNGKey(0))
    out.block_until_ready()
    print(f"compile+warmup {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    os.makedirs(outdir, exist_ok=True)
    jax.profiler.start_trace(outdir)
    for i in range(3):
        out = fn(g, x, xl, jax.random.PRNGKey(i + 1))
    out.block_until_ready()
    jax.profiler.stop_trace()
    print(f"trace written to {outdir}", file=sys.stderr)

    from tpu_tts.utils.roofline import profile_report

    profile_report(outdir)


if __name__ == "__main__":
    main()
