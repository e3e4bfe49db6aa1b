"""Validate the fused Pallas MRF decoder on the real TPU chip.

Builds a full-size HiFi-GAN v1 generator (VITS decoder config: 192 in-ch,
512 initial, upsample 8x8x2x2), runs the XLA path and the Pallas path on the
same input at bench shapes, and reports numeric agreement + per-call timing.

Run (long first Mosaic compile through the axon tunnel — budget >= 45 min):
    timeout 5400 python scripts/tpu_validate_pallas_decoder.py
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from tpu_tts.parallel.platform import maybe_enable_compile_cache

    maybe_enable_compile_cache()
    import jax.numpy as jnp

    from tpu_tts.ops.hifigan_pallas import hifigan_apply_pallas
    from tpu_tts.vocoder.models.hifigan_generator import HifiganGenerator

    B = int(os.environ.get("VAL_BATCH", "128"))
    Y = int(os.environ.get("VAL_FRAMES", "768"))
    dtype = jnp.bfloat16 if os.environ.get("VAL_DTYPE", "bf16") == "bf16" else jnp.float32

    gen = HifiganGenerator(
        in_channels=192,
        out_channels=1,
        resblock_type="1",
        resblock_dilation_sizes=[[1, 3, 5]] * 3,
        resblock_kernel_sizes=[3, 7, 11],
        upsample_kernel_sizes=[16, 16, 4, 4],
        upsample_initial_channel=512,
        upsample_factors=[8, 8, 2, 2],
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        z0 = jnp.zeros((1, 32, 192), dtype=jnp.float32)
        params = gen.init(jax.random.PRNGKey(0), z0)["params"]
        z = jnp.asarray(
            np.random.default_rng(0).standard_normal((B, Y, 192)) * 0.7, dtype=jnp.float32
        )
    dev = jax.devices()[0]
    print(f"[val] device: {dev}", file=sys.stderr, flush=True)
    params = jax.device_put(
        jax.tree_util.tree_map(lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params),
        dev,
    )
    z = jax.device_put(z.astype(dtype), dev)

    kw = dict(
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3,
        upsample_factors=(8, 8, 2, 2),
    )
    fn_xla = jax.jit(lambda p, x: gen.apply({"params": p}, x))
    fn_pal = jax.jit(lambda p, x: hifigan_apply_pallas(p, x, None, **kw))

    results = {"B": B, "Y": Y, "dtype": str(dtype.__name__)}
    for name, fn in [("xla", fn_xla), ("pallas", fn_pal)]:
        print(f"[val] compiling {name}...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        out = fn(params, z)
        head = np.asarray(out[:, :8, 0], dtype=np.float32)
        ct = time.perf_counter() - t0
        print(f"[val] {name} compile+run {ct:.1f}s finite={np.isfinite(head).all()}",
              file=sys.stderr, flush=True)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(params, z)
            _ = np.asarray(out[:, :8, 0])
            times.append(time.perf_counter() - t0)
        results[name + "_s"] = round(float(np.median(times)), 4)
        results[name + "_compile_s"] = round(ct, 1)
        if name == "xla":
            ref_np = np.asarray(out, dtype=np.float32)
        else:
            got_np = np.asarray(out, dtype=np.float32)

    diff = np.abs(ref_np - got_np)
    results["max_abs_diff"] = float(diff.max())
    results["mean_abs_diff"] = float(diff.mean())
    results["ref_rms"] = float(np.sqrt((ref_np**2).mean()))
    results["speedup_xla_over_pallas"] = round(results["xla_s"] / results["pallas_s"], 3)
    print(json.dumps(results))
    with open("/tmp/pallas_tpu_validation.json", "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    main()
