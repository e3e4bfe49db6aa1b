"""Micro-bench: can int8 beat bf16 on the small-channel HiFi-GAN stages?

The C=32 stage of the XLA decoder runs at ~20% MFU (MXU output-row padding:
32 output channels vs 128 lanes). int8 doubles MXU rate; padding waste is
unchanged, so a ~2x win is the ceiling. Measures one MRF stage's worth of
convs at bench shapes in bf16 vs int8 (weights+activations int8, int32
accumulation, f32 rescale).

Run: timeout 1200 python scripts/tpu_int8_conv_microbench.py
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu_tts.parallel.platform import maybe_enable_compile_cache

    maybe_enable_compile_cache()

    B = 128
    results = {}
    for C, T in [(32, 196608), (64, 98304)]:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, T, C)) * 0.5, dtype=jnp.bfloat16)
        ks = [(3, 1), (3, 3), (3, 5), (7, 1), (7, 3), (7, 5), (11, 1), (11, 3), (11, 5)]
        ws = [jnp.asarray(rng.standard_normal((k, C, C)) * 0.1, dtype=jnp.bfloat16) for k, _ in ks]

        def stage_bf16(x, ws):
            h = x
            for (k, d), w in zip(ks, ws):
                pad = (k // 2) * d
                h = jax.lax.conv_general_dilated(
                    h, w, (1,), [(pad, pad)], rhs_dilation=(d,),
                    dimension_numbers=("NHC", "HIO", "NHC"),
                )
            return h

        def stage_int8(x, ws):
            h = x
            for (k, d), w in zip(ks, ws):
                pad = (k // 2) * d
                # dynamic per-tensor activation scale, per-outchannel weight scale
                s_a = jnp.max(jnp.abs(h)).astype(jnp.float32) / 127.0 + 1e-8
                q_a = jnp.clip(jnp.round(h.astype(jnp.float32) / s_a), -127, 127).astype(jnp.int8)
                s_w = jnp.max(jnp.abs(w).astype(jnp.float32), axis=(0, 1)) / 127.0 + 1e-8
                q_w = jnp.clip(jnp.round(w.astype(jnp.float32) / s_w), -127, 127).astype(jnp.int8)
                y = jax.lax.conv_general_dilated(
                    q_a, q_w, (1,), [(pad, pad)], rhs_dilation=(d,),
                    dimension_numbers=("NHC", "HIO", "NHC"),
                    preferred_element_type=jnp.int32,
                )
                h = (y.astype(jnp.float32) * (s_a * s_w)).astype(jnp.bfloat16)
            return h

        for name, fn in [("bf16", stage_bf16), ("int8", stage_int8)]:
            f = jax.jit(fn)
            try:
                t0 = time.perf_counter()
                out = f(x, ws)
                _ = np.asarray(out[:, :4, 0])
                compile_s = time.perf_counter() - t0
            except Exception as e:  # int8 conv may be unsupported
                results[f"C{C}_{name}"] = f"ERROR: {str(e)[:200]}"
                print(f"[c{C} {name}] failed: {str(e)[:200]}", file=sys.stderr, flush=True)
                continue
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = f(x, ws)
                _ = np.asarray(out[:, :4, 0])
                times.append(time.perf_counter() - t0)
            results[f"C{C}_{name}"] = round(float(np.median(times)), 5)
            print(f"[c{C} {name}] {results[f'C{C}_{name}']}s (compile {compile_s:.1f}s)",
                  file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
