"""Shape experiment: is the C=32 MRF stage faster when time is folded into
channels (space-to-depth, [B,T,32] → [B,T/4,128])?

A dilated k-tap conv at C channels folded by f becomes a k'-tap conv at C·f
channels with k' ≈ (k-1)·d/f + 1 (block-sparse weights — MXU cost is dense).
This times the folded-equivalent dense shapes for every conv in the C=32 MRF
stage vs the direct shapes, to see if the 4× MXU-utilization gain survives
XLA's actual scheduling. Run: timeout 1200 python scripts/tpu_fold_conv_microbench.py
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
    B, T, C, f = 128, 196608, 32, 4
    Cf = C * f
    convs = []
    for k in (3, 7, 11):
        for d in (1, 3, 5):
            convs.append((k, d))  # conv1
            convs.append((k, 1))  # conv2
    rng = np.random.default_rng(0)

    def timeit(fn, *args):
        g = jax.jit(fn)
        t0 = time.perf_counter()
        out = g(*args)
        _ = np.asarray(out[:, :2, 0])
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = g(*args)
            _ = np.asarray(out[:, :2, 0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), compile_s

    x = jnp.asarray(rng.standard_normal((B, T, C)) * 0.5, dtype=jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((k, C, C)) * 0.1, dtype=jnp.bfloat16) for k, _ in convs]

    def direct(x, ws):
        h = x
        for (k, d), w in zip(convs, ws):
            pad = (k // 2) * d
            h = jax.lax.conv_general_dilated(
                h, w, (1,), [(pad, pad)], rhs_dilation=(d,), dimension_numbers=("NHC", "HIO", "NHC")
            )
        return h

    t_direct, c_direct = timeit(direct, x, ws)
    print(f"[direct C={C}] {t_direct:.5f}s (compile {c_direct:.1f}s)", file=sys.stderr, flush=True)

    xf = jnp.asarray(rng.standard_normal((B, T // f, Cf)) * 0.5, dtype=jnp.bfloat16)
    kps = [max((k - 1) * d // f + 1, 1) + 1 for k, d in convs]  # folded taps (+1 phase slack)
    wfs = [jnp.asarray(rng.standard_normal((kp, Cf, Cf)) * 0.05, dtype=jnp.bfloat16) for kp in kps]

    def folded(x, ws):
        h = x
        for kp, w in zip(kps, ws):
            pad = kp // 2
            h = jax.lax.conv_general_dilated(
                h, w, (1,), [(pad, pad)], dimension_numbers=("NHC", "HIO", "NHC")
            )
        return h

    t_folded, c_folded = timeit(folded, xf, wfs)
    print(f"[folded Cf={Cf}] {t_folded:.5f}s (compile {c_folded:.1f}s)", file=sys.stderr, flush=True)
    print(json.dumps({"direct_s": t_direct, "folded_s": t_folded, "speedup": round(t_direct / t_folded, 3)}))


if __name__ == "__main__":
    main()
