"""A/B the REAL XttsNet.stream_chunk cost on TPU: full param tree vs only the
GPT subtree as input (the microbench says the same math runs in 57 ms/chunk;
the model path measures ~193 ms — find where the overhead lives).

Usage: python scripts/xtts_chunk_ab.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_tts.parallel import maybe_force_platform  # noqa: E402

maybe_force_platform()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_tts.parallel.platform import maybe_enable_compile_cache

maybe_enable_compile_cache()

from tpu_tts.configs.xtts_config import XttsConfig  # noqa: E402
from tpu_tts.models.xtts import Xtts, XttsNet  # noqa: E402


def main():
    cfg = XttsConfig()
    model = Xtts(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    a = model.args
    B = int(os.environ.get("AB_B", "1"))
    rng0 = np.random.default_rng(0)
    text = jnp.asarray(rng0.integers(1, 200, (B, 30)), dtype=jnp.int32)
    cond = jnp.asarray(rng0.standard_normal((B, a.num_cond_latents, a.gpt_n_model_channels)) * 0.02,
                       jnp.bfloat16)
    chunk = 20

    pf = jax.jit(lambda p, c, t: model.net.apply({"params": p}, c, t, method=XttsNet.stream_prefill))

    def run(tag, p_in, reformat=False):
        ck = jax.jit(
            lambda p, cache, pl, code, stop, r, i0: model.net.apply(
                {"params": p}, cache, pl, code, stop, r, i0, chunk, 0.75, 50,
                method=XttsNet.stream_chunk,
            ),
            donate_argnums=(1,),
        )
        cache, pl, code = pf(params, cond, text)
        stopped = jnp.zeros((B,), dtype=bool)
        rng = jax.random.PRNGKey(0)
        if reformat:
            # AOT: read the layouts the compiled program WANTS for its inputs
            # and device_put the params into them once — if the entry layouts
            # differ from default, every call was paying a relayout
            lowered = ck.lower(p_in, cache, pl, code, stopped, rng, jnp.int32(0))
            compiled = lowered.compile()
            informats = compiled.input_formats[0]
            n_diff = 0
            def _fmt_of(arr):
                return getattr(arr, "format", None)
            flat_in, _ = jax.tree_util.tree_flatten(informats[0])
            flat_arr, treedef = jax.tree_util.tree_flatten(p_in)
            for f, arr in zip(flat_in, flat_arr):
                if _fmt_of(arr) is not None and f != arr.format:
                    n_diff += 1
            print(f"   [{tag}] params whose compiled layout differs from buffer: "
                  f"{n_diff}/{len(flat_arr)}", flush=True)
            p_in = jax.device_put(p_in, informats[0])
            cache = jax.device_put(cache, informats[1])
        t0 = time.perf_counter()
        (cache, code, stopped, rng), outs = ck(p_in, cache, pl, code, stopped, rng, jnp.int32(0))
        np.asarray(outs[0][:, :1])
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(4):
            t0 = time.perf_counter()
            (cache, code, stopped, rng), outs = ck(
                p_in, cache, pl, code, stopped, rng, jnp.int32((i + 1) * chunk)
            )
            np.asarray(outs[0][:, :1])  # data sync
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times)) * 1e3
        print(f"{tag:12s} per-chunk {ms:8.1f} ms ({ms/chunk:6.2f} ms/step) compile {compile_s:.0f}s",
              flush=True)

    def run_fn(tag, fn, fresh_cache=False):
        ck = jax.jit(fn, donate_argnums=(1,))
        if fresh_cache:
            cache = model.net.apply({"params": params}, B, a.kv_cache_len,
                                    method=lambda net, b, t: net.gpt.init_cache(b, t))
            pl = jnp.int32(a.num_cond_latents + 30)
            code = jnp.full((B,), a.gpt_start_audio_token, dtype=jnp.int32)
        else:
            cache, pl, code = pf(params, cond, text)
        stopped = jnp.zeros((B,), dtype=bool)
        rng = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        (cache, code, stopped, rng), outs = ck(params, cache, pl, code, stopped, rng, jnp.int32(0))
        np.asarray(outs[0][:, :1])
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(4):
            t0 = time.perf_counter()
            (cache, code, stopped, rng), outs = ck(
                params, cache, pl, code, stopped, rng, jnp.int32((i + 1) * chunk)
            )
            np.asarray(outs[0][:, :1])
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times)) * 1e3
        print(f"{tag:12s} per-chunk {ms:8.1f} ms ({ms/chunk:6.2f} ms/step) compile {compile_s:.0f}s",
              flush=True)

    base_fn = lambda p, cache, pl, code, stop, r, i0: model.net.apply(
        {"params": p}, cache, pl, code, stop, r, i0, chunk, 0.75, 50,
        method=XttsNet.stream_chunk,
    )

    def pinned_fn(p, cache, pl, code, stop, r, i0):
        from jax.experimental.layout import Layout, with_layout_constraint

        L4 = Layout(major_to_minor=(0, 1, 2, 3))
        pin = lambda t: jax.tree_util.tree_map(lambda x: with_layout_constraint(x, L4), t)
        out = model.net.apply(
            {"params": p}, pin(cache), pl, code, stop, r, i0, chunk, 0.75, 50,
            method=XttsNet.stream_chunk,
        )
        (c2, code2, stop2, rng2), rest = out
        return (pin(c2), code2, stop2, rng2), rest

    which = os.environ.get("AB_WHICH", "full,zeros,pin").split(",")
    if "full" in which:
        run("full-params", params)
    if "gpt" in which:
        try:
            run("gpt-only", {"gpt": params["gpt"]})
        except Exception as e:
            print(f"gpt-only failed: {type(e).__name__}: {str(e)[:200]}")
    if "fmt" in which:
        try:
            run("reformatted", params, reformat=True)
        except Exception as e:
            print(f"reformatted failed: {type(e).__name__}: {str(e)[:200]}")
    if "zeros" in which:
        try:
            run_fn("zeros-cache", base_fn, fresh_cache=True)
        except Exception as e:
            print(f"zeros-cache failed: {type(e).__name__}: {str(e)[:200]}")
    if "pin" in which:
        try:
            run_fn("pin-layout", pinned_fn)
        except Exception as e:
            print(f"pin-layout failed: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
