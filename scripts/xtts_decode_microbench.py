"""Attribute the XTTS GPT decode-step cost on TPU (profile_xtts_decode.py
found ~9 ms/step inside the scan + ~180 ms/call of weight-layout conversion
fusions — ~100x off the weight-streaming floor).

Variants (30-layer, 1024-wide GPT decode, 20-step chunk, B=1):
  base      — current structure: cache [B,T,H,D], DUS at T, top_k=50 sort
  nosort    — top_k filter removed (argmax sample): isolates jnp.sort
  cacheBHTD — cache stored [B,H,T,D]
  bigqkv    — qkv+mlp as one fused weight read per layer? (skipped; structural)
  const     — weights closed over as jit constants: isolates per-call
              arg->loop layout conversions

Measured verdicts (v5e, full-size 30x1024, chunk 20): sort-based top-k is
free; cache layout BTHD vs BHTD indistinguishable ONCE the model-level
phantom-forward bug was fixed; `lax.scan(unroll=4)` buys only ~3%
(64.1 -> 62.2 ms/chunk) for 4x the program — rejected. The remaining
~3 ms/step vs the ~1 ms weight-streaming floor is fixed per-kernel overhead
across ~300 small kernels per step.

Usage: python scripts/xtts_decode_microbench.py
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_tts.parallel import maybe_force_platform  # noqa: E402

maybe_force_platform()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_tts.parallel.platform import maybe_enable_compile_cache

maybe_enable_compile_cache()

L, H, D, C, V, TMAX, CHUNK, B = 30, 16, 64, 1024, 1026, 1100, 20, int(os.environ.get("MB_B", "1"))


def make_weights(rng):
    ws = []
    for i in range(L):
        k = jax.random.fold_in(rng, i)
        ws.append({
            "qkv": jax.random.normal(jax.random.fold_in(k, 0), (C, 3 * C), jnp.bfloat16) * 0.02,
            "proj": jax.random.normal(jax.random.fold_in(k, 1), (C, C), jnp.bfloat16) * 0.02,
            "fc": jax.random.normal(jax.random.fold_in(k, 2), (C, 4 * C), jnp.bfloat16) * 0.02,
            "out": jax.random.normal(jax.random.fold_in(k, 3), (4 * C, C), jnp.bfloat16) * 0.02,
        })
    head = jax.random.normal(jax.random.fold_in(rng, 999), (C, V), jnp.bfloat16) * 0.02
    emb = jax.random.normal(jax.random.fold_in(rng, 998), (V, C), jnp.bfloat16) * 0.02
    return ws, head, emb


def _ln(x):
    m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    return ((x - m) / jnp.sqrt(v + 1e-5)).astype(x.dtype)


def step_body(ws, head, emb, cache, code, key, idx, layout="BTHD", topk=50, ln=False, posemb=None):
    x = emb[code][:, None, :]  # [B,1,C]
    if posemb is not None:
        x = x + posemb[idx][None, None, :]
    new_cache = []
    for i in range(L):
        w = ws[i]
        h = _ln(x) if ln else x
        qkv = h @ w["qkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, 1, H, D)
        k = k.reshape(B, 1, H, D)
        v = v.reshape(B, 1, H, D)
        kc, vc = cache[i]
        if layout == "BTHD":
            kc = jax.lax.dynamic_update_slice(kc, k, (0, idx, 0, 0))
            vc = jax.lax.dynamic_update_slice(vc, v, (0, idx, 0, 0))
            att = jnp.einsum("bthd,bshd->bhts", q, kc) / 8.0
            att = jnp.where(jnp.arange(TMAX)[None, None, None, :] <= idx, att, -1e9)
            att = jax.nn.softmax(att, axis=-1)
            y = jnp.einsum("bhts,bshd->bthd", att, vc)
        else:  # BHTD
            kc = jax.lax.dynamic_update_slice(kc, jnp.swapaxes(k, 1, 2), (0, 0, idx, 0))
            vc = jax.lax.dynamic_update_slice(vc, jnp.swapaxes(v, 1, 2), (0, 0, idx, 0))
            att = jnp.einsum("bthd,bhsd->bhts", q, kc) / 8.0
            att = jnp.where(jnp.arange(TMAX)[None, None, None, :] <= idx, att, -1e9)
            att = jax.nn.softmax(att, axis=-1)
            y = jnp.einsum("bhts,bhsd->bthd", att, vc)
        y = y.reshape(B, 1, C)
        x = x + y @ w["proj"]
        h2 = _ln(x) if ln else x
        x = x + jax.nn.gelu(h2 @ w["fc"], approximate=True) @ w["out"]
        new_cache.append((kc, vc))
    if ln:
        x = _ln(_ln(x))
    logits = (x @ head)[:, 0]
    if topk:
        kth = jnp.sort(logits, axis=-1)[:, -topk][:, None]
        logits = jnp.where(logits < kth, -1e9, logits)
        nxt = jax.random.categorical(key, logits).astype(jnp.int32)
    else:
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return new_cache, nxt


def chunk_fn(ws, head, emb, cache, code, rng, i0, layout="BTHD", topk=50, const=False,
             ln=False, posemb=None, emit_latents=False):
    def body(carry, i):
        cache, code, key = carry
        key, sub = jax.random.split(key)
        cache, code = step_body(ws, head, emb, cache, code, sub, i, layout=layout, topk=topk,
                                ln=ln, posemb=posemb)
        out = (code, emb[code]) if emit_latents else code
        return (cache, code, key), out

    (cache, code, rng), codes = jax.lax.scan(
        body, (cache, code, rng), i0 + jnp.arange(CHUNK),
        unroll=int(os.environ.get("MB_UNROLL", "1")))
    if emit_latents:
        codes = codes[0]
    return cache, code, rng, codes


def bench(name, layout="BTHD", topk=50, const=False, ln=False, use_posemb=False,
          emit_latents=False):
    rng = jax.random.PRNGKey(0)
    ws, head, emb = make_weights(rng)
    posemb = (jax.random.normal(jax.random.fold_in(rng, 997), (1000, C), jnp.bfloat16) * 0.02
              if use_posemb else None)
    if layout == "BTHD":
        cache = [(jnp.zeros((B, TMAX, H, D), jnp.bfloat16), jnp.zeros((B, TMAX, H, D), jnp.bfloat16))
                 for _ in range(L)]
    else:
        cache = [(jnp.zeros((B, H, TMAX, D), jnp.bfloat16), jnp.zeros((B, H, TMAX, D), jnp.bfloat16))
                 for _ in range(L)]
    code = jnp.zeros((B,), jnp.int32)
    if const:
        fn = jax.jit(
            lambda cache, code, rng, i0: chunk_fn(ws, head, emb, cache, code, rng, i0,
                                                  layout=layout, topk=topk),
            donate_argnums=(0,),
        )
        args = lambda i: (cache, code, jax.random.PRNGKey(i), jnp.int32(40 + i))
        call = lambda i: fn(*args(i))
    else:
        fn = jax.jit(
            lambda ws, head, emb, pe, cache, code, rng, i0: chunk_fn(
                ws, head, emb, cache, code, rng, i0, layout=layout, topk=topk,
                ln=ln, posemb=pe, emit_latents=emit_latents),
            donate_argnums=(4,),
        )
        call = lambda i: fn(ws, head, emb, posemb, cache, code, jax.random.PRNGKey(i), jnp.int32(40 + i))

    t0 = time.perf_counter()
    out = call(0)
    cache = out[0]
    np.asarray(out[3][:1])
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        out = call(i + 1)
        cache = out[0]
        np.asarray(out[3][:1])  # data-driven sync (block_until_ready lies via the tunnel)
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) * 1e3
    print(f"{name:12s} per-chunk {ms:8.1f} ms  ({ms/CHUNK:6.2f} ms/step)  compile {compile_s:.0f}s",
          flush=True)


def bench_flax():
    """Drive the REAL XttsGPT flax stack (30x1024) with the microbench's own
    scan + argmax — isolates whether the slowdown lives in the flax layers /
    decode_step, or in the surrounding stream_chunk scaffolding."""
    from tpu_tts.layers.xtts.gpt import XttsGPT

    gpt = XttsGPT(n_layer=L, n_head=H, n_embd=C, num_audio_tokens=V)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cond = jnp.zeros((B, 32, C))
        text = jnp.zeros((B, 30), jnp.int32)
        codes0 = jnp.zeros((B, 4), jnp.int32)
        params = gpt.init(jax.random.PRNGKey(0), cond, text, codes0)["params"]
    params = jax.device_put(params, jax.devices()[0])
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    cache = gpt.apply({"params": params}, B, TMAX,
                      method=lambda m, b, t: m.init_cache(b, t))

    def chunk(p, cache, code, i0):
        def body(carry, i):
            cache, code = carry
            logits, latent, cache = gpt.apply(
                {"params": p}, code, i, cache, 62 + i, method=XttsGPT.decode_step
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (cache, nxt), nxt

        (cache, code), codes = jax.lax.scan(body, (cache, code), i0 + jnp.arange(CHUNK))
        return cache, code, codes

    fn = jax.jit(chunk, donate_argnums=(1,))
    code = jnp.zeros((B,), jnp.int32)
    t0 = time.perf_counter()
    cache, code, codes = fn(params, cache, code, jnp.int32(0))
    np.asarray(codes[:1])
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        cache, code, codes = fn(params, cache, code, jnp.int32((i + 1) * CHUNK))
        np.asarray(codes[:1])
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) * 1e3
    print(f"{'flax-gpt':12s} per-chunk {ms:8.1f} ms  ({ms/CHUNK:6.2f} ms/step)  compile {compile_s:.0f}s",
          flush=True)


if __name__ == "__main__":
    print(f"B={B} layers={L} width={C} kv={TMAX} chunk={CHUNK}", flush=True)
    if not os.environ.get("MB_ONLY_FLAX"):
        bench("base", layout="BTHD", topk=50)
    if not os.environ.get("MB_ONLY_FLAX"):
        bench("nosort", layout="BTHD", topk=0)
        bench("cacheBHTD", layout="BHTD", topk=50)
        bench("+ln", layout="BTHD", topk=50, ln=True)
        bench("+posemb", layout="BTHD", topk=50, use_posemb=True)
        bench("+latents", layout="BTHD", topk=50, emit_latents=True)
        bench("full", layout="BTHD", topk=50, ln=True, use_posemb=True, emit_latents=True)
    # NOTE: const-weight variants bake ~800 MB of literals into the HLO and
    # crash the remote-compile tunnel — layout attribution is done with the
    # AOT-layout experiment in scripts instead
    if os.environ.get("MB_CONST"):
        bench("const", layout="BTHD", topk=50, const=True)
    if os.environ.get("MB_FLAX"):
        bench_flax()
