"""Benchmark: VITS end-to-end inference RTF on the current accelerator.

Default dtype is bf16 (native MXU serving dtype); set BENCH_DTYPE=f32 to
measure full precision.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published VITS inference RTF of ×67.12 realtime on
"a GPU" (/root/reference/docs/source/models/vits.md:7; BASELINE.md).

Measures the full-size VITS graph (hidden 192, HiFi-GAN v1 decoder, hop 256 @
22.05 kHz) generating bucketed fixed-shape audio: tokens → durations → flow
reverse → waveform. Audio seconds are counted from the decoded frames actually
produced (y_max bucket), since the padded decode does the full compute.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache: driver re-runs skip the multi-minute
    # remote compile of the full VITS graph
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_tts.configs.vits_config import VitsConfig
    from tpu_tts.models.vits import Vits, VitsNet

    cfg = VitsConfig()
    cfg.model_args.num_chars = 165
    model = Vits(cfg)
    # init on CPU (fast local compile), then ship params to the accelerator —
    # avoids spending accelerator remote-compile time on the init graph
    t0 = time.perf_counter()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])
    if os.environ.get("BENCH_DTYPE", "bf16") == "bf16":
        # bf16 weights: native MXU dtype, half the HBM traffic
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
        )
    model.params = params
    print(f"[bench] init {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    sr = cfg.audio.sample_rate
    hop = cfg.audio.hop_length
    # measured on 1x v5e bf16: 850x@B8, 1052x@B16, 1167x@B32, 1652x@B64,
    # 2354x@B128; B=256 exceeds 15.75G HBM
    B = int(os.environ.get("BENCH_BATCH", "128"))
    T_en = 128
    Y_MAX = 768  # mel frames per item -> 768*256/22050 = 8.9 s audio each

    x = jnp.asarray(np.random.default_rng(0).integers(1, 160, (B, T_en)), dtype=jnp.int32)
    xl = jnp.full((B,), T_en, dtype=jnp.int32)

    n_chunks = int(os.environ.get("BENCH_CHUNKS", "1"))
    use_pallas = os.environ.get("BENCH_DECODER", "xla") == "pallas"
    if n_chunks > 1:
        # sequential halo-overlap time chunking: caps decoder activation
        # liveness at T/n_chunks so batches past the B=128 HBM knee fit
        from tpu_tts.parallel.sharded_decoder import hifigan_apply_chunked

        a = cfg.model_args

        def _infer(p, xi, xli, rng):
            out = model.net.apply(
                {"params": p}, xi, xli, Y_MAX,
                method=VitsNet.inference, decode=False,
                rngs={"noise": rng, "sdp": jax.random.fold_in(rng, 1)},
            )
            return hifigan_apply_chunked(
                p["waveform_decoder"], out["z_in"], n_chunks,
                resblock_kernel_sizes=tuple(a.resblock_kernel_sizes_decoder),
                resblock_dilation_sizes=tuple(tuple(d) for d in a.resblock_dilation_sizes_decoder),
                upsample_factors=tuple(a.upsample_rates_decoder),
                upsample_kernel_sizes=tuple(a.upsample_kernel_sizes_decoder),
            )

        fn = jax.jit(_infer)
    elif use_pallas:
        # fused Pallas MRF decoder (tpu_tts/ops/hifigan_pallas.py): the
        # waveform decoder is ~100% of inference time and bandwidth-bound in
        # the XLA path; the fused kernel keeps each stage VMEM-resident
        from tpu_tts.ops.hifigan_pallas import hifigan_apply_pallas

        a = cfg.model_args

        def _infer(p, xi, xli, rng):
            out = model.net.apply(
                {"params": p}, xi, xli, Y_MAX,
                method=VitsNet.inference, decode=False,
                rngs={"noise": rng, "sdp": jax.random.fold_in(rng, 1)},
            )
            return hifigan_apply_pallas(
                p["waveform_decoder"], out["z_in"], None,
                resblock_kernel_sizes=tuple(a.resblock_kernel_sizes_decoder),
                resblock_dilation_sizes=tuple(tuple(d) for d in a.resblock_dilation_sizes_decoder),
                upsample_factors=tuple(a.upsample_rates_decoder),
            )

        fn = jax.jit(_infer)
    else:
        fn = jax.jit(
            lambda p, xi, xli, rng: model.net.apply(
                {"params": p}, xi, xli, Y_MAX,
                method=VitsNet.inference,
                rngs={"noise": rng, "sdp": jax.random.fold_in(rng, 1)},
            )["model_outputs"]
        )

    g = params["generator"]
    # warmup / compile; force a real device->host sync via data fetch
    # (block_until_ready alone can be unreliable on experimental backends)
    print(f"[bench] compiling... (B={B}, T_en={T_en}, Y={Y_MAX})", file=sys.stderr, flush=True)
    t_c = time.perf_counter()
    out = fn(g, x, xl, jax.random.PRNGKey(0))
    chk = np.asarray(out[:, :8, 0])
    assert np.isfinite(chk).all()
    print(f"[bench] compile+warmup {time.perf_counter()-t_c:.1f}s", file=sys.stderr, flush=True)

    n_iters = int(os.environ.get("BENCH_ITERS", "10"))
    times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        out = fn(g, x, xl, jax.random.PRNGKey(i + 1))
        _ = np.asarray(out[:, :8, 0])  # per-round D2H sync
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) * n_iters

    audio_seconds = n_iters * B * (Y_MAX * hop / sr)
    rtf = audio_seconds / dt
    baseline = 67.12
    print(
        json.dumps(
            {
                "metric": "vits_e2e_inference_rtf",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
