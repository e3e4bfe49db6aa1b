"""Benchmarks on the current accelerator — multi-metric (VERDICT r1 #5).

Emits ONE JSON line per metric:
  {"metric", "value", "unit", "vs_baseline"}
- vits_gan_train_steps_per_s_bf16 / _f32 — full-size VITS GAN train step
  (D+G optimizers), mixed-precision vs fp32 (no reference number → the
  vs_baseline field is the bf16/f32 speedup for the bf16 row, null for f32).
- xtts_first_chunk_latency_ms — full-size XTTS streaming first chunk
  (reference target < 200 ms, /root/reference/README.md:5). vs_baseline is
  target/actual (>1 = faster than target).
- vits_e2e_inference_rtf — PRINTED LAST (the driver's `parsed` field takes
  the last JSON line; this is the headline vs the reference's ×67.12,
  /root/reference/docs/source/models/vits.md:7).

Stage selection: BENCH_STAGES=train,xtts,serve,rtf (default all). Each stage
is fail-safe: an exception prints to stderr and the remaining stages still
run. Default dtype for inference is bf16 (BENCH_DTYPE=f32 to override).
Extra metrics: vits_train_mfu_pct (XLA-counted FLOPs of the fused GAN step),
xtts_concurrent_streams_under_200ms + aggregate audio-s/s (serve stage),
vits_aggregate_rtf_v5e16_extrapolated (vs the ≥5000x BASELINE target).
"""

import json
import os
import sys
import time

import numpy as np


def _emit(metric, value, unit, vs_baseline):
    print(json.dumps({
        "metric": metric,
        "value": value,
        "unit": unit,
        "vs_baseline": vs_baseline,
    }), flush=True)


# --------------------------------------------------------------------- train
def _train_point(B, mp, host_params_box):
    """Measure the full-size VITS GAN fused train step at batch B / precision
    mp. Returns (steps_per_s, flops_per_step, host_params_box)."""
    import jax
    import optax

    from tpu_tts.configs.vits_config import VitsConfig
    from tpu_tts.models.vits import Vits

    tag = "bf16" if mp else "f32"
    T_en, T_spec = 128, 256
    hop = 256
    rng = np.random.default_rng(0)
    batch_np = {
        "text_input": np.asarray(rng.integers(1, 160, (B, T_en)), dtype=np.int32),
        "text_lengths": np.full((B,), T_en, dtype=np.int32),
        "mel_lengths": np.full((B,), T_spec, dtype=np.int32),
        "waveform": np.asarray(rng.standard_normal((B, T_spec * hop, 1)) * 0.1, dtype=np.float32),
    }

    cfg = VitsConfig()
    cfg.model_args.num_chars = 165
    cfg.mixed_precision = mp
    model = Vits(cfg)
    t0 = time.perf_counter()
    if host_params_box[0] is None:  # params identical across dtypes/batches — init once
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            host_params_box[0] = jax.device_get(model.init_params(jax.random.PRNGKey(0)))
    params = jax.device_put(host_params_box[0], jax.devices()[0])
    opts = model.get_optimizer()
    opt_states = [
        jax.device_put(opts[i].init(jax.tree_util.tree_map(np.asarray, model.param_partition(params, i))),
                       jax.devices()[0])
        for i in range(2)
    ]
    print(f"[bench:train:{tag}:B{B}] init {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    def sub_step(idx, p, s, batch, key):
        sub = model.param_partition(p, idx)

        def loss_sub(x):
            merged = model.param_merge(p, x, idx)
            return model.loss_fn(merged, batch, key, optimizer_idx=idx)

        (loss, _), grads = jax.value_and_grad(loss_sub, has_aux=True)(sub)
        updates, s = opts[idx].update(grads, s, sub)
        sub = optax.apply_updates(sub, updates)
        return model.param_merge(p, sub, idx), s, loss

    # D+G fused in one jit (the trainer's fuse_optimizer_steps default):
    # XLA CSEs the generator forward shared by both sub-steps
    def fused(p, ss, batch, key):
        losses = []
        for idx in (0, 1):
            p, s, loss = sub_step(idx, p, ss[idx], batch, jax.random.fold_in(key, idx))
            ss = (s, ss[1]) if idx == 0 else (ss[0], s)
            losses.append(loss)
        return p, ss, losses

    step = jax.jit(fused, donate_argnums=(0, 1))
    opt_states = tuple(opt_states)
    batch = {k: jax.device_put(v, jax.devices()[0]) for k, v in batch_np.items()}
    t_c = time.perf_counter()
    params, opt_states, losses = step(params, opt_states, batch, jax.random.PRNGKey(0))
    assert all(np.isfinite(float(l)) for l in losses), "train loss not finite"
    print(f"[bench:train:{tag}:B{B}] compile+warmup {time.perf_counter()-t_c:.1f}s",
          file=sys.stderr, flush=True)

    # one sync per WINDOW, not per step — the trainer's deferred-logging
    # loop dispatches ahead the same way, so this is the steps/s a real
    # training run sees (per-step sync would bill the tunnel RTT per step)
    n_iters = int(os.environ.get("BENCH_TRAIN_ITERS", "6"))
    times = []
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(n_iters):
            params, opt_states, losses = step(params, opt_states, batch,
                                              jax.random.PRNGKey(100 * w + i))
        _ = float(losses[-1])  # window sync
        times.append((time.perf_counter() - t0) / n_iters)
    steps_per_s = 1.0 / float(np.median(times))
    # train-step MFU from XLA's own static FLOP count of the compiled
    # fused D+G step (VERDICT r2 next-round #1) vs the v5e bf16 peak
    flops = None
    try:
        ca = step.lower(params, opt_states, batch, jax.random.PRNGKey(0)).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:
        print(f"[bench:train:{tag}:B{B}] cost_analysis unavailable: {e}", file=sys.stderr, flush=True)
    del params, opt_states, step, batch  # free HBM before the next point
    return steps_per_s, flops


def bench_train_steps():
    """Full-size VITS GAN train step (both optimizers): bf16 vs f32 at the
    B=16 continuity point, plus the THROUGHPUT point (default B=64, bf16 —
    what a production run gets; VERDICT r3 #3)."""
    B = int(os.environ.get("BENCH_TRAIN_BATCH", "16"))
    box = [None]
    results, flops_per_step = {}, {}
    dtypes = os.environ.get("BENCH_TRAIN_DTYPES", "bf16,f32").split(",")
    for tag, mp in (("bf16", True), ("f32", False)):
        if tag not in dtypes:
            continue
        results[tag], flops_per_step[tag] = _train_point(B, mp, box)

    speedup = (
        results["bf16"] / results["f32"] if results.get("f32") and results.get("bf16") else None
    )
    if "f32" in results:
        _emit("vits_gan_train_steps_per_s_f32", round(results["f32"], 3), "steps/s", None)
    if "bf16" in results:
        _emit("vits_gan_train_steps_per_s_bf16", round(results["bf16"], 3), "steps/s",
              round(speedup, 3) if speedup else None)
    # train MFU (bf16 step preferred): XLA-counted FLOPs/step x steps/s vs
    # the v5e bf16 peak — the honest fraction-of-speed-of-light for training
    for tag in ("bf16", "f32"):
        if results.get(tag) and flops_per_step.get(tag):
            mfu = flops_per_step[tag] * results[tag] / 197e12 * 100.0
            _emit("vits_train_mfu_pct", round(mfu, 1), "percent", None)
            break

    # throughput-optimal point: per-chip samples/s at the large batch a
    # production run would use (BASELINE.md north star is per-chip
    # throughput, not fixed-B latency). Measured scaling (bf16, r4 paired-D):
    # 245 samples/s 25.3% MFU @ B=16 -> 365 / 37.6% @ B=64 -> 442 / 45.6%
    # @ B=128 (fits in HBM at the bench shapes; B=128 is the knee).
    B_thr = int(os.environ.get("BENCH_TRAIN_BATCH_THROUGHPUT", "128"))
    if B_thr and B_thr != B and "bf16" in dtypes:
        sps, flops = _train_point(B_thr, True, box)
        _emit(f"vits_gan_train_samples_per_s_b{B_thr}", round(sps * B_thr, 1),
              "samples/s", None)
        if flops:
            mfu = flops * sps / 197e12 * 100.0
            _emit(f"vits_train_mfu_pct_b{B_thr}", round(mfu, 1), "percent", None)


# ---------------------------------------------------------------------- xtts
def bench_xtts_first_chunk():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from xtts_stream_latency import measure

    m = measure(iters=int(os.environ.get("LAT_ITERS", "5")))
    val = m["first_chunk_ms"]
    _emit("xtts_first_chunk_latency_ms", val, "ms", round(200.0 / val, 3))


# --------------------------------------------------------------------- serve
def bench_xtts_multistream():
    """Concurrent XTTS streams per chip (VERDICT r2 next-round #5a): largest
    lockstep batch whose first chunk lands < 200 ms + the aggregate
    audio-seconds/s at that batch."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from xtts_stream_latency import measure_multistream

    m = measure_multistream(iters=int(os.environ.get("LAT_ITERS", "3")))
    _emit("xtts_concurrent_streams_under_200ms", m["max_streams_under_200ms"], "streams", None)
    if m.get("aggregate_audio_s_per_s_at_max"):
        _emit("xtts_aggregate_audio_s_per_s", m["aggregate_audio_s_per_s_at_max"],
              "audio_s/s", None)


def bench_xtts_openloop():
    """OPEN-LOOP serving (VERDICT r4 #1): Poisson arrivals through the real
    XttsStreamPool (chunk-boundary admission) — p95 first-chunk latency and
    delivered audio-s/s at the stated offered load, arrivals NOT aligned to
    round boundaries."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from xtts_stream_latency import measure_openloop

    m = measure_openloop()
    _emit("xtts_openloop_offered_rps", m["offered_rps"], "req/s", None)
    if m["p95_first_chunk_ms"]:
        _emit("xtts_p95_first_chunk_ms_openloop", m["p95_first_chunk_ms"], "ms",
              round(200.0 / m["p95_first_chunk_ms"], 3))
    _emit("xtts_openloop_audio_s_per_s", m["aggregate_audio_s_per_s"], "audio_s/s", None)


def _hifigan_flops(a, B: int, T_in: int) -> float:
    """Analytic MAC·2 count of the HiFi-GAN generator at `[B, T_in, C]` input
    (conv_pre + transposed upsamples + MRF stacks + conv_post) — the FLOPs
    dominator of VITS inference, used for the bench MFU metric."""
    ch0 = a.upsample_initial_channel_decoder
    flops = T_in * a.hidden_channels * ch0 * 7 * 2  # conv_pre
    T = T_in
    ch_prev = ch0
    n_res_convs_per_k = {"1": 6, "2": 2}[str(a.resblock_type_decoder)]
    for i, (u, k) in enumerate(zip(a.upsample_rates_decoder, a.upsample_kernel_sizes_decoder)):
        ch = ch0 // (2 ** (i + 1))
        flops += T * ch_prev * ch * k * 2  # transposed conv (per input position)
        T *= u
        for rk in a.resblock_kernel_sizes_decoder:
            flops += n_res_convs_per_k * T * ch * ch * rk * 2
        ch_prev = ch
    flops += T * ch_prev * 1 * 7 * 2  # conv_post
    return float(flops) * B


# ----------------------------------------------------------------------- rtf
def bench_inference_rtf():
    import jax
    import jax.numpy as jnp

    from tpu_tts.configs.vits_config import VitsConfig
    from tpu_tts.models.vits import Vits, VitsNet

    cfg = VitsConfig()
    cfg.model_args.num_chars = 165
    model = Vits(cfg)
    # init on CPU (fast local compile), then ship params to the accelerator
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
    print(f"[bench:rtf] init {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

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
        # fused Pallas MRF decoder (tpu_tts/ops/hifigan_pallas.py)
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
    print(f"[bench:rtf] compiling... (B={B}, T_en={T_en}, Y={Y_MAX})", file=sys.stderr, flush=True)
    t_c = time.perf_counter()
    out = fn(g, x, xl, jax.random.PRNGKey(0))
    chk = np.asarray(out[:, :8, 0])
    assert np.isfinite(chk).all()
    print(f"[bench:rtf] compile+warmup {time.perf_counter()-t_c:.1f}s", file=sys.stderr, flush=True)

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

    # decoder-FLOPs MFU over the whole e2e iteration (a lower bound on the
    # decoder's own utilization; v5e bf16 peak 197 TFLOP/s)
    flops = _hifigan_flops(cfg.model_args, B, Y_MAX)
    mfu = flops / float(np.median(times)) / 197e12 * 100.0
    _emit("vits_infer_decoder_mfu_pct", round(mfu, 1), "percent", None)
    # v5e-16 aggregate extrapolation (BASELINE ≥5000× target): batch inference
    # is pure data parallelism — zero cross-chip collectives — so per-chip ×16
    # is the architecture number; the virtual-8-device sharded program is
    # validated separately (scripts/scaling_bench.py --virtual 8, recorded in
    # README). Real multi-chip ICI measurement needs hardware this sandbox
    # doesn't have.
    _emit("vits_aggregate_rtf_v5e16_extrapolated", round(rtf * 16, 0), "x_realtime",
          round(rtf * 16 / 5000.0, 3))
    _emit("vits_e2e_inference_rtf", round(rtf, 2), "x_realtime", round(rtf / 67.12, 3))


def main():
    import jax

    # persistent compilation cache: driver re-runs skip the multi-minute
    # remote compile of the full VITS/XTTS graphs
    from tpu_tts.parallel.platform import maybe_enable_compile_cache
    maybe_enable_compile_cache()

    stages = os.environ.get("BENCH_STAGES", "train,xtts,serve,openloop,rtf").split(",")
    runners = {
        "train": bench_train_steps,
        "xtts": bench_xtts_first_chunk,
        "serve": bench_xtts_multistream,
        "openloop": bench_xtts_openloop,
        "rtf": bench_inference_rtf,  # keep LAST: driver parses the last line
    }
    for name in ("train", "xtts", "serve", "openloop", "rtf"):
        if name not in stages:
            continue
        try:
            runners[name]()
        except Exception as e:  # stage failures must not kill the headline metric
            print(f"[bench:{name}] FAILED: {type(e).__name__}: {e}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
