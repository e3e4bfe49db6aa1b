"""Trace the full-size VITS fused GAN train step (bench.py's train stage
shapes: B=16, T_en=128, T_spec=256) with jax.profiler and print the roofline
report — the training-side counterpart of profile_vits_infer.py (VERDICT r2
next-round #1: "give training the same speed-of-light treatment").

Reports:
- XLA's own static FLOP count of the compiled step (cost_analysis), split
  out per step so MFU = flops × steps/s / chip peak;
- the per-kernel device-time table over a 4-step trace window;
- steps/s measured the same way bench.py measures it.

Usage: python scripts/profile_vits_train.py [outdir] [bf16|f32]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(mp: bool, B: int = 16, T_en: int = 128, T_spec: int = 256):
    """The exact fused D+G step bench.py times (bench.py:bench_train_steps)."""
    import jax
    import optax

    from tpu_tts.configs.vits_config import VitsConfig
    from tpu_tts.models.vits import Vits

    # segment-size study (VERDICT r3 #2): PROF_SEGMENT sets spec_segment_size
    # (frames; default 32 = 8192 samples) and PROF_BATCH the batch, so e.g.
    # PROF_BATCH=8 PROF_SEGMENT=64 measures the same samples/step as B=16
    # seg=32 but with every GAN kernel twice as long.
    B = int(os.environ.get("PROF_BATCH", B))
    cfg = VitsConfig()
    cfg.model_args.num_chars = 165
    if os.environ.get("PROF_SEGMENT"):
        cfg.model_args.spec_segment_size = int(os.environ["PROF_SEGMENT"])
    cfg.mixed_precision = mp
    model = Vits(cfg)
    hop = 256
    rng = np.random.default_rng(0)
    batch_np = {
        "text_input": np.asarray(rng.integers(1, 160, (B, T_en)), dtype=np.int32),
        "text_lengths": np.full((B,), T_en, dtype=np.int32),
        "mel_lengths": np.full((B,), T_spec, dtype=np.int32),
        "waveform": np.asarray(rng.standard_normal((B, T_spec * hop, 1)) * 0.1, dtype=np.float32),
    }
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        host_params = jax.device_get(model.init_params(jax.random.PRNGKey(0)))
    params = jax.device_put(host_params, jax.devices()[0])
    opts = model.get_optimizer()
    opt_states = tuple(
        jax.device_put(
            opts[i].init(jax.tree_util.tree_map(np.asarray, model.param_partition(params, i))),
            jax.devices()[0],
        )
        for i in range(2)
    )

    def sub_step(idx, p, s, batch, key):
        sub = model.param_partition(p, idx)

        def loss_sub(x):
            merged = model.param_merge(p, x, idx)
            return model.loss_fn(merged, batch, key, optimizer_idx=idx)

        (loss, _), grads = jax.value_and_grad(loss_sub, has_aux=True)(sub)
        updates, s = opts[idx].update(grads, s, sub)
        sub = optax.apply_updates(sub, updates)
        return model.param_merge(p, sub, idx), s, loss

    def fused(p, ss, batch, key):
        losses = []
        for idx in (0, 1):
            p, s, loss = sub_step(idx, p, ss[idx], batch, jax.random.fold_in(key, idx))
            ss = (s, ss[1]) if idx == 0 else (ss[0], s)
            losses.append(loss)
        return p, ss, losses

    step = jax.jit(fused, donate_argnums=(0, 1))
    batch = {k: jax.device_put(v, jax.devices()[0]) for k, v in batch_np.items()}
    return step, params, opt_states, batch


def step_flops(step, params, opt_states, batch) -> float:
    """XLA's static FLOP count for ONE compiled step (cost_analysis)."""
    import jax

    try:
        compiled = step.lower(params, opt_states, batch, jax.random.PRNGKey(0)).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))
    except Exception as e:  # cost_analysis availability varies per backend
        print(f" [!] cost_analysis unavailable: {e}", file=sys.stderr)
        return 0.0


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vits_train_trace"
    mp = (sys.argv[2] if len(sys.argv) > 2 else "bf16") == "bf16"
    import jax

    from tpu_tts.parallel.platform import maybe_enable_compile_cache

    maybe_enable_compile_cache()

    step, params, opt_states, batch = build_step(mp)
    flops = step_flops(step, params, opt_states, batch)
    t0 = time.perf_counter()
    params, opt_states, losses = step(params, opt_states, batch, jax.random.PRNGKey(0))
    assert all(np.isfinite(float(l)) for l in losses)
    print(f"compile+warmup {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # measured steps/s, window-synced like bench.py
    times = []
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(6):
            params, opt_states, losses = step(params, opt_states, batch, jax.random.PRNGKey(100 * w + i))
        _ = float(losses[-1])
        times.append((time.perf_counter() - t0) / 6)
    sps = 1.0 / float(np.median(times))
    B = int(os.environ.get("PROF_BATCH", "16"))
    seg = int(os.environ.get("PROF_SEGMENT", "32"))
    print(f"steps/s: {sps:.2f}  ({'bf16' if mp else 'f32'}, B={B}, seg={seg} frames)"
          f"  samples/s: {sps * B:.1f}  segment-samples/s: {sps * B * seg * 256:.0f}")
    if flops:
        print(f"XLA-counted FLOPs/step: {flops / 1e12:.3f} TF -> "
              f"{flops * sps / 1e12:.1f} TF/s achieved = "
              f"{flops * sps / 197e12 * 100:.1f}% of v5e bf16 peak")

    os.makedirs(outdir, exist_ok=True)
    jax.profiler.start_trace(outdir)
    for i in range(4):
        params, opt_states, losses = step(params, opt_states, batch, jax.random.PRNGKey(1000 + i))
    _ = float(losses[-1])
    jax.profiler.stop_trace()
    print(f"trace written to {outdir}", file=sys.stderr)

    from tpu_tts.utils.roofline import profile_report

    profile_report(outdir, top=30, flops=flops * 4 if flops else None)


if __name__ == "__main__":
    main()
