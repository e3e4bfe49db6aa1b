"""Scaling-efficiency benchmark harness (SURVEY.md §7.8): VITS inference and
the full GAN train step over 1..N devices of a `jax.sharding.Mesh`.

The reference has no analogue (DDP is exercised only manually, SURVEY.md §4);
this harness measures, per device count d:
  - inference: aggregate audio-seconds/s and realtime factor of the
    data-sharded VITS inference program (tokens → flow reverse → HiFi-GAN);
  - train: GAN steps/s (both optimizers, D then G) with data on the `data`
    axis and gradients psum'd by XLA;
and reports scaling efficiency  e(d) = (T_d / T_base) / (d / base).

On a real multi-chip slice this measures ICI scaling. With `--virtual N` it
runs on N virtual CPU devices — a *functional* validation of the sharded
program (all N "devices" share one socket, so efficiency there is a
correctness check, not a hardware number).

Usage:
  # functional check on 8 virtual CPU devices
  python scripts/scaling_bench.py --virtual 8 --devices 1,2,4,8 --mode both
  # real accelerator(s), full-size model
  python scripts/scaling_bench.py --size full --mode infer --batch-per-device 32
"""

import argparse
import json
import os
import sys
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--virtual", type=int, default=0,
                   help="force N virtual CPU devices (functional scaling check)")
    p.add_argument("--devices", type=str, default="",
                   help="comma list of device counts (default: 1..all powers of 2)")
    p.add_argument("--mode", choices=["infer", "train", "both"], default="both")
    p.add_argument("--size", choices=["tiny", "full"], default="tiny")
    p.add_argument("--batch-per-device", type=int, default=0,
                   help="per-device batch (default: 2 tiny / 32 full)")
    p.add_argument("--iters", type=int, default=0,
                   help="timed iterations (default: 3 tiny-cpu / 10 otherwise)")
    return p.parse_args()


ARGS = parse_args()
if ARGS.virtual:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ARGS.virtual}"
    )
    os.environ["TPU_TTS_PLATFORM"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_tts.parallel import maybe_force_platform  # noqa: E402

maybe_force_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def build_model(size: str):
    from tpu_tts.configs.vits_config import VitsConfig
    from tpu_tts.models.vits import Vits

    if size == "full":
        cfg = VitsConfig()
        cfg.model_args.num_chars = 165
        model = Vits(cfg)
    else:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from __graft_entry__ import _tiny_vits

        model = _tiny_vits()
    cpu = jax.devices("cpu")[0] if ARGS.virtual == 0 else jax.devices()[0]
    with jax.default_device(cpu):
        model.init_params(jax.random.PRNGKey(0))
    return model


def bench_infer(model, counts, bpd, iters):
    from tpu_tts.models.vits import VitsNet

    cfg = model.config
    sr, hop = cfg.audio.sample_rate, cfg.audio.hop_length
    T_en = 32 if ARGS.size == "tiny" else 128
    y_max = 64 if ARGS.size == "tiny" else 768
    results = []
    for d in counts:
        mesh = Mesh(np.array(jax.devices()[:d]), ("data",))
        repl = NamedSharding(mesh, P())
        dsh = NamedSharding(mesh, P("data"))
        params = jax.device_put(model.params["generator"], repl)
        B = bpd * d
        x = jax.device_put(
            np.random.default_rng(0).integers(1, 64, (B, T_en)).astype(np.int32),
            dsh,
        )
        xl = jax.device_put(np.full((B,), T_en, dtype=np.int32), dsh)

        @jax.jit
        def fn(p, xi, xli, rng):
            return model.net.apply(
                {"params": p}, xi, xli, y_max,
                method=VitsNet.inference,
                rngs={"noise": rng, "sdp": jax.random.fold_in(rng, 1)},
            )["model_outputs"]

        with mesh:
            out = fn(params, x, xl, jax.random.PRNGKey(0))
            out.block_until_ready()  # compile + warmup
            t0 = time.perf_counter()
            for i in range(iters):
                out = fn(params, x, xl, jax.random.fold_in(jax.random.PRNGKey(1), i))
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
        audio_s = B * y_max * hop / sr
        results.append({
            "mode": "infer", "devices": d, "batch": B,
            "step_s": round(dt, 4),
            "audio_s_per_s": round(audio_s / dt, 1),
            "rtf": round(audio_s / dt, 1),
        })
    return results


def bench_train(model, counts, bpd, iters):
    import optax

    results = []
    hop = model.config.audio.hop_length
    T_en, T_spec = (16, 24) if ARGS.size == "tiny" else (64, 128)
    opts = model.get_optimizer()
    for d in counts:
        mesh = Mesh(np.array(jax.devices()[:d]), ("data",))
        repl = NamedSharding(mesh, P())
        dsh = NamedSharding(mesh, P("data"))
        params = jax.device_put(model.params, repl)
        opt_states = [
            jax.device_put(opts[i].init(model.param_partition(params, i)), repl)
            for i in range(2)
        ]
        B = bpd * d
        rng = np.random.default_rng(0)
        batch = {
            "text_input": rng.integers(1, 64, (B, T_en)).astype(np.int32),
            "text_lengths": np.full((B,), T_en, dtype=np.int32),
            "mel_lengths": np.full((B,), T_spec, dtype=np.int32),
            "waveform": (rng.standard_normal((B, T_spec * hop, 1)) * 0.1).astype(np.float32),
        }
        batch = {k: jax.device_put(v, dsh) for k, v in batch.items()}

        def make_step(idx):
            def step(params, opt_state, batch, key):
                sub = model.param_partition(params, idx)

                def loss_sub(s):
                    merged = model.param_merge(params, s, idx)
                    loss, _ = model.loss_fn(merged, batch, key, optimizer_idx=idx)
                    return loss

                loss, grads = jax.value_and_grad(loss_sub)(sub)
                updates, opt_state = opts[idx].update(grads, opt_state, sub)
                sub = optax.apply_updates(sub, updates)
                return model.param_merge(params, sub, idx), opt_state, loss

            # no donation: device_put can alias model.params on 1-device runs,
            # and donating would delete the source buffers between counts
            return jax.jit(step)

        steps = [make_step(0), make_step(1)]
        with mesh:
            for idx in (0, 1):  # compile + warmup
                params, opt_states[idx], loss = steps[idx](
                    params, opt_states[idx], batch, jax.random.PRNGKey(idx)
                )
            loss.block_until_ready()
            t0 = time.perf_counter()
            for i in range(iters):
                for idx in (0, 1):
                    params, opt_states[idx], loss = steps[idx](
                        params, opt_states[idx], batch, jax.random.fold_in(jax.random.PRNGKey(2), 2 * i + idx)
                    )
            loss.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
        results.append({
            "mode": "train", "devices": d, "batch": B,
            "step_s": round(dt, 4),
            "samples_per_s": round(B / dt, 1),
        })
    return results


def add_efficiency(rows):
    by_mode = {}
    for r in rows:
        by_mode.setdefault(r["mode"], []).append(r)
    for mode_rows in by_mode.values():
        base = min(mode_rows, key=lambda r: r["devices"])
        key = "audio_s_per_s" if "audio_s_per_s" in base else "samples_per_s"
        for r in mode_rows:
            speedup = r[key] / base[key]
            ideal = r["devices"] / base["devices"]
            r["efficiency"] = round(speedup / ideal, 3)
    return rows


def main():
    n_avail = len(jax.devices())
    if ARGS.devices:
        counts = [int(c) for c in ARGS.devices.split(",") if int(c) <= n_avail]
    else:
        counts, c = [], 1
        while c <= n_avail:
            counts.append(c)
            c *= 2
    bpd = ARGS.batch_per_device or (2 if ARGS.size == "tiny" else 32)
    iters = ARGS.iters or (3 if ARGS.virtual else 10)
    print(f"[scaling_bench] platform={jax.devices()[0].platform} "
          f"devices={n_avail} counts={counts} size={ARGS.size}", file=sys.stderr)
    model = build_model(ARGS.size)
    rows = []
    if ARGS.mode in ("infer", "both"):
        rows += bench_infer(model, counts, bpd, iters)
    if ARGS.mode in ("train", "both"):
        rows += bench_train(model, counts, bpd, iters)
    for r in add_efficiency(rows):
        print(json.dumps(r))


if __name__ == "__main__":
    main()
