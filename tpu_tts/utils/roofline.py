"""Per-kernel profile report from a `jax.profiler` trace (SURVEY §5: the
reference has no tracing at all; on TPU per-kernel numbers are table stakes).

Reads the xplane.pb written by `profile_trace`/`StepProfiler`, aggregates
device-op durations, and prints a top-N table with time shares plus an
optional roofline summary (achieved FLOP/s vs the chip peak when the caller
supplies the program's FLOP count).

The tensorboard-plugin converter is broken in this environment; we parse the
proto directly (pure-python protobuf impl + tensorflow.tsl's xplane_pb2).

CLI:
    python -m tpu_tts.utils.roofline <profile_dir> [--top 20] [--flops 3.3e13]
"""

import argparse
import glob
import os
import sys
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

# peak numbers for utilization estimates (per chip)
CHIP_PEAKS = {
    # name: (bf16 FLOP/s, HBM bytes/s)
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
}


def _find_xplanes(profile_dir: str) -> List[str]:
    pats = [
        os.path.join(profile_dir, "**", "*.xplane.pb"),
        os.path.join(profile_dir, "*.xplane.pb"),
    ]
    out = []
    for p in pats:
        out.extend(glob.glob(p, recursive=True))
    return sorted(set(out))


def parse_xplane(path: str, device_substr: str = "TPU") -> Dict[str, float]:
    """Aggregate event durations (seconds) per op name over all device planes
    whose name contains `device_substr`."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    totals: Dict[str, float] = defaultdict(float)
    for plane in space.planes:
        if device_substr not in plane.name:
            continue
        names = {m.id: m.name for m in plane.event_metadata.values()}
        # only the synchronous per-op line: 'Steps'/'XLA Modules' duplicate
        # the same time at coarser granularity and 'Async XLA Ops' counts
        # overlapped DMA wall-time — summing those triple-counts the window
        lines = [l for l in plane.lines if l.name == "XLA Ops"] or list(plane.lines)
        for line in lines:
            for ev in line.events:
                name = names.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps * 1e-12
    return dict(totals)


def profile_report(
    profile_dir: str,
    top: int = 20,
    flops: Optional[float] = None,
    chip: str = "v5e",
    device_substr: str = "TPU",
    file=None,
) -> List[Tuple[str, float]]:
    """Print the top-N ops by device time; returns [(op, seconds), ...].

    If `flops` (total program FLOPs across the traced window) is given, also
    prints achieved FLOP/s and MFU against the `chip` peak.
    """
    file = file or sys.stdout
    paths = _find_xplanes(profile_dir)
    if not paths:
        print(f" [!] no xplane.pb under {profile_dir}", file=file)
        return []
    totals: Dict[str, float] = defaultdict(float)
    for p in paths:
        for k, v in parse_xplane(p, device_substr).items():
            totals[k] += v
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])
    all_s = sum(totals.values())
    print(f"\n per-kernel device time ({profile_dir}; {len(paths)} xplane file(s))", file=file)
    print(f" {'op':60s} {'ms':>10s} {'share':>7s}", file=file)
    for name, sec in ranked[:top]:
        print(f" {name[:60]:60s} {sec * 1e3:10.3f} {sec / all_s * 100:6.1f}%", file=file)
    print(f" {'TOTAL':60s} {all_s * 1e3:10.3f} {'100.0%':>7s}", file=file)
    if flops:
        peak_flops, peak_bw = CHIP_PEAKS.get(chip, CHIP_PEAKS["v5e"])
        achieved = flops / all_s
        print(
            f"\n roofline: {achieved / 1e12:.1f} TFLOP/s achieved over the window "
            f"→ {achieved / peak_flops * 100:.1f}% MFU vs {chip} peak "
            f"({peak_flops / 1e12:.0f} TF bf16, {peak_bw / 1e9:.0f} GB/s HBM)",
            file=file,
        )
    return ranked


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--flops", type=float, default=None, help="total FLOPs of the traced window")
    ap.add_argument("--chip", default="v5e", choices=sorted(CHIP_PEAKS))
    ap.add_argument("--device", default="TPU", help="device plane substring (e.g. TPU, CPU)")
    args = ap.parse_args(argv)
    profile_report(args.profile_dir, args.top, args.flops, args.chip, args.device)


if __name__ == "__main__":
    main()
