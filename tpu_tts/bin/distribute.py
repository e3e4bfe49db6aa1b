"""Multi-process training launcher — counterpart of the reference's
`python -m trainer.distribute --gpus "0,1" --script train.py`
(docs/source/training_a_model.md:36).

On a TPU pod every host runs the same program and
`jax.distributed.initialize` auto-detects the slice, so this launcher is for
single-machine multi-process runs (CPU collectives testing, or one process
per local device group):

    python -m tpu_tts.bin.distribute --nproc 2 --script my_train.py -- --config_path c.json
    python -m tpu_tts.bin.distribute --nproc 2 --module tpu_tts.bin.train_tts -- --config_path c.json

Each worker gets `TPU_TTS_COORDINATOR` / `TPU_TTS_NUM_PROCESSES` /
`TPU_TTS_PROCESS_ID` (consumed by `tpu_tts.parallel.init_distributed`).
"""

import argparse
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--script", default=None, help="python script to run per process")
    parser.add_argument("--module", default=None, help="python module to run per process (python -m ...)")
    parser.add_argument("--nproc", type=int, default=2, help="number of worker processes")
    parser.add_argument("--coordinator", default=None, help="host:port (default: localhost + a free port)")
    parser.add_argument("rest", nargs=argparse.REMAINDER, help="args after -- go to the script")
    args = parser.parse_args(argv)
    if not args.script and not args.module:
        parser.error("one of --script / --module is required")
    rest = args.rest[1:] if args.rest[:1] == ["--"] else args.rest
    coordinator = args.coordinator or f"127.0.0.1:{_free_port()}"

    procs = []
    for pid in range(args.nproc):
        env = dict(os.environ)
        env["TPU_TTS_COORDINATOR"] = coordinator
        env["TPU_TTS_NUM_PROCESSES"] = str(args.nproc)
        env["TPU_TTS_PROCESS_ID"] = str(pid)
        cmd = [sys.executable, "-m", args.module] if args.module else [sys.executable, args.script]
        procs.append(subprocess.Popen(cmd + rest, env=env))
    rc = 0
    for p in procs:
        rc = p.wait() or rc
    return rc


if __name__ == "__main__":
    sys.exit(main())
