"""jax.profiler integration (SURVEY §5: the reference has none — wall-clock
prints only; on TPU a real trace is table stakes).

Usage:
    with profile_trace("/tmp/tpu_tts_trace"):        # context manager
        run_steps()
or via config: set `profile_dir` (+ optional `profile_start_step` /
`profile_end_step`) and the Trainer brackets those steps with a trace.
Open the result with TensorBoard's profile plugin or xprof."""

import contextlib
import os
import sys


@contextlib.contextmanager
def profile_trace(logdir: str):
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        print(f" > profiler trace written to {logdir}", file=sys.stderr)


class StepProfiler:
    """Start/stop a trace around a step window (driven by the Trainer)."""

    def __init__(self, logdir, start_step: int = 10, end_step: int = 15):
        self.logdir = logdir
        self.start_step = start_step
        self.end_step = end_step
        self._active = False

    def maybe_start(self, step: int):
        if self.logdir and not self._active and step == self.start_step:
            import jax

            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._active = True

    def maybe_stop(self, step: int):
        if self._active and step >= self.end_step:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            print(f" > profiler trace written to {self.logdir}", file=sys.stderr)

    def close(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
