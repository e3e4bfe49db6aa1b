"""Parallelism / communication backend.

The moral replacement for the reference's `trainer.distribute` launcher and
TTS/utils/distribute.py (NCCL DDP init :13, `reduce_tensor` allreduce-mean
:6): JAX distributed init, mesh construction, and collective helpers. Inside
`pjit`/`shard_map` gradient sync is implicit (XLA inserts psums from the
shardings); `reduce_mean` is for explicit `shard_map` code paths.
"""

from tpu_tts.parallel.platform import init_distributed, maybe_force_platform, maybe_init_distributed


def make_mesh(axes=("data",), devices=None):
    """A Mesh over all (or the given) devices; 1-D by default, or factored
    (e.g. ("data", "model")) with the model axis innermost so it rides ICI."""
    import numpy as np

    import jax
    from jax.sharding import Mesh

    devices = np.array(devices if devices is not None else jax.devices())
    if len(axes) > 1:
        n = len(devices)
        model = max(d for d in range(1, n + 1) if n % d == 0 and d <= n // 1)
        # default split: as data-parallel as possible, model axis = 1
        shape = [n] + [1] * (len(axes) - 1)
        devices = devices.reshape(shape)
    return Mesh(devices, axes)


def reduce_mean(x, axis_name: str = "data"):
    """Cross-device mean (ref distribute.py:6 `reduce_tensor`); for use inside
    `shard_map`/`pmap` bodies."""
    import jax

    return jax.lax.pmean(x, axis_name)


def local_device_count() -> int:
    import jax

    return jax.local_device_count()


def process_index() -> int:
    import jax

    return jax.process_index()


__all__ = [
    "maybe_force_platform",
    "init_distributed",
    "make_mesh",
    "reduce_mean",
    "local_device_count",
    "process_index",
]
