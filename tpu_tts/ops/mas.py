"""Monotonic Alignment Search (MAS) — three interchangeable backends.

The reference ships MAS to the CPU every training step
(/root/reference/TTS/tts/utils/helpers.py:187 copies logp to numpy, runs the
Cython DP from monotonic_align/core.pyx, copies back) — a device→host→device
round trip per step. This module provides:

1. `maximum_path_jax`  — fully on-device `lax.scan` DP + backtrace. This is the
   default inside jitted train steps (Glow-TTS / VITS / ForwardTTS): no host
   round trip, O(T_mel) scan steps each doing O(B·T_text) VPU work.
2. `maximum_path_cpp`  — C++/OpenMP host kernel (ctypes; built on demand from
   mas_cpp.cpp), the fast host-side path for data preprocessing tools.
3. `maximum_path_numpy`— pure numpy oracle for parity tests.

All take log-prob `value [B, T_x, T_y]` + `mask [B, T_x, T_y]` and return a
0/1 path of the same shape, matching the reference's semantics exactly.
"""

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_MAX_NEG = -1e9

# ---------------------------------------------------------------------------
# numpy reference
# ---------------------------------------------------------------------------


def maximum_path_numpy(value: np.ndarray, mask: np.ndarray, max_neg_val: float = -np.inf) -> np.ndarray:
    """Vectorized numpy MAS (semantics of reference helpers.py:197)."""
    value = value * mask
    b, t_x, t_y = value.shape
    direction = np.zeros(value.shape, dtype=np.int64)
    v = np.zeros((b, t_x), dtype=np.float32)
    x_range = np.arange(t_x, dtype=np.float32).reshape(1, -1)
    for j in range(t_y):
        v0 = np.pad(v, [[0, 0], [1, 0]], mode="constant", constant_values=max_neg_val)[:, :-1]
        v1 = v
        max_mask = v1 >= v0
        v_max = np.where(max_mask, v1, v0)
        direction[:, :, j] = max_mask
        index_mask = x_range <= j
        v = np.where(index_mask, v_max + value[:, :, j], max_neg_val)
    direction = np.where(mask.astype(bool), direction, 1)

    path = np.zeros(value.shape, dtype=np.float32)
    index = mask[:, :, 0].sum(1).astype(np.int64) - 1
    index_range = np.arange(b)
    for j in reversed(range(t_y)):
        path[index_range, index, j] = 1
        index = index + direction[index_range, index, j] - 1
    return path * mask


# ---------------------------------------------------------------------------
# C++ host kernel (ctypes, built on demand)
# ---------------------------------------------------------------------------

_LIB: Optional[ctypes.CDLL] = None


def _build_lib() -> ctypes.CDLL:
    src = os.path.join(os.path.dirname(__file__), "mas_cpp.cpp")
    cache_dir = os.path.join(tempfile.gettempdir(), "tpu_tts_native")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libmas.so")
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(src):
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC", src, "-o", so_path]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(so_path)
    lib.maximum_path_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
    ]
    lib.maximum_path_batch.restype = None
    return lib


def cpp_available() -> bool:
    global _LIB
    if _LIB is not None:
        return True
    try:
        _LIB = _build_lib()
        return True
    except (subprocess.CalledProcessError, OSError):
        return False


def maximum_path_cpp(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """C++/OpenMP banded MAS over a batch. Host-side arrays in/out."""
    if not cpp_available():
        return maximum_path_numpy(value, mask)
    value = np.ascontiguousarray((value * mask).astype(np.float32))
    b, t_x, t_y = value.shape
    paths = np.zeros((b, t_x, t_y), dtype=np.int32)
    t_xs = np.ascontiguousarray(mask.sum(1)[:, 0].astype(np.int32))
    t_ys = np.ascontiguousarray(mask.sum(2)[:, 0].astype(np.int32))
    _LIB.maximum_path_batch(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        value.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b,
        t_x,
        t_y,
        np.float32(_MAX_NEG),
    )
    return paths.astype(np.float32) * mask


# ---------------------------------------------------------------------------
# On-device JAX version (jit/grad-safe; used inside train steps)
# ---------------------------------------------------------------------------


def maximum_path_jax(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """MAS as two `lax.scan`s, entirely on-device.

    Forward: scan over the mel axis carrying the DP row `v [B, T_x]`, emitting
    per-column direction bits. Backward: reverse scan carrying the path index.
    Gradients are stopped — the path is a hard assignment, as in the reference.
    """
    value = jax.lax.stop_gradient(value * mask)
    mask_f = jax.lax.stop_gradient(mask.astype(value.dtype))
    B, t_x, t_y = value.shape
    x_range = jnp.arange(t_x, dtype=jnp.float32)[None, :]  # [1, T_x]

    def fwd(v, j_and_col):
        j, col = j_and_col  # col: [B, T_x]
        v0 = jnp.pad(v, ((0, 0), (1, 0)), constant_values=_MAX_NEG)[:, :-1]
        max_mask = v >= v0  # True: came from same x (stay)
        v_max = jnp.where(max_mask, v, v0)
        index_mask = x_range <= j
        v_new = jnp.where(index_mask, v_max + col, _MAX_NEG)
        return v_new, max_mask

    cols = jnp.moveaxis(value, 2, 0)  # [T_y, B, T_x]
    js = jnp.arange(t_y, dtype=jnp.float32)
    _, directions = jax.lax.scan(fwd, jnp.zeros((B, t_x)), (js, cols))
    # directions: [T_y, B, T_x]; outside mask → 1 (stay), as in reference
    directions = jnp.where(jnp.moveaxis(mask_f, 2, 0) > 0, directions.astype(jnp.int32), 1)

    t_x_lens = mask_f[:, :, 0].sum(1).astype(jnp.int32)  # [B]

    def bwd(index, dir_col):
        # dir_col: [B, T_x] directions at column j (scanned in reverse)
        onehot = jax.nn.one_hot(index, t_x, dtype=value.dtype)  # [B, T_x]
        d = jnp.take_along_axis(dir_col, index[:, None], axis=1)[:, 0]
        index_new = index + d - 1
        return index_new, onehot

    _, path_cols = jax.lax.scan(bwd, t_x_lens - 1, directions, reverse=True)
    path = jnp.moveaxis(path_cols, 0, 2)  # [B, T_x, T_y]
    return path * mask_f


def maximum_path(value, mask, backend: str = "jax"):
    """Dispatch by backend name ('jax' on-device, 'cpp' host, 'numpy' oracle)."""
    if backend == "jax":
        return maximum_path_jax(value, mask)
    if backend == "cpp":
        return maximum_path_cpp(np.asarray(value), np.asarray(mask))
    return maximum_path_numpy(np.asarray(value), np.asarray(mask))
