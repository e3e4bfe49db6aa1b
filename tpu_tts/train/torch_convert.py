"""Torch `.pth` checkpoint ingestion (reference-checkpoint parity path).

Loads a reference torch checkpoint into numpy dicts. Model-specific key
mapping (torch module names → flax param paths, weight-norm folding, conv
kernel transposition) lives with each model's `convert_torch_state_dict`.
"""

from typing import Any, Dict

import numpy as np


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    out: Dict[str, Any] = {}
    for key, value in ckpt.items():
        if key == "model" and isinstance(value, dict):
            out["torch_state_dict"] = {
                k: to_np(v) for k, v in value.items() if hasattr(v, "shape")
            }
        elif hasattr(value, "detach"):
            out[key] = value.detach().cpu().numpy()
        else:
            out[key] = value
    return out


def torch_conv1d_to_flax(w: np.ndarray) -> np.ndarray:
    """torch Conv1d weight `[out, in, k]` → flax `[k, in, out]`."""
    return np.transpose(w, (2, 1, 0))


def torch_linear_to_flax(w: np.ndarray) -> np.ndarray:
    """torch Linear/1x1-conv weight `[out, in]` → flax Dense kernel `[in, out]`."""
    if w.ndim == 3 and w.shape[-1] == 1:  # 1x1 conv
        w = w[:, :, 0]
    return np.transpose(w)


def fold_weight_norm(v: np.ndarray, g: np.ndarray) -> np.ndarray:
    """Fold torch weight-norm (v, g) into a dense kernel: g·v/‖v‖ with the
    norm over all axes but dim0 (torch convention, out-channels first)."""
    norm = np.sqrt(np.sum(v**2, axis=tuple(range(1, v.ndim)), keepdims=True) + 1e-12)
    return v / norm * g.reshape((-1,) + (1,) * (v.ndim - 1))
