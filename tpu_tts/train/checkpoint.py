"""Checkpoint I/O: orbax pytree checkpoints + travelling config.json.

Replaces the reference's torch `.pth` + fsspec stack (`trainer.io`,
TTS/utils/io.py:27): each checkpoint is an orbax directory
`checkpoint_<step>/` (or `best_model_<step>/`) holding the param/optimizer
pytrees, with `config.json` saved next to it so a checkpoint fully describes
its model (the property that makes the zoo/CLI/server work). Also provides a
torch→jax converter entry for ingesting reference checkpoints.
"""

import glob
import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    state: Dict[str, Any],
    output_dir: str,
    step: int,
    config=None,
    prefix: str = "checkpoint",
    keep_n: Optional[int] = None,
) -> str:
    """Save a train-state pytree as `<output_dir>/<prefix>_<step>/`.

    Multi-process: orbax saves are COLLECTIVE — every process must call this
    (rank-0-only calls deadlock on orbax's internal barrier). Filesystem
    maintenance (stale-dir removal, config.json, keep_n pruning) runs on the
    primary process only."""
    import jax

    is_main = jax.process_index() == 0
    multi = jax.process_count() > 1
    path = os.path.abspath(os.path.join(output_dir, f"{prefix}_{step}"))
    if is_main and os.path.exists(path):
        shutil.rmtree(path)
    if multi:
        from jax.experimental import multihost_utils

        # barrier so no process enters the orbax save while the primary is
        # still clearing a stale dir of the same name
        multihost_utils.sync_global_devices(f"tpu_tts:pre_save:{prefix}_{step}")
    _checkpointer().save(path, state)
    if config is not None and is_main:
        config.save_json(os.path.join(output_dir, "config.json"))
    if not is_main:
        return path
    if keep_n:
        ckpts = sorted(
            glob.glob(os.path.join(output_dir, f"{prefix}_*")),
            key=lambda p: int(re.findall(r"_(\d+)$", p)[0]) if re.findall(r"_(\d+)$", p) else -1,
        )
        for old in ckpts[:-keep_n]:
            shutil.rmtree(old, ignore_errors=True)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load an orbax checkpoint dir (or a torch .pth via the converter)."""
    if path.endswith(".pth"):
        from tpu_tts.train.torch_convert import load_torch_checkpoint

        return load_torch_checkpoint(path)
    return _checkpointer().restore(os.path.abspath(path))


def get_last_checkpoint(output_dir: str) -> Tuple[str, str]:
    """Return (last_checkpoint_path, best_model_path) — reference
    `trainer.get_last_checkpoint` surface used by train tests."""

    def _latest(prefix):
        ckpts = glob.glob(os.path.join(output_dir, f"{prefix}_*"))
        with_steps = []
        for p in ckpts:
            m = re.findall(r"_(\d+)$", p)
            if m:
                with_steps.append((int(m[0]), p))
        if not with_steps:
            return None
        return max(with_steps)[1]

    last = _latest("checkpoint")
    best = _latest("best_model") or last
    if last is None:
        raise ValueError(f" [!] No checkpoints found in {output_dir}")
    return last, best


def save_best_model(
    current_loss: float,
    best_loss: float,
    state: Dict[str, Any],
    output_dir: str,
    step: int,
    config=None,
    keep_all_best: bool = False,
) -> float:
    """Track-and-save best model by eval loss (reference trainer.io surface).
    Collective like `save_checkpoint` — the loss is a global (identical)
    value, so every process takes the same branch."""
    if current_loss < best_loss:
        save_checkpoint(state, output_dir, step, config=config, prefix="best_model", keep_n=None if keep_all_best else 1)
        import jax

        if jax.process_index() == 0:
            print(f" > BEST MODEL : loss {current_loss:.5f} @ step {step}")
        return current_loss
    return best_loss


def copy_model_files(config, output_dir: str, new_fields: Optional[Dict] = None):
    """Persist config (+ extra fields) beside checkpoints."""
    data = config.to_dict()
    if new_fields:
        data.update(new_fields)
    with open(os.path.join(output_dir, "config.json"), "w", encoding="utf-8") as f:
        json.dump(data, f, indent=4, default=str)
