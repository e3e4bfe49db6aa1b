"""Serving export: serialize a jitted inference function to a portable
StableHLO artifact (`jax.export`).

TPU-native counterpart of the reference's ONNX export (ref tts/models/vits.py:
1806 `export_onnx`): instead of an ONNX graph for onnxruntime, we serialize the
XLA program itself. The artifact embeds the weights as constants, is loadable
without the model class (only jax), and runs on any backend whose PJRT plugin
supports the serialized StableHLO (CPU/GPU/TPU).

Unlike ONNX's dynamic axes, shapes are fixed at export time — the TPU serving
idiom is one artifact per bucket shape (see `Vits.inference` bucketing).
"""

import json
import os
import zipfile
from typing import Callable, Dict, Sequence

import jax


def export_serving_fn(fn: Callable, example_args: Sequence, output_path: str, meta: Dict = None) -> str:
    """Trace `fn(*example_args)`, serialize, and write a `.xla.zip` artifact
    (serialized StableHLO + json metadata). Returns the path written."""
    from jax import export as jax_export

    exported = jax_export.export(jax.jit(fn))(*example_args)
    payload = exported.serialize()
    meta = dict(meta or {})
    meta.setdefault("in_avals", [str(a) for a in exported.in_avals])
    meta.setdefault("out_avals", [str(a) for a in exported.out_avals])
    meta.setdefault("platforms", list(exported.platforms))
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    with zipfile.ZipFile(output_path, "w") as zf:
        zf.writestr("module.stablehlo", payload)
        zf.writestr("meta.json", json.dumps(meta, indent=2))
    return output_path


def load_serving_fn(path: str):
    """Load an exported artifact → (callable, meta). The callable takes the
    same positional args the function was exported with."""
    from jax import export as jax_export

    with zipfile.ZipFile(path) as zf:
        payload = zf.read("module.stablehlo")
        meta = json.loads(zf.read("meta.json"))
    exported = jax_export.deserialize(payload)
    return exported.call, meta
