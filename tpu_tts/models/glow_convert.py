"""Reference Glow-TTS torch checkpoint → flax param-tree converter.

Maps `GlowTTS.state_dict()` names (TTS/tts/models/glow_tts.py, encoder in
TTS/tts/layers/glow_tts/{encoder,transformer,duration_predictor}.py, decoder
in TTS/tts/layers/glow_tts/decoder.py) onto our `GlowTTSNet` tree. Same
layout rules as `vits_convert` (shared helpers)."""

import re
from typing import Any, Dict

import numpy as np

from tpu_tts.models.vits_convert import (
    _conv1d,
    _dense,
    _fold_param_pairs,
    _map_wn_block,
    _set,
    _wn_decompose,
)


def convert_glow_tts_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference `GlowTTS` torch state dict → our flax param tree."""
    sd = _fold_param_pairs({k: np.asarray(v) for k, v in state_dict.items()})
    out: Dict[str, Any] = {}

    # ---------------- encoder ----------------
    for k, v in sd.items():
        if k == "encoder.emb.weight":
            _set(out, "encoder/emb/embedding", v)
            continue
        m = re.match(r"encoder\.prenet\.conv_layers\.(\d+)\.(weight|bias)$", k)
        if m:
            i, leaf = m.groups()
            _set(out, f"encoder/prenet/conv_{i}/conv/{'kernel' if leaf == 'weight' else 'bias'}",
                 _conv1d(v) if leaf == "weight" else v)
            continue
        m = re.match(r"encoder\.prenet\.norm_layers\.(\d+)\.(gamma|beta)$", k)
        if m:
            _set(out, f"encoder/prenet/norm_{m.group(1)}/{m.group(2)}", v.reshape(-1))
            continue
        if k == "encoder.prenet.proj.weight":
            _set(out, "encoder/prenet/proj/kernel", _dense(v))
            continue
        if k == "encoder.prenet.proj.bias":
            _set(out, "encoder/prenet/proj/bias", v)
            continue
        m = re.match(r"encoder\.encoder\.attn_layers\.(\d+)\.(emb_rel_[kv])$", k)
        if m:
            _set(out, f"encoder/encoder/attn_{m.group(1)}/{m.group(2)}", v)
            continue
        m = re.match(r"encoder\.encoder\.attn_layers\.(\d+)\.conv_([qkvo])\.(weight|bias)$", k)
        if m:
            i, which, leaf = m.groups()
            _set(out, f"encoder/encoder/attn_{i}/conv_{which}/{'kernel' if leaf == 'weight' else 'bias'}",
                 _dense(v) if leaf == "weight" else v)
            continue
        m = re.match(r"encoder\.encoder\.norm_layers_([12])\.(\d+)\.(gamma|beta)$", k)
        if m:
            n, i, leaf = m.groups()
            _set(out, f"encoder/encoder/norm{n}_{i}/{leaf}", v.reshape(-1))
            continue
        m = re.match(r"encoder\.encoder\.ffn_layers\.(\d+)\.conv_([12])\.(weight|bias)$", k)
        if m:
            i, n, leaf = m.groups()
            _set(out, f"encoder/encoder/ffn_{i}/conv_{n}/conv/{'kernel' if leaf == 'weight' else 'bias'}",
                 _conv1d(v) if leaf == "weight" else v)
            continue
        m = re.match(r"encoder\.proj_([ms])\.(weight|bias)$", k)
        if m:
            which, leaf = m.groups()
            _set(out, f"encoder/proj_{which}/{'kernel' if leaf == 'weight' else 'bias'}",
                 _dense(v) if leaf == "weight" else v)
            continue
        m = re.match(r"encoder\.duration_predictor\.conv_([12])\.(weight|bias)$", k)
        if m:
            n, leaf = m.groups()
            _set(out, f"encoder/duration_predictor/conv_{n}/conv/{'kernel' if leaf == 'weight' else 'bias'}",
                 _conv1d(v) if leaf == "weight" else v)
            continue
        m = re.match(r"encoder\.duration_predictor\.norm_([12])\.(gamma|beta)$", k)
        if m:
            _set(out, f"encoder/duration_predictor/norm_{m.group(1)}/{m.group(2)}", v.reshape(-1))
            continue
        if k == "encoder.duration_predictor.proj.weight":
            _set(out, "encoder/duration_predictor/proj/kernel", _dense(v))
            continue
        if k == "encoder.duration_predictor.proj.bias":
            _set(out, "encoder/duration_predictor/proj/bias", v)
            continue
        if k == "emb_g.weight":
            _set(out, "emb_g/embedding", v)

    map_glow_decoder(sd, out, "decoder.flows", "decoder")

    return out


def map_glow_decoder(sd: Dict[str, np.ndarray], out: Dict, src_prefix: str, dst_prefix: str):
    """Glow `Decoder.flows` = [actnorm, invconv, coupling] × B
    (ref layers/glow_tts/decoder.py:50) → our `GlowDecoder` tree. Shared by
    the Glow-TTS and OverFlow converters. Expects folded weight norm."""
    flow_idx = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(re.escape(src_prefix) + r"\.(\d+)\.", k))}
    )
    an = iv = cp = 0
    for fi in flow_idx:
        src = f"{src_prefix}.{fi}"
        if f"{src}.logs" in sd:  # ActNorm
            _set(out, f"{dst_prefix}/actnorm_{an}/logs", sd[f"{src}.logs"].reshape(-1))
            _set(out, f"{dst_prefix}/actnorm_{an}/bias", sd[f"{src}.bias"].reshape(-1))
            an += 1
        elif f"{src}.weight" in sd:  # InvConvNear
            _set(out, f"{dst_prefix}/invconv_{iv}/weight", sd[f"{src}.weight"])
            iv += 1
        else:  # CouplingBlock
            kv, g = _wn_decompose(_conv1d(sd[f"{src}.start.weight"]))
            _set(out, f"{dst_prefix}/coupling_{cp}/start/v", kv)
            _set(out, f"{dst_prefix}/coupling_{cp}/start/g", g)
            _set(out, f"{dst_prefix}/coupling_{cp}/start/bias", sd[f"{src}.start.bias"])
            _set(out, f"{dst_prefix}/coupling_{cp}/end/kernel", _dense(sd[f"{src}.end.weight"]))
            _set(out, f"{dst_prefix}/coupling_{cp}/end/bias", sd[f"{src}.end.bias"])
            _map_wn_block(sd, out, f"{src}.wn", f"{dst_prefix}/coupling_{cp}/wn")
            cp += 1
