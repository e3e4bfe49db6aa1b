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


def convert_glow_tts_torch_state_dict(
    state_dict: Dict[str, Any], encoder_type: str = "rel_pos_transformer"
) -> Dict[str, Any]:
    """Reference `GlowTTS` torch state dict → our flax param tree."""
    sd = _fold_param_pairs({k: np.asarray(v) for k, v in state_dict.items()})
    out: Dict[str, Any] = {}

    if encoder_type == "gated_conv":
        _map_gated_conv(sd, out)
    elif encoder_type == "residual_conv_bn":
        _map_res_bn_encoder(sd, out)
    elif encoder_type == "time_depth_separable":
        _map_tds_encoder(sd, out)

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


def _map_gated_conv(sd: Dict[str, np.ndarray], out: Dict):
    """`GatedConvBlock` encoder (ref generic/gated_conv.py:6):
    conv_layers/norm_layers → our `encoder/encoder/conv_{i}|norm_{i}`."""
    for k, v in sd.items():
        m = re.match(r"encoder\.encoder\.conv_layers\.(\d+)\.(weight|bias)$", k)
        if m:
            i, leaf = m.groups()
            _set(out, f"encoder/encoder/conv_{i}/conv/{'kernel' if leaf == 'weight' else 'bias'}",
                 _conv1d(v) if leaf == "weight" else v)
        m = re.match(r"encoder\.encoder\.norm_layers\.(\d+)\.(gamma|beta)$", k)
        if m:
            _set(out, f"encoder/encoder/norm_{m.group(1)}/{m.group(2)}", v.reshape(-1))


def _map_res_bn_encoder(sd: Dict[str, np.ndarray], out: Dict):
    """`residual_conv_bn` encoder (ref glow_tts/encoder.py:116-122): 1×1
    prenet, ResidualConv1dBNBlock stack, conv+BN postnet (frozen_batch)."""
    from tpu_tts.models.forward_convert import _map_res_conv_stack

    if "encoder.prenet.0.weight" in sd:
        _set(out, "encoder/prenet/kernel", _dense(sd["encoder.prenet.0.weight"]))
        _set(out, "encoder/prenet/bias", sd["encoder.prenet.0.bias"])
    _map_res_conv_stack(sd, out, "encoder.encoder", "encoder/encoder")
    if "encoder.postnet.0.weight" in sd:
        _set(out, "encoder/postnet_conv/kernel", _dense(sd["encoder.postnet.0.weight"]))
        _set(out, "encoder/postnet_conv/bias", sd["encoder.postnet.0.bias"])
        _set(out, "encoder/postnet_norm/scale", sd["encoder.postnet.1.weight"])
        _set(out, "encoder/postnet_norm/bias", sd["encoder.postnet.1.bias"])
        _set(out, "encoder/postnet_norm/mean", sd["encoder.postnet.1.running_mean"])
        _set(out, "encoder/postnet_norm/var", sd["encoder.postnet.1.running_var"])


def _map_tds_encoder(sd: Dict[str, np.ndarray], out: Dict):
    """`TimeDepthSeparableConvBlock` encoder (ref generic/
    time_depth_sep_conv.py:60); BN running stats → frozen_batch params."""
    def bn(src, dst):
        _set(out, f"{dst}/scale", sd[f"{src}.weight"])
        _set(out, f"{dst}/bias", sd[f"{src}.bias"])
        _set(out, f"{dst}/mean", sd[f"{src}.running_mean"])
        _set(out, f"{dst}/var", sd[f"{src}.running_var"])

    layers = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"encoder\.encoder\.layers\.(\d+)\.", k))}
    )
    for i in layers:
        src, dst = f"encoder.encoder.layers.{i}", f"encoder/encoder/layer_{i}"
        _set(out, f"{dst}/time_conv/kernel", _dense(sd[f"{src}.time_conv.weight"]))
        _set(out, f"{dst}/time_conv/bias", sd[f"{src}.time_conv.bias"])
        bn(f"{src}.norm1", f"{dst}/norm1")
        _set(out, f"{dst}/depth_conv/kernel", _conv1d(sd[f"{src}.depth_conv.weight"]))
        _set(out, f"{dst}/depth_conv/bias", sd[f"{src}.depth_conv.bias"])
        bn(f"{src}.norm2", f"{dst}/norm2")
        _set(out, f"{dst}/time_conv2/kernel", _dense(sd[f"{src}.time_conv2.weight"]))
        _set(out, f"{dst}/time_conv2/bias", sd[f"{src}.time_conv2.bias"])
        bn(f"{src}.norm3", f"{dst}/norm3")


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
