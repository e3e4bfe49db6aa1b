"""Reference VITS torch checkpoint → flax param-tree converter.

Maps the reference's `Vits.state_dict()` names (TTS/tts/models/vits.py:603,
layers in TTS/tts/layers/vits/ and TTS/tts/layers/glow_tts/) onto our
`VitsNet` flax tree. Pure key/layout translation — no reference code.

Layout rules:
- torch Conv1d weight `[out, in, k]`    → flax `[k, in, out]`
- torch ConvTranspose1d `[in, out, k]`  → flax `[k, in, out]`
- torch Conv2d `[out, in, kh, kw]`      → flax `[kh, kw, in, out]`
- torch 1x1 conv / Linear `[out, in]`   → flax Dense `[in, out]`
- torch weight-norm pairs (`parametrizations.weight.original0/1`) are folded
  into a plain weight first, then re-decomposed into our (v, g) convention
  (g = per-out-channel norm) — the effective kernel is bit-identical.
"""

import re
from typing import Any, Dict, Tuple

import numpy as np

from tpu_tts.train.torch_convert import fold_weight_norm


def _conv1d(w):
    return np.transpose(w, (2, 1, 0))


def _convtr1d(w):
    # torch ConvTranspose1d correlates with the spatially-flipped kernel
    # relative to flax's fractionally-strided conv — flip to compensate
    return np.ascontiguousarray(np.transpose(w, (2, 0, 1))[::-1])


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w):
    if w.ndim == 3:
        w = w[:, :, 0]
    return np.transpose(w)


def _wn_decompose(kernel_flax: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Full flax-layout kernel → our (v, g): g = ‖v‖ over all but the last
    (out-channel) axis, so g·v/‖v‖ == kernel exactly."""
    axes = tuple(range(kernel_flax.ndim - 1))
    g = np.sqrt(np.sum(kernel_flax**2, axis=axes) + 0.0)
    return kernel_flax, g


def _set(tree: Dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value, dtype=np.float32)


def _fold_param_pairs(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold `X.parametrizations.weight.original{0,1}` into `X.weight`."""
    out = {}
    done = set()
    for k in sd:
        m = re.match(r"(.*)\.parametrizations\.weight\.original0$", k)
        if m:
            base = m.group(1)
            g = sd[k]
            v = sd[base + ".parametrizations.weight.original1"]
            out[base + ".weight"] = fold_weight_norm(np.asarray(v), np.asarray(g))
            done.add(k)
            done.add(base + ".parametrizations.weight.original1")
    for k, v in sd.items():
        if k not in done and ".parametrizations." not in k:
            out.setdefault(k, np.asarray(v))
    return out


def _map_wn_block(sd, tree, src: str, dst: str):
    """Reference `WN` stack (glow_tts/glow.py WN): in_layers / res_skip_layers
    / cond_layer → our `in_{i}` / `res_skip_{i}` / `cond` WNConv1d params."""
    pat = re.compile(re.escape(src) + r"\.(in_layers|res_skip_layers)\.(\d+)\.(weight|bias)$")
    for k, v in sd.items():
        m = pat.match(k)
        if m:
            kind = "in" if m.group(1) == "in_layers" else "res_skip"
            i, leaf = m.group(2), m.group(3)
            if leaf == "weight":
                kv, g = _wn_decompose(_conv1d(v))
                _set(tree, f"{dst}/{kind}_{i}/v", kv)
                _set(tree, f"{dst}/{kind}_{i}/g", g)
            else:
                _set(tree, f"{dst}/{kind}_{i}/bias", v)
        elif k == f"{src}.cond_layer.weight":
            kv, g = _wn_decompose(_conv1d(v))
            _set(tree, f"{dst}/cond/v", kv)
            _set(tree, f"{dst}/cond/g", g)
        elif k == f"{src}.cond_layer.bias":
            _set(tree, f"{dst}/cond/bias", v)


def _map_dds_conv(sd, tree, src: str, dst: str):
    """Reference `DDSConv` (vits/stochastic_duration_predictor.py) →
    our sep_{i}/conv1x1_{i}/norm1_{i}/norm2_{i}."""
    for k, v in sd.items():
        m = re.match(re.escape(src) + r"\.convs_sep\.(\d+)\.(weight|bias)$", k)
        if m:
            i, leaf = m.groups()
            _set(tree, f"{dst}/sep_{i}/{'kernel' if leaf == 'weight' else 'bias'}",
                 _conv1d(v) if leaf == "weight" else v)
            continue
        m = re.match(re.escape(src) + r"\.convs_1x1\.(\d+)\.(weight|bias)$", k)
        if m:
            i, leaf = m.groups()
            _set(tree, f"{dst}/conv1x1_{i}/{'kernel' if leaf == 'weight' else 'bias'}",
                 _dense(v) if leaf == "weight" else v)
            continue
        m = re.match(re.escape(src) + r"\.norms_([12])\.(\d+)\.(gamma|beta)$", k)
        if m:
            n, i, leaf = m.groups()
            _set(tree, f"{dst}/norm{n}_{i}/{leaf}", v)


def _map_conv_flow(sd, tree, src: str, dst: str):
    """Reference `ConvFlow` → our flows_{j}: pre/proj 1x1 + DDSConv."""
    for leaf in ("weight", "bias"):
        if f"{src}.pre.{leaf}" in sd:
            _set(tree, f"{dst}/pre/{'kernel' if leaf == 'weight' else 'bias'}",
                 _dense(sd[f"{src}.pre.{leaf}"]) if leaf == "weight" else sd[f"{src}.pre.{leaf}"])
        if f"{src}.proj.{leaf}" in sd:
            _set(tree, f"{dst}/proj/{'kernel' if leaf == 'weight' else 'bias'}",
                 _dense(sd[f"{src}.proj.{leaf}"]) if leaf == "weight" else sd[f"{src}.proj.{leaf}"])
    _map_dds_conv(sd, tree, f"{src}.convs", f"{dst}/convs")


def map_hifigan_generator(sd, tree, src: str, dst: str):
    """Reference `HifiganGenerator` (vocoder/models/hifigan_generator.py:125)
    → our flax tree: conv_pre / ups / resblocks / conv_post / cond_layer."""
    prefix = src + "." if src else ""
    for k, v in sd.items():
        if prefix and not k.startswith(prefix):
            continue
        rest = k[len(prefix):]
        if rest in ("conv_pre.weight", "conv_post.weight"):
            which = rest.split(".")[0]
            kv, g = _wn_decompose(_conv1d(v))
            _set(tree, f"{dst}/{which}/v", kv)
            _set(tree, f"{dst}/{which}/g", g)
            continue
        if rest in ("conv_pre.bias", "conv_post.bias"):
            _set(tree, f"{dst}/{rest.split('.')[0]}/bias", v)
            continue
        m = re.match(r"ups\.(\d+)\.(weight|bias)$", rest)
        if m:
            i, leaf = m.groups()
            if leaf == "weight":
                kv, g = _wn_decompose(_convtr1d(v))
                _set(tree, f"{dst}/ups_{i}/v", kv)
                _set(tree, f"{dst}/ups_{i}/g", g)
            else:
                _set(tree, f"{dst}/ups_{i}/bias", v)
            continue
        m = re.match(r"resblocks\.(\d+)\.(convs\d?)\.(\d+)\.(weight|bias)$", rest)
        if m:
            i, convs, j, leaf = m.groups()
            if leaf == "weight":
                kv, g = _wn_decompose(_conv1d(v))
                _set(tree, f"{dst}/resblocks_{i}/{convs}_{j}/v", kv)
                _set(tree, f"{dst}/resblocks_{i}/{convs}_{j}/g", g)
            else:
                _set(tree, f"{dst}/resblocks_{i}/{convs}_{j}/bias", v)
            continue
        if rest in ("cond_layer.weight", "cond.weight"):
            _set(tree, f"{dst}/cond_layer/kernel", _dense(v))
            continue
        if rest in ("cond_layer.bias", "cond.bias"):
            _set(tree, f"{dst}/cond_layer/bias", v)
            continue
        m = re.match(r"conds\.(\d+)\.(weight|bias)$", rest)
        if m:
            i, leaf = m.groups()
            _set(tree, f"{dst}/conds_{i}/{'kernel' if leaf == 'weight' else 'bias'}",
                 _dense(v) if leaf == "weight" else v)

    # conv_post in the reference has no bias when conv_post_bias=False; ours
    # always has one — zero-fill so the effective op is identical
    node = tree
    for part in dst.split("/"):
        node = node.get(part, {})
    if "conv_post" in node and "bias" not in node["conv_post"]:
        node["conv_post"]["bias"] = np.zeros(node["conv_post"]["g"].shape, dtype=np.float32)


def convert_vits_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference `Vits` torch state dict → `{"generator": ..., "discriminator": ...}`
    flax param tree (numpy leaves)."""
    sd = _fold_param_pairs({k: np.asarray(v) for k, v in state_dict.items()})
    gen: Dict[str, Any] = {}
    disc: Dict[str, Any] = {}

    # ---- text encoder ----
    for k, v in sd.items():
        if k == "text_encoder.emb.weight":
            _set(gen, "text_encoder/emb/embedding", v)
            continue
        m = re.match(r"text_encoder\.encoder\.attn_layers\.(\d+)\.(emb_rel_[kv])$", k)
        if m:
            _set(gen, f"text_encoder/encoder/attn_{m.group(1)}/{m.group(2)}", v)
            continue
        m = re.match(r"text_encoder\.encoder\.attn_layers\.(\d+)\.conv_([qkvo])\.(weight|bias)$", k)
        if m:
            i, which, leaf = m.groups()
            _set(gen, f"text_encoder/encoder/attn_{i}/conv_{which}/{'kernel' if leaf == 'weight' else 'bias'}",
                 _dense(v) if leaf == "weight" else v)
            continue
        m = re.match(r"text_encoder\.encoder\.norm_layers_([12])\.(\d+)\.(gamma|beta)$", k)
        if m:
            n, i, leaf = m.groups()
            _set(gen, f"text_encoder/encoder/norm{n}_{i}/{leaf}", v)
            continue
        m = re.match(r"text_encoder\.encoder\.ffn_layers\.(\d+)\.conv_([12])\.(weight|bias)$", k)
        if m:
            i, n, leaf = m.groups()
            _set(gen, f"text_encoder/encoder/ffn_{i}/conv_{n}/conv/{'kernel' if leaf == 'weight' else 'bias'}",
                 _conv1d(v) if leaf == "weight" else v)
            continue
        if k == "text_encoder.proj.weight":
            _set(gen, "text_encoder/proj/kernel", _dense(v))
        elif k == "text_encoder.proj.bias":
            _set(gen, "text_encoder/proj/bias", v)

    # ---- posterior encoder ----
    if "posterior_encoder.pre.weight" in sd:
        _set(gen, "posterior_encoder/pre/kernel", _dense(sd["posterior_encoder.pre.weight"]))
        _set(gen, "posterior_encoder/pre/bias", sd["posterior_encoder.pre.bias"])
        _set(gen, "posterior_encoder/proj/kernel", _dense(sd["posterior_encoder.proj.weight"]))
        _set(gen, "posterior_encoder/proj/bias", sd["posterior_encoder.proj.bias"])
        _map_wn_block(sd, gen, "posterior_encoder.enc", "posterior_encoder/enc")

    # ---- flow (couplings sit at even indices; odd are param-free flips) ----
    flow_idx = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"flow\.flows\.(\d+)\.", k))}
    )
    for j, fi in enumerate(flow_idx):
        src = f"flow.flows.{fi}"
        dst = f"flow/coupling_{j}"
        _set(gen, f"{dst}/pre/kernel", _dense(sd[f"{src}.pre.weight"]))
        _set(gen, f"{dst}/pre/bias", sd[f"{src}.pre.bias"])
        _set(gen, f"{dst}/post/kernel", _dense(sd[f"{src}.post.weight"]))
        _set(gen, f"{dst}/post/bias", sd[f"{src}.post.bias"])
        _map_wn_block(sd, gen, f"{src}.enc", f"{dst}/enc")

    # ---- duration predictor (stochastic or deterministic) ----
    dp = "duration_predictor"
    if f"{dp}.flows.0.log_scale" in sd:  # SDP
        for group, my_group in (("flows", "flows"), ("post_flows", "post_flows")):
            idx = sorted(
                {int(m.group(1)) for k in sd if (m := re.match(rf"{dp}\.{group}\.(\d+)\.", k))}
            )
            for j, fi in enumerate(idx):
                src = f"{dp}.{group}.{fi}"
                if f"{src}.log_scale" in sd:  # ElementwiseAffine
                    _set(gen, f"{dp}/{my_group}_{j}/log_scale", sd[f"{src}.log_scale"].reshape(-1))
                    _set(gen, f"{dp}/{my_group}_{j}/translation", sd[f"{src}.translation"].reshape(-1))
                else:  # ConvFlow
                    _map_conv_flow(sd, gen, src, f"{dp}/{my_group}_{j}")
        for name in ("pre", "proj", "post_pre", "post_proj"):
            if f"{dp}.{name}.weight" in sd:
                _set(gen, f"{dp}/{name}/kernel", _dense(sd[f"{dp}.{name}.weight"]))
                _set(gen, f"{dp}/{name}/bias", sd[f"{dp}.{name}.bias"])
        _map_dds_conv(sd, gen, f"{dp}.convs", f"{dp}/convs")
        _map_dds_conv(sd, gen, f"{dp}.post_convs", f"{dp}/post_convs")
        if f"{dp}.cond.weight" in sd:
            _set(gen, f"{dp}/cond/kernel", _dense(sd[f"{dp}.cond.weight"]))
            _set(gen, f"{dp}/cond/bias", sd[f"{dp}.cond.bias"])
    elif f"{dp}.conv_1.weight" in sd:  # deterministic DurationPredictor
        for n in ("1", "2"):
            _set(gen, f"{dp}/conv_{n}/conv/kernel", _conv1d(sd[f"{dp}.conv_{n}.weight"]))
            _set(gen, f"{dp}/conv_{n}/conv/bias", sd[f"{dp}.conv_{n}.bias"])
            _set(gen, f"{dp}/norm_{n}/gamma", sd[f"{dp}.norm_{n}.gamma"])
            _set(gen, f"{dp}/norm_{n}/beta", sd[f"{dp}.norm_{n}.beta"])
        _set(gen, f"{dp}/proj/kernel", _dense(sd[f"{dp}.proj.weight"]))
        _set(gen, f"{dp}/proj/bias", sd[f"{dp}.proj.bias"])

    # ---- waveform decoder (HiFi-GAN generator) ----
    map_hifigan_generator(sd, gen, "waveform_decoder", "waveform_decoder")

    # ---- speaker / language embeddings ----
    if "emb_g.weight" in sd:
        _set(gen, "emb_g/embedding", sd["emb_g.weight"])
    if "emb_l.weight" in sd:
        _set(gen, "emb_l/embedding", sd["emb_l.weight"])

    # ---- discriminator: nets.0 = slim DiscriminatorS, nets.1.. = periods ----
    periods = [2, 3, 5, 7, 11]
    for k, v in sd.items():
        m = re.match(r"disc\.nets\.(\d+)\.(convs\.(\d+)|conv_post)\.(weight|bias)$", k)
        if not m:
            continue
        net_i = int(m.group(1))
        sub = f"convs_{m.group(3)}" if m.group(3) is not None else "conv_post"
        leaf = m.group(4)
        dst_net = "disc_s" if net_i == 0 else f"disc_p{periods[net_i - 1]}"
        if leaf == "bias":
            _set(disc, f"{dst_net}/{sub}/bias", v)
        else:
            kv, g = _wn_decompose(_conv1d(v) if v.ndim == 3 else _conv2d(v))
            _set(disc, f"{dst_net}/{sub}/v", kv)
            _set(disc, f"{dst_net}/{sub}/g", g)

    out: Dict[str, Any] = {"generator": gen}
    if disc:
        out["discriminator"] = disc
    return out


# ------------------------------------------------------------------ fairseq
_FAIRSEQ_FLOW_IDX = {"2": "1", "4": "2", "6": "3"}
_FAIRSEQ_DP_IDX = {"1": "1", "3": "2", "5": "3", "7": "4"}


def rehash_fairseq_vits_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """fairseq-MMS VITS state-dict names → reference/coqui `Vits` names.

    Same key semantics as ref TTS/tts/utils/fairseq.py:4
    (`rehash_fairseq_vits_checkpoint`): fairseq module prefixes map onto the
    reference names, the flow/SDP lists drop the interleaved `Flip` layers
    (fairseq indexes {2,4,6} → {1,2,3}; SDP {1,3,5,7} → {1,2,3,4}), and the
    SDP `ElementwiseAffine` leaves rename `m`/`logs` → `translation`/
    `log_scale`. Old-style `weight_g`/`weight_v` weight-norm pairs (fairseq
    checkpoints predate torch parametrize) are normalized onto the
    `parametrizations.weight.original{0,1}` naming that `_fold_param_pairs`
    folds, so `convert_vits_torch_state_dict` can ingest the result directly.
    """
    out: Dict[str, Any] = {}
    for k, v in sd.items():
        k = re.sub(r"\.weight_g$", ".parametrizations.weight.original0", k)
        k = re.sub(r"\.weight_v$", ".parametrizations.weight.original1", k)
        if k.startswith("enc_p."):
            k = "text_encoder." + k[len("enc_p."):]
        elif k.startswith("dec."):
            k = "waveform_decoder." + k[len("dec."):]
        elif k.startswith("enc_q."):
            k = "posterior_encoder." + k[len("enc_q."):]
        elif k.startswith("flow.flows."):
            idx, rest = k[len("flow.flows."):].split(".", 1)
            k = f"flow.flows.{_FAIRSEQ_FLOW_IDX.get(idx, idx)}.{rest}"
        elif k.startswith("dp."):
            m = re.match(r"dp\.(flows|post_flows)\.(\d+)\.(.*)$", k)
            if m:
                group, idx, rest = m.groups()
                if idx == "0":
                    rest = {"m": "translation", "logs": "log_scale"}.get(rest, rest)
                    k = f"duration_predictor.{group}.0.{rest}"
                else:
                    k = f"duration_predictor.{group}.{_FAIRSEQ_DP_IDX.get(idx, idx)}.{rest}"
            else:
                k = "duration_predictor." + k[len("dp."):]
        out[k] = v
    return out
