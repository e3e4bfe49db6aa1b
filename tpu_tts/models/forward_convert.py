"""Reference ForwardTTS (FastPitch/FastSpeech/SpeedySpeech) torch checkpoint
→ flax param-tree converter.

Maps `ForwardTTS.state_dict()` names (TTS/tts/models/forward_tts.py, FFT
layers in TTS/tts/layers/feed_forward/ and generic/transformer.py, aligner in
TTS/tts/layers/generic/aligner.py) onto our tree. torch
`nn.MultiheadAttention` packs q/k/v into `in_proj_*` along dim0 — unpacked
here into flax's per-head `[in, heads, head_dim]` layout."""

import re
from typing import Any, Dict

import numpy as np

from tpu_tts.models.vits_convert import _conv1d, _dense, _fold_param_pairs, _set


def _mha(out_tree, dst, in_w, in_b, out_w, out_b, num_heads):
    H = out_w.shape[0]
    dh = H // num_heads
    for i, name in enumerate(("query", "key", "value")):
        w = in_w[i * H : (i + 1) * H]  # [H(out), H(in)]
        b = in_b[i * H : (i + 1) * H]
        _set(out_tree, f"{dst}/{name}/kernel", np.transpose(w).reshape(H, num_heads, dh))
        _set(out_tree, f"{dst}/{name}/bias", b.reshape(num_heads, dh))
    # out kernel is [heads, head_dim, out]: torch rows index out, cols index
    # the flattened (head, dim) input — transpose then split the IN axis
    _set(out_tree, f"{dst}/out/kernel", np.transpose(out_w).reshape(num_heads, dh, H))
    _set(out_tree, f"{dst}/out/bias", out_b)


def _map_fft_block(sd, tree, src: str, dst: str, num_heads: int):
    """One reference `FFTransformer` layer → our `fft_{i}` block."""
    _mha(
        tree, f"{dst}/self_attn",
        sd[f"{src}.self_attn.in_proj_weight"], sd[f"{src}.self_attn.in_proj_bias"],
        sd[f"{src}.self_attn.out_proj.weight"], sd[f"{src}.self_attn.out_proj.bias"],
        num_heads,
    )
    for n in ("1", "2"):
        _set(tree, f"{dst}/conv{n}/conv/kernel", _conv1d(sd[f"{src}.conv{n}.weight"]))
        _set(tree, f"{dst}/conv{n}/conv/bias", sd[f"{src}.conv{n}.bias"])
        _set(tree, f"{dst}/norm{n}/scale", sd[f"{src}.norm{n}.weight"])
        _set(tree, f"{dst}/norm{n}/bias", sd[f"{src}.norm{n}.bias"])


def _map_dp(sd, tree, src: str, dst: str):
    """Reference `DurationPredictor`-style conv stack (also pitch/energy)."""
    for n in ("1", "2"):
        _set(tree, f"{dst}/conv_{n}/conv/kernel", _conv1d(sd[f"{src}.conv_{n}.weight"]))
        _set(tree, f"{dst}/conv_{n}/conv/bias", sd[f"{src}.conv_{n}.bias"])
        _set(tree, f"{dst}/norm_{n}/gamma", sd[f"{src}.norm_{n}.gamma"].reshape(-1))
        _set(tree, f"{dst}/norm_{n}/beta", sd[f"{src}.norm_{n}.beta"].reshape(-1))
    _set(tree, f"{dst}/proj/kernel", _dense(sd[f"{src}.proj.weight"]))
    _set(tree, f"{dst}/proj/bias", sd[f"{src}.proj.bias"])


def convert_forward_tts_torch_state_dict(
    state_dict: Dict[str, Any], num_heads: int = 2
) -> Dict[str, Any]:
    """Reference `ForwardTTS` torch state dict → our flax param tree."""
    sd = _fold_param_pairs({k: np.asarray(v) for k, v in state_dict.items()})
    out: Dict[str, Any] = {}

    if "emb.weight" in sd:
        _set(out, "emb/embedding", sd["emb.weight"])
    if "emb_g.weight" in sd:
        _set(out, "emb_g/embedding", sd["emb_g.weight"])

    for k in sd:
        m = re.match(r"encoder\.encoder\.fft_layers\.(\d+)\.self_attn\.in_proj_weight$", k)
        if m:
            _map_fft_block(sd, out, f"encoder.encoder.fft_layers.{m.group(1)}",
                           f"encoder/fft_{m.group(1)}", num_heads)
        m = re.match(
            r"decoder\.decoder\.transformer_block\.fft_layers\.(\d+)\.self_attn\.in_proj_weight$", k
        )
        if m:
            _map_fft_block(sd, out, f"decoder.decoder.transformer_block.fft_layers.{m.group(1)}",
                           f"decoder/fft_{m.group(1)}", num_heads)

    map_speedy_speech(sd, out)

    # decoder output projection (ref FFTransformerDecoder `postnet`, 1x1 conv)
    if "decoder.decoder.postnet.weight" in sd:
        _set(out, "proj/kernel", _dense(sd["decoder.decoder.postnet.weight"]))
        _set(out, "proj/bias", sd["decoder.decoder.postnet.bias"])

    for name in ("duration_predictor", "pitch_predictor", "energy_predictor"):
        if f"{name}.conv_1.weight" in sd:
            _map_dp(sd, out, name, name)
    for name in ("pitch_emb", "energy_emb"):
        if f"{name}.weight" in sd:
            _set(out, f"{name}/conv/kernel", _conv1d(sd[f"{name}.weight"]))
            _set(out, f"{name}/conv/bias", sd[f"{name}.bias"])

    # aligner: Sequential convs at indices 0,2(,4) with activations between
    key_idx = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"aligner\.key_layer\.(\d+)\.weight", k))}
    )
    for j, i in enumerate(key_idx):
        w = sd[f"aligner.key_layer.{i}.weight"]
        _set(out, f"aligner/key_conv{j + 1}/conv/kernel",
             _dense(w) if w.shape[-1] == 1 else _conv1d(w))
        _set(out, f"aligner/key_conv{j + 1}/conv/bias", sd[f"aligner.key_layer.{i}.bias"])
    q_idx = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"aligner\.query_layer\.(\d+)\.weight", k))}
    )
    for j, i in enumerate(q_idx):
        w = sd[f"aligner.query_layer.{i}.weight"]
        _set(out, f"aligner/query_conv{j + 1}/conv/kernel",
             _dense(w) if w.shape[-1] == 1 else _conv1d(w))
        _set(out, f"aligner/query_conv{j + 1}/conv/bias", sd[f"aligner.query_layer.{i}.bias"])

    return out


def _map_conv_bn(sd, out, src: str, dst: str):
    """`Conv1dBN` (ref generic/res_conv_bn.py:18): conv1d + BatchNorm."""
    _set(out, f"{dst}/conv1d/kernel", _conv1d(sd[f"{src}.conv1d.weight"]))
    _set(out, f"{dst}/conv1d/bias", sd[f"{src}.conv1d.bias"])
    _set(out, f"{dst}/norm/scale", sd[f"{src}.norm.weight"])
    _set(out, f"{dst}/norm/bias", sd[f"{src}.norm.bias"])
    _set(out, f"{dst}/norm/mean", sd[f"{src}.norm.running_mean"])
    _set(out, f"{dst}/norm/var", sd[f"{src}.norm.running_var"])


def _map_res_conv_stack(sd, out, src: str, dst: str):
    """`ResidualConv1dBNBlock.res_blocks` (ref res_conv_bn.py:83)."""
    for k in sd:
        m = re.match(re.escape(src) + r"\.res_blocks\.(\d+)\.conv_bn_blocks\.(\d+)\.conv1d\.weight$", k)
        if m:
            b, j = m.groups()
            _map_conv_bn(sd, out, f"{src}.res_blocks.{b}.conv_bn_blocks.{j}",
                         f"{dst}/res_block_{b}/conv_bn_{j}")


def map_speedy_speech(sd, out):
    """SpeedySpeech residual_conv_bn encoder/decoder (ref feed_forward/
    encoder.py:41 `ResidualConv1dBNEncoder`, decoder.py:125
    `ResidualConv1dBNDecoder`). The decoder's final 1×1 conv maps to our
    model-level `proj`."""
    if "encoder.encoder.prenet.0.weight" in sd:
        _set(out, "encoder/prenet/kernel", _dense(sd["encoder.encoder.prenet.0.weight"]))
        _set(out, "encoder/prenet/bias", sd["encoder.encoder.prenet.0.bias"])
        _map_res_conv_stack(sd, out, "encoder.encoder.res_conv_block", "encoder/res_conv_block")
        _set(out, "encoder/postnet_0/kernel", _dense(sd["encoder.encoder.postnet.0.weight"]))
        _set(out, "encoder/postnet_0/bias", sd["encoder.encoder.postnet.0.bias"])
        _set(out, "encoder/postnet_norm/scale", sd["encoder.encoder.postnet.2.weight"])
        _set(out, "encoder/postnet_norm/bias", sd["encoder.encoder.postnet.2.bias"])
        _set(out, "encoder/postnet_norm/mean", sd["encoder.encoder.postnet.2.running_mean"])
        _set(out, "encoder/postnet_norm/var", sd["encoder.encoder.postnet.2.running_var"])
        _set(out, "encoder/postnet_1/kernel", _dense(sd["encoder.encoder.postnet.3.weight"]))
        _set(out, "encoder/postnet_1/bias", sd["encoder.encoder.postnet.3.bias"])
    if "decoder.decoder.res_conv_block.res_blocks.0.conv_bn_blocks.0.conv1d.weight" in sd:
        _map_res_conv_stack(sd, out, "decoder.decoder.res_conv_block", "decoder/res_conv_block")
        _set(out, "decoder/post_conv/kernel", _dense(sd["decoder.decoder.post_conv.weight"]))
        _set(out, "decoder/post_conv/bias", sd["decoder.decoder.post_conv.bias"])
        for j in range(2):
            _map_conv_bn(sd, out, f"decoder.decoder.postnet.0.conv_bn_blocks.{j}",
                         f"decoder/postnet_block/conv_bn_{j}")
        _set(out, "proj/kernel", _dense(sd["decoder.decoder.postnet.1.weight"]))
        _set(out, "proj/bias", sd["decoder.decoder.postnet.1.bias"])
