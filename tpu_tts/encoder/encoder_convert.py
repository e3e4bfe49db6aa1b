"""Reference speaker-encoder torch checkpoints → flax param trees.

Covers the two zoo encoder families (TTS/encoder/models/lstm.py:34,
resnet.py:59). The reference ResNet flattens conv maps channel-major
([B, C, F, T] → [B, C·F, T]); ours flattens freq-major ([B, T, F, C] →
[B, T, F·C]) — the attention and fc weights are row-permuted here so the
outputs are bit-identical without transposing activations at runtime."""

import re
from typing import Any, Dict

import numpy as np

from tpu_tts.models.tacotron_convert import _map_lstm
from tpu_tts.models.vits_convert import _dense, _set


def _conv2d_tf(w):
    """torch [out, in, k_freq, k_time] → our [k_time, k_freq, in, out]: the
    reference treats the spectrogram as a (freq, time) image, ours as
    (time, freq) — swap the kernel's spatial axes along with the layout."""
    return np.transpose(w, (3, 2, 1, 0))


def convert_lstm_encoder_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """`LSTMSpeakerEncoder` → our lstm_{i}/proj_{i} stack."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict[str, Any] = {}
    idx = sorted({int(m.group(1)) for k in sd if (m := re.match(r"layers\.(\d+)\.lstm\.", k))})
    for i in idx:
        src = f"layers.{i}"
        # nn.RNN is scope-transparent: the cell registers under the parent as
        # OptimizedLSTMCell_{i} (same as the tacotron encoder BiLSTM)
        _map_lstm(
            out, f"OptimizedLSTMCell_{i}",
            sd[f"{src}.lstm.weight_ih_l0"], sd[f"{src}.lstm.weight_hh_l0"],
            sd[f"{src}.lstm.bias_ih_l0"], sd[f"{src}.lstm.bias_hh_l0"],
        )
        _set(out, f"proj_{i}/kernel", _dense(sd[f"{src}.linear.weight"]))
        # reference projection has no bias; ours does — zero it
        _set(out, f"proj_{i}/bias", np.zeros(sd[f"{src}.linear.weight"].shape[0], dtype=np.float32))
    return out


def _bn(sd, tree, src, dst):
    _set(tree, f"{dst}/scale", sd[f"{src}.weight"])
    _set(tree, f"{dst}/bias", sd[f"{src}.bias"])
    _set(tree, f"{dst}/mean", sd[f"{src}.running_mean"])
    _set(tree, f"{dst}/var", sd[f"{src}.running_var"])


def convert_resnet_encoder_state_dict(
    state_dict: Dict[str, Any], input_dim: int = 64, num_filters=(32, 64, 128, 256)
) -> Dict[str, Any]:
    """`ResNetSpeakerEncoder` → our tree (requires `norm_type='frozen_batch'`)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict[str, Any] = {}

    _set(out, "conv1/kernel", _conv2d_tf(sd["conv1.weight"]))
    _set(out, "conv1/bias", sd["conv1.bias"])
    _bn(sd, out, "bn1", "bn1")

    for k in sd:
        m = re.match(r"layer([1-4])\.(\d+)\.conv([12])\.weight$", k)
        if m:
            li, bi, ci = int(m.group(1)) - 1, m.group(2), m.group(3)
            blk = f"layer{li}_{bi}"
            _set(out, f"{blk}/conv{ci}/kernel", _conv2d_tf(sd[k]))
            _bn(sd, out, f"layer{li + 1}.{bi}.bn{ci}", f"{blk}/bn{ci}")
            continue
        m = re.match(r"layer([1-4])\.(\d+)\.se\.fc\.([02])\.(weight|bias)$", k)
        if m:
            li, bi, fi, leaf = int(m.group(1)) - 1, m.group(2), m.group(3), m.group(4)
            dense = "Dense_0" if fi == "0" else "Dense_1"
            _set(out, f"layer{li}_{bi}/SELayer_0/{dense}/{'kernel' if leaf == 'weight' else 'bias'}",
                 _dense(sd[k]) if leaf == "weight" else sd[k])
            continue
        m = re.match(r"layer([1-4])\.(\d+)\.downsample\.0\.weight$", k)
        if m:
            li, bi = int(m.group(1)) - 1, m.group(2)
            _set(out, f"layer{li}_{bi}/ds_conv/kernel", _conv2d_tf(sd[k]))
            _bn(sd, out, f"layer{li + 1}.{bi}.downsample.1", f"layer{li}_{bi}/ds_norm")

    # ---- attentive pooling: permute ref C-major flatten → our F-major ----
    C = num_filters[-1]
    F_bins = input_dim // 8
    # our row j = f*C + c  ←  ref row i = c*F + f
    perm = np.array([c * F_bins + f for f in range(F_bins) for c in range(C)])

    w1 = _dense(sd["attention.0.weight"])  # [C*F, 128]
    _set(out, "attn_conv1/kernel", w1[perm][None])  # our Conv kernel [1, in, out]
    _set(out, "attn_conv1/bias", sd["attention.0.bias"])
    _bn(sd, out, "attention.2", "attn_bn")
    w2 = _dense(sd["attention.3.weight"])  # [128, C*F]
    _set(out, "attn_conv2/kernel", w2[:, perm][None])
    _set(out, "attn_conv2/bias", sd["attention.3.bias"][perm])

    fc = _dense(sd["fc.weight"])  # [2*C*F (or C*F), proj]
    if fc.shape[0] == 2 * C * F_bins:  # ASP: [mu | sg] halves, each permuted
        fc = np.concatenate([fc[:C * F_bins][perm], fc[C * F_bins:][perm]], axis=0)
    else:
        fc = fc[perm]
    _set(out, "fc/kernel", fc)
    _set(out, "fc/bias", sd["fc.bias"])
    return out
