"""Reference Tacotron2 torch checkpoint → flax param-tree converter.

Maps `Tacotron2.state_dict()` names (TTS/tts/models/tacotron2.py, layers in
TTS/tts/layers/tacotron/tacotron2.py + attentions.py + common_layers.py) onto
our tree. The reference's BatchNorm layers map onto `FrozenBatchNorm`
(running stats as affine params) — convert with the model's
`norm_type="frozen_batch"` variant.

torch LSTM packs gates as rows [i | f | g | o] of `weight_ih`/`weight_hh`
(4H × in); flax cells keep separate `ii/if/ig/io` (no bias) and
`hi/hf/hg/ho` (bias = bias_ih + bias_hh) Dense layers."""

import re
from typing import Any, Dict

import numpy as np

from tpu_tts.models.vits_convert import _conv1d, _dense, _set

_GATES = ("i", "f", "g", "o")


def _map_lstm(tree, dst, w_ih, w_hh, b_ih, b_hh):
    H = w_hh.shape[1]
    for gi, g in enumerate(_GATES):
        _set(tree, f"{dst}/i{g}/kernel", np.transpose(w_ih[gi * H : (gi + 1) * H]))
        _set(tree, f"{dst}/h{g}/kernel", np.transpose(w_hh[gi * H : (gi + 1) * H]))
        _set(tree, f"{dst}/h{g}/bias", b_ih[gi * H : (gi + 1) * H] + b_hh[gi * H : (gi + 1) * H])


def _map_bn(sd, tree, src, dst):
    _set(tree, f"{dst}/scale", sd[f"{src}.weight"])
    _set(tree, f"{dst}/bias", sd[f"{src}.bias"])
    _set(tree, f"{dst}/mean", sd[f"{src}.running_mean"])
    _set(tree, f"{dst}/var", sd[f"{src}.running_var"])


def convert_tacotron2_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference `Tacotron2` torch state dict → our flax param tree
    (requires the model's `norm_type='frozen_batch'` variant)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict[str, Any] = {}

    _set(out, "embedding/embedding", sd["embedding.weight"])
    if "speaker_embedding.weight" in sd:
        _set(out, "speaker_embedding/embedding", sd["speaker_embedding.weight"])

    # ---- encoder convs + BN + BiLSTM ----
    for i in range(3):
        src = f"encoder.convolutions.{i}"
        _set(out, f"encoder/conv_{i}/conv/kernel", _conv1d(sd[f"{src}.convolution1d.weight"]))
        _set(out, f"encoder/conv_{i}/conv/bias", sd[f"{src}.convolution1d.bias"])
        _map_bn(sd, out, f"{src}.batch_normalization", f"encoder/norm_{i}")
    # fwd = OptimizedLSTMCell_0, reverse = OptimizedLSTMCell_1
    for cell, suffix in (("OptimizedLSTMCell_0", ""), ("OptimizedLSTMCell_1", "_reverse")):
        _map_lstm(
            out, f"encoder/{cell}",
            sd[f"encoder.lstm.weight_ih_l0{suffix}"], sd[f"encoder.lstm.weight_hh_l0{suffix}"],
            sd[f"encoder.lstm.bias_ih_l0{suffix}"], sd[f"encoder.lstm.bias_hh_l0{suffix}"],
        )

    # ---- decoder cell(s): main decoder + optional DDC coarse decoder ----
    def map_decoder(src: str, dst: str):
        cell = f"{dst}/cell"
        for i in range(2):
            _set(out, f"{cell}/prenet/linear_{i}/kernel",
                 _dense(sd[f"{src}.prenet.linear_layers.{i}.linear_layer.weight"]))
        for rnn in ("attention_rnn", "decoder_rnn"):
            _map_lstm(
                out, f"{cell}/{rnn}",
                sd[f"{src}.{rnn}.weight_ih"], sd[f"{src}.{rnn}.weight_hh"],
                sd[f"{src}.{rnn}.bias_ih"], sd[f"{src}.{rnn}.bias_hh"],
            )
        att = f"{src}.attention"
        _set(out, f"{cell}/attention/query_layer/kernel", _dense(sd[f"{att}.query_layer.linear_layer.weight"]))
        _set(out, f"{cell}/attention/inputs_layer/kernel", _dense(sd[f"{att}.inputs_layer.linear_layer.weight"]))
        _set(out, f"{cell}/attention/v/kernel", _dense(sd[f"{att}.v.linear_layer.weight"]))
        if f"{att}.v.linear_layer.bias" in sd:
            _set(out, f"{cell}/attention/v/bias", sd[f"{att}.v.linear_layer.bias"])
        if f"{att}.location_layer.location_conv1d.weight" in sd:
            _set(out, f"{cell}/attention/location_layer/location_conv/conv/kernel",
                 _conv1d(sd[f"{att}.location_layer.location_conv1d.weight"]))
            _set(out, f"{cell}/attention/location_layer/location_dense/kernel",
                 _dense(sd[f"{att}.location_layer.location_dense.linear_layer.weight"]))
        _set(out, f"{cell}/linear_projection/kernel", _dense(sd[f"{src}.linear_projection.linear_layer.weight"]))
        _set(out, f"{cell}/linear_projection/bias", sd[f"{src}.linear_projection.linear_layer.bias"])
        _set(out, f"{cell}/stopnet/kernel", _dense(sd[f"{src}.stopnet.1.linear_layer.weight"]))
        _set(out, f"{cell}/stopnet/bias", sd[f"{src}.stopnet.1.linear_layer.bias"])

    map_decoder("decoder", "decoder")
    if "coarse_decoder.attention_rnn.weight_ih" in sd:
        map_decoder("coarse_decoder", "coarse_decoder")

    # ---- postnet ----
    n_post = len({m.group(1) for k in sd if (m := re.match(r"postnet\.convolutions\.(\d+)\.", k))})
    for i in range(n_post):
        src = f"postnet.convolutions.{i}"
        _set(out, f"postnet/conv_{i}/conv/kernel", _conv1d(sd[f"{src}.convolution1d.weight"]))
        _set(out, f"postnet/conv_{i}/conv/bias", sd[f"{src}.convolution1d.bias"])
        _map_bn(sd, out, f"{src}.batch_normalization", f"postnet/norm_{i}")

    return out
