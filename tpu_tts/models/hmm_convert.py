"""Reference NeuralhmmTTS / Overflow torch checkpoint → flax param-tree
converter.

Maps `NeuralhmmTTS.state_dict()` names (TTS/tts/models/neuralhmm_tts.py,
layers in TTS/tts/layers/overflow/{common_layers,neural_hmm}.py) onto our
`NeuralhmmTTSNet` tree; Overflow adds the glow decoder
(TTS/tts/layers/overflow/decoder.py wrapping glow_tts/decoder.py). The
reference's BatchNorm encoder maps onto our `norm_type="frozen_batch"`
variant."""

import re
from typing import Any, Dict

import numpy as np

from tpu_tts.models.glow_convert import map_glow_decoder
from tpu_tts.models.tacotron_convert import _map_bn, _map_lstm
from tpu_tts.models.vits_convert import _conv1d, _dense, _fold_param_pairs, _set


def convert_neuralhmm_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference `NeuralhmmTTS` (or `Overflow`) torch state dict → our flax
    param tree. Also understands the Overflow `decoder.glow_decoder.*` keys."""
    sd = _fold_param_pairs({k: np.asarray(v) for k, v in state_dict.items()})
    out: Dict[str, Any] = {}

    # ---- encoder: emb + 3×ConvBN + spp-folded BiLSTM (common_layers.py:12) ----
    _set(out, "emb/embedding", sd["encoder.emb.weight"])
    for i in range(3):
        src = f"encoder.convolutions.{i}"
        _set(out, f"encoder/conv_{i}/conv/kernel", _conv1d(sd[f"{src}.convolution1d.weight"]))
        _set(out, f"encoder/conv_{i}/conv/bias", sd[f"{src}.convolution1d.bias"])
        _map_bn(sd, out, f"{src}.batch_normalization", f"encoder/norm_{i}")
    for cell, suffix in (("OptimizedLSTMCell_0", ""), ("OptimizedLSTMCell_1", "_reverse")):
        _map_lstm(
            out, f"encoder/{cell}",
            sd[f"encoder.lstm.weight_ih_l0{suffix}"], sd[f"encoder.lstm.weight_hh_l0{suffix}"],
            sd[f"encoder.lstm.bias_ih_l0{suffix}"], sd[f"encoder.lstm.bias_hh_l0{suffix}"],
        )

    # ---- neural HMM decoder (neural_hmm.py:14) ----
    for k in sd:
        m = re.match(r"neural_hmm\.prenet\.linear_layers\.(\d+)\.linear_layer\.weight$", k)
        if m:
            _set(out, f"hmm/prenet/linear_{m.group(1)}/kernel", _dense(sd[k]))
        m = re.match(r"neural_hmm\.output_net\.parametermodel\.layers\.(\d+)\.linear_layer\.weight$", k)
        if m:
            i = m.group(1)
            _set(out, f"hmm/hidden_layers_{i}/kernel", _dense(sd[k]))
            _set(out, f"hmm/hidden_layers_{i}/bias",
                 sd[f"neural_hmm.output_net.parametermodel.layers.{i}.linear_layer.bias"])
    _map_lstm(
        out, "hmm/memory_rnn",
        sd["neural_hmm.memory_rnn.weight_ih"], sd["neural_hmm.memory_rnn.weight_hh"],
        sd["neural_hmm.memory_rnn.bias_ih"], sd["neural_hmm.memory_rnn.bias_hh"],
    )
    _set(out, "hmm/out_layer/kernel", _dense(sd["neural_hmm.output_net.parametermodel.last_layer.weight"]))
    _set(out, "hmm/out_layer/bias", sd["neural_hmm.output_net.parametermodel.last_layer.bias"])

    # ---- Overflow glow decoder (overflow/decoder.py wraps glow_tts Decoder) ----
    if any(k.startswith("decoder.glow_decoder.flows") for k in sd):
        map_glow_decoder(sd, out, "decoder.glow_decoder.flows", "flow_decoder")

    return out


def extract_mel_statistics(state_dict: Dict[str, Any]) -> Dict[str, float]:
    """The reference registers dataset `mean`/`std` buffers on the model
    (models/neuralhmm_tts.py update_mean_std); pull them for our
    `update_mean_std`."""
    stats = {}
    for key in ("mean", "std"):
        if key in state_dict:
            stats[key] = float(np.asarray(state_dict[key]).reshape(()))
    return stats
