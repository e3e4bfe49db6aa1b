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


def _map_gru(tree, dst, w_ih, w_hh, b_ih=None, b_hh=None):
    """torch GRU packs gates as rows [r | z | n]; flax GRUCell keeps
    `ir/iz/in` (with bias) and `hr/hz` (no bias) + `hn` (bias). torch's
    b_hr/b_hz fold into the input-gate biases (the update rules match:
    n = tanh(W_in·x + b_in + r·(W_hn·h + b_hn)))."""
    H = w_hh.shape[1]
    names = (("r", 0), ("z", 1), ("n", 2))
    if b_ih is None:
        b_ih = np.zeros(3 * H, dtype=w_ih.dtype)
    if b_hh is None:
        b_hh = np.zeros(3 * H, dtype=w_hh.dtype)
    for g, gi in names:
        sl = slice(gi * H, (gi + 1) * H)
        _set(tree, f"{dst}/i{g}/kernel", np.transpose(w_ih[sl]))
        _set(tree, f"{dst}/h{g}/kernel", np.transpose(w_hh[sl]))
        if g == "n":
            _set(tree, f"{dst}/in/bias", b_ih[sl])
            _set(tree, f"{dst}/hn/bias", b_hh[sl])
        else:
            _set(tree, f"{dst}/i{g}/bias", b_ih[sl] + b_hh[sl])


def _map_attention(sd, tree, src: str, dst: str):
    """`OriginalAttention` params (ref layers/tacotron/attentions.py:127)."""
    _set(tree, f"{dst}/query_layer/kernel", _dense(sd[f"{src}.query_layer.linear_layer.weight"]))
    _set(tree, f"{dst}/inputs_layer/kernel", _dense(sd[f"{src}.inputs_layer.linear_layer.weight"]))
    _set(tree, f"{dst}/v/kernel", _dense(sd[f"{src}.v.linear_layer.weight"]))
    if f"{src}.v.linear_layer.bias" in sd:
        _set(tree, f"{dst}/v/bias", sd[f"{src}.v.linear_layer.bias"])
    if f"{src}.location_layer.location_conv1d.weight" in sd:
        _set(tree, f"{dst}/location_layer/location_conv/conv/kernel",
             _conv1d(sd[f"{src}.location_layer.location_conv1d.weight"]))
        _set(tree, f"{dst}/location_layer/location_dense/kernel",
             _dense(sd[f"{src}.location_layer.location_dense.linear_layer.weight"]))
    if f"{src}.ta.weight" in sd:  # forward attention transition agent
        _set(tree, f"{dst}/ta/kernel", _dense(sd[f"{src}.ta.weight"]))
        _set(tree, f"{dst}/ta/bias", sd[f"{src}.ta.bias"])


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

    map_gst(sd, out)
    map_capacitron(sd, out)

    # ---- postnet ----
    n_post = len({m.group(1) for k in sd if (m := re.match(r"postnet\.convolutions\.(\d+)\.", k))})
    for i in range(n_post):
        src = f"postnet.convolutions.{i}"
        _set(out, f"postnet/conv_{i}/conv/kernel", _conv1d(sd[f"{src}.convolution1d.weight"]))
        _set(out, f"postnet/conv_{i}/conv/bias", sd[f"{src}.convolution1d.bias"])
        _map_bn(sd, out, f"{src}.batch_normalization", f"postnet/norm_{i}")

    return out


def _map_cbhg(sd, out, src: str, dst: str):
    """Reference `CBHG` (layers/tacotron/tacotron.py:94) → our `CBHG` tree.
    BN (momentum .99, eps 1e-3) → frozen_batch; convs are bias-free."""
    K = len({m.group(1) for k in sd if (m := re.match(re.escape(src) + r"\.conv1d_banks\.(\d+)\.", k))})
    for j in range(K):
        w = sd[f"{src}.conv1d_banks.{j}.conv1d.weight"]
        # k=1 convs are Dense on our side
        _set(out, f"{dst}/bank_{j + 1}/conv/kernel", _dense(w[..., 0]) if w.shape[2] == 1 else _conv1d(w))
        _map_bn(sd, out, f"{src}.conv1d_banks.{j}.bn", f"{dst}/bank_norm_{j + 1}")
    n_proj = len({m.group(1) for k in sd if (m := re.match(re.escape(src) + r"\.conv1d_projections\.(\d+)\.", k))})
    for i in range(n_proj):
        _set(out, f"{dst}/proj_{i}/conv/kernel", _conv1d(sd[f"{src}.conv1d_projections.{i}.conv1d.weight"]))
        _map_bn(sd, out, f"{src}.conv1d_projections.{i}.bn", f"{dst}/proj_norm_{i}")
    if f"{src}.pre_highway.weight" in sd:
        _set(out, f"{dst}/pre_highway/kernel", _dense(sd[f"{src}.pre_highway.weight"]))
    nh = len({m.group(1) for k in sd if (m := re.match(re.escape(src) + r"\.highways\.(\d+)\.", k))})
    for i in range(nh):
        for part in ("H", "T"):
            _set(out, f"{dst}/highway_{i}/{part}/kernel", _dense(sd[f"{src}.highways.{i}.{part}.weight"]))
            _set(out, f"{dst}/highway_{i}/{part}/bias", sd[f"{src}.highways.{i}.{part}.bias"])
    # bidirectional GRU: forward = GRUCell_0, reverse = GRUCell_1
    for cell, suffix in (("GRUCell_0", ""), ("GRUCell_1", "_reverse")):
        _map_gru(
            out, f"{dst}/{cell}",
            sd[f"{src}.gru.weight_ih_l0{suffix}"], sd[f"{src}.gru.weight_hh_l0{suffix}"],
            sd.get(f"{src}.gru.bias_ih_l0{suffix}"), sd.get(f"{src}.gru.bias_hh_l0{suffix}"),
        )


def convert_tacotron1_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference `Tacotron` (v1) torch state dict → our flax param tree
    (TTS/tts/models/tacotron.py + layers/tacotron/tacotron.py: CBHG:94,
    Decoder:249). Requires `norm_type='frozen_batch'`. DDC `coarse_decoder.*`
    keys are skipped (unused at inference; our v1 trains without DDC)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict[str, Any] = {}

    _set(out, "embedding/embedding", sd["embedding.weight"])

    for i in range(2):
        _set(out, f"encoder_prenet/linear_{i}/kernel",
             _dense(sd[f"encoder.prenet.linear_layers.{i}.linear_layer.weight"]))
        _set(out, f"encoder_prenet/linear_{i}/bias",
             sd[f"encoder.prenet.linear_layers.{i}.linear_layer.bias"])
    _map_cbhg(sd, out, "encoder.cbhg.cbhg", "encoder_cbhg")

    # ---- decoder cell(s): main decoder + optional DDC coarse decoder ----
    def map_v1_decoder(src: str, dst: str):
        for i in range(2):
            _set(out, f"{dst}/prenet/linear_{i}/kernel",
                 _dense(sd[f"{src}.prenet.linear_layers.{i}.linear_layer.weight"]))
            _set(out, f"{dst}/prenet/linear_{i}/bias",
                 sd[f"{src}.prenet.linear_layers.{i}.linear_layer.bias"])
        _map_gru(out, f"{dst}/attention_rnn",
                 sd[f"{src}.attention_rnn.weight_ih"], sd[f"{src}.attention_rnn.weight_hh"],
                 sd.get(f"{src}.attention_rnn.bias_ih"), sd.get(f"{src}.attention_rnn.bias_hh"))
        _map_attention(sd, out, f"{src}.attention", f"{dst}/attention")
        _set(out, f"{dst}/project_to_decoder_in/kernel", _dense(sd[f"{src}.project_to_decoder_in.weight"]))
        _set(out, f"{dst}/project_to_decoder_in/bias", sd[f"{src}.project_to_decoder_in.bias"])
        for i in range(2):
            _map_gru(out, f"{dst}/decoder_rnns_{i}",
                     sd[f"{src}.decoder_rnns.{i}.weight_ih"], sd[f"{src}.decoder_rnns.{i}.weight_hh"],
                     sd.get(f"{src}.decoder_rnns.{i}.bias_ih"), sd.get(f"{src}.decoder_rnns.{i}.bias_hh"))
        _set(out, f"{dst}/proj_to_mel/kernel", _dense(sd[f"{src}.proj_to_mel.weight"]))
        _set(out, f"{dst}/proj_to_mel/bias", sd[f"{src}.proj_to_mel.bias"])
        _set(out, f"{dst}/stopnet/kernel", _dense(sd[f"{src}.stopnet.linear.weight"]))
        _set(out, f"{dst}/stopnet/bias", sd[f"{src}.stopnet.linear.bias"])

    map_v1_decoder("decoder", "cell")
    if "coarse_decoder.attention_rnn.weight_ih" in sd:
        map_v1_decoder("coarse_decoder", "coarse_cell")

    _map_cbhg(sd, out, "postnet.cbhg", "postnet_cbhg")
    _set(out, "last_linear/kernel", _dense(sd["last_linear.weight"]))
    _set(out, "last_linear/bias", sd["last_linear.bias"])
    map_gst(sd, out)
    map_capacitron(sd, out)
    return out


def _conv2d(w):
    """torch Conv2d [out, in, kh, kw] → flax [kh, kw, in, out]."""
    return np.transpose(w, (2, 3, 1, 0))


def map_gst(sd, out, src: str = "gst_layer", dst: str = "gst_layer"):
    """Reference `GST` (layers/tacotron/gst_layers.py:6) → our `GST` tree.
    No-op when the checkpoint has no GST."""
    if f"{src}.encoder.convs.0.weight" not in sd:
        return
    for i in range(6):
        _set(out, f"{dst}/encoder/conv_{i}/kernel", _conv2d(sd[f"{src}.encoder.convs.{i}.weight"]))
        _set(out, f"{dst}/encoder/conv_{i}/bias", sd[f"{src}.encoder.convs.{i}.bias"])
        _map_bn(sd, out, f"{src}.encoder.bns.{i}", f"{dst}/encoder/norm_{i}")
    _map_gru(
        out, f"{dst}/encoder/rnn_cell",
        sd[f"{src}.encoder.recurrence.weight_ih_l0"], sd[f"{src}.encoder.recurrence.weight_hh_l0"],
        sd.get(f"{src}.encoder.recurrence.bias_ih_l0"), sd.get(f"{src}.encoder.recurrence.bias_hh_l0"),
    )
    _set(out, f"{dst}/style_token_layer/style_tokens", sd[f"{src}.style_token_layer.style_tokens"])
    for w in ("W_query", "W_key", "W_value"):
        _set(out, f"{dst}/style_token_layer/attention/{w}/kernel",
             _dense(sd[f"{src}.style_token_layer.attention.{w}.weight"]))


def map_capacitron(sd, out, src: str = "capacitron_vae_layer", dst: str = "capacitron_vae_layer"):
    """Reference `CapacitronVAE` (layers/tacotron/capacitron_layers.py:7) →
    our tree. No-op when the checkpoint has no capacitron."""
    if f"{src}.encoder.convs.0.weight" not in sd:
        return
    for i in range(6):
        _set(out, f"{dst}/encoder/conv_{i}/kernel", _conv2d(sd[f"{src}.encoder.convs.{i}.weight"]))
        _set(out, f"{dst}/encoder/conv_{i}/bias", sd[f"{src}.encoder.convs.{i}.bias"])
        _map_bn(sd, out, f"{src}.encoder.bns.{i}", f"{dst}/encoder/norm_{i}")
    _map_lstm(
        out, f"{dst}/encoder/rnn_cell",
        sd[f"{src}.encoder.recurrence.weight_ih_l0"], sd[f"{src}.encoder.recurrence.weight_hh_l0"],
        sd[f"{src}.encoder.recurrence.bias_ih_l0"], sd[f"{src}.encoder.recurrence.bias_hh_l0"],
    )
    if f"{src}.text_summary_net.lstm.weight_ih_l0" in sd:
        _map_lstm(
            out, f"{dst}/text_summary_cell",
            sd[f"{src}.text_summary_net.lstm.weight_ih_l0"], sd[f"{src}.text_summary_net.lstm.weight_hh_l0"],
            sd[f"{src}.text_summary_net.lstm.bias_ih_l0"], sd[f"{src}.text_summary_net.lstm.bias_hh_l0"],
        )
    _set(out, f"{dst}/net_0/kernel", _dense(sd[f"{src}.post_encoder_mlp.net.0.weight"]))
    _set(out, f"{dst}/net_0/bias", sd[f"{src}.post_encoder_mlp.net.0.bias"])
    _set(out, f"{dst}/net_2/kernel", _dense(sd[f"{src}.post_encoder_mlp.net.2.weight"]))
    _set(out, f"{dst}/net_2/bias", sd[f"{src}.post_encoder_mlp.net.2.bias"])
    _set(out, f"{dst}/beta", np.asarray(sd[f"{src}.beta"]).reshape(1))
