"""Reference FreeVC torch checkpoint → flax param-tree converter.

Maps `FreeVC.state_dict()` (TTS/vc/models/freevc.py) onto our `FreeVCNet`
tree: enc_p (WavLM-feature bottleneck), enc_q→enc_spec (spec posterior),
flow (VITS-style couplings), dec (HiFi-GAN), enc_spk (3-layer LSTM + linear).
`wavlm.*` weights are skipped — our content encoder replaces WavLM
(documented deviation); ssl features fed to enc_p convert exactly."""

import re
from typing import Any, Dict

import numpy as np

from tpu_tts.models.tacotron_convert import _map_lstm
from tpu_tts.models.vits_convert import (
    _dense,
    _fold_param_pairs,
    _map_wn_block,
    _set,
    map_hifigan_generator,
)


def convert_freevc_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    sd = _fold_param_pairs(
        {k: np.asarray(v) for k, v in state_dict.items() if not k.startswith("wavlm.")}
    )
    out: Dict[str, Any] = {}

    # ---- bottleneck encoders: enc_p (ssl feats) and enc_q → enc_spec ----
    for src, dst in (("enc_p", "enc_p"), ("enc_q", "enc_spec")):
        if f"{src}.pre.weight" not in sd:
            continue
        _set(out, f"{dst}/pre/kernel", _dense(sd[f"{src}.pre.weight"]))
        _set(out, f"{dst}/pre/bias", sd[f"{src}.pre.bias"])
        _set(out, f"{dst}/proj/kernel", _dense(sd[f"{src}.proj.weight"]))
        _set(out, f"{dst}/proj/bias", sd[f"{src}.proj.bias"])
        _map_wn_block(sd, out, f"{src}.enc", f"{dst}/enc")

    # ---- flow: couplings at even indices ----
    flow_idx = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"flow\.flows\.(\d+)\.", k))}
    )
    for j, fi in enumerate(flow_idx):
        src, dst = f"flow.flows.{fi}", f"flow/coupling_{j}"
        _set(out, f"{dst}/pre/kernel", _dense(sd[f"{src}.pre.weight"]))
        _set(out, f"{dst}/pre/bias", sd[f"{src}.pre.bias"])
        _set(out, f"{dst}/post/kernel", _dense(sd[f"{src}.post.weight"]))
        _set(out, f"{dst}/post/bias", sd[f"{src}.post.bias"])
        _map_wn_block(sd, out, f"{src}.enc", f"{dst}/enc")

    # ---- waveform decoder ----
    dec_sd = {k[len("dec."):]: v for k, v in sd.items() if k.startswith("dec.")}
    map_hifigan_generator(dec_sd, out, "", "dec")

    # ---- mel speaker encoder: multi-layer torch LSTM + linear ----
    layers = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"enc_spk\.lstm\.weight_ih_l(\d+)$", k))}
    )
    for i in layers:
        _map_lstm(
            out, f"speaker_encoder/OptimizedLSTMCell_{i}",
            sd[f"enc_spk.lstm.weight_ih_l{i}"], sd[f"enc_spk.lstm.weight_hh_l{i}"],
            sd[f"enc_spk.lstm.bias_ih_l{i}"], sd[f"enc_spk.lstm.bias_hh_l{i}"],
        )
    if "enc_spk.linear.weight" in sd:
        _set(out, "speaker_encoder/proj/kernel", _dense(sd["enc_spk.linear.weight"]))
        _set(out, "speaker_encoder/proj/bias", sd["enc_spk.linear.bias"])

    return out
