"""Reference XTTS (v2, perceiver variant) torch checkpoint → flax converter.

Maps `Xtts.state_dict()` (TTS/tts/models/xtts.py, gpt stack in
TTS/tts/layers/xtts/{gpt.py, latent_encoder.py, perceiver_encoder.py},
decoder in hifigan_decoder.py) onto our `XttsNet` tree.

GPT-2 notes: transformers' Conv1D stores weights `[in, out]` — copied
straight into flax Dense kernels with no transpose. The conditioning
encoder's packed per-head qkv conv layout matches our Dense column order
directly after the 1×1-conv→Dense transpose."""

import re
from typing import Any, Dict

import numpy as np

from tpu_tts.encoder.encoder_convert import convert_resnet_encoder_state_dict
from tpu_tts.models.vits_convert import _dense, _fold_param_pairs, _set, map_hifigan_generator


def convert_xtts_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict[str, Any] = {}

    # ---- conditioning encoder (conv + attention blocks) ----
    if "gpt.conditioning_encoder.init.weight" in sd:
        _set(out, "conditioning_encoder/init/kernel", _dense(sd["gpt.conditioning_encoder.init.weight"]))
        _set(out, "conditioning_encoder/init/bias", sd["gpt.conditioning_encoder.init.bias"])
    for k in sd:
        m = re.match(r"gpt\.conditioning_encoder\.attn\.(\d+)\.(norm|qkv|proj_out)\.(weight|bias)$", k)
        if not m:
            continue
        i, which, leaf = m.groups()
        dst = f"conditioning_encoder/attn_{i}/{which}"
        if which == "norm":
            _set(out, f"{dst}/{'scale' if leaf == 'weight' else 'bias'}", sd[k])
        else:
            _set(out, f"{dst}/{'kernel' if leaf == 'weight' else 'bias'}",
                 _dense(sd[k]) if leaf == "weight" else sd[k])

    # ---- perceiver resampler ----
    if "gpt.conditioning_perceiver.latents" in sd:
        _set(out, "conditioning_perceiver/latents", sd["gpt.conditioning_perceiver.latents"])
        _set(out, "conditioning_perceiver/norm_gamma", sd["gpt.conditioning_perceiver.norm.gamma"])
        for k in sd:
            m = re.match(r"gpt\.conditioning_perceiver\.layers\.(\d+)\.0\.(to_q|to_kv|to_out)\.weight$", k)
            if m:
                _set(out, f"conditioning_perceiver/attn_{m.group(1)}/{m.group(2)}/kernel", _dense(sd[k]))
                continue
            m = re.match(r"gpt\.conditioning_perceiver\.layers\.(\d+)\.1\.(0|2)\.(weight|bias)$", k)
            if m:
                i, pos, leaf = m.groups()
                which = "fc" if pos == "0" else "proj"
                _set(out, f"conditioning_perceiver/ff_{i}/{which}/{'kernel' if leaf == 'weight' else 'bias'}",
                     _dense(sd[k]) if leaf == "weight" else sd[k])
        if "gpt.conditioning_perceiver.proj_context.weight" in sd:
            _set(out, "conditioning_perceiver/proj_context/kernel",
                 _dense(sd["gpt.conditioning_perceiver.proj_context.weight"]))
            _set(out, "conditioning_perceiver/proj_context/bias",
                 sd["gpt.conditioning_perceiver.proj_context.bias"])

    # ---- embeddings / heads / norms ----
    pairs = [
        ("gpt.text_embedding.weight", "gpt/text_embedding/embedding", None),
        ("gpt.mel_embedding.weight", "gpt/audio_embedding/embedding", None),
        ("gpt.text_pos_embedding.emb.weight", "gpt/text_pos_embedding/embedding", None),
        ("gpt.mel_pos_embedding.emb.weight", "gpt/audio_pos_embedding/embedding", None),
        ("gpt.text_head.weight", "gpt/text_head/kernel", _dense),
        ("gpt.text_head.bias", "gpt/text_head/bias", None),
        ("gpt.mel_head.weight", "gpt/mel_head/kernel", _dense),
        ("gpt.mel_head.bias", "gpt/mel_head/bias", None),
        ("gpt.gpt.ln_f.weight", "gpt/ln_f/scale", None),
        ("gpt.gpt.ln_f.bias", "gpt/ln_f/bias", None),
        ("gpt.final_norm.weight", "gpt/final_norm/scale", None),
        ("gpt.final_norm.bias", "gpt/final_norm/bias", None),
    ]
    for src, dst, fn in pairs:
        if src in sd:
            _set(out, dst, fn(sd[src]) if fn else sd[src])

    # ---- GPT-2 blocks: transformers Conv1D is [in, out] — no transpose ----
    for k in sd:
        m = re.match(r"gpt\.gpt\.h\.(\d+)\.(ln_[12])\.(weight|bias)$", k)
        if m:
            i, ln, leaf = m.groups()
            _set(out, f"gpt/h_{i}/{ln.replace('_', '')}/{'scale' if leaf == 'weight' else 'bias'}", sd[k])
            continue
        m = re.match(r"gpt\.gpt\.h\.(\d+)\.attn\.(c_attn|c_proj)\.(weight|bias)$", k)
        if m:
            i, which, leaf = m.groups()
            dst = "qkv" if which == "c_attn" else "proj"
            _set(out, f"gpt/h_{i}/attn/{dst}/{'kernel' if leaf == 'weight' else 'bias'}", sd[k])
            continue
        m = re.match(r"gpt\.gpt\.h\.(\d+)\.mlp\.(c_fc|c_proj)\.(weight|bias)$", k)
        if m:
            i, which, leaf = m.groups()
            dst = "mlp_fc" if which == "c_fc" else "mlp_proj"
            _set(out, f"gpt/h_{i}/{dst}/{'kernel' if leaf == 'weight' else 'bias'}", sd[k])

    # ---- waveform decoder (standard hifigan map) ----
    wd_sd = _fold_param_pairs(
        {k[len("hifigan_decoder.waveform_decoder."):]: v
         for k, v in sd.items() if k.startswith("hifigan_decoder.waveform_decoder.")}
    )
    map_hifigan_generator(wd_sd, out, "", "hifigan_decoder")

    # ---- decoder-side ResNet speaker encoder (same arch as TTS.encoder) ----
    se_sd = {
        k[len("hifigan_decoder.speaker_encoder."):]: v
        for k, v in sd.items()
        if k.startswith("hifigan_decoder.speaker_encoder.") and ".torch_spec." not in k
    }
    if se_sd:
        out["speaker_encoder"] = convert_resnet_encoder_state_dict(se_sd, input_dim=64)

    return out
