"""Reference Bark torch checkpoints → flax converters.

Maps the suno GPT checkpoints (ref /root/reference/TTS/tts/layers/bark/
model.py:146 `GPT`, model_fine.py:76 `FineGPT`; loaded with `model_args`
from the checkpoint in load_model.py:94-129) onto `tpu_tts.layers.bark_gpt`
modules, and the external `encodec` 24 kHz codec state dict (both the
original facebook naming `decoder.model.{i}` / `quantizer.vq.layers.{q}.
_codebook.embed` and the HF transformers naming `decoder.layers.{i}` /
`quantizer.layers.{q}.codebook.embed`) onto `tpu_tts.layers.encodec`.
"""

import re
from typing import Any, Dict

import numpy as np

from tpu_tts.models.vits_convert import _conv1d, _convtr1d, _dense, _fold_param_pairs, _set
from tpu_tts.train.torch_convert import fold_weight_norm


def normalize_gpt_args(model_args: Dict[str, Any]) -> Dict[str, Any]:
    """Checkpoint `model_args` → kwargs (ref load_model.py:123-127: legacy
    `vocab_size` becomes both input and output vocab)."""
    args = dict(model_args)
    if "input_vocab_size" not in args and "vocab_size" in args:
        args["input_vocab_size"] = args["vocab_size"]
        args["output_vocab_size"] = args["vocab_size"]
        del args["vocab_size"]
    args.pop("dropout", None)
    return args


def _strip_prefixes(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Drop torch-compile / DDP prefixes (ref load_model.py:131-137 strips
    `_orig_mod.`) and detach to numpy."""
    out = {}
    for k, v in sd.items():
        k = k.replace("_orig_mod.", "").replace("module.", "")
        out[k] = np.asarray(v)
    return out


def _map_nano_block(sd: Dict[str, np.ndarray], tree: Dict, src: str, dst: str):
    """transformer.h.{i} → h_{i} (ln_1/attn/ln_2/mlp), bias-optional."""
    for ln in ("ln_1", "ln_2"):
        _set(tree, f"{dst}/{ln}/scale", sd[f"{src}.{ln}.weight"])
        if f"{src}.{ln}.bias" in sd:
            _set(tree, f"{dst}/{ln}/bias", sd[f"{src}.{ln}.bias"])
    for mod, leaf in (("attn", "c_attn"), ("attn", "c_proj"), ("mlp", "c_fc"), ("mlp", "c_proj")):
        w = sd[f"{src}.{mod}.{leaf}.weight"]
        _set(tree, f"{dst}/{mod}/{leaf}/kernel", _dense(w))
        if f"{src}.{mod}.{leaf}.bias" in sd:
            _set(tree, f"{dst}/{mod}/{leaf}/bias", sd[f"{src}.{mod}.{leaf}.bias"])


def convert_bark_gpt_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """`GPT.state_dict()` → `BarkGPT` params."""
    sd = _strip_prefixes(state_dict)
    out: Dict[str, Any] = {}
    _set(out, "wte/embedding", sd["transformer.wte.weight"])
    _set(out, "wpe/embedding", sd["transformer.wpe.weight"])
    n_layer = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"transformer\.h\.(\d+)\.", k))
    )
    for i in range(n_layer):
        _map_nano_block(sd, out, f"transformer.h.{i}", f"h_{i}")
    _set(out, "ln_f/scale", sd["transformer.ln_f.weight"])
    if "transformer.ln_f.bias" in sd:
        _set(out, "ln_f/bias", sd["transformer.ln_f.bias"])
    _set(out, "lm_head/kernel", _dense(sd["lm_head.weight"]))
    return out


def convert_bark_fine_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """`FineGPT.state_dict()` → `BarkFineGPT` params. The `lm_heads` are
    weight-tied to `wtes[i+1]` (ref model_fine.py:100) so only the
    embeddings are materialized."""
    sd = _strip_prefixes(state_dict)
    out: Dict[str, Any] = {}
    n_codes = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"transformer\.wtes\.(\d+)\.", k))
    )
    for c in range(n_codes):
        _set(out, f"wte_{c}/embedding", sd[f"transformer.wtes.{c}.weight"])
    _set(out, "wpe/embedding", sd["transformer.wpe.weight"])
    n_layer = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"transformer\.h\.(\d+)\.", k))
    )
    for i in range(n_layer):
        _map_nano_block(sd, out, f"transformer.h.{i}", f"h_{i}")
    _set(out, "ln_f/scale", sd["transformer.ln_f.weight"])
    _set(out, "ln_f/bias", sd["transformer.ln_f.bias"])
    return out


# --------------------------------------------------------------------- codec
def _normalize_encodec_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Unify original-encodec / HF / parametrized-weight-norm namings onto
    `{encoder|decoder}.layers.{i}...conv.weight` with weight-norm folded."""
    ren = {}
    for k, v in sd.items():
        k = re.sub(r"\.weight_g$", ".parametrizations.weight.original0", k)
        k = re.sub(r"\.weight_v$", ".parametrizations.weight.original1", k)
        k = re.sub(r"^(encoder|decoder)\.model\.", r"\1.layers.", k)
        k = re.sub(r"\.vq\.layers\.(\d+)\._codebook\.", r".layers.\1.codebook.", k)
        # original SEANet wraps convs twice: NormConv1d(.conv) holds the
        # parametrized conv (.conv) — collapse `X.conv.conv.` to `X.conv.`
        k = k.replace(".conv.conv.", ".conv.").replace(".convtr.convtr.", ".conv.")
        k = k.replace(".lstm.lstm.", ".lstm.")
        ren[k] = np.asarray(v)
    return _fold_param_pairs(ren)


def convert_encodec_state_dict(
    state_dict: Dict[str, Any],
    upsampling_ratios=(8, 5, 4, 2),
    num_residual_layers: int = 1,
) -> Dict[str, Any]:
    """EnCodec 24 kHz `state_dict()` → `tpu_tts.layers.encodec.EncodecModel`
    params (encoder + decoder + quantizer codebooks)."""
    # decoder ModuleList slots holding ConvTranspose1d: [conv, lstm, (ELU,
    # convT, res*nrl)*len(ratios), ELU, conv]
    transpose_slots = {
        2 + (num_residual_layers + 2) * r + 1 for r in range(len(upsampling_ratios))
    }
    sd = _normalize_encodec_keys({k: np.asarray(v) for k, v in state_dict.items()})
    out: Dict[str, Any] = {}

    # quantizer codebooks → stacked [n_q, size, dim]
    qs = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"quantizer\.layers\.(\d+)\.codebook\.embed$", k))}
    )
    if qs:
        embed = np.stack([sd[f"quantizer.layers.{q}.codebook.embed"] for q in qs])
        _set(out, "quantizer/embed", embed)

    for tower in ("encoder", "decoder"):
        pat = re.compile(rf"^{tower}\.layers\.(\d+)\.(.*)$")
        groups: Dict[int, Dict[str, np.ndarray]] = {}
        for k, v in sd.items():
            m = pat.match(k)
            if m:
                groups.setdefault(int(m.group(1)), {})[m.group(2)] = v
        for i, leaves in groups.items():
            dst = f"{tower}/layer_{i}"
            if "lstm.weight_ih_l0" in leaves:
                for lk, lv in leaves.items():
                    m = re.match(r"lstm\.(weight|bias)_(ih|hh)_l(\d+)$", lk)
                    if m:
                        kind, which, lay = m.groups()
                        _set(out, f"{dst}/{'w' if kind == 'weight' else 'b'}_{which}_l{lay}", lv)
            elif "conv.weight" in leaves and not any(lk.startswith("block") for lk in leaves):
                w = leaves["conv.weight"]
                is_tr = tower == "decoder" and i in transpose_slots
                _set(out, f"{dst}/conv/kernel", _convtr1d(w) if is_tr else _conv1d(w))
                if leaves.get("conv.bias") is not None:
                    _set(out, f"{dst}/conv/bias", leaves["conv.bias"])
            else:  # resnet block
                for j in (1, 3):
                    if f"block.{j}.conv.weight" in leaves:
                        _set(out, f"{dst}/block_{j}/conv/kernel", _conv1d(leaves[f"block.{j}.conv.weight"]))
                        if f"block.{j}.conv.bias" in leaves:
                            _set(out, f"{dst}/block_{j}/conv/bias", leaves[f"block.{j}.conv.bias"])
                if "shortcut.conv.weight" in leaves:
                    _set(out, f"{dst}/shortcut/conv/kernel", _conv1d(leaves["shortcut.conv.weight"]))
                    if "shortcut.conv.bias" in leaves:
                        _set(out, f"{dst}/shortcut/conv/bias", leaves["shortcut.conv.bias"])
    return out
