"""Reference vocoder GAN torch checkpoint → flax param-tree converters.

Maps `GAN.state_dict()` names (TTS/vocoder/models/gan.py:41 `model_g`/`model_d`
prefixes; generator in hifigan_generator.py, discriminator in
hifigan_discriminator.py) onto our `GAN` flax tree
(`{"generator", "discriminator"}`). Shares layout helpers with the
tts-model converters (`tpu_tts/models/vits_convert.py`).

Spectral-norm convs (msd scale 0) store the *unnormalized* weight in
`parametrizations.weight.original`; our `NormConv` equally normalizes at
runtime, so that tensor maps straight onto `v`."""

import re
from typing import Any, Dict

import numpy as np

from tpu_tts.models.vits_convert import (
    _conv1d,
    _conv2d,
    _fold_param_pairs,
    _set,
    _wn_decompose,
    map_hifigan_generator,
)

_MPD_PERIODS = (2, 3, 5, 7, 11)


def _split_gan(sd: Dict[str, np.ndarray]):
    gen, disc = {}, {}
    for k, v in sd.items():
        if k.startswith("model_g."):
            gen[k[len("model_g."):]] = v
        elif k.startswith("model_d."):
            disc[k[len("model_d."):]] = v
        else:  # generator-only checkpoint (e.g. released inference models)
            gen[k] = v
    return gen, disc


def _map_norm_conv(tree, dst, weight, bias, spectral: bool):
    kv = _conv1d(weight) if weight.ndim == 3 else _conv2d(weight)
    if spectral:
        _set(tree, f"{dst}/v", kv)
    else:
        kv, g = _wn_decompose(kv)
        _set(tree, f"{dst}/v", kv)
        _set(tree, f"{dst}/g", g)
    if bias is not None:
        _set(tree, f"{dst}/bias", bias)


def convert_hifigan_discriminator_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """`HifiganDiscriminator` (mpd + msd) → our `mpd/disc_p*`, `msd/disc_s*`."""
    raw = {k: np.asarray(v) for k, v in sd.items()}
    # spectral-norm entries: keep `original` as-is; weight-norm pairs fold
    spectral = {
        m.group(1)
        for k in raw
        if (m := re.match(r"(.*)\.parametrizations\.weight\.original$", k))
    }
    folded = _fold_param_pairs(raw)
    for base in spectral:
        folded[base + ".weight"] = raw[base + ".parametrizations.weight.original"]
    out: Dict[str, Any] = {}
    for k, v in folded.items():
        m = re.match(r"(mpd|msd)\.discriminators\.(\d+)\.(convs\.(\d+)|conv_post)\.(weight|bias)$", k)
        if not m:
            continue
        which, i, _, j, leaf = m.group(1), int(m.group(2)), m.group(3), m.group(4), m.group(5)
        sub = f"convs_{j}" if j is not None else "conv_post"
        net = f"mpd/disc_p{_MPD_PERIODS[i]}" if which == "mpd" else f"msd/disc_s{i}"
        base = k.rsplit("." + leaf, 1)[0]
        is_spec = which == "msd" and i == 0 and base in spectral
        if leaf == "bias":
            _set(out, f"{net}/{sub}/bias", v)
        else:
            _map_norm_conv(out, f"{net}/{sub}", v, None, is_spec)
    return out


def convert_gan_torch_state_dict(state_dict: Dict[str, Any], generator_name: str = "hifigan") -> Dict[str, Any]:
    """Reference vocoder `GAN` torch state dict → `{"generator", "discriminator"}`."""
    gen_sd, disc_sd = _split_gan({k: np.asarray(v) for k, v in state_dict.items()})
    if generator_name not in ("hifigan", "hifigan_generator"):
        raise NotImplementedError(f"no vocoder converter for generator '{generator_name}' yet")
    gen_folded = _fold_param_pairs(gen_sd)
    gen_tree: Dict[str, Any] = {}
    map_hifigan_generator(gen_folded, gen_tree, "", "g")
    out: Dict[str, Any] = {"generator": gen_tree.get("g", {})}
    if disc_sd:
        out["discriminator"] = convert_hifigan_discriminator_state_dict(disc_sd)
    return out
