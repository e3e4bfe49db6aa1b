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


def map_melgan_generator(sd: Dict[str, np.ndarray], tree: Dict, dst: str):
    """Reference `MelganGenerator` (vocoder/models/melgan_generator.py:9,
    torch `layers.N` Sequential indices) → our flax names. Layout: index 1 is
    the first conv; then per upsample stage i: index 3+3i = ConvTranspose,
    4+3i = ResidualStack; the final conv is the second-to-last module."""
    from tpu_tts.models.vits_convert import _convtr1d

    conv_idx = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"layers\.(\d+)\.", k))}
    )
    first, last = conv_idx[0], conv_idx[-1]
    stages = [i for i in conv_idx if i not in (first, last) and f"layers.{i}.weight" in sd]
    # transposes carry a plain .weight; residual stacks have .blocks keys
    ups = [i for i in stages if not any(k.startswith(f"layers.{i}.blocks") for k in sd)]
    stacks = [i for i in conv_idx if any(k.startswith(f"layers.{i}.blocks") for k in sd)]

    def put_conv(src_key, dst_name, transpose=False):
        w = sd[src_key + ".weight"]
        kv, g = _wn_decompose(_convtr1d(w) if transpose else _conv1d(w))
        _set(tree, f"{dst}/{dst_name}/v", kv)
        _set(tree, f"{dst}/{dst_name}/g", g)
        if src_key + ".bias" in sd:
            _set(tree, f"{dst}/{dst_name}/bias", sd[src_key + ".bias"])

    put_conv(f"layers.{first}", "conv_pre")
    put_conv(f"layers.{last}", "conv_post")
    for si, idx in enumerate(sorted(ups)):
        put_conv(f"layers.{idx}", f"up_{si}", transpose=True)
    for si, idx in enumerate(sorted(stacks)):
        n_blocks = len({int(m.group(1)) for k in sd if (m := re.match(rf"layers\.{idx}\.blocks\.(\d+)\.", k))})
        for b in range(n_blocks):
            put_conv(f"layers.{idx}.blocks.{b}.2", f"resstack_{si}/block_{b}_conv1")
            put_conv(f"layers.{idx}.blocks.{b}.4", f"resstack_{si}/block_{b}_conv2")
            put_conv(f"layers.{idx}.shortcuts.{b}", f"resstack_{si}/shortcut_{b}")


def convert_gan_torch_state_dict(state_dict: Dict[str, Any], generator_name: str = "hifigan") -> Dict[str, Any]:
    """Reference vocoder `GAN` torch state dict → `{"generator", "discriminator"}`.

    Generators: hifigan, melgan / fullband_melgan / multiband_melgan. For
    melgan-family checkpoints the discriminator (multiscale) is not converted:
    released checkpoints ship generator-only, and fine-tuning re-inits D.
    """
    gen_sd, disc_sd = _split_gan({k: np.asarray(v) for k, v in state_dict.items()})
    base = generator_name.lower().replace("_generator", "")
    gen_folded = _fold_param_pairs(gen_sd)
    gen_tree: Dict[str, Any] = {}
    out: Dict[str, Any] = {}
    if base in ("hifigan",):
        map_hifigan_generator(gen_folded, gen_tree, "", "g")
        if disc_sd:
            out["discriminator"] = convert_hifigan_discriminator_state_dict(disc_sd)
    elif base in ("melgan", "fullband_melgan", "multiband_melgan"):
        map_melgan_generator(gen_folded, gen_tree, "g")
    elif base == "univnet":
        map_univnet_generator(gen_folded, gen_tree, "g")
    elif base == "parallel_wavegan":
        map_parallel_wavegan_generator(gen_folded, gen_tree, "g")
        if disc_sd:
            out["discriminator"] = convert_parallel_wavegan_discriminator_state_dict(disc_sd)
    else:
        raise NotImplementedError(f"no vocoder converter for generator '{generator_name}' yet")
    out["generator"] = gen_tree.get("g", {})
    return out


def convert_wavegrad_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference `Wavegrad` torch weights (vocoder/models/wavegrad.py:61,
    layers/wavegrad.py DBlock/UBlock/FiLM) → our flax tree. Weight-norm keys
    are folded; FiLM's single chunked `output_conv` splits into our
    shift/scale convs; 1×1 convs land on Dense kernels `[in, out]`."""
    sd = _fold_param_pairs({k: np.asarray(v) for k, v in state_dict.items()})
    tree: Dict[str, Any] = {}

    def put(src, dst):
        w = sd[src + ".weight"]
        kw = _conv1d(w)  # [k, in, out]
        if kw.shape[0] == 1:  # 1x1 -> Dense
            _set(tree, f"{dst}/conv/kernel", kw[0])
        else:
            _set(tree, f"{dst}/conv/kernel", kw)
        if src + ".bias" in sd:
            _set(tree, f"{dst}/conv/bias", sd[src + ".bias"])

    put("y_conv", "y_conv")
    put("x_conv", "x_conv")
    put("out_conv", "out_conv")
    n_d = len({int(m.group(1)) for k in sd if (m := re.match(r"dblocks\.(\d+)\.", k))})
    for i in range(n_d):
        put(f"dblocks.{i}.res_block", f"dblock_{i}/res_conv")
        for j in range(3):
            put(f"dblocks.{i}.main_block.{j}", f"dblock_{i}/conv_{j}")
    n_f = len({int(m.group(1)) for k in sd if (m := re.match(r"film\.(\d+)\.", k))})
    for i in range(n_f):
        put(f"film.{i}.input_conv", f"film_{i}/input_conv")
        w = sd[f"film.{i}.output_conv.weight"]
        b = sd[f"film.{i}.output_conv.bias"]
        half = w.shape[0] // 2
        _set(tree, f"film_{i}/shift_conv/conv/kernel", _conv1d(w[:half]))
        _set(tree, f"film_{i}/shift_conv/conv/bias", b[:half])
        _set(tree, f"film_{i}/scale_conv/conv/kernel", _conv1d(w[half:]))
        _set(tree, f"film_{i}/scale_conv/conv/bias", b[half:])
    n_u = len({int(m.group(1)) for k in sd if (m := re.match(r"ublocks\.(\d+)\.", k))})
    for i in range(n_u):
        put(f"ublocks.{i}.res_block", f"ublock_{i}/res_conv")
        put(f"ublocks.{i}.main_block.0", f"ublock_{i}/conv_0")
        put(f"ublocks.{i}.main_block.1", f"ublock_{i}/conv_1")
        put(f"ublocks.{i}.out_block.0", f"ublock_{i}/conv_2")
        put(f"ublocks.{i}.out_block.1", f"ublock_{i}/conv_3")
    return tree


def map_univnet_generator(sd: Dict[str, np.ndarray], tree: Dict, dst: str):
    """Reference `UnivnetGenerator` (vocoder/models/univnet_generator.py:13 +
    layers/lvc_block.py) → our flax names. The kernel predictor's
    residual_conv Sequential convs sit at indices 1,3,6,8,11,13 →
    res{i}_conv{1,2}."""
    from tpu_tts.models.vits_convert import _convtr1d

    def put(src, dst_name, transpose=False):
        w = sd[src + ".weight"]
        kv, g = _wn_decompose(_convtr1d(w) if transpose else _conv1d(w))
        _set(tree, f"{dst}/{dst_name}/v", kv)
        _set(tree, f"{dst}/{dst_name}/g", g)
        if src + ".bias" in sd:
            _set(tree, f"{dst}/{dst_name}/bias", sd[src + ".bias"])

    put("first_conv", "conv_pre")
    put("last_conv_layers.0", "conv_post")
    n_blocks = len({int(m.group(1)) for k in sd if (m := re.match(r"lvc_blocks\.(\d+)\.", k))})
    res_idx = [(0, 1, 1), (0, 3, 2), (1, 6, 1), (1, 8, 2), (2, 11, 1), (2, 13, 2)]
    for n in range(n_blocks):
        base = f"lvc_blocks.{n}"
        put(f"{base}.upsample", f"lvc_{n}/convt_pre", transpose=True)
        n_convs = len({int(m.group(1)) for k in sd if (m := re.match(rf"lvc_blocks\.{n}\.convs\.(\d+)\.", k))})
        for i in range(n_convs):
            put(f"{base}.convs.{i}", f"lvc_{n}/conv_{i}")
        kp = f"{base}.kernel_predictor"
        put(f"{kp}.input_conv.0", f"lvc_{n}/kernel_predictor/input_conv")
        for ri, si, which in res_idx:
            put(f"{kp}.residual_conv.{si}", f"lvc_{n}/kernel_predictor/res{ri}_conv{which}")
        put(f"{kp}.kernel_conv", f"lvc_{n}/kernel_predictor/kernel_conv")
        put(f"{kp}.bias_conv", f"lvc_{n}/kernel_predictor/bias_conv")


def convert_univnet_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    sd = _fold_param_pairs({k: np.asarray(v) for k, v in state_dict.items()})
    tree: Dict[str, Any] = {}
    map_univnet_generator(sd, tree, "g")
    return tree.get("g", {})


def map_parallel_wavegan_generator(sd: Dict[str, np.ndarray], tree: Dict, dst: str):
    """Reference `ParallelWaveganGenerator` (parallel_wavegan_generator.py:9 +
    layers/parallel_wavegan.py ResidualBlock + layers/upsample.py ConvUpsample)
    → our `ParallelWaveganGenerator` tree. Expects folded weight norm."""
    _set(tree, f"{dst}/upsample/conv_in/kernel", _conv1d(sd["upsample_net.conv_in.weight"]))
    for k in sd:
        m = re.match(r"upsample_net\.upsample\.up_layers\.(\d+)\.weight$", k)
        if m:
            # per scale j: Stretch2d at 2j, smoothing Conv2d at 2j+1
            j = (int(m.group(1)) - 1) // 2
            w = np.asarray(sd[k])  # [1, 1, 1, kt]
            _set(tree, f"{dst}/upsample/smooth_{j}/kernel", w.reshape(-1, 1, 1))
    _map_norm_conv(tree, f"{dst}/first_conv", sd["first_conv.weight"], sd.get("first_conv.bias"), False)
    for k in sd:
        m = re.match(r"conv_layers\.(\d+)\.(conv|conv1x1_aux|conv1x1_skip|conv1x1_out)\.weight$", k)
        if not m:
            continue
        i, part = int(m.group(1)), m.group(2)
        my = {"conv": f"conv_{i}", "conv1x1_aux": f"aux_{i}", "conv1x1_skip": f"skip_{i}", "conv1x1_out": f"res_{i}"}[part]
        _map_norm_conv(tree, f"{dst}/{my}", sd[k], sd.get(f"conv_layers.{i}.{part}.bias"), False)
    _map_norm_conv(tree, f"{dst}/last_conv1", sd["last_conv_layers.1.weight"], sd.get("last_conv_layers.1.bias"), False)
    _map_norm_conv(tree, f"{dst}/last_conv2", sd["last_conv_layers.3.weight"], sd.get("last_conv_layers.3.bias"), False)


def convert_parallel_wavegan_discriminator_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference `ParallelWaveganDiscriminator` (parallel_wavegan_discriminator.py:9):
    convs at even ModuleList slots (LeakyReLU between); the final output conv
    is appended to the same list, so the highest even slot maps to our
    `conv_last`."""
    folded = _fold_param_pairs({k: np.asarray(v) for k, v in sd.items()})
    idxs = sorted(
        int(m.group(1)) for k in folded if (m := re.match(r"conv_layers\.(\d+)\.weight$", k))
    )
    tree: Dict[str, Any] = {}
    for i in idxs:
        dst = "conv_last" if i == idxs[-1] else f"conv_{i // 2}"
        _map_norm_conv(tree, dst, folded[f"conv_layers.{i}.weight"], folded.get(f"conv_layers.{i}.bias"), False)
    return tree


def convert_wavernn_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference `Wavernn` torch weights (vocoder/models/wavernn.py:223) →
    our flax tree. BatchNorm running stats fold onto `frozen_batch` affines;
    torch GRUs map gate-wise onto flax GRUCells; the shared up-layer
    smoothing Conv2d `[1,1,1,k]` lands on our `smooth_{i}_kernel` `[k]`."""
    from tpu_tts.models.tacotron_convert import _map_gru

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    tree: Dict[str, Any] = {}

    def dense(src, dst):
        _set(tree, f"{dst}/kernel", np.transpose(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            _set(tree, f"{dst}/bias", sd[f"{src}.bias"])

    def bn(src, dst):
        _set(tree, f"{dst}/scale", sd[f"{src}.weight"])
        _set(tree, f"{dst}/bias", sd[f"{src}.bias"])
        _set(tree, f"{dst}/mean", sd[f"{src}.running_mean"])
        _set(tree, f"{dst}/var", sd[f"{src}.running_var"])

    # ---- upsample network ----
    for k in list(sd):
        m = re.match(r"upsample\.up_layers\.(\d+)\.weight$", k)
        if m:
            j = (int(m.group(1)) - 1) // 2  # Stretch2d at 2j, conv at 2j+1
            _set(tree, f"upsample/smooth_{j}_kernel", sd[k].reshape(-1))
    if "upsample.resnet.conv_in.weight" in sd:
        _set(tree, "upsample/resnet/conv_in/kernel", _conv1d(sd["upsample.resnet.conv_in.weight"]))
        bn("upsample.resnet.batch_norm", "upsample/resnet/norm_in")
        n_res = len({int(m.group(1)) for k in sd if (m := re.match(r"upsample\.resnet\.layers\.(\d+)\.", k))})
        for i in range(n_res):
            _set(tree, f"upsample/resnet/res{i}_conv1/kernel", _conv1d(sd[f"upsample.resnet.layers.{i}.conv1.weight"]))
            _set(tree, f"upsample/resnet/res{i}_conv2/kernel", _conv1d(sd[f"upsample.resnet.layers.{i}.conv2.weight"]))
            bn(f"upsample.resnet.layers.{i}.batch_norm1", f"upsample/resnet/res{i}_norm1")
            bn(f"upsample.resnet.layers.{i}.batch_norm2", f"upsample/resnet/res{i}_norm2")
        _set(tree, "upsample/resnet/conv_out/kernel", _conv1d(sd["upsample.resnet.conv_out.weight"]))
        if "upsample.resnet.conv_out.bias" in sd:
            _set(tree, "upsample/resnet/conv_out/bias", sd["upsample.resnet.conv_out.bias"])

    # ---- sample-rate cell ----
    dense("I", "cell/I")
    for r in ("rnn1", "rnn2"):
        _map_gru(
            tree, f"cell/{r}",
            sd[f"{r}.weight_ih_l0"], sd[f"{r}.weight_hh_l0"],
            sd.get(f"{r}.bias_ih_l0"), sd.get(f"{r}.bias_hh_l0"),
        )
    dense("fc1", "cell/fc1")
    dense("fc2", "cell/fc2")
    dense("fc3", "cell/fc3")
    return tree
