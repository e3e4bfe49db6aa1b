"""Fused Pallas kernel for the HiFi-GAN multi-receptive-field (MRF) stack.

Motivation (profiled on 1×v5e, VITS e2e inference, B=128): the waveform
decoder is ~100% of inference time, and inside it the per-stage ResBlock
stacks are bandwidth-bound — XLA emits a separate HBM round trip for every
leaky-relu / residual-add between convs (≈40% of decoder time), and the
convolutions themselves pad the tiny channel counts (32/64) up to the 128-wide
MXU, wasting most of the array.

This kernel runs the ENTIRE MRF stack of one upsample stage — all resblocks ×
dilation units × (lrelu → dilated conv → lrelu → conv → residual) — over a
VMEM-resident tile, writing activations to HBM exactly once per stage.
Convolution taps are folded into the matmul contraction dimension
(im2col in VMEM: K = kernel_size·C, e.g. 11·32 = 352 ≈ 3 full MXU passes
instead of 11 passes at K=32), so small-channel stages stop wasting the MXU.

Layout: activations are processed as `[C, T]` tiles — C on sublanes, time on
lanes — so conv taps are static lane-offset slices. Tiles overlap by the total
receptive-field halo (60 samples for k=11, dilations (1,3,5)); boundary
correctness vs. the reference's per-conv zero padding is preserved exactly by
re-masking each conv input outside the true sequence (see `_mask`).

Behavior spec: tpu_tts/vocoder/models/hifigan_generator.py ResBlock1 (ref
hifigan_generator.py:18); numerically parity-tested against the flax module in
tests/test_hifigan_pallas.py.

STATUS (measured 1×v5e bf16, B=128, Y=768, full generator — see
scripts/tpu_validate_pallas_decoder.py): compiles and matches XLA numerically
(mean |Δ| 0.004), but runs 1.8× SLOWER than the XLA path (0.814 s vs 0.454 s
per call). Per-stage MFU of the XLA path is ~88% at C=128, so only the
small-channel stages (C=32 ≈ 20%, C=64 ≈ 58% — MXU output-row padding) have
headroom, and the f32 roll/mask VPU work in this kernel more than eats it.
Kept as an opt-in experimental path (TPU_TTS_PALLAS_DECODER=1 /
aux_input["use_pallas_decoder"]); the serving default remains XLA.
"""

import functools
import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def _block_halo(k: int, dilations: Sequence[int]) -> int:
    """Per-side receptive field of one resblock: Σ (k-1)/2·d + (k-1)/2 per unit."""
    return sum((k - 1) // 2 * d + (k - 1) // 2 for d in dilations)


def fold_wn(v: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Weight-norm fold: kernel = g · v/‖v‖ (matches WNConv1d)."""
    norm = jnp.sqrt(jnp.sum(v**2, axis=(0, 1), keepdims=True) + 1e-12)
    return v / norm * g[None, None, :]


def _mrf_kernel(x_ref, *refs, units, halo, t_tile, W0, T_total, n_blocks, out_dtype):
    """One (batch-group, tile) grid step. x_ref: [1, 1, C, bg·W0] — `bg` batch
    items side by side along lanes; refs: 4 per unit (w1_2d, b1, w2_2d, b2)
    then o_ref [1, 1, C, bg·W0].

    Every intermediate stays at the full width, center-aligned: conv taps are
    cyclic lane rolls (wrapped/cross-item garbage lands inside each item's
    halo, which the host-side de-halo slice discards), so Mosaic sees
    identical layouts on every concat/add and the kernel never slices."""
    o_ref = refs[-1]
    w_refs = refs[:-1]
    t_idx = pl.program_id(1)
    x = x_ref[0, 0]  # [C, bg*W0]
    Wfull = x.shape[1]

    def _mask(arr):
        # zero everything outside the true sequence, replicating the
        # reference's per-conv SAME zero padding at utterance edges.
        # int32 compare + f32 multiply: Mosaic lacks bf16 compare/select.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, Wfull), 1)
        pos = lane % W0 + (t_idx * t_tile - halo)
        ok = ((pos >= 0) & (pos < T_total)).astype(jnp.float32)
        return (arr.astype(jnp.float32) * ok).astype(arr.dtype)

    def _conv(h, w2d_ref, b_ref, k, d):
        # center-aligned im2col via cyclic rolls: tap j reads offset (j-pad)·d.
        # Mosaic's rotate only handles 32-bit data — roll in f32, cast back.
        pad = (k - 1) // 2
        h32 = h if h.dtype == jnp.float32 else h.astype(jnp.float32)
        taps = [
            pltpu.roll(h32, (Wfull - (j - pad) * d) % Wfull, 1).astype(h.dtype) for j in range(k)
        ]
        X = jnp.concatenate(taps, axis=0)  # [k*C, Wfull], rows ordered (j, c)
        w2d = w2d_ref[...]  # [k*C, C]
        y = jax.lax.dot_general(
            w2d, X, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [C, Wfull]
        return (y + b_ref[...][:, None]).astype(h.dtype)

    # compare-free leaky relu (Mosaic lacks bf16 compare/select)
    lrelu = lambda t: jnp.maximum(t, 0) + jnp.minimum(t, 0) * LRELU_SLOPE

    acc = None
    for b, (k, dils) in enumerate(units):
        ui = sum(len(units[bb][1]) for bb in range(b))
        h = x
        for d in dils:
            w1, b1, w2, b2 = w_refs[4 * ui : 4 * ui + 4]
            ui += 1
            t1 = _mask(lrelu(h))
            c1 = _conv(t1, w1, b1, k, d)
            t2 = _mask(lrelu(c1))
            c2 = _conv(t2, w2, b2, k, 1)
            h = h + c2
        acc = h.astype(jnp.float32) if acc is None else acc + h.astype(jnp.float32)
    o_ref[0, 0] = (acc / n_blocks).astype(out_dtype)


def mrf_stack_pallas(
    x: jnp.ndarray,
    stage_weights: List[List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]]],
    kernel_sizes: Sequence[int],
    dilations: Sequence[Sequence[int]],
    t_tile: int = 2048,
    interpret: bool = None,
) -> jnp.ndarray:
    """Apply the fused MRF stack. x `[B, T, C]` → `[B, T, C]`.

    stage_weights[b][u] = (w1 [k,C,C], b1 [C], w2 [k,C,C], b2 [C]) with
    weight-norm already folded (`fold_wn`).
    """
    if interpret is None:
        interpret = os.environ.get("TPU_TTS_PALLAS_INTERPRET", "0") == "1"
    # compute in the weight dtype (bf16 in serving) — a f32 activation leaking
    # in doubles VMEM and halves the matmul rate
    w_dtype = stage_weights[0][0][0].dtype
    if x.dtype != w_dtype:
        x = x.astype(w_dtype)
    B, T, C = x.shape
    halo = max(_block_halo(k, d) for k, d in zip(kernel_sizes, dilations))
    halo = int(np.ceil(halo / 128) * 128)  # lane-aligned final slice
    t_tile = min(t_tile, T)
    assert T % t_tile == 0, f"T={T} must divide t_tile={t_tile}"
    n_tiles = T // t_tile
    W0 = t_tile + 2 * halo
    # batch-group: pack several items side by side along lanes so each grid
    # step runs one large matmul instead of many tiny ones (grid-step overhead
    # dominated the single-item version). Cross-item roll contamination lands
    # inside the per-item halo, which the de-halo slice discards. Group size
    # is bounded by VMEM: the im2col buffer is k_max·C wide, so the working
    # set is ≈ (k_max + 8 live activations) · C · bg · W0 elements.
    itemsize = x.dtype.itemsize
    k_max = max(kernel_sizes)

    def _est_vmem(bg_):
        return (k_max + 8) * C * bg_ * W0 * itemsize

    bg = max(1, 512 // C)
    while B % bg != 0:
        bg //= 2
    while bg > 1 and _est_vmem(bg) > 60 * 2**20:
        bg //= 2
    n_bg = B // bg

    xt = jnp.swapaxes(x, 1, 2)  # [B, C, T]
    xp = jnp.pad(xt, ((0, 0), (0, 0), (halo, halo)))
    # overlapping tile view [B, n_tiles, C, W0] via static slices
    tiles = jnp.stack(
        [jax.lax.slice_in_dim(xp, i * t_tile, i * t_tile + W0, axis=2) for i in range(n_tiles)], axis=1
    )
    # [n_bg, n_tiles, C, bg*W0]: items of a group contiguous along lanes
    tiles = (
        tiles.reshape(n_bg, bg, n_tiles, C, W0)
        .transpose(0, 2, 3, 1, 4)
        .reshape(n_bg, n_tiles, C, bg * W0)
    )

    units = tuple((int(k), tuple(int(d) for d in dils)) for k, dils in zip(kernel_sizes, dilations))
    flat_w = []
    w_specs = []
    for b, (k, dils) in enumerate(units):
        for u in range(len(dils)):
            w1, b1, w2, b2 = stage_weights[b][u]
            for arr in (w1.reshape(k * C, C), b1, w2.reshape(k * C, C), b2):
                arr = arr.astype(x.dtype) if arr.ndim == 2 else arr.astype(jnp.float32)
                flat_w.append(arr)
                w_specs.append(pl.BlockSpec(arr.shape, lambda *_, n=arr.ndim: (0,) * n))

    kernel = functools.partial(
        _mrf_kernel,
        units=units,
        halo=halo,
        t_tile=t_tile,
        W0=W0,
        T_total=T,
        n_blocks=len(units),
        out_dtype=x.dtype,
    )
    # 2× headroom over the bf16 working-set estimate: the f32 roll/mask/acc
    # intermediates roughly double it (measured 67.2M stack vs 44.8M estimate
    # at C=64, bg=8 — a 1.5× limit OOMed the scoped vmem allocator)
    vmem_bytes = _est_vmem(bg) + sum(arr.size * arr.dtype.itemsize for arr in flat_w)
    out = pl.pallas_call(
        kernel,
        grid=(n_bg, n_tiles),
        in_specs=[pl.BlockSpec((1, 1, C, bg * W0), lambda b, t: (b, t, 0, 0))] + w_specs,
        out_specs=pl.BlockSpec((1, 1, C, bg * W0), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bg, n_tiles, C, bg * W0), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(max(vmem_bytes * 2, 16 * 2**20), 110 * 2**20))
        ),
        interpret=interpret,
    )(tiles, *flat_w)
    # de-halo: [n_bg, n_tiles, C, bg*W0] -> per-item center slices -> [B, T, C]
    out = out.reshape(n_bg, n_tiles, C, bg, W0)[..., halo : halo + t_tile]
    y = out.transpose(0, 3, 2, 1, 4).reshape(B, C, T)
    return jnp.swapaxes(y, 1, 2)


def extract_stage_weights(gen_params, stage: int, num_kernels: int, dtype=None):
    """Pull + fold the stage's resblock conv weights from HifiganGenerator
    params (resblocks_{stage*num_kernels + j} / convs{1,2}_{u})."""
    out = []
    for j in range(num_kernels):
        rb = gen_params[f"resblocks_{stage * num_kernels + j}"]
        units = []
        u = 0
        while f"convs1_{u}" in rb:
            c1, c2 = rb[f"convs1_{u}"], rb[f"convs2_{u}"]
            w1 = fold_wn(c1["v"], c1["g"])
            w2 = fold_wn(c2["v"], c2["g"])
            units.append((w1, c1["bias"], w2, c2["bias"]))
            u += 1
        out.append(units)
    return out


# --------------------------------------------------------------------------- #
# Full generator forward with fused MRF stages (serving fast path)            #
# --------------------------------------------------------------------------- #


def _wn_conv(params, x, dilation=1, use_bias=True):
    """WNConv1d forward from raw params (x `[B, T, C]`, SAME padding).
    Computes in the KERNEL dtype, matching WNConv1d's `x.astype(kernel.dtype)`
    (bf16 serving params keep the whole path bf16)."""
    kernel = fold_wn(params["v"], params["g"])
    x = x.astype(kernel.dtype)
    k = kernel.shape[0]
    pad = (k // 2) * dilation
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if use_bias and "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def _wn_conv_transpose(params, x, stride):
    kernel = fold_wn(params["v"], params["g"])
    x = x.astype(kernel.dtype)
    k = kernel.shape[0]
    crop = (k - stride) // 2
    pad = k - 1 - crop
    y = jax.lax.conv_transpose(
        x, kernel, strides=(stride,), padding=[(pad, pad)], dimension_numbers=("NHC", "HIO", "NHC")
    )
    return y + params["bias"].astype(x.dtype)


def hifigan_apply_pallas(
    gen_params,
    x: jnp.ndarray,
    g=None,
    *,
    resblock_kernel_sizes=(3, 7, 11),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    upsample_factors=(8, 8, 2, 2),
    max_pallas_channels: int = 128,
    t_tile: int = 2048,
    interpret: bool = None,
) -> jnp.ndarray:
    """HifiganGenerator forward (resblock_type "1") with the MRF stacks fused
    via `mrf_stack_pallas`. Mirrors HifiganGenerator.__call__ exactly (same
    params tree); stages whose channel count exceeds `max_pallas_channels`
    (VMEM weight budget) fall back to the flax/XLA resblock math.

    Time lengths must tile: T_mel · prod(upsample_factors[:i+1]) should be a
    multiple of `t_tile` (or of the auto-shrunk tile) per pallas stage.
    """
    from tpu_tts.vocoder.models.hifigan_generator import ResBlock1, lrelu

    num_kernels = len(resblock_kernel_sizes)
    upsample_initial_channel = gen_params["conv_pre"]["v"].shape[-1]
    o = _wn_conv(gen_params["conv_pre"], x)
    if g is not None and "cond_layer" in gen_params:
        cl = gen_params["cond_layer"]
        o = o + jnp.einsum("b1c,cd->b1d", g.astype(o.dtype), cl["kernel"].astype(o.dtype)) + cl["bias"].astype(o.dtype)
    for i, u in enumerate(upsample_factors):
        o = lrelu(o)
        ch = upsample_initial_channel // (2 ** (i + 1))
        o = _wn_conv_transpose(gen_params[f"ups_{i}"], o, u)
        T = o.shape[1]
        tile = t_tile
        while tile > 128 and T % tile != 0:
            tile //= 2
        if ch <= max_pallas_channels and T % tile == 0:
            weights = extract_stage_weights(gen_params, i, num_kernels)
            o = mrf_stack_pallas(
                o, weights, resblock_kernel_sizes, resblock_dilation_sizes, t_tile=tile, interpret=interpret
            )
        else:
            z_sum = None
            for j, (rk, rd) in enumerate(zip(resblock_kernel_sizes, resblock_dilation_sizes)):
                rb_params = gen_params[f"resblocks_{i * num_kernels + j}"]
                h = o
                for uix, d in enumerate(rd):
                    xt = lrelu(h)
                    xt = _wn_conv(rb_params[f"convs1_{uix}"], xt, dilation=d)
                    xt = lrelu(xt)
                    xt = _wn_conv(rb_params[f"convs2_{uix}"], xt, dilation=1)
                    h = h + xt
                z_sum = h if z_sum is None else z_sum + h
            o = z_sum / num_kernels
    o = jax.nn.leaky_relu(o, 0.01)
    o = _wn_conv(gen_params["conv_post"], o, use_bias="bias" in gen_params["conv_post"])
    return jnp.tanh(o)
