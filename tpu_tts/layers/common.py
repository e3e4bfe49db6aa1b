"""Common neural building blocks (flax.linen, channels-last `[B, T, C]`).

TPU-first design notes: all tensors are channels-last so the feature dim maps
to TPU lanes; 1×1 convs are `nn.Dense` (pure MXU matmuls); masking is explicit
multiplicative `[B, T, 1]` masks; weight-norm is implemented as (v, g)
reparameterized convs matching torch's `weight_norm` for checkpoint ingest.

Covers the roles of /root/reference/TTS/tts/layers/generic/{normalization.py,
wavenet.py} and glow_tts/glow.py:11 (ResidualConv1dLayerNormBlock).
"""

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class Conv1d(nn.Module):
    """1D conv on `[B, T, C]` with 'SAME'-style symmetric padding and optional
    dilation — matches torch Conv1d(padding=k//2*d) semantics for odd k."""

    features: int
    kernel_size: int = 1
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        if self.kernel_size == 1:
            return nn.Dense(self.features, use_bias=self.use_bias, name="conv")(x)
        # length-preserving padding; asymmetric for even kernels
        total = (self.kernel_size - 1) * self.dilation
        left = (self.kernel_size // 2) * self.dilation
        right = total - left
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=[(left, right)],
            use_bias=self.use_bias,
            name="conv",
        )(x)


class WNConv1d(nn.Module):
    """Weight-normalized conv: kernel = g · v/‖v‖ (torch weight_norm parity).

    `g` is initialized to ‖v‖ so the initial effective kernel equals `v`.
    `zero_init=True` makes the layer an identity-0 map (coupling `end` convs).
    """

    features: int
    kernel_size: int = 1
    dilation: int = 1
    use_bias: bool = True
    zero_init: bool = False
    pad_mode: str = "zeros"  # "zeros" | "reflect" (MelGAN uses ReflectionPad1d)
    # compute dtype (mixed precision): params stay fp32 masters, the weight-
    # norm division runs fp32, then kernel+input are cast — the JAX analogue
    # of the reference's torch autocast regions (ref vits.py:1273)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kshape = (self.kernel_size, in_ch, self.features)
        if self.zero_init:
            v = self.param("v", nn.initializers.zeros, kshape)
        else:
            v = self.param("v", nn.initializers.he_normal(in_axis=(0, 1), out_axis=2), kshape)
        g = self.param(
            "g",
            lambda _key: jnp.sqrt(jnp.sum(jax.lax.stop_gradient(v) ** 2, axis=(0, 1)) + 1e-12),
        )
        norm = jnp.sqrt(jnp.sum(v**2, axis=(0, 1), keepdims=True) + 1e-12)
        kernel = v / norm * g[None, None, :]
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
        pad = (self.kernel_size // 2) * self.dilation
        x = x.astype(kernel.dtype)
        if self.pad_mode == "reflect" and pad:
            x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
            pad = 0
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(pad, pad)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class LayerNorm(nn.Module):
    """Channel layer norm (over last dim), matching reference LayerNorm
    (generic/normalization.py) in the `[B, T, C]` layout."""

    channels: int
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        return x * gamma + beta


class TorchBatchNorm(nn.Module):
    """Train-time BatchNorm with torch `nn.BatchNorm1d/2d` semantics on
    channels-last tensors (stats over all non-channel axes).

    - torch momentum convention: running = (1-m)·running + m·batch
      (so the reference's `momentum=0.99` CBHG norm tracks the latest batch).
    - running_var updates with the UNBIASED batch variance, normalization uses
      the biased one — exactly torch's split.
    - Running stats live in the `batch_stats` collection; the trainer threads
      them through the jitted step as explicit model state (pure function,
      no hidden mutation).

    For ingested reference checkpoints `FrozenBatchNorm` (stats folded into
    params) remains the default — this module is for training from scratch.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32))
        if train:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class ResidualConv1dLayerNormBlock(nn.Module):
    """[k-conv → LN → relu → dropout] × N with 0-init residual projection
    (ref glow.py:11). x/x_mask: `[B, T, C]` / `[B, T, 1]`."""

    hidden_channels: int
    out_channels: int
    kernel_size: int
    num_layers: int
    dropout_p: float

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        x_res = x
        for i in range(self.num_layers):
            x = Conv1d(self.hidden_channels, self.kernel_size, name=f"conv_{i}")(x * x_mask)
            x = LayerNorm(self.hidden_channels, name=f"norm_{i}")(x * x_mask)
            x = nn.Dropout(self.dropout_p, deterministic=not train)(nn.relu(x))
        proj = nn.Dense(
            self.out_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj",
        )
        x = x_res + proj(x)
        return x * x_mask


class GatedConvBlock(nn.Module):
    """Gated convolutional block (ref generic/gated_conv.py:6, GLU from
    arXiv:1612.08083): [dropout → k-conv to 2C → LayerNorm(2C) → GLU] × N
    with a running residual. x/x_mask: `[B, T, C]` / `[B, T, 1]`."""

    channels: int
    kernel_size: int
    dropout_p: float
    num_layers: int

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        o, res = x, x
        for i in range(self.num_layers):
            o = nn.Dropout(self.dropout_p, deterministic=not train)(o)
            o = Conv1d(2 * self.channels, self.kernel_size, name=f"conv_{i}")(o * x_mask)
            o = LayerNorm(2 * self.channels, name=f"norm_{i}")(o)
            a, b = jnp.split(o, 2, axis=-1)  # torch glu(dim=channels)
            o = res + a * jax.nn.sigmoid(b)
            res = o
        return o


class TimeDepthSeparableConv(nn.Module):
    """Time-depth separable conv (ref generic/time_depth_sep_conv.py:5,
    arXiv:1904.02619): 1×1→BN→GLU → depthwise k-conv→BN→x·σ(x) → 1×1→BN,
    with a residual add. BatchNorm follows the framework's norm_type
    convention ("batch" trains with threaded batch_stats, "frozen_batch"
    folds running stats for checkpoint ingest)."""

    hid_channels: int
    out_channels: int
    kernel_size: int
    norm_type: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from tpu_tts.layers.tacotron import _apply_norm

        res = x
        x = nn.Dense(2 * self.hid_channels, name="time_conv")(x)
        x = _apply_norm(self.norm_type, 2 * self.hid_channels, "norm1", x, train)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)
        half = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.hid_channels,
            kernel_size=(self.kernel_size,),
            padding=[(half, half)],
            feature_group_count=self.hid_channels,
            name="depth_conv",
        )(x)
        x = _apply_norm(self.norm_type, self.hid_channels, "norm2", x, train)
        x = x * jax.nn.sigmoid(x)
        x = nn.Dense(self.out_channels, name="time_conv2")(x)
        x = _apply_norm(self.norm_type, self.out_channels, "norm3", x, train)
        return res + x


class TimeDepthSeparableConvBlock(nn.Module):
    """Stack of TimeDepthSeparableConv, out_channels on the final layer only
    (ref generic/time_depth_sep_conv.py:60); each layer sees `x * x_mask`."""

    hid_channels: int
    out_channels: int
    num_layers: int
    kernel_size: int
    norm_type: str = "batch"

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        for i in range(self.num_layers):
            out_ch = self.out_channels if i == self.num_layers - 1 else self.hid_channels
            x = TimeDepthSeparableConv(
                self.hid_channels, out_ch, self.kernel_size, self.norm_type, name=f"layer_{i}"
            )(x * x_mask, train=train)
        return x


class WN(nn.Module):
    """Gated WaveNet stack with weight norm and optional conditioning
    (ref generic/wavenet.py:16). x: `[B, T, C]`, g: `[B, 1 or T, C_g]`."""

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    num_layers: int
    c_in_channels: int = 0
    dropout_p: float = 0.0
    dtype: Optional[Any] = None  # compute dtype (bf16 mixed precision)

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, train: bool = False):
        if x_mask is None:
            x_mask = 1.0
        output = jnp.zeros_like(x)
        if g is not None:
            g_all = WNConv1d(
                2 * self.hidden_channels * self.num_layers, 1, dtype=self.dtype, name="cond_layer"
            )(g)
        drop = nn.Dropout(self.dropout_p, deterministic=not train)
        for i in range(self.num_layers):
            dilation = self.dilation_rate**i
            x_in = WNConv1d(
                2 * self.hidden_channels, self.kernel_size, dilation=dilation, dtype=self.dtype,
                name=f"in_{i}",
            )(x)
            x_in = drop(x_in)
            if g is not None:
                off = i * 2 * self.hidden_channels
                g_l = g_all[..., off : off + 2 * self.hidden_channels]
            else:
                g_l = 0.0
            z = x_in + g_l
            acts = jnp.tanh(z[..., : self.hidden_channels]) * jax.nn.sigmoid(z[..., self.hidden_channels :])
            res_skip_ch = 2 * self.hidden_channels if i < self.num_layers - 1 else self.hidden_channels
            res_skip = WNConv1d(res_skip_ch, 1, dtype=self.dtype, name=f"res_skip_{i}")(acts)
            if i < self.num_layers - 1:
                x = (x + res_skip[..., : self.hidden_channels]) * x_mask
                output = output + res_skip[..., self.hidden_channels :]
            else:
                output = output + res_skip
        return output * x_mask


class DurationPredictor(nn.Module):
    """[2 × (k-conv → relu → LN → dropout)] → 1×1 conv
    (ref glow_tts/duration_predictor.py:7). Returns `[B, T, 1]` log durations."""

    hidden_channels: int
    kernel_size: int
    dropout_p: float
    cond_channels: int = 0
    language_emb_dim: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, lang_emb=None, train: bool = False):
        if g is not None:
            x = x + nn.Dense(x.shape[-1], name="cond")(g)
        if lang_emb is not None:
            x = x + nn.Dense(x.shape[-1], name="cond_lang")(lang_emb)
        drop = nn.Dropout(self.dropout_p, deterministic=not train)
        x = Conv1d(self.hidden_channels, self.kernel_size, name="conv_1")(x * x_mask)
        x = LayerNorm(self.hidden_channels, name="norm_1")(nn.relu(x))
        x = drop(x)
        x = Conv1d(self.hidden_channels, self.kernel_size, name="conv_2")(x * x_mask)
        x = LayerNorm(self.hidden_channels, name="norm_2")(nn.relu(x))
        x = drop(x)
        x = nn.Dense(1, name="proj")(x * x_mask)
        return x * x_mask
