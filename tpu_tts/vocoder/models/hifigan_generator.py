"""HiFi-GAN generator (flax, channels-last).

Mirror of /root/reference/TTS/vocoder/models/hifigan_generator.py (ResBlock1
:18, ResBlock2:108, HifiganGenerator:206 with transposed-conv upsampling and
MRF). TPU notes: channels-last keeps channel dims on lanes; upsampling is
`lax.conv_transpose`; the whole stack is static-shape so XLA fuses
leaky-relu/add chains into the convs. This is the per-chip throughput
north-star model (BASELINE.md).
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_tts.layers.common import WNConv1d

LRELU_SLOPE = 0.1


def lrelu(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


class WNConvTranspose1d(nn.Module):
    """Weight-normalized transposed conv with torch-compatible `T→T·stride`
    output length (crop (k-stride)//2 per side)."""

    features: int
    kernel_size: int
    stride: int
    dtype: Optional[Any] = None  # compute dtype (fp32 master params)

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k, s = self.kernel_size, self.stride
        v = self.param("v", nn.initializers.he_normal(in_axis=(0, 1), out_axis=2), (k, in_ch, self.features))
        g = self.param(
            "g", lambda _k: jnp.sqrt(jnp.sum(jax.lax.stop_gradient(v) ** 2, axis=(0, 1)) + 1e-12)
        )
        norm = jnp.sqrt(jnp.sum(v**2, axis=(0, 1), keepdims=True) + 1e-12)
        kernel = v / norm * g[None, None, :]
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
        crop = (k - s) // 2
        pad = k - 1 - crop
        x = x.astype(kernel.dtype)
        y = jax.lax.conv_transpose(
            x, kernel, strides=(s,), padding=[(pad, pad)], dimension_numbers=("NHC", "HIO", "NHC")
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return y + b.astype(y.dtype)


class ResBlock1(nn.Module):
    """3 × [lrelu → dilated conv → lrelu → conv] with residuals (ref :18)."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = lrelu(x)
            xt = WNConv1d(self.channels, self.kernel_size, dilation=d, dtype=self.dtype, name=f"convs1_{i}")(xt)
            xt = lrelu(xt)
            xt = WNConv1d(self.channels, self.kernel_size, dilation=1, dtype=self.dtype, name=f"convs2_{i}")(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """2 × [lrelu → dilated conv] with residuals (ref :108)."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = lrelu(x)
            xt = WNConv1d(self.channels, self.kernel_size, dilation=d, dtype=self.dtype, name=f"convs_{i}")(xt)
            x = xt + x
        return x


class HifiganGenerator(nn.Module):
    """mel `[B, T, C_mel]` → waveform `[B, T·prod(upsample), 1]` (ref :206)."""

    in_channels: int = 80
    out_channels: int = 1
    resblock_type: str = "1"
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    upsample_factors: Tuple[int, ...] = (8, 8, 2, 2)
    inference_padding: int = 5
    cond_channels: int = 0
    conv_pre_weight_norm: bool = True
    conv_post_weight_norm: bool = True
    conv_post_bias: bool = True
    # XTTS HifiDecoder variant: re-inject speaker conditioning after every
    # upsample stage (ref tts/layers/xtts/hifigan_decoder.py `conds`)
    cond_in_each_up_layer: bool = False
    # compute dtype for the whole stack (bfloat16 mixed precision); the final
    # conv_post + tanh run fp32 for a clean waveform
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, g=None):
        """x: `[B, T, C_mel]`; g: `[B, 1, C_g]` speaker conditioning."""
        num_kernels = len(self.resblock_kernel_sizes)
        resblock_cls = ResBlock1 if str(self.resblock_type) == "1" else ResBlock2
        o = WNConv1d(self.upsample_initial_channel, 7, dtype=self.dtype, name="conv_pre")(x)
        if self.cond_channels > 0 and g is not None:
            o = o + nn.Dense(self.upsample_initial_channel, dtype=self.dtype, name="cond_layer")(g)
        for i, (u, k) in enumerate(zip(self.upsample_factors, self.upsample_kernel_sizes)):
            o = lrelu(o)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            o = WNConvTranspose1d(ch, k, u, dtype=self.dtype, name=f"ups_{i}")(o)
            if self.cond_in_each_up_layer and g is not None:
                o = o + nn.Dense(ch, dtype=self.dtype, name=f"conds_{i}")(g)
            z_sum = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)):
                rb = resblock_cls(ch, rk, tuple(rd), dtype=self.dtype, name=f"resblocks_{i*num_kernels + j}")(o)
                z_sum = rb if z_sum is None else z_sum + rb
            o = z_sum / num_kernels
        # ref hifigan_generator.py:262 uses torch's default slope (0.01) here,
        # unlike the 0.1 used everywhere else — kept for checkpoint parity
        o = jax.nn.leaky_relu(o.astype(jnp.float32), 0.01)
        o = WNConv1d(self.out_channels, 7, use_bias=self.conv_post_bias, name="conv_post")(o)
        return jnp.tanh(o)

    def inference(self, c):
        c = jnp.pad(c, ((0, 0), (self.inference_padding, self.inference_padding), (0, 0)), mode="edge")
        return self(c)
