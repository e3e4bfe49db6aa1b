"""UnivNet generator: location-variable convolutions (flax).

Mirror of /root/reference/TTS/vocoder/models/univnet_generator.py:157 +
layers/lvc_block.py (KernelPredictor:5, LVCBlock:86). The LVC op — per-frame
predicted conv kernels applied to audio segments — is expressed as an einsum
over unfolded segments, which XLA maps onto the MXU.
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.layers.common import WNConv1d


class KernelPredictor(nn.Module):
    """Mel → per-frame LVC kernels/biases (ref lvc_block.py:5)."""

    cond_channels: int
    conv_in_channels: int
    conv_out_channels: int
    conv_layers: int
    conv_kernel_size: int = 3
    kpnet_hidden_channels: int = 64
    kpnet_conv_size: int = 3
    dropout: float = 0.0
    lrelu_slope: float = 0.1  # tortoise/vocoder.py:27 uses the block slope (0.2)
    # coqui lvc_block.py:45-63 wraps ONE residual around the whole 6-conv
    # chain; tortoise/vocoder.py:107-109 adds a residual around EACH 2-conv
    # block
    per_block_residual: bool = False

    @nn.compact
    def __call__(self, c, train: bool = False):
        kpnet_kernel_channels = self.conv_in_channels * self.conv_out_channels * self.conv_kernel_size * self.conv_layers
        kpnet_bias_channels = self.conv_out_channels * self.conv_layers
        h = WNConv1d(self.kpnet_hidden_channels, 5, name="input_conv")(c)
        h = jax.nn.leaky_relu(h, self.lrelu_slope)
        if self.per_block_residual:
            for i in range(3):
                res = nn.Dropout(self.dropout, deterministic=not train)(h)
                res = WNConv1d(self.kpnet_hidden_channels, self.kpnet_conv_size, name=f"res{i}_conv1")(res)
                res = jax.nn.leaky_relu(res, self.lrelu_slope)
                res = WNConv1d(self.kpnet_hidden_channels, self.kpnet_conv_size, name=f"res{i}_conv2")(res)
                res = jax.nn.leaky_relu(res, self.lrelu_slope)
                h = h + res
        else:
            # ONE residual over the whole 6-conv chain (ref lvc_block.py:45-63)
            res = h
            for i in range(3):
                res = nn.Dropout(self.dropout, deterministic=not train)(res)
                res = WNConv1d(self.kpnet_hidden_channels, self.kpnet_conv_size, name=f"res{i}_conv1")(res)
                res = jax.nn.leaky_relu(res, self.lrelu_slope)
                res = WNConv1d(self.kpnet_hidden_channels, self.kpnet_conv_size, name=f"res{i}_conv2")(res)
                res = jax.nn.leaky_relu(res, self.lrelu_slope)
            h = h + res
        kernels = WNConv1d(kpnet_kernel_channels, self.kpnet_conv_size, name="kernel_conv")(h)
        bias = WNConv1d(kpnet_bias_channels, self.kpnet_conv_size, name="bias_conv")(h)
        B, T = kernels.shape[0], kernels.shape[1]
        kernels = kernels.reshape(
            B, T, self.conv_layers, self.conv_in_channels, self.conv_out_channels, self.conv_kernel_size
        )
        bias = bias.reshape(B, T, self.conv_layers, self.conv_out_channels)
        return kernels, bias


def location_variable_convolution(x, kernel, bias, dilation: int, hop_size: int):
    """LVC (ref lvc_block.py:170): apply per-frame kernels to per-frame audio
    segments. x `[B, T, C_in]`, kernel `[B, T_frames, C_in, C_out, K]`,
    bias `[B, T_frames, C_out]`."""
    B, T, C_in = x.shape
    Tf = kernel.shape[1]
    K = kernel.shape[-1]
    assert T == Tf * hop_size, f"LVC length mismatch {T} vs {Tf}*{hop_size}"
    pad = dilation * (K - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    # gather K dilated taps for every output position: out[t] uses xp[t + k*dilation]
    idx = np.arange(T)[:, None] + np.arange(K)[None, :] * dilation  # [T, K]
    taps = xp[:, idx]  # [B, T, K, C_in]
    taps = taps.reshape(B, Tf, hop_size, K, C_in)
    out = jnp.einsum("bfhki,bfiok->bfho", taps, kernel, preferred_element_type=jnp.float32)
    out = out + bias[:, :, None, :]
    return out.reshape(B, T, -1)


class LVCBlock(nn.Module):
    """Upsample + stack of dilated LVC layers (ref lvc_block.py:86)."""

    in_channels: int
    cond_channels: int
    upsample_ratio: int
    conv_layers: int = 4
    conv_kernel_size: int = 3
    kpnet_hidden_channels: int = 64
    kpnet_conv_size: int = 3
    dropout: float = 0.0
    kpnet_lrelu_slope: float = 0.1
    kpnet_per_block_residual: bool = False
    dilations: Tuple[int, ...] = (1, 3, 9, 27)

    @nn.compact
    def __call__(self, x, c, train: bool = False):
        kernels, bias = KernelPredictor(
            cond_channels=self.cond_channels,
            conv_in_channels=self.in_channels,
            conv_out_channels=2 * self.in_channels,
            conv_layers=self.conv_layers,
            conv_kernel_size=self.conv_kernel_size,
            kpnet_hidden_channels=self.kpnet_hidden_channels,
            kpnet_conv_size=self.kpnet_conv_size,
            dropout=self.dropout,
            lrelu_slope=self.kpnet_lrelu_slope,
            per_block_residual=self.kpnet_per_block_residual,
            name="kernel_predictor",
        )(c, train=train)
        # transposed-conv upsample of the audio latent
        stride = self.upsample_ratio
        x = jax.nn.leaky_relu(x, 0.2)
        from tpu_tts.vocoder.models.hifigan_generator import WNConvTranspose1d

        x = WNConvTranspose1d(self.in_channels, 2 * stride, stride, name="convt_pre")(x)
        hop = x.shape[1] // c.shape[1]
        for i in range(self.conv_layers):
            dilation = self.dilations[i]
            y = jax.nn.leaky_relu(x, 0.2)
            y = WNConv1d(self.in_channels, self.conv_kernel_size, dilation=dilation, name=f"conv_{i}")(y)
            y = jax.nn.leaky_relu(y, 0.2)
            y = location_variable_convolution(y, kernels[:, :, i], bias[:, :, i], dilation=1, hop_size=hop)
            # ref lvc_block.py:158: sigmoid on the FIRST half, tanh on the second
            xa, xb = jnp.split(y, 2, axis=-1)
            x = x + jax.nn.sigmoid(xa) * jnp.tanh(xb)
        return x


class UnivnetGenerator(nn.Module):
    """Noise + mel → waveform (ref univnet_generator.py:157)."""

    in_channels: int = 64
    out_channels: int = 1
    hidden_channels: int = 32
    cond_channels: int = 80
    upsample_factors: Tuple[int, ...] = (8, 8, 4)
    lvc_layers_each_block: int = 4
    lvc_kernel_size: int = 3
    kpnet_hidden_channels: int = 64
    kpnet_conv_size: int = 3
    dropout: float = 0.0
    # tortoise/vocoder.py variant: reflect-padded pre/post convs, slope 0.2
    # everywhere (incl. the kernel predictor), n_mel=100 conditioning
    kpnet_lrelu_slope: float = 0.1
    kpnet_per_block_residual: bool = False
    post_lrelu_slope: float = 0.1
    pad_mode: str = "zeros"

    @nn.compact
    def __call__(self, c, z=None, train: bool = False):
        """c: mel `[B, T_mel, C_mel]` → wav `[B, T_mel*prod(factors), 1]`."""
        B, Tm, _ = c.shape
        if z is None:
            z = jax.random.normal(self.make_rng("noise"), (B, Tm, self.in_channels))
        x = WNConv1d(self.hidden_channels, 7, pad_mode=self.pad_mode, name="conv_pre")(z)
        for i, s in enumerate(self.upsample_factors):
            x = LVCBlock(
                in_channels=self.hidden_channels,
                cond_channels=self.cond_channels,
                upsample_ratio=s,
                conv_layers=self.lvc_layers_each_block,
                conv_kernel_size=self.lvc_kernel_size,
                kpnet_hidden_channels=self.kpnet_hidden_channels,
                kpnet_conv_size=self.kpnet_conv_size,
                dropout=self.dropout,
                kpnet_lrelu_slope=self.kpnet_lrelu_slope,
                kpnet_per_block_residual=self.kpnet_per_block_residual,
                name=f"lvc_{i}",
            )(x, c, train=train)
        x = jax.nn.leaky_relu(x, self.post_lrelu_slope)  # ref univnet_generator.py:10
        x = WNConv1d(self.out_channels, 7, pad_mode=self.pad_mode, name="conv_post")(x)
        return jnp.tanh(x)

    def inference(self, c):
        return self(c)
