"""MelGAN generator family (flax): MelGAN, FullBand, MultiBand.

Mirror of /root/reference/TTS/vocoder/models/{melgan_generator.py:8,
fullband_melgan_generator.py, multiband_melgan_generator.py:9} +
layers/melgan.py residual stacks. MultiBand variant pairs with PQMF synthesis
(tpu_tts/vocoder/layers/pqmf.py).
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_tts.layers.common import WNConv1d
from tpu_tts.vocoder.models.hifigan_generator import WNConvTranspose1d


class ResidualStack(nn.Module):
    """MelGAN residual stack: blocks of [lrelu → dilated k3 conv → lrelu →
    1×1 conv] + 1×1 shortcut (ref layers/melgan.py)."""

    channels: int
    num_res_blocks: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_res_blocks):
            d = 3**i
            xt = jax.nn.leaky_relu(x, 0.2)
            xt = WNConv1d(self.channels, 3, dilation=d, pad_mode="reflect", name=f"block_{i}_conv1")(xt)
            xt = jax.nn.leaky_relu(xt, 0.2)
            xt = WNConv1d(self.channels, 1, name=f"block_{i}_conv2")(xt)
            sc = WNConv1d(self.channels, 1, name=f"shortcut_{i}")(x)
            x = xt + sc
        return x


class MelganGenerator(nn.Module):
    """mel `[B, T, C]` → waveform `[B, T·prod(factors), out_channels]`."""

    in_channels: int = 80
    out_channels: int = 1
    proj_kernel: int = 7
    base_channels: int = 512
    upsample_factors: Tuple[int, ...] = (8, 8, 2, 2)
    num_res_blocks: int = 3

    @nn.compact
    def __call__(self, x):
        o = WNConv1d(self.base_channels, self.proj_kernel, pad_mode="reflect", name="conv_pre")(x)
        for i, u in enumerate(self.upsample_factors):
            ch = self.base_channels // (2 ** (i + 1))
            o = jax.nn.leaky_relu(o, 0.2)
            o = WNConvTranspose1d(ch, 2 * u, u, name=f"up_{i}")(o)
            o = ResidualStack(ch, self.num_res_blocks, name=f"resstack_{i}")(o)
        o = jax.nn.leaky_relu(o, 0.2)
        o = WNConv1d(self.out_channels, self.proj_kernel, pad_mode="reflect", name="conv_post")(o)
        return jnp.tanh(o)

    def inference(self, c):
        c = jnp.pad(c, ((0, 0), (2, 2), (0, 0)), mode="edge")
        return self(c)


# aliases matching the reference registry names
class FullbandMelganGenerator(MelganGenerator):
    pass


class MultibandMelganGenerator(MelganGenerator):
    """4-subband generator; use with PQMF.synthesis for full-band audio."""
