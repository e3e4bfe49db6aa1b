"""Parallel WaveGAN generator + discriminator (flax).

Mirror of /root/reference/TTS/vocoder/models/{parallel_wavegan_generator.py:
(WaveNet-style non-causal dilated conv stack with aux mel upsampling),
parallel_wavegan_discriminator.py:187}.
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.layers.common import WNConv1d


class UpsampleNetwork(nn.Module):
    """`ConvUpsample` (ref layers/upsample.py:66): a 1×1 context conv over the
    mel, then per upsample factor a nearest-neighbor time stretch followed by
    a bias-free smoothing filter of width 2s+1 SHARED across mel bins (the
    reference's Conv2d(1, 1, (1, 2s+1)) over the [bins, time] plane)."""

    upsample_factors: Tuple[int, ...]
    aux_channels: int = 80

    @nn.compact
    def __call__(self, c):
        # c: [B, T, C]
        c = nn.Conv(self.aux_channels, (1,), use_bias=False, name="conv_in")(c)
        B = c.shape[0]
        for i, s in enumerate(self.upsample_factors):
            c = jnp.repeat(c, s, axis=1)
            k = 2 * s + 1
            # shared-across-channels smoothing: fold channels into batch
            T, C = c.shape[1], c.shape[2]
            flat = jnp.swapaxes(c, 1, 2).reshape(B * C, T, 1)
            flat = nn.Conv(1, (k,), padding="SAME", use_bias=False, name=f"smooth_{i}")(flat)
            c = jnp.swapaxes(flat.reshape(B, C, T), 1, 2)
        return c


class ParallelWaveganGenerator(nn.Module):
    """Noise + upsampled mel → waveform through dilated residual convs
    (ref parallel_wavegan_generator.py:164)."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    num_res_blocks: int = 30
    stacks: int = 3
    res_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    upsample_factors: Tuple[int, ...] = (4, 4, 4, 4)

    @nn.compact
    def __call__(self, c, z=None):
        """c: mel `[B, T_mel, C]`; z: noise `[B, T, 1]` (sampled if None)."""
        hop = int(np.prod(self.upsample_factors))
        c_up = UpsampleNetwork(self.upsample_factors, aux_channels=self.aux_channels, name="upsample")(c)
        T = c_up.shape[1]
        if z is None:
            z = jax.random.normal(self.make_rng("noise"), (c.shape[0], T, self.in_channels))
        x = WNConv1d(self.res_channels, 1, name="first_conv")(z)
        skips = 0.0
        layers_per_stack = self.num_res_blocks // self.stacks
        for i in range(self.num_res_blocks):
            dilation = 2 ** (i % layers_per_stack)
            res_in = x
            h = WNConv1d(self.gate_channels, self.kernel_size, dilation=dilation, name=f"conv_{i}")(x)
            ca = WNConv1d(self.gate_channels, 1, use_bias=False, name=f"aux_{i}")(c_up)
            h = h + ca
            ht, hs = jnp.split(h, 2, axis=-1)
            out = jnp.tanh(ht) * jax.nn.sigmoid(hs)
            skip = WNConv1d(self.skip_channels, 1, name=f"skip_{i}")(out)
            skips = skips + skip
            res = WNConv1d(self.res_channels, 1, name=f"res_{i}")(out)
            # NB: the reference scales by 0.5**2 (layers/parallel_wavegan.py:75),
            # not the paper's sqrt(0.5) — match it for checkpoint parity
            x = (res_in + res) * (0.5**2)
        x = skips * (1.0 / np.sqrt(self.num_res_blocks))
        x = nn.relu(x)
        x = WNConv1d(self.skip_channels, 1, name="last_conv1")(x)
        x = nn.relu(x)
        x = WNConv1d(self.out_channels, 1, name="last_conv2")(x)
        return x  # the reference emits the raw conv output (no tanh)

    def inference(self, c):
        return self(c)


class ParallelWaveganDiscriminator(nn.Module):
    """Non-causal dilated conv discriminator (ref
    parallel_wavegan_discriminator.py:187). Returns (score, feature list)."""

    num_layers: int = 10
    conv_channels: int = 64
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        feats = []
        for i in range(self.num_layers - 1):
            dilation = max(1, i)
            x = WNConv1d(self.conv_channels, self.kernel_size, dilation=dilation, name=f"conv_{i}")(x)
            x = jax.nn.leaky_relu(x, 0.2)
            feats.append(x)
        score = WNConv1d(1, self.kernel_size, name="conv_last")(x)
        feats.append(score)
        return score.reshape(score.shape[0], -1), feats
