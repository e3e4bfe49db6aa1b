"""MelGAN discriminators (flax).

Mirror of /root/reference/TTS/vocoder/models/{melgan_discriminator.py,
melgan_multiscale_discriminator.py}.
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_tts.vocoder.models.hifigan_discriminator import NormConv, _avg_pool


class MelganDiscriminator(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    kernel_sizes: Tuple[int, int] = (5, 3)
    base_channels: int = 16
    max_channels: int = 1024
    downsample_factors: Tuple[int, ...] = (4, 4, 4, 4)

    @nn.compact
    def __call__(self, x):
        """x: `[B, T, 1]` → (score, feature list)."""
        feats = []
        k0 = self.kernel_sizes[0] * self.kernel_sizes[1]  # 15
        o = NormConv(self.base_channels, (k0,), padding=((k0 // 2, k0 // 2),), name="conv_pre")(x)
        o = jax.nn.leaky_relu(o, 0.2)
        feats.append(o)
        ch = self.base_channels
        for i, df in enumerate(self.downsample_factors):
            ch_out = min(ch * df, self.max_channels)
            k = df * 10 + 1
            groups = max(ch // 4, 1)
            o = NormConv(ch_out, (k,), strides=(df,), groups=groups, padding=((k // 2, k // 2),), name=f"down_{i}")(o)
            o = jax.nn.leaky_relu(o, 0.2)
            feats.append(o)
            ch = ch_out
        o = NormConv(min(ch * 2, self.max_channels), (self.kernel_sizes[0],),
                     padding=((self.kernel_sizes[0] // 2,) * 2,), name="conv_mid")(o)
        o = jax.nn.leaky_relu(o, 0.2)
        feats.append(o)
        score = NormConv(self.out_channels, (self.kernel_sizes[1],),
                         padding=((self.kernel_sizes[1] // 2,) * 2,), name="conv_post")(o)
        feats.append(score)
        return score.reshape(score.shape[0], -1), feats


class MelganMultiscaleDiscriminator(nn.Module):
    num_scales: int = 3
    base_channels: int = 16
    max_channels: int = 1024
    downsample_factors: Tuple[int, ...] = (4, 4, 4)
    pooling_factor: int = 4

    @nn.compact
    def __call__(self, x):
        scores, feats = [], []
        for i in range(self.num_scales):
            score, feat = MelganDiscriminator(
                base_channels=self.base_channels,
                max_channels=self.max_channels,
                downsample_factors=self.downsample_factors,
                name=f"disc_{i}",
            )(x)
            scores.append(score)
            feats.append(feat)
            if i < self.num_scales - 1:
                x = _avg_pool(x, window=self.pooling_factor, stride=2)
        return scores, feats
