"""Tortoise audio classifier (flax), weight-compatible with
/root/reference/TTS/tts/layers/tortoise/classifier.py (`AudioMiniEncoder
WithClassifierHead`, used by models/tortoise.py:150 `classify_audio_clip` to
detect Tortoise-generated audio)."""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_tts.layers.tortoise_arch import AttentionBlock, Conv1dSame, tortoise_groups


class ClassifierResBlock(nn.Module):
    """classifier.py:7 ResBlock (no up/down path, equal channels)."""

    channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        pad = 1 if self.kernel_size == 3 else 2
        h = nn.GroupNorm(num_groups=tortoise_groups(self.channels), epsilon=1e-5,
                         name="in_norm")(x)
        h = Conv1dSame(self.channels, self.kernel_size, padding=pad, name="in_conv")(jax.nn.silu(h))
        h = nn.GroupNorm(num_groups=tortoise_groups(self.channels), epsilon=1e-5,
                         name="out_norm")(h)
        h = Conv1dSame(self.channels, self.kernel_size, padding=pad, name="out_conv")(jax.nn.silu(h))
        return x + h


class AudioMiniEncoder(nn.Module):
    """classifier.py:74: conv init → (resblocks + strided Downsample) × depth
    → 1×1 projection → attention stack → first-frame embedding."""

    spec_dim: int = 1
    embedding_dim: int = 512
    base_channels: int = 128
    depth: int = 2
    resnet_blocks: int = 2
    attn_blocks: int = 4
    num_attn_heads: int = 4
    downsample_factor: int = 2
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        """x `[B, T, spec_dim]` → `[B, embedding_dim]`."""
        h = Conv1dSame(self.base_channels, 3, padding=1, name="init")(x)
        ch = self.base_channels
        i = 0
        for _ in range(self.depth):
            for _ in range(self.resnet_blocks):
                h = ClassifierResBlock(ch, self.kernel_size, name=f"res_{i}")(h)
                i += 1
            # Downsample(use_conv=True): conv k5 stride=factor pad 2
            h = Conv1dSame(ch * 2, 5, stride=self.downsample_factor, padding=2,
                           name=f"res_{i}")(h)
            i += 1
            ch *= 2
        h = nn.GroupNorm(num_groups=tortoise_groups(ch), epsilon=1e-5, name="final_norm")(h)
        h = Conv1dSame(self.embedding_dim, 1, padding=0, name="final_conv")(jax.nn.silu(h))
        for a in range(self.attn_blocks):
            h = AttentionBlock(self.embedding_dim, self.num_attn_heads, name=f"attn_{a}")(h)
        return h[:, 0]


class AudioMiniEncoderWithClassifierHead(nn.Module):
    """classifier.py:132."""

    classes: int = 2
    spec_dim: int = 1
    embedding_dim: int = 512
    base_channels: int = 32
    depth: int = 5
    resnet_blocks: int = 2
    attn_blocks: int = 4
    num_attn_heads: int = 4
    downsample_factor: int = 4
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x):
        h = AudioMiniEncoder(
            spec_dim=self.spec_dim, embedding_dim=self.embedding_dim,
            base_channels=self.base_channels, depth=self.depth,
            resnet_blocks=self.resnet_blocks, attn_blocks=self.attn_blocks,
            num_attn_heads=self.num_attn_heads,
            downsample_factor=self.downsample_factor, kernel_size=self.kernel_size,
            name="enc",
        )(x)
        return nn.Dense(self.classes, name="head")(h)
