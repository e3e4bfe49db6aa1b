"""Tortoise shared building blocks (flax), weight-compatible with the
reference /root/reference/TTS/tts/layers/tortoise/arch_utils.py.

Covers: the grouped normalization rule (arch_utils.py:29), the legacy
per-head-packed QKV attention block with optional T5 relative-position bias
(arch_utils.py:47 `QKVAttentionLegacy`, :83 `AttentionBlock`;
xtransformers.py:151 `RelativePositionBias`), the AR conditioning encoder
(autoregressive.py:163), sinusoidal timestep embeddings
(diffusion_decoder.py:21), and the diffusion ResBlock/DiffusionLayer
(diffusion_decoder.py:60,123).

TPU notes: channels-last `[B, T, C]`; the relative-position bucket matrix is
computed with numpy at trace time (static shapes) so the bias is a single
gather + add inside the kernel; attention runs as batched einsum on the MXU.
"""

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def tortoise_groups(channels: int) -> int:
    """Group count rule of arch_utils.py:29 `normalization`."""
    groups = 32
    if channels <= 16:
        groups = 8
    elif channels <= 64:
        groups = 16
    while channels % groups != 0:
        groups = int(groups / 2)
    assert groups > 2
    return groups


def t5_relative_bucket_matrix(i: int, j: int, num_buckets: int = 32, max_distance: int = 64) -> np.ndarray:
    """Non-causal T5 bucket ids `[i, j]` (xtransformers.py:161, causal=False)."""
    q_pos = np.arange(i)[:, None]
    k_pos = np.arange(j)[None, :]
    n = q_pos - k_pos  # == -(k_pos - q_pos)
    nb = num_buckets // 2
    ret = (n < 0).astype(np.int64) * nb
    n = np.abs(n)
    max_exact = nb // 2
    with np.errstate(divide="ignore"):
        val_if_large = max_exact + (
            np.log(np.maximum(n, 1) / max_exact) / math.log(max_distance / max_exact) * (nb - max_exact)
        ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, nb - 1)
    return ret + np.where(n < max_exact, n, val_if_large)


def group_norm(x, num_groups: int, eps: float = 1e-5):
    """Parameter-free GroupNorm on channels-last `[B, T, C]`."""
    B, T, C = x.shape
    g = x.reshape(B, T, num_groups, C // num_groups)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = g.var(axis=(1, 3), keepdims=True)
    return ((g - mean) / jnp.sqrt(var + eps)).reshape(B, T, C)


class RelativePositionBias(nn.Module):
    """T5-style additive attention bias (xtransformers.py:151)."""

    scale: float
    heads: int
    num_buckets: int = 32
    max_distance: int = 64

    @nn.compact
    def __call__(self, qk_dots):
        """qk_dots `[B, H, i, j]` → biased dots."""
        i, j = qk_dots.shape[-2], qk_dots.shape[-1]
        emb = self.param(
            "relative_attention_bias", nn.initializers.normal(1.0), (self.num_buckets, self.heads)
        )
        bucket = t5_relative_bucket_matrix(i, j, self.num_buckets, self.max_distance)
        bias = emb[jnp.asarray(bucket)]  # [i, j, H]
        return qk_dots + jnp.transpose(bias, (2, 0, 1))[None] * self.scale


class AttentionBlock(nn.Module):
    """arch_utils.py:83: GroupNorm → per-head-packed qkv 1×1 conv →
    double-sqrt-scaled attention (+ optional T5 rel-pos bias) → zero-init out
    proj → residual from the UN-normed input (unlike the XTTS variant)."""

    channels: int
    num_heads: int = 1
    relative_pos_embeddings: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        """x `[B, T, C]`; mask `[B, T]` multiplies post-softmax weights
        (arch_utils.py:74-77 semantics)."""
        B, T, C = x.shape
        H = self.num_heads
        ch = C // H
        h = nn.GroupNorm(num_groups=tortoise_groups(C), epsilon=1e-5, name="norm")(x)
        qkv = nn.Dense(3 * C, name="qkv")(h).reshape(B, T, H, 3, ch)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        att = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
        if self.relative_pos_embeddings:
            att = RelativePositionBias(
                scale=ch**0.5, heads=H, num_buckets=32, max_distance=64,
                name="relative_pos_embeddings",
            )(att)
        att = jax.nn.softmax(att, axis=-1)
        if mask is not None:
            att = att * mask[:, None, None, :]
        y = jnp.einsum("bhts,bshc->bthc", att, v).reshape(B, T, C)
        y = nn.Dense(C, kernel_init=nn.initializers.zeros, name="proj_out")(y)
        return x + y


class ConditioningEncoder(nn.Module):
    """autoregressive.py:163: 1×1 conv + N attention blocks; output is the
    first frame's vector (or the time-mean when `mean=True`)."""

    spec_dim: int = 80
    embedding_dim: int = 1024
    attn_blocks: int = 6
    num_attn_heads: int = 4
    mean: bool = False

    @nn.compact
    def __call__(self, mel):
        """mel `[B, T, spec_dim]` → `[B, embedding_dim]`."""
        h = nn.Dense(self.embedding_dim, name="init")(mel)
        for i in range(self.attn_blocks):
            h = AttentionBlock(self.embedding_dim, self.num_attn_heads, name=f"attn_{i}")(h)
        return h.mean(axis=1) if self.mean else h[:, 0]


def timestep_embedding(timesteps, dim: int, max_period: int = 10000):
    """diffusion_decoder.py:21: sinusoidal [cos | sin] embedding `[N, dim]`."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class Conv1dSame(nn.Module):
    """Plain torch-layout conv on `[B, T, C]` with symmetric padding."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (self.kernel_size,), strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            kernel_init=nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal(),
            name="conv",
        )(x)


class DiffResBlock(nn.Module):
    """diffusion_decoder.py:60 ResBlock (dims=1): GroupNorm→SiLU→conv(k=1
    when efficient) with timestep scale-shift on the out norm."""

    channels: int
    emb_channels: int
    out_channels: Optional[int] = None
    kernel_size: int = 3
    efficient_config: bool = True
    use_scale_shift_norm: bool = False

    @nn.compact
    def __call__(self, x, emb):
        out_ch = self.out_channels or self.channels
        pad = {1: 0, 3: 1, 5: 2}[self.kernel_size]
        eff_k = 1 if self.efficient_config else 3
        eff_pad = 0 if self.efficient_config else 1

        h = nn.GroupNorm(num_groups=tortoise_groups(self.channels), epsilon=1e-5, name="in_norm")(x)
        h = Conv1dSame(out_ch, eff_k, padding=eff_pad, name="in_conv")(jax.nn.silu(h))
        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch, name="emb_proj"
        )(jax.nn.silu(emb))
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = nn.GroupNorm(num_groups=tortoise_groups(out_ch), epsilon=1e-5, name="out_norm")(h)
            h = h * (1 + scale[:, None]) + shift[:, None]
            h = Conv1dSame(out_ch, self.kernel_size, padding=pad, name="out_conv")(jax.nn.silu(h))
        else:
            h = h + emb_out[:, None]
            h = nn.GroupNorm(num_groups=tortoise_groups(out_ch), epsilon=1e-5, name="out_norm")(h)
            h = Conv1dSame(out_ch, self.kernel_size, padding=pad, name="out_conv")(jax.nn.silu(h))
        if out_ch == self.channels:
            skip = x
        else:
            skip = Conv1dSame(out_ch, eff_k, padding=eff_pad, name="skip")(x)
        return skip + h


class RandomLatentConverter(nn.Module):
    """random_latent_generator.py:39: 5 EqualLinear (lr_mul 0.1, fused
    leaky-relu with bias, ×sqrt(2)) + plain Linear; maps N(0,1) noise to a
    conditioning latent for speaker-free synthesis."""

    channels: int
    lr_mul: float = 0.1

    @nn.compact
    def transform(self, r):
        """r `[B, channels]` (standard normal) → latent `[B, channels]`."""
        h = r
        scale = (1.0 / math.sqrt(self.channels)) * self.lr_mul
        for i in range(5):
            w = self.param(f"eq_{i}_weight", nn.initializers.normal(1.0 / self.lr_mul),
                           (self.channels, self.channels))
            b = self.param(f"eq_{i}_bias", nn.initializers.zeros, (self.channels,))
            h = h @ (w * scale).T
            h = jax.nn.leaky_relu(h + b * self.lr_mul, 0.2) * math.sqrt(2.0)
        return nn.Dense(self.channels, name="final")(h)

    def __call__(self, rng, batch: int = 1):
        return self.transform(jax.random.normal(rng, (batch, self.channels)))


class DiffusionLayer(nn.Module):
    """diffusion_decoder.py:123: scale-shift ResBlock + rel-pos attention."""

    model_channels: int
    num_heads: int

    @nn.compact
    def __call__(self, x, time_emb):
        y = DiffResBlock(
            self.model_channels, self.model_channels, self.model_channels,
            use_scale_shift_norm=True, name="resblk",
        )(x, time_emb)
        return AttentionBlock(
            self.model_channels, self.num_heads, relative_pos_embeddings=True, name="attn"
        )(y)
