"""XTTS conditioning stack: mel → ConditioningEncoder → PerceiverResampler.

Exact functional mirror of the reference
(/root/reference/TTS/tts/layers/xtts/{latent_encoder.py:71 AttentionBlock,
gpt.py:353 get_style_emb, perceiver_encoder.py:225 PerceiverResampler}) so
XTTS-v2 torch checkpoints convert weight-for-weight:

- ConditioningEncoder: 1×1 conv + 6 attention blocks (GroupNorm, packed
  per-head qkv, 1/sqrt(sqrt(ch)) double scaling, zero-init out proj).
- PerceiverResampler: learned latents; per layer latents += attn(latents,
  cat(latents, x)) then latents += GEGLU-FF(latents); final RMSNorm.
"""

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _group_count(channels: int) -> int:
    groups = 16
    while channels % groups != 0:
        groups //= 2
    return groups


class AttentionBlock(nn.Module):
    """Tortoise-style self-attention block (ref latent_encoder.py:71).

    qkv is packed PER HEAD: channel layout [h0:(q,k,v), h1:(q,k,v), ...]."""

    channels: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x):
        """x: `[B, T, C]`."""
        B, T, C = x.shape
        H = self.num_heads
        ch = C // H
        h = nn.GroupNorm(num_groups=_group_count(C), epsilon=1e-5, name="norm")(x)
        qkv = nn.Dense(3 * C, name="qkv")(h)  # [B, T, H*3*ch]
        qkv = qkv.reshape(B, T, H, 3, ch)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        att = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhts,bshc->bthc", att, v).reshape(B, T, C)
        y = nn.Dense(C, kernel_init=nn.initializers.zeros, name="proj_out")(y)
        return h + y


class ConditioningEncoder(nn.Module):
    """1×1 conv + N attention blocks (ref gpt.py ConditioningEncoder)."""

    spec_dim: int = 80
    embedding_dim: int = 1024
    attn_blocks: int = 6
    num_attn_heads: int = 4

    @nn.compact
    def __call__(self, mel):
        """mel `[B, T, C_mel]` → `[B, T, embedding_dim]`."""
        h = nn.Dense(self.embedding_dim, name="init")(mel)
        for i in range(self.attn_blocks):
            h = AttentionBlock(self.embedding_dim, self.num_attn_heads, name=f"attn_{i}")(h)
        return h


class PerceiverAttention(nn.Module):
    """Cross-attention with queries included in the context
    (ref perceiver_encoder.py:279, cross_attn_include_queries=True)."""

    dim: int
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, latents, context):
        B, Tq, _ = latents.shape
        inner = self.heads * self.dim_head
        ctx = jnp.concatenate([latents, context], axis=1)
        q = nn.Dense(inner, use_bias=False, name="to_q")(latents)
        kv = nn.Dense(2 * inner, use_bias=False, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        H, D = self.heads, self.dim_head
        q = q.reshape(B, Tq, H, D)
        k = k.reshape(B, -1, H, D)
        v = v.reshape(B, -1, H, D)
        att = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(D)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhts,bshd->bthd", att, v).reshape(B, Tq, inner)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(y)


class GEGLUFeedForward(nn.Module):
    """Linear(dim→2·inner) → gelu(gate)·x → Linear(inner→dim)
    with inner = dim·mult·2/3 (ref perceiver_encoder.py:211)."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult * 2 / 3)
        h = nn.Dense(2 * inner, name="fc")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        return nn.Dense(self.dim, name="proj")(jax.nn.gelu(gate, approximate=False) * a)


class PerceiverResampler(nn.Module):
    """Learned latents resampling arbitrary-length features to `num_latents`
    (ref perceiver_encoder.py:225)."""

    dim: int = 1024
    depth: int = 2
    num_latents: int = 32
    heads: int = 8
    dim_head: int = 64
    in_dim: Optional[int] = None  # context dim; projected when != dim

    @nn.compact
    def __call__(self, x, mask=None):
        """x `[B, T, C]` → latents `[B, num_latents, dim]`."""
        B = x.shape[0]
        if self.in_dim is not None and self.in_dim != self.dim:
            x = nn.Dense(self.dim, name="proj_context")(x)
        latents = self.param("latents", nn.initializers.normal(0.02), (self.num_latents, self.dim))
        h = jnp.broadcast_to(latents[None], (B, self.num_latents, self.dim))
        for i in range(self.depth):
            h = PerceiverAttention(self.dim, self.heads, self.dim_head, name=f"attn_{i}")(h, x) + h
            h = GEGLUFeedForward(self.dim, name=f"ff_{i}")(h) + h
        # RMSNorm with learned gamma (ref perceiver_encoder.py:168)
        gamma = self.param("norm_gamma", nn.initializers.ones, (self.dim,))
        h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
        return h * math.sqrt(self.dim) * gamma
