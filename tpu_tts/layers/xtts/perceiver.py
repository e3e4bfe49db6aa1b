"""Perceiver resampler: mel features → fixed set of conditioning latents.

Mirror of /root/reference/TTS/tts/layers/xtts/perceiver_encoder.py: learned
latent queries cross-attend the (arbitrary-length) reference mel sequence.
"""

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class CrossAttention(nn.Module):
    n_head: int
    n_embd: int

    @nn.compact
    def __call__(self, q_in, kv_in, mask=None):
        H, D = self.n_head, self.n_embd // self.n_head
        B, Tq, _ = q_in.shape
        Tk = kv_in.shape[1]
        q = nn.Dense(self.n_embd, name="q")(q_in).reshape(B, Tq, H, D)
        k = nn.Dense(self.n_embd, name="k")(kv_in).reshape(B, Tk, H, D)
        v = nn.Dense(self.n_embd, name="v")(kv_in).reshape(B, Tk, H, D)
        att = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(D)
        if mask is not None:
            att = jnp.where(mask[:, None, None, :], att, -1e9)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhts,bshd->bthd", att, v).reshape(B, Tq, self.n_embd)
        return nn.Dense(self.n_embd, name="proj")(y)


class PerceiverResampler(nn.Module):
    dim: int = 1024
    depth: int = 2
    num_latents: int = 32
    n_head: int = 8
    in_dim: int = 80

    @nn.compact
    def __call__(self, x, mask=None):
        """x: mel `[B, T, C_mel]` → latents `[B, num_latents, dim]`."""
        B = x.shape[0]
        x = nn.Dense(self.dim, name="proj_in")(x)
        latents = self.param("latents", nn.initializers.normal(0.02), (self.num_latents, self.dim))
        h = jnp.broadcast_to(latents[None], (B, self.num_latents, self.dim))
        for i in range(self.depth):
            kv = jnp.concatenate([x, h], axis=1)
            kv_mask = None
            if mask is not None:
                kv_mask = jnp.concatenate(
                    [mask, jnp.ones((B, self.num_latents), dtype=mask.dtype)], axis=1
                )
            h = h + CrossAttention(self.n_head, self.dim, name=f"xattn_{i}")(
                nn.LayerNorm(name=f"ln_q_{i}")(h), nn.LayerNorm(name=f"ln_kv_{i}")(kv), mask=kv_mask
            )
            m = nn.Dense(4 * self.dim, name=f"mlp_fc_{i}")(nn.LayerNorm(name=f"ln_m_{i}")(h))
            h = h + nn.Dense(self.dim, name=f"mlp_proj_{i}")(jax.nn.gelu(m, approximate=True))
        return nn.LayerNorm(name="ln_out")(h)
