"""Tortoise CLVP contrastive reranker (flax), weight-compatible with
/root/reference/TTS/tts/layers/tortoise/clvp.py:20 in its released
configuration (`use_xformers=True` → xtransformers.py Encoder with
use_rmsnorm, ff_glu (GELU gate, ff_mult=2), rotary_pos_emb; wrapped by
ContinuousTransformerWrapper (xtransformers.py:1213) which adds a final
LayerNorm).

Faithfully replicates two reference quirks: rotary embeddings are applied to
the first `rotary_dim` channels of q, k AND v (xtransformers.py:651-655), and
masked mean pooling over the encoder output (clvp.py:15).
"""

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def rotary_freqs(seq_len: int, dim: int):
    """xtransformers.py:273 RotaryEmbedding: `[seq, dim]` angles."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.concatenate([freqs, freqs], axis=-1)


def apply_rotary(t, freqs):
    """Rotate the leading `freqs.shape[-1]` channels (xtransformers.py:292)."""
    rot = freqs.shape[-1]
    tl, tr = t[..., :rot], t[..., rot:]
    tl = tl * jnp.cos(freqs) + _rotate_half(tl) * jnp.sin(freqs)
    return jnp.concatenate([tl, tr], axis=-1)


class RMSNorm(nn.Module):
    """xtransformers.py:345 (L2-norm based, eps 1e-8)."""

    dim: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (self.dim,))
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True) * self.dim**-0.5
        return x / jnp.maximum(norm, self.eps) * g


class XTAttention(nn.Module):
    """xtransformers.py:489 Attention in the CLVP configuration: bias-free
    q/k/v, dim_head 64, rotary on q/k/v leading 32 dims, boolean key mask."""

    dim: int
    heads: int
    dim_head: int = 64
    rotary_dim: int = 32

    @nn.compact
    def __call__(self, x, mask=None):
        B, N, _ = x.shape
        H, D = self.heads, self.dim_head
        q = nn.Dense(H * D, use_bias=False, name="to_q")(x).reshape(B, N, H, D).transpose(0, 2, 1, 3)
        k = nn.Dense(H * D, use_bias=False, name="to_k")(x).reshape(B, N, H, D).transpose(0, 2, 1, 3)
        v = nn.Dense(H * D, use_bias=False, name="to_v")(x).reshape(B, N, H, D).transpose(0, 2, 1, 3)
        freqs = rotary_freqs(N, self.rotary_dim)[None, None]
        q, k, v = (apply_rotary(t, freqs) for t in (q, k, v))
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * D**-0.5
        if mask is not None:
            big_neg = jnp.finfo(dots.dtype).max
            dots = jnp.where(
                mask[:, None, :, None] & mask[:, None, None, :], dots, -big_neg
            )
        att = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", att, v).transpose(0, 2, 1, 3).reshape(B, N, H * D)
        return nn.Dense(self.dim, name="to_out")(out)


class XTFeedForward(nn.Module):
    """xtransformers.py:450 with glu=True: GLU(dim→inner×2, GELU gate) →
    Linear(inner→dim)."""

    dim: int
    mult: float = 2.0

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        h = nn.Dense(inner * 2, name="glu_proj")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, name="out")(h)


class XTEncoder(nn.Module):
    """Pre-RMSNorm (a, f) blocks + final LayerNorm (the wrapper's `norm`)."""

    dim: int
    depth: int
    heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        for i in range(self.depth):
            h = RMSNorm(self.dim, name=f"norm_a_{i}")(x)
            x = x + XTAttention(self.dim, self.heads, name=f"attn_{i}")(h, mask=mask)
            h = RMSNorm(self.dim, name=f"norm_f_{i}")(x)
            x = x + XTFeedForward(self.dim, name=f"ff_{i}")(h)
        return nn.LayerNorm(epsilon=1e-5, name="final_ln")(x)


class CLVP(nn.Module):
    """clvp.py:20 (xformers variant): token embeddings → encoders → masked
    mean → bias-free latent projections → cosine sim × exp(temperature)."""

    dim_text: int = 768
    dim_speech: int = 768
    dim_latent: int = 768
    num_text_tokens: int = 256
    text_enc_depth: int = 20
    text_heads: int = 12
    num_speech_tokens: int = 8192
    speech_enc_depth: int = 20
    speech_heads: int = 12

    def setup(self):
        self.text_emb = nn.Embed(self.num_text_tokens, self.dim_text, name="text_emb")
        self.to_text_latent = nn.Dense(self.dim_latent, use_bias=False, name="to_text_latent")
        self.speech_emb = nn.Embed(self.num_speech_tokens, self.dim_speech, name="speech_emb")
        self.to_speech_latent = nn.Dense(self.dim_latent, use_bias=False, name="to_speech_latent")
        self.text_transformer = XTEncoder(
            self.dim_text, self.text_enc_depth, self.text_heads, name="text_transformer"
        )
        self.speech_transformer = XTEncoder(
            self.dim_speech, self.speech_enc_depth, self.speech_heads, name="speech_transformer"
        )
        self.temperature = self.param("temperature", nn.initializers.ones, ())

    @staticmethod
    def _masked_mean(t, mask):
        t = jnp.where(mask[..., None], t, 0.0)
        return t.sum(axis=1) / mask.sum(axis=1)[..., None]

    def __call__(self, text, speech_tokens, text_mask=None, voice_mask=None):
        """Eval-mode similarity per pair `[B]` (clvp.py:104, return_loss=False)."""
        if text_mask is None:
            text_mask = jnp.ones(text.shape, dtype=bool)
        if voice_mask is None:
            voice_mask = jnp.ones(speech_tokens.shape, dtype=bool)
        enc_text = self.text_transformer(self.text_emb(text), mask=text_mask)
        enc_speech = self.speech_transformer(self.speech_emb(speech_tokens), mask=voice_mask)
        tl = self.to_text_latent(self._masked_mean(enc_text, text_mask))
        sl = self.to_speech_latent(self._masked_mean(enc_speech, voice_mask))
        tl = tl / jnp.linalg.norm(tl, axis=-1, keepdims=True)
        sl = sl / jnp.linalg.norm(sl, axis=-1, keepdims=True)
        return jnp.einsum("nd,nd->n", tl, sl) * jnp.exp(self.temperature)
