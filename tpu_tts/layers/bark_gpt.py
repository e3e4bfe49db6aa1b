"""Bark GPT stages with the exact suno/nanoGPT parameter layout.

Weight-compatible flax re-design of /root/reference/TTS/tts/layers/bark/
model.py:146 (`GPT`: wte/wpe + pre-LN causal blocks + ln_f + untied lm_head,
with the semantic stage's `merge_context` summed text+history embedding,
model.py:180-200) and model_fine.py:76 (`FineGPT`: per-codebook embedding sum,
non-causal blocks, lm_heads weight-tied to `wtes[i+1]`).

TPU-native decisions (not a port): incremental decoding is a `lax.scan` over
a static KV-cache with a carried validity row-mask (the reference grows
`past_kv` tensors per token), and the variable-length coarse prompt is
right-padded to a fixed bucket with masked attention so every sliding window
reuses one compiled program.
"""

import math
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Cache = List[Tuple[jnp.ndarray, jnp.ndarray]]


class NanoSelfAttention(nn.Module):
    """Fused-qkv causal attention (ref model.py:26 `CausalSelfAttention`)."""

    n_head: int
    n_embd: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, *, causal: bool = True, key_valid=None, cache=None, cache_index=None):
        """x `[B, T, C]`. With `cache` ((k, v) each `[B, T_max, H, D]`) the
        new keys/values are written at `cache_index` and attention runs over
        the whole cache; `key_valid` `[B, T_max]` (or `[B, T]` uncached)
        masks out unwritten/padded rows."""
        B, T, C = x.shape
        H, D = self.n_head, self.n_embd // self.n_head
        qkv = nn.Dense(3 * self.n_embd, use_bias=self.bias, name="c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, H, D)
        v = v.reshape(B, T, H, D)
        if cache is not None:
            k_cache, v_cache = cache
            k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, cache_index, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, cache_index, 0, 0))
            T_k = k_cache.shape[1]
            att = jnp.einsum("bthd,bshd->bhts", q, k_cache) / math.sqrt(D)
            pos = jnp.arange(T_k)[None, None, None, :]
            if causal:
                limit = (cache_index + jnp.arange(T))[None, None, :, None]
                att = jnp.where(pos <= limit, att, -jnp.inf)
            if key_valid is not None:
                att = jnp.where(key_valid[:, None, None, :], att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1)
            y = jnp.einsum("bhts,bshd->bthd", att, v_cache)
            new_cache = (k_cache, v_cache)
        else:
            att = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(D)
            if causal:
                mask = jnp.tril(jnp.ones((T, T), dtype=bool))
                att = jnp.where(mask[None, None], att, -jnp.inf)
            if key_valid is not None:
                att = jnp.where(key_valid[:, None, None, :], att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1)
            y = jnp.einsum("bhts,bshd->bthd", att, v)
            new_cache = None
        y = y.reshape(B, T, C)
        return nn.Dense(self.n_embd, use_bias=self.bias, name="c_proj")(y), new_cache


class NanoMLP(nn.Module):
    """4x GELU MLP (ref model.py:102; torch nn.GELU() is the exact erf)."""

    n_embd: int
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(4 * self.n_embd, use_bias=self.bias, name="c_fc")(x)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(self.n_embd, use_bias=self.bias, name="c_proj")(h)


class NanoBlock(nn.Module):
    """Pre-LN block (ref model.py:118); LayerNorm eps 1e-5, optional bias."""

    n_head: int
    n_embd: int
    bias: bool = True
    causal: bool = True

    @nn.compact
    def __call__(self, x, *, key_valid=None, cache=None, cache_index=None):
        h, new_cache = NanoSelfAttention(self.n_head, self.n_embd, self.bias, name="attn")(
            nn.LayerNorm(epsilon=1e-5, use_bias=self.bias, name="ln_1")(x),
            causal=self.causal, key_valid=key_valid, cache=cache, cache_index=cache_index,
        )
        x = x + h
        x = x + NanoMLP(self.n_embd, self.bias, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, use_bias=self.bias, name="ln_2")(x)
        )
        return x, new_cache


class BarkGPT(nn.Module):
    """Causal GPT matching the suno checkpoint layout exactly.

    Parameter tree: wte, wpe, h_{i}/{ln_1,attn/{c_attn,c_proj},ln_2,
    mlp/{c_fc,c_proj}}, ln_f, lm_head (no bias) — 1:1 with ref model.py:146.
    """

    input_vocab_size: int
    output_vocab_size: int
    n_layer: int
    n_head: int
    n_embd: int
    block_size: int = 1024
    bias: bool = True
    merge_context_width: int = 256  # ref model.py:186: 256 text + 256 history

    def setup(self):
        self.wte = nn.Embed(self.input_vocab_size, self.n_embd, name="wte")
        self.wpe = nn.Embed(self.block_size, self.n_embd, name="wpe")
        self.h = [
            NanoBlock(self.n_head, self.n_embd, self.bias, name=f"h_{i}")
            for i in range(self.n_layer)
        ]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, use_bias=self.bias, name="ln_f")
        self.lm_head = nn.Dense(self.output_vocab_size, use_bias=False, name="lm_head")

    def embed_prompt(self, idx, merge_context: bool = False):
        """Token+position embeddings for a full prompt `[B, T]`.

        With `merge_context` the first 2*W ids are two W-wide contexts whose
        embeddings are summed (ref model.py:186-196: text + semantic
        history), so the embedded length is T - W.
        """
        if merge_context:
            w = self.merge_context_width
            tok = jnp.concatenate(
                [self.wte(idx[:, :w]) + self.wte(idx[:, w : 2 * w]), self.wte(idx[:, 2 * w :])],
                axis=1,
            )
        else:
            tok = self.wte(idx)
        return tok + self.wpe(jnp.arange(tok.shape[1])[None])

    def __call__(self, idx, merge_context: bool = False, key_valid=None):
        """Teacher-forced pass: logits `[B, T', output_vocab]` for every
        position (the reference returns only the last — slice outside)."""
        x = self.embed_prompt(idx, merge_context)
        for blk in self.h:
            x, _ = blk(x, key_valid=key_valid)
        return self.lm_head(self.ln_f(x))

    # ----------------------------------------------------------- incremental
    def init_cache(self, B: int, T_max: int, dtype=jnp.float32) -> Cache:
        H, D = self.n_head, self.n_embd // self.n_head
        return [
            (jnp.zeros((B, T_max, H, D), dtype), jnp.zeros((B, T_max, H, D), dtype))
            for _ in range(self.n_layer)
        ]

    def prefill(self, idx, cache: Cache, merge_context: bool = False, key_valid=None):
        """Write rows [0, T') of the cache from a (right-padded) prompt.
        `key_valid` `[B, T_max]` marks which cache rows are real; returns
        (cache, last-hidden `[B, T', C]`)."""
        x = self.embed_prompt(idx, merge_context)
        new_cache = []
        for blk, c in zip(self.h, cache):
            x, nc = blk(x, key_valid=key_valid, cache=c, cache_index=0)
            new_cache.append(nc)
        return new_cache, self.ln_f(x)

    def logits_at(self, hidden_last):
        return self.lm_head(hidden_last)

    def decode_step(self, token, position, cache: Cache, cache_index, key_valid=None):
        """One incremental token: embed at `position`, attend over the cache
        (masked by `key_valid`), write at `cache_index`. Returns
        (logits `[B, V]`, cache). `position` is normalized to [B] before the
        embed — a scalar fed straight through `Embed()[:, None]` broadcasts
        the hidden state to [B, n_embd, n_embd] (the XTTS phantom-forward
        bug, tpu_tts/layers/xtts/gpt.py:decode_step)."""
        position = jnp.broadcast_to(jnp.asarray(position).reshape(-1), token.shape[:1])
        x = self.wte(token[:, None]) + self.wpe(position)[:, None]
        new_cache = []
        for blk, c in zip(self.h, cache):
            x, nc = blk(x, key_valid=key_valid, cache=c, cache_index=cache_index)
            new_cache.append(nc)
        return self.lm_head(self.ln_f(x))[:, 0], new_cache


class BarkFineGPT(nn.Module):
    """Non-causal per-codebook refiner (ref model_fine.py:76 `FineGPT`).

    `lm_heads[i]` is weight-tied to `wtes[i + 1]` (ref model_fine.py:100), so
    logits are computed with `Embed.attend` — no separate head params, same
    as the torch tie.
    """

    input_vocab_size: int
    output_vocab_size: int
    n_layer: int
    n_head: int
    n_embd: int
    n_codes_total: int = 8
    n_codes_given: int = 1
    block_size: int = 1024
    bias: bool = True

    def setup(self):
        self.wtes = [
            nn.Embed(self.input_vocab_size, self.n_embd, name=f"wte_{i}")
            for i in range(self.n_codes_total)
        ]
        self.wpe = nn.Embed(self.block_size, self.n_embd, name="wpe")
        # FineBlock uses plain nn.LayerNorm (always biased, model_fine.py:64)
        self.h = [
            NanoBlock(self.n_head, self.n_embd, bias=True, causal=False, name=f"h_{i}")
            for i in range(self.n_layer)
        ]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, name="ln_f")

    def __call__(self, pred_idx: int, codes):
        """codes `[B, T, n_codes_total]` → logits `[B, T, output_vocab]` for
        codebook `pred_idx` (sums embeddings of codebooks 0..pred_idx)."""
        B, T, _ = codes.shape
        x = self.wtes[0](codes[..., 0])
        for c in range(1, pred_idx + 1):
            x = x + self.wtes[c](codes[..., c])
        x = x + self.wpe(jnp.arange(T)[None])
        for blk in self.h:
            x, _ = blk(x)
        x = self.ln_f(x)
        # tied head: lm_heads[pred_idx - n_codes_given] == wtes[pred_idx -
        # n_codes_given + 1]; Embed.attend gives x @ embedding.T, and the
        # output vocab is a prefix of the (padded) input vocab
        head_wte = self.wtes[pred_idx - self.n_codes_given + 1]
        return head_wte.attend(x)[..., : self.output_vocab_size]
