"""GPT decoder for XTTS-style mel-code generation (flax).

TPU-native re-design of /root/reference/TTS/tts/layers/xtts/gpt.py:88 (a
GPT-2 decoder over [conditioning latents; text tokens; mel codes]) and the
role of stream_generator.py:930: incremental decoding is a `lax.scan` with an
explicit static-shape KV-cache — no HF generate loop, one compiled kernel for
the whole decode.
"""

import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class CausalSelfAttention(nn.Module):
    n_head: int
    n_embd: int

    @nn.compact
    def __call__(self, x, mask=None, cache=None, cache_index=None):
        """x `[B, T, C]`. With `cache` (k,v `[B, T_max, H, D]`) and
        `cache_index`, performs one-step incremental attention (T==1)."""
        B, T, C = x.shape
        H, D = self.n_head, self.n_embd // self.n_head
        qkv = nn.Dense(3 * self.n_embd, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, H, D)
        v = v.reshape(B, T, H, D)
        if cache is not None:
            # works for both prefill (T=prompt_len at index 0) and
            # single-step decode (T=1 at index `cache_index`).
            # The cache is TIME-MAJOR `[T_max, B, H, D]`: a decode step then
            # writes ONE contiguous [1,B,H,D] block instead of a strided
            # single-row update across the whole tiled buffer
            # (scripts/profile_xtts_decode.py).
            k_cache, v_cache = cache
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, jnp.swapaxes(k, 0, 1), (cache_index, 0, 0, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, jnp.swapaxes(v, 0, 1), (cache_index, 0, 0, 0)
            )
            T_k = k_cache.shape[0]
            att = jnp.einsum("bthd,sbhd->bhts", q, k_cache) / math.sqrt(D)
            pos = jnp.arange(T_k)[None, None, None, :]
            limit = (cache_index + jnp.arange(T))[None, None, :, None]
            att = jnp.where(pos <= limit, att, -1e9)
            if mask is not None:
                # key-side validity over cache rows [B, T_k]: lets a
                # right-padded prompt share one compiled program across text
                # lengths (padded rows contribute exp(-1e9)=0 exactly, so a
                # full-length mask is bit-identical to no mask)
                att = jnp.where(mask[:, None, None, :], att, -1e9)
            att = jax.nn.softmax(att, axis=-1)
            y = jnp.einsum("bhts,sbhd->bthd", att, v_cache)
            new_cache = (k_cache, v_cache)
        else:
            att = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(D)
            causal = np.tril(np.ones((T, T), dtype=bool))
            att = jnp.where(causal[None, None], att, -1e9)
            if mask is not None:
                att = jnp.where(mask[:, None, None, :], att, -1e9)
            att = jax.nn.softmax(att, axis=-1)
            y = jnp.einsum("bhts,bshd->bthd", att, v)
            new_cache = None
        y = y.reshape(B, T, C)
        return nn.Dense(self.n_embd, name="proj")(y), new_cache


class GPTBlock(nn.Module):
    n_head: int
    n_embd: int

    @nn.compact
    def __call__(self, x, mask=None, cache=None, cache_index=None):
        h, new_cache = CausalSelfAttention(self.n_head, self.n_embd, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="ln1")(x), mask=mask, cache=cache, cache_index=cache_index
        )
        x = x + h
        m = nn.Dense(4 * self.n_embd, name="mlp_fc")(nn.LayerNorm(epsilon=1e-5, name="ln2")(x))
        m = nn.Dense(self.n_embd, name="mlp_proj")(jax.nn.gelu(m, approximate=True))
        return x + m, new_cache


class XttsGPT(nn.Module):
    """GPT over [cond latents | text tokens | audio codes] with dual heads
    (text CE + mel-code CE) and a latent output for the HiFi-GAN decoder."""

    n_layer: int = 30
    n_head: int = 16
    n_embd: int = 1024
    num_text_tokens: int = 6681
    num_audio_tokens: int = 1026  # 1024 codes + start/stop
    max_text_tokens: int = 402
    max_audio_tokens: int = 605
    max_prompt_tokens: int = 70

    def setup(self):
        self.text_embedding = nn.Embed(self.num_text_tokens, self.n_embd)
        self.audio_embedding = nn.Embed(self.num_audio_tokens, self.n_embd)
        self.text_pos_embedding = nn.Embed(self.max_text_tokens + 2, self.n_embd)
        self.audio_pos_embedding = nn.Embed(self.max_audio_tokens + 3, self.n_embd)
        self.blocks = [GPTBlock(self.n_head, self.n_embd, name=f"h_{i}") for i in range(self.n_layer)]
        self.ln_f = nn.LayerNorm(epsilon=1e-5)
        # ref gpt.py applies a second LayerNorm (final_norm) after GPT2's
        # own ln_f, before the heads / decoder latents
        self.final_norm = nn.LayerNorm(epsilon=1e-5)
        self.text_head = nn.Dense(self.num_text_tokens)
        self.mel_head = nn.Dense(self.num_audio_tokens)

    def _embed_inputs(self, cond_latents, text_tokens, audio_codes):
        t_emb = self.text_embedding(text_tokens) + self.text_pos_embedding(
            jnp.arange(text_tokens.shape[1])[None]
        )
        a_emb = self.audio_embedding(audio_codes) + self.audio_pos_embedding(
            jnp.arange(audio_codes.shape[1])[None]
        )
        return jnp.concatenate([cond_latents, t_emb, a_emb], axis=1)

    def __call__(self, cond_latents, text_tokens, audio_codes, attn_mask=None) -> Dict:
        """Teacher-forced training pass. Returns text/mel logits and the
        per-code latents feeding the waveform decoder."""
        x = self._embed_inputs(cond_latents, text_tokens, audio_codes)
        for blk in self.blocks:
            x, _ = blk(x, mask=attn_mask)
        x = self.final_norm(self.ln_f(x))
        n_cond = cond_latents.shape[1]
        n_text = text_tokens.shape[1]
        text_latents = x[:, n_cond : n_cond + n_text]
        audio_latents = x[:, n_cond + n_text :]
        return {
            "text_logits": self.text_head(text_latents),
            "mel_logits": self.mel_head(audio_latents),
            "audio_latents": audio_latents,
        }

    # ----------------------------------------------------------- incremental
    def init_cache(self, B: int, T_max: int, dtype=None):
        """KV-cache pytree, TIME-MAJOR `[T_max, B, H, D]` (see
        CausalSelfAttention: one decode step writes one contiguous block).
        `dtype` follows the parameter dtype by default so bf16-cast weights
        keep the cache (the bandwidth-bound read in every decode step) in
        bf16 too."""
        if dtype is None:
            dtype = self.text_embedding.embedding.dtype
        H, D = self.n_head, self.n_embd // self.n_head
        return [
            (jnp.zeros((T_max, B, H, D), dtype), jnp.zeros((T_max, B, H, D), dtype))
            for _ in range(self.n_layer)
        ]

    def key_valid_mask(
        self, n_cond: int, prompt_len, text_lengths, T_max: int,
        cond_lengths=None, audio_start=None,
    ):
        """Key-side cache-row validity for a right-padded prompt
        [cond (padded to n_cond) | text (padded to T_pad) | audio...]: cond
        rows up to each row's real latent count (`cond_lengths` [B], default
        the full width), text rows up to each row's real length, and the
        audio region from `prompt_len` on. `prompt_len` may be traced, so one
        compiled program serves a whole text-length bucket.

        `audio_start` [B] marks the absolute decode step at which each row
        JOINED the shared timeline (continuous-batching admission,
        infer/xtts_pool.py): audio cache rows before `prompt_len +
        audio_start[b]` are a spliced-in row's uninitialized gap and must be
        hidden. Rows present from step 0 pass 0 — the mask (and the compiled
        program) is then bit-identical to the no-admission case."""
        s = jnp.arange(T_max)[None]
        cond_ok = s < (n_cond if cond_lengths is None else cond_lengths[:, None])
        text_ok = (s >= n_cond) & ((s - n_cond) < text_lengths[:, None])
        audio_ok = s >= prompt_len
        if audio_start is not None:
            audio_ok = audio_ok & ((s - prompt_len) >= audio_start[:, None])
        return (cond_ok & (s < n_cond)) | text_ok | audio_ok

    def prefill(self, cond_latents, text_tokens, cache, text_lengths=None, cond_lengths=None):
        """Run the prompt through the stack, writing rows [0, T) of the
        KV-cache. Returns (cache, prompt_length, last_hidden).

        With `text_lengths` [B], `text_tokens` is treated as RIGHT-PADDED:
        padded rows still write (masked) cache rows, but a key-side mask
        keeps every query — here and in later decode steps — from attending
        to them, so one compiled prefill serves a text-length bucket (role of
        the reference's dynamic-shape HF generate over arbitrary prompts,
        ref stream_generator.py:930). `cond_lengths` [B] does the same for a
        RIGHT-PADDED conditioning-latent track: rows with fewer reference
        latents than the padded width batch with wider (multi-reference,
        ref xtts.py:326) rows."""
        x = jnp.concatenate(
            [
                cond_latents,
                self.text_embedding(text_tokens)
                + self.text_pos_embedding(jnp.arange(text_tokens.shape[1])[None]),
            ],
            axis=1,
        )
        T = x.shape[1]
        mask = None
        if text_lengths is not None or cond_lengths is not None:
            if text_lengths is None:
                text_lengths = jnp.full(
                    text_tokens.shape[:1], text_tokens.shape[1], dtype=jnp.int32
                )
            mask = self.key_valid_mask(
                cond_latents.shape[1], T, text_lengths, cache[0][0].shape[0],
                cond_lengths=cond_lengths,
            )
        new_cache = []
        for blk, c in zip(self.blocks, cache):
            x, nc = blk(x, mask=mask, cache=c, cache_index=0)
            new_cache.append(nc)
        x = self.final_norm(self.ln_f(x))
        return new_cache, T, x[:, -1]

    def decode_step(self, audio_code, pos_in_audio, cache, cache_index, key_valid=None):
        """One incremental step: embed previous code, attend over cache,
        return (logits, latent, new_cache).

        `pos_in_audio` may be a scalar (the scan loops pass the step index)
        or a [B] vector; it is normalized to [B] BEFORE the embed. With a
        scalar fed straight in, `Embed(scalar)[:, None]` is [n_embd, 1] and
        broadcasting silently blew the hidden state up to [B, 1024, 1024] —
        every decode step ran a full 1024-position forward (~1000x the FLOPs,
        10.5 ms/step on v5e) AND took position 0's embedding for every step
        while clobbering the KV cache with the phantom rows (caught by
        tests/test_xtts.py::test_xtts_decode_step_matches_teacher_forced)."""
        pos = jnp.broadcast_to(jnp.asarray(pos_in_audio).reshape(-1), audio_code.shape[:1])
        a = self.audio_embedding(audio_code[:, None]) + self.audio_pos_embedding(pos)[:, None]
        x = a
        new_cache = []
        for blk, c in zip(self.blocks, cache):
            x, nc = blk(x, mask=key_valid, cache=c, cache_index=cache_index)
            new_cache.append(nc)
        x = self.final_norm(self.ln_f(x))
        return self.mel_head(x)[:, 0], x[:, 0], new_cache
