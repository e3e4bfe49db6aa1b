"""Tortoise UnifiedVoice autoregressive stage (flax), weight-compatible with
/root/reference/TTS/tts/layers/tortoise/autoregressive.py:262.

Structure: mel ConditioningEncoder (:163) → GPT-2 stack over
[cond | text emb + learned text pos | mel emb + learned mel pos] with the HF
GPT2 wpe nulled (:207 `build_hf_gpt_transformer`), GPT2 `ln_f` + extra
`final_norm`, text/mel heads. The reference drives HF `generate` through
`GPT2InferenceModel` (:40); here incremental decoding is a `lax.scan` over a
static KV-cache (prefill = [cond, text, start_mel], mel positions restart at
0 for the start token per GPT2InferenceModel.forward:104-119).
"""

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_tts.layers.tortoise_arch import ConditioningEncoder
from tpu_tts.layers.xtts.gpt import GPTBlock

Cache = List[Tuple[jnp.ndarray, jnp.ndarray]]


class UnifiedVoice(nn.Module):
    """Parameter layout is 1:1 with the reference module (autoregressive.py:
    316-345): conditioning_encoder, text_embedding, mel_embedding,
    mel_pos_embedding, text_pos_embedding, gpt h blocks + ln_f, final_norm,
    text_head, mel_head."""

    layers: int = 30
    model_dim: int = 1024
    heads: int = 16
    max_text_tokens: int = 402
    max_mel_tokens: int = 604
    max_conditioning_inputs: int = 2
    mel_length_compression: int = 1024
    number_text_tokens: int = 255
    start_text_token: int = 255
    number_mel_codes: int = 8194
    start_mel_token: int = 8192
    stop_mel_token: int = 8193
    types: int = 1

    @property
    def stop_text_token(self) -> int:
        return 0

    def setup(self):
        self.conditioning_encoder = ConditioningEncoder(
            80, self.model_dim, attn_blocks=6, num_attn_heads=self.heads,
            name="conditioning_encoder",
        )
        self.text_embedding = nn.Embed(
            self.number_text_tokens * self.types + 1, self.model_dim, name="text_embedding"
        )
        self.mel_embedding = nn.Embed(self.number_mel_codes, self.model_dim, name="mel_embedding")
        # ref :332-333: mel pos table covers max_mel+2+max_cond, text covers max_text+2
        self.mel_pos_embedding = nn.Embed(
            self.max_mel_tokens + 2 + self.max_conditioning_inputs, self.model_dim,
            name="mel_pos_embedding",
        )
        self.text_pos_embedding = nn.Embed(
            self.max_text_tokens + 2, self.model_dim, name="text_pos_embedding"
        )
        self.h = [GPTBlock(self.heads, self.model_dim, name=f"h_{i}") for i in range(self.layers)]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, name="ln_f")
        self.final_norm = nn.LayerNorm(epsilon=1e-5, name="final_norm")
        self.text_head = nn.Dense(self.number_text_tokens * self.types + 1, name="text_head")
        self.mel_head = nn.Dense(self.number_mel_codes, name="mel_head")

    # ------------------------------------------------------------ components
    def get_conditioning(self, mel):
        """mel `[B, T, 80]` (or `[B, n_clips, T, 80]`) → cond latent `[B, C]`
        (ref :442: per-clip encodings stacked then meaned)."""
        if mel.ndim == 3:
            return self.conditioning_encoder(mel)
        conds = jnp.stack(
            [self.conditioning_encoder(mel[:, j]) for j in range(mel.shape[1])], axis=1
        )
        return conds.mean(axis=1)

    @staticmethod
    def _aligned(inp, start_token: int, stop_token: int):
        """ref :379: inputs get a leading start token, targets a trailing stop."""
        B = inp.shape[0]
        start = jnp.full((B, 1), start_token, dtype=inp.dtype)
        stop = jnp.full((B, 1), stop_token, dtype=inp.dtype)
        return jnp.concatenate([start, inp], axis=1), jnp.concatenate([inp, stop], axis=1)

    def _gpt(self, emb):
        x = emb
        for blk in self.h:
            x, _ = blk(x)
        return self.final_norm(self.ln_f(x))

    def __call__(self, speech_conditioning_latent, text_inputs, mel_codes,
                 return_latent: bool = False):
        """Teacher-forced pass mirroring ref `forward` (:455, text_first) on
        pre-clipped inputs: text/mel each get a trailing stop pad then
        start/stop alignment; returns (text_logits, mel_logits) over vocab or
        the mel latents (`return_latent`, stripping the 2 appended tokens)."""
        text_inputs = jnp.pad(text_inputs, ((0, 0), (0, 1)), constant_values=self.stop_text_token)
        mel_codes = jnp.pad(mel_codes, ((0, 0), (0, 1)), constant_values=self.stop_mel_token)
        conds = speech_conditioning_latent[:, None]
        text_inputs, _ = self._aligned(text_inputs, self.start_text_token, self.stop_text_token)
        text_emb = self.text_embedding(text_inputs) + self.text_pos_embedding(
            jnp.arange(text_inputs.shape[1])
        )[None]
        mel_codes, _ = self._aligned(mel_codes, self.start_mel_token, self.stop_mel_token)
        mel_emb = self.mel_embedding(mel_codes) + self.mel_pos_embedding(
            jnp.arange(mel_codes.shape[1])
        )[None]
        emb = jnp.concatenate([conds, text_emb, mel_emb], axis=1)
        enc = self._gpt(emb)[:, 1:]  # first position is tied to the cond input (ref :419)
        n_text = text_emb.shape[1]
        text_latents = enc[:, :n_text]
        mel_latents = enc[:, -mel_emb.shape[1]:]
        if return_latent:
            return mel_latents[:, :-2]
        return self.text_head(text_latents), self.mel_head(mel_latents)

    # ----------------------------------------------------------- incremental
    def init_cache(self, B: int, T_max: int, dtype=jnp.float32) -> Cache:
        """KV-cache pytree, TIME-MAJOR `[T_max, B, H, D]` (shared GPTBlock /
        CausalSelfAttention from tpu_tts.layers.xtts.gpt: a decode step
        writes one contiguous block); pass the parameter dtype when serving
        bf16-cast weights so the cache reads (bandwidth-bound) stay bf16.
        (Called on the unbound module, so the dtype can't be inferred from
        params here.)"""
        H, D = self.heads, self.model_dim // self.heads
        return [
            (jnp.zeros((T_max, B, H, D), dtype), jnp.zeros((T_max, B, H, D), dtype))
            for _ in range(self.layers)
        ]

    def prefill(self, speech_conditioning_latent, text_inputs, cache: Cache):
        """Prompt = [cond, text(start/stop aligned), start_mel@mel-pos-0]
        (ref inference_speech :551-581). Returns (cache, prompt_len,
        logits over mel codes at the last position)."""
        text_inputs = jnp.pad(text_inputs, ((0, 0), (0, 1)), constant_values=self.stop_text_token)
        text_inputs, _ = self._aligned(text_inputs, self.start_text_token, self.stop_text_token)
        text_emb = self.text_embedding(text_inputs) + self.text_pos_embedding(
            jnp.arange(text_inputs.shape[1])
        )[None]
        B = text_emb.shape[0]
        start = self.mel_embedding(
            jnp.full((B, 1), self.start_mel_token, dtype=jnp.int32)
        ) + self.mel_pos_embedding(jnp.zeros((1,), dtype=jnp.int32))[None]
        x = jnp.concatenate([speech_conditioning_latent[:, None], text_emb, start], axis=1)
        T = x.shape[1]
        new_cache = []
        for blk, c in zip(self.h, cache):
            x, nc = blk(x, cache=c, cache_index=0)
            new_cache.append(nc)
        x = self.final_norm(self.ln_f(x))
        return new_cache, T, self.mel_head(x[:, -1])

    def decode_step(self, mel_code, pos_in_mel, cache: Cache, cache_index):
        """One generated token: mel position restarts from the start token
        (GPT2InferenceModel.forward:117 get_fixed_embedding). Returns
        (logits `[B, number_mel_codes]`, cache)."""
        pos_in_mel = jnp.broadcast_to(jnp.asarray(pos_in_mel).reshape(-1), mel_code.shape[:1])
        x = self.mel_embedding(mel_code[:, None]) + self.mel_pos_embedding(pos_in_mel)[:, None]
        new_cache = []
        for blk, c in zip(self.h, cache):
            x, nc = blk(x, cache=c, cache_index=cache_index)
            new_cache.append(nc)
        x = self.final_norm(self.ln_f(x))
        return self.mel_head(x[:, 0]), new_cache
