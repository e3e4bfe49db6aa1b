"""Tortoise: multi-stage inference-only TTS (AR candidates → CLVP rerank →
diffusion mel decoder → vocoder).

TPU-native re-design of /root/reference/TTS/tts/models/tortoise.py:911 +
layers/tortoise/{autoregressive.py, clvp.py, diffusion_decoder.py,
diffusion.py, dpm_solver.py}. Compact stage implementations with the same
pipeline: the AR stage samples N candidates in ONE batched scan; CLVP scores
text/voice-code agreement contrastively; a DDIM loop denoises mels; the
waveform comes from the shared UnivNet/HiFi-GAN vocoders.
"""

from dataclasses import dataclass, field
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.config.base import Coqpit
from tpu_tts.layers.xtts.gpt import XttsGPT
from tpu_tts.models.base_tts import BaseTTSModel


@dataclass
class TortoiseArgs(Coqpit):
    num_chars: int = 255
    mel_code_vocab: int = 8194
    gpt_layers: int = 8
    gpt_heads: int = 8
    gpt_channels: int = 512
    clvp_dim: int = 256
    clvp_layers: int = 4
    diff_channels: int = 256
    diff_layers: int = 6
    out_channels: int = 100  # tortoise uses 100-bin mels
    kv_cache_len: int = 768
    num_ar_samples: int = 4
    diffusion_steps: int = 30
    # waveform stage + prompt-redaction (ref tortoise.py:265,258)
    vocoder_upsample_factors: tuple = (8, 8, 4)
    enable_redaction: bool = False


class CLVPTower(nn.Module):
    dim: int
    layers: int
    vocab: int

    @nn.compact
    def __call__(self, tokens):
        h = nn.Embed(self.vocab, self.dim, name="emb")(tokens)
        h = h + nn.Embed(2048, self.dim, name="pos")(jnp.arange(tokens.shape[1])[None])
        for i in range(self.layers):
            a = nn.MultiHeadDotProductAttention(
                num_heads=8, qkv_features=self.dim, deterministic=True, name=f"attn_{i}"
            )(nn.LayerNorm(name=f"ln1_{i}")(h), nn.LayerNorm(name=f"ln1b_{i}")(h))
            h = h + a
            m = nn.Dense(4 * self.dim, name=f"fc_{i}")(nn.LayerNorm(name=f"ln2_{i}")(h))
            h = h + nn.Dense(self.dim, name=f"proj_{i}")(jax.nn.gelu(m, approximate=True))
        e = jnp.mean(nn.LayerNorm(name="lnf")(h), axis=1)
        return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)


class CLVP(nn.Module):
    """Contrastive text/voice-code ranking (ref clvp.py)."""

    dim: int
    layers: int
    text_vocab: int
    code_vocab: int

    def setup(self):
        self.text_tower = CLVPTower(self.dim, self.layers, self.text_vocab)
        self.code_tower = CLVPTower(self.dim, self.layers, self.code_vocab)

    def __call__(self, text_tokens, code_tokens):
        te = self.text_tower(text_tokens)
        ce = self.code_tower(code_tokens)
        return jnp.sum(te * ce, axis=-1)  # cosine score per pair


class DiffusionDecoder(nn.Module):
    """Conditional denoiser: (noisy mel, t, AR latents) → predicted noise
    (compact stand-in for ref diffusion_decoder.py)."""

    channels: int
    layers: int
    out_channels: int

    @nn.compact
    def __call__(self, x, t_emb_scale, cond):
        # x: [B, T, C_mel]; cond: [B, T, C_lat] (upsampled AR latents)
        from tpu_tts.layers.common import Conv1d

        h = Conv1d(self.channels, 3, name="in_conv")(jnp.concatenate([x, cond], axis=-1))
        temb = nn.Dense(self.channels, name="t_proj")(t_emb_scale)
        h = h + temb[:, None, :]
        for i in range(self.layers):
            res = h
            y = jax.nn.silu(nn.LayerNorm(name=f"ln_{i}")(h))
            y = Conv1d(self.channels, 3, dilation=2 ** (i % 4), name=f"conv_{i}")(y)
            h = res + y
        return Conv1d(self.out_channels, 3, name="out_conv")(jax.nn.silu(h))


class Tortoise(BaseTTSModel):
    """Inference-only (reference train_step raises, tortoise.py:910)."""

    def __init__(self, config, ap=None, tokenizer=None):
        super().__init__(config, ap, tokenizer)
        args = config.model_args
        if isinstance(args, dict) or args is None:
            args = TortoiseArgs.from_dict(args or {})
        self.args = args
        a = args
        self.autoregressive = XttsGPT(
            n_layer=a.gpt_layers, n_head=a.gpt_heads, n_embd=a.gpt_channels,
            num_text_tokens=a.num_chars, num_audio_tokens=a.mel_code_vocab,
            max_text_tokens=402, max_audio_tokens=a.kv_cache_len,
        )
        self.clvp = CLVP(a.clvp_dim, a.clvp_layers, a.num_chars, a.mel_code_vocab)
        self.code_latent = None  # set lazily: code embedding table shared from AR
        self.diffusion = DiffusionDecoder(a.diff_channels, a.diff_layers, a.out_channels)
        from tpu_tts.vocoder.models.univnet_generator import UnivnetGenerator

        # mel → waveform stage (ref tortoise.py:383 builds a UnivNet vocoder)
        self.vocoder = UnivnetGenerator(
            cond_channels=a.out_channels, upsample_factors=tuple(a.vocoder_upsample_factors)
        )
        self.cond_proj_dim = a.diff_channels
        self._aligner = None
        self.params = None
        # linear DDIM alpha schedule
        betas = np.linspace(1e-4, 0.02, 1000)
        self.alphas_cumprod = jnp.asarray(np.cumprod(1 - betas), dtype=jnp.float32)

    def init_params(self, rng):
        a = self.args
        r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
        text = jnp.zeros((1, 8), dtype=jnp.int32)
        codes = jnp.zeros((1, 10), dtype=jnp.int32)
        cond = jnp.zeros((1, 0, a.gpt_channels))
        ar = self.autoregressive.init(r1, cond, text, codes)["params"]
        clvp = self.clvp.init(r2, text, codes)["params"]
        diff = self.diffusion.init(
            r3, jnp.zeros((1, 16, a.out_channels)), jnp.zeros((1, 8)), jnp.zeros((1, 16, a.gpt_channels))
        )["params"]
        voc = self.vocoder.init(
            {"params": r4, "noise": r5}, jnp.zeros((1, 8, a.out_channels))
        )["params"]
        self.params = {"autoregressive": ar, "clvp": clvp, "diffusion": diff, "vocoder": voc}
        return self.params

    def loss_fn(self, *args, **kwargs):
        raise NotImplementedError(" [!] Tortoise training is not supported (inference-only, as in the reference).")

    # ------------------------------------------------------------- pipeline
    def _ar_sample(self, text_tokens, rng, max_tokens: int, num_samples: int, temperature=0.8, top_k=50):
        """Sample `num_samples` candidates in one batched scan."""
        a = self.args
        tt = jnp.repeat(text_tokens, num_samples, axis=0)
        B = tt.shape[0]
        cache = self.autoregressive.init_cache(B, a.kv_cache_len)
        cond = jnp.zeros((B, 0, a.gpt_channels))
        cache, prompt_len, _ = self._prefill(cond, tt, cache)
        start = jnp.zeros((B,), dtype=jnp.int32)

        def step(carry, i):
            cache, code, key = carry
            key, sub = jax.random.split(key)
            logits, latent, cache = self.autoregressive.apply(
                {"params": self.params["autoregressive"]}, code, i, cache, prompt_len + i,
                method=XttsGPT.decode_step,
            )
            logits = logits / temperature
            kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
            logits = jnp.where(logits < kth, -1e9, logits)
            nxt = jax.random.categorical(sub, logits).astype(jnp.int32)
            return (cache, nxt, key), (nxt, latent)

        (_, _, _), (codes, latents) = jax.lax.scan(step, (cache, start, rng), jnp.arange(max_tokens))
        return jnp.swapaxes(codes, 0, 1), jnp.swapaxes(latents, 0, 1)

    def _prefill(self, cond, tt, cache):
        return self.autoregressive.apply(
            {"params": self.params["autoregressive"]}, cond, tt, cache, method=XttsGPT.prefill
        )

    def _ddim(self, cond_latents, rng, steps: int):
        """DDIM denoising loop over mels conditioned on AR latents."""
        a = self.args
        B, T, _ = cond_latents.shape
        x = jax.random.normal(rng, (B, T, a.out_channels))
        ts = jnp.linspace(999, 0, steps).astype(jnp.int32)

        def body(x, t):
            acp = self.alphas_cumprod[t]
            t_emb = jnp.broadcast_to(
                jnp.sin(jnp.arange(8, dtype=jnp.float32) * (t.astype(jnp.float32) / 1000.0))[None], (B, 8)
            )
            eps = self.diffusion.apply({"params": self.params["diffusion"]}, x, t_emb, cond_latents)
            x0 = (x - jnp.sqrt(1 - acp) * eps) / jnp.sqrt(acp)
            prev = jnp.maximum(t - 1000 // max(steps, 1), 0)
            acp_prev = self.alphas_cumprod[prev]
            x = jnp.sqrt(acp_prev) * x0 + jnp.sqrt(1 - acp_prev) * eps
            return x, None

        x, _ = jax.lax.scan(body, x, ts)
        return x

    def inference(self, text_tokens: np.ndarray, num_ar_samples: Optional[int] = None, seed: int = 0,
                  max_code_tokens: int = 96, diffusion_steps: Optional[int] = None,
                  text: Optional[str] = None) -> Dict:
        """AR candidates → CLVP best → diffusion mel → UnivNet wav, with
        optional `[bracketed]`-span redaction (ref tortoise.py:807)."""
        a = self.args
        tt = jnp.asarray(text_tokens, dtype=jnp.int32)
        if tt.ndim == 1:
            tt = tt[None]
        k = num_ar_samples or a.num_ar_samples
        rng = jax.random.PRNGKey(seed)
        codes, latents = self._ar_sample(tt, rng, max_code_tokens, k)
        scores = self.clvp.apply(
            {"params": self.params["clvp"]}, jnp.repeat(tt, k, axis=0), codes
        )
        best = jnp.argmax(scores)
        best_latents = latents[best][None]
        mel = self._ddim(best_latents, jax.random.fold_in(rng, 1), diffusion_steps or a.diffusion_steps)
        wav = self.vocoder.apply(
            {"params": self.params["vocoder"]}, mel, rngs={"noise": jax.random.fold_in(rng, 2)}
        )
        wav = np.asarray(wav)[0, :, 0]
        if a.enable_redaction and text is not None:
            wav = self.aligner.redact(wav, text, getattr(self.config, "sample_rate", 24000) or 24000)
        return {
            "model_outputs": np.asarray(mel),
            "wav": wav,
            "clvp_scores": np.asarray(scores),
            "best_candidate": int(best),
            "gpt_codes": np.asarray(codes),
        }

    @property
    def aligner(self):
        """Lazy wav2vec2 aligner for redaction (ref tortoise.py:336)."""
        if self._aligner is None:
            from tpu_tts.layers.tortoise_align import Wav2VecAlignment

            self._aligner = Wav2VecAlignment()
        return self._aligner

    @staticmethod
    def init_from_config(config, samples=None):
        return Tortoise(config)
