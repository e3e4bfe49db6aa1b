"""Bark: cascade GPT TTS (text → semantic → coarse → fine codec tokens).

TPU-native re-design of /root/reference/TTS/tts/models/bark.py:284 +
layers/bark/{model.py:233 (GPT), model_fine.py, inference_funcs.py:606}.
All three stages reuse the XttsGPT decoder core; each stage's sampled decode
is one `lax.scan` over a static KV-cache. The EnCodec waveform decoder is an
external dependency in the reference; here a conv codec-decoder module stands
in (weights ingestable via torch_convert), gated with a clear error when
unavailable.
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
class BarkArgs(Coqpit):
    num_chars: int = 0
    semantic_vocab_size: int = 10000
    coarse_vocab_size: int = 2048  # 2 codebooks x 1024
    fine_vocab_size: int = 1024
    n_codes_total: int = 8
    n_codes_given: int = 2
    text_vocab_size: int = 129600
    gpt_layers: int = 12
    gpt_heads: int = 12
    gpt_channels: int = 768
    semantic_rate_hz: float = 49.9
    coarse_rate_hz: float = 75.0
    sample_rate: int = 24000
    kv_cache_len: int = 1024
    # voice-prompt conditioning (ref inference_funcs.py:345-370): history
    # token budgets and the special-token id layout of the suno release
    text_encoding_offset: int = 10048
    semantic_infer_token: int = 129599
    semantic_history_len: int = 256
    coarse_history_len: int = 630
    fine_history_len: int = 512


class BarkStageGPT(nn.Module):
    """One causal GPT stage (text→semantic or semantic→coarse)."""

    in_vocab: int
    out_vocab: int
    n_layer: int
    n_head: int
    n_embd: int
    kv_cache_len: int

    def setup(self):
        self.core = XttsGPT(
            n_layer=self.n_layer,
            n_head=self.n_head,
            n_embd=self.n_embd,
            num_text_tokens=self.in_vocab,
            num_audio_tokens=self.out_vocab,
            max_text_tokens=512,
            max_audio_tokens=self.kv_cache_len,
        )

    def init_stub(self, prompt_tokens, out_tokens):
        """Init-only: touches every param via the teacher-forced core pass."""
        return self.core(jnp.zeros((prompt_tokens.shape[0], 0, self.n_embd)), prompt_tokens, out_tokens)

    def generate(self, prompt_tokens, rng, max_new_tokens: int, temperature: float = 0.7,
                 top_k: int = 50, stop_token: Optional[int] = None):
        B = prompt_tokens.shape[0]
        cache = self.core.init_cache(B, self.kv_cache_len)
        cond = jnp.zeros((B, 0, self.n_embd))
        cache, prompt_len, _ = self.core.prefill(cond, prompt_tokens, cache)
        start = jnp.zeros((B,), dtype=jnp.int32)

        def step(carry, i):
            cache, code, stopped, key = carry
            key, sub = jax.random.split(key)
            logits, _, cache = self.core.decode_step(code, i, cache, prompt_len + i)
            logits = logits / temperature
            kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
            logits = jnp.where(logits < kth, -1e9, logits)
            nxt = jax.random.categorical(sub, logits).astype(jnp.int32)
            if stop_token is not None:
                stopped = stopped | (nxt == stop_token)
            return (cache, nxt, stopped, key), (nxt, ~stopped)

        (_, _, _, _), (tokens, valid) = jax.lax.scan(
            step, (cache, start, jnp.zeros((B,), dtype=bool), rng), jnp.arange(max_new_tokens)
        )
        return jnp.swapaxes(tokens, 0, 1), jnp.swapaxes(valid, 0, 1)


class BarkFineGPT(nn.Module):
    """Non-causal per-codebook refinement (ref model_fine.py)."""

    vocab: int
    n_codes_total: int
    n_layer: int = 4
    n_head: int = 8
    n_embd: int = 512

    def setup(self):
        self.embs = [nn.Embed(self.vocab + 1, self.n_embd) for _ in range(self.n_codes_total)]
        self.pos = nn.Embed(2048, self.n_embd)
        self.attns = [
            nn.MultiHeadDotProductAttention(num_heads=self.n_head, qkv_features=self.n_embd, deterministic=True)
            for _ in range(self.n_layer)
        ]
        self.ln1 = [nn.LayerNorm() for _ in range(self.n_layer)]
        self.ln2 = [nn.LayerNorm() for _ in range(self.n_layer)]
        self.fcs = [nn.Dense(4 * self.n_embd) for _ in range(self.n_layer)]
        self.projs = [nn.Dense(self.n_embd) for _ in range(self.n_layer)]
        self.lnf = nn.LayerNorm()
        self.heads = [nn.Dense(self.vocab) for _ in range(self.n_codes_total)]

    def init_stub(self, codes):
        """Init-only: touch the head of every codebook."""
        out = None
        for c in range(self.n_codes_total):
            out = self(codes, c)
        return out

    def __call__(self, codes, codebook_idx: int):
        """codes `[B, T, n_codes]` (current partial stack) → logits for
        codebook `codebook_idx`: `[B, T, vocab]`."""
        B, T, _ = codes.shape
        h = 0.0
        for c in range(self.n_codes_total):
            h = h + self.embs[c](codes[..., c])
        h = h + self.pos(jnp.arange(T)[None])
        for i in range(self.n_layer):
            hn = self.ln1[i](h)
            h = h + self.attns[i](hn, hn)
            m = self.fcs[i](self.ln2[i](h))
            h = h + self.projs[i](jax.nn.gelu(m, approximate=True))
        return self.heads[codebook_idx](self.lnf(h))


class CodecDecoder(nn.Module):
    """EnCodec-style decoder stand-in: codebook embeddings → conv upsample →
    waveform. Real EnCodec weights load through torch_convert."""

    vocab: int = 1024
    n_codes: int = 8
    dim: int = 128
    upsample: tuple = (8, 5, 4, 2)

    @nn.compact
    def __call__(self, codes):
        """codes `[B, T, n_codes]` → wav `[B, T*320, 1]`."""
        h = 0.0
        for c in range(self.n_codes):
            h = h + nn.Embed(self.vocab, self.dim, name=f"emb_{c}")(codes[..., c])
        from tpu_tts.vocoder.models.hifigan_generator import WNConvTranspose1d

        for i, s in enumerate(self.upsample):
            h = jax.nn.elu(h)
            h = WNConvTranspose1d(max(self.dim // (2 ** (i + 1)), 16), 2 * s, s, name=f"up_{i}")(h)
        return jnp.tanh(nn.Dense(1, name="out")(h))


class Bark(BaseTTSModel):
    """Inference-only cascade (ref: train_step raises, bark.py)."""

    def __init__(self, config, ap=None, tokenizer=None):
        super().__init__(config, ap, tokenizer)
        args = config.model_args
        if isinstance(args, dict):
            args = BarkArgs.from_dict(args)
        self.args = args
        a = args
        self.text_model = BarkStageGPT(
            in_vocab=a.text_vocab_size, out_vocab=a.semantic_vocab_size + 1,
            n_layer=a.gpt_layers, n_head=a.gpt_heads, n_embd=a.gpt_channels,
            kv_cache_len=a.kv_cache_len,
        )
        # input space covers semantic ids, the infer token, and (offset)
        # coarse-history ids — mirroring the suno id layout
        self.coarse_model = BarkStageGPT(
            in_vocab=a.semantic_vocab_size + 1 + a.coarse_vocab_size, out_vocab=a.coarse_vocab_size,
            n_layer=a.gpt_layers, n_head=a.gpt_heads, n_embd=a.gpt_channels,
            kv_cache_len=a.kv_cache_len,
        )
        self.fine_model = BarkFineGPT(vocab=a.fine_vocab_size, n_codes_total=a.n_codes_total)
        self.codec = CodecDecoder(vocab=a.fine_vocab_size, n_codes=a.n_codes_total)
        self.params = None

    def init_params(self, rng):
        a = self.args
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        toks = jnp.zeros((1, 8), dtype=jnp.int32)

        def stage_init(stage, r, in_len=8):
            return stage.init(
                r, jnp.zeros((1, in_len), dtype=jnp.int32), jnp.zeros((1, 4), dtype=jnp.int32),
                method=BarkStageGPT.init_stub,
            )["params"]

        self.params = {
            "text": stage_init(self.text_model, r1),
            "coarse": stage_init(self.coarse_model, r2),
            "fine": self.fine_model.init(
                r3, jnp.zeros((1, 8, a.n_codes_total), dtype=jnp.int32), method=BarkFineGPT.init_stub
            )["params"],
            "codec": self.codec.init(r4, jnp.zeros((1, 8, a.n_codes_total), dtype=jnp.int32))["params"],
        }
        return self.params

    def loss_fn(self, *args, **kwargs):
        raise NotImplementedError(" [!] Bark training is not supported (inference-only, as in the reference).")

    def generate_audio(
        self,
        text_tokens: np.ndarray,
        history_prompt=None,
        max_semantic: int = 256,
        max_coarse: int = 256,
        seed: int = 0,
    ):
        """Full cascade: text tokens → semantic → coarse → fine → waveform.

        `history_prompt` is the cloned-voice `(semantic, coarse, fine)` tuple
        (ref inference_funcs.py:149 npz layout): the semantic history is
        prepended to the text-stage prompt, the coarse history (id-offset past
        the semantic space) to the coarse-stage prompt, and the fine history
        frames prefix the fine refinement window (then get sliced off)."""
        a = self.args
        tt = jnp.asarray(text_tokens, dtype=jnp.int32)
        if tt.ndim == 1:
            tt = tt[None]
        sem_hist, coarse_hist, fine_hist = history_prompt or (None, None, None)
        if sem_hist is not None:
            h = jnp.asarray(np.asarray(sem_hist)[-a.semantic_history_len:], dtype=jnp.int32)
            tt = jnp.concatenate([tt, jnp.tile(h[None], (tt.shape[0], 1))], axis=1)
        tt = jnp.concatenate(
            [tt, jnp.full((tt.shape[0], 1), a.semantic_infer_token, dtype=jnp.int32)], axis=1
        )
        r = jax.random.PRNGKey(seed)
        sem, sem_valid = self.text_model.apply(
            {"params": self.params["text"]}, tt, r, max_semantic,
            method=BarkStageGPT.generate, stop_token=a.semantic_vocab_size,
        )
        coarse_prompt = sem
        if coarse_hist is not None:
            ch = np.asarray(coarse_hist)[: a.n_codes_given]  # [n_q, T]
            flat = ch.T.reshape(-1)[-a.coarse_history_len:]  # interleaved codebooks
            ch_ids = jnp.asarray(flat, dtype=jnp.int32) + a.semantic_vocab_size + 1
            parts = [
                jnp.tile(ch_ids[None], (sem.shape[0], 1)),
                jnp.full((sem.shape[0], 1), a.semantic_vocab_size, dtype=jnp.int32),  # infer token
                sem,
            ]
            coarse_prompt = jnp.concatenate(parts, axis=1)
        coarse, _ = self.coarse_model.apply(
            {"params": self.params["coarse"]}, coarse_prompt, jax.random.fold_in(r, 1), max_coarse,
            method=BarkStageGPT.generate,
        )
        # stack coarse into the first n_codes_given codebooks
        T = coarse.shape[1] // a.n_codes_given
        codes = jnp.zeros((coarse.shape[0], T, a.n_codes_total), dtype=jnp.int32)
        for c in range(a.n_codes_given):
            codes = codes.at[:, :, c].set(coarse[:, c::a.n_codes_given][:, :T] % a.fine_vocab_size)
        # fine model fills the remaining codebooks, with the cloned voice's
        # fine frames as a refinement prefix
        n_hist = 0
        if fine_hist is not None:
            fh = np.asarray(fine_hist)[: a.n_codes_total, -a.fine_history_len:].T  # [T_h, n_q]
            n_hist = fh.shape[0]
            fh_b = jnp.tile(jnp.asarray(fh, dtype=jnp.int32)[None] % a.fine_vocab_size, (codes.shape[0], 1, 1))
            codes = jnp.concatenate([fh_b, codes], axis=1)
        for c in range(a.n_codes_given, a.n_codes_total):
            logits = self.fine_model.apply({"params": self.params["fine"]}, codes, c)
            filled = jnp.argmax(logits, axis=-1)
            if n_hist:  # keep the history frames verbatim
                filled = filled.at[:, :n_hist].set(codes[:, :n_hist, c])
            codes = codes.at[:, :, c].set(filled)
        if n_hist:
            codes = codes[:, n_hist:]
        wav = self.codec.apply({"params": self.params["codec"]}, codes)
        return np.asarray(wav)[0, :, 0], np.asarray(sem), np.asarray(codes)

    # ------------------------------------------------------------- synthesize
    def _text_to_tokens(self, text: str) -> np.ndarray:
        """BERT-tokenize + offset into the bark text id region
        (ref inference_funcs.py: TEXT_ENCODING_OFFSET). Falls back to byte
        ids when the HF tokenizer isn't available."""
        a = self.args
        if self.tokenizer is not None and hasattr(self.tokenizer, "encode"):
            ids = np.asarray(self.tokenizer.encode(text), dtype=np.int64)
        else:
            try:
                from transformers import BertTokenizer

                tok = BertTokenizer.from_pretrained("bert-base-multilingual-cased")
                ids = np.asarray(tok.encode(text, add_special_tokens=False), dtype=np.int64)
            except Exception:
                ids = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int64)
        return (ids + a.text_encoding_offset).astype(np.int32)

    def synthesize(self, text: str, config, speaker_id: str = "random", voice_dirs=None, **kwargs):
        """Reference `Bark.synthesize` surface (ref bark.py:197): resolve the
        voice (cloning + caching on first use), run the cascade."""
        from tpu_tts.layers.bark_voice_clone import load_voice

        speaker_id = "random" if speaker_id is None else speaker_id
        if voice_dirs is None:
            voice_dirs = []
        elif isinstance(voice_dirs, str):
            voice_dirs = [voice_dirs]
        history_prompt = load_voice(self, speaker_id, voice_dirs)
        tokens = self._text_to_tokens(text)
        wav, _, _ = self.generate_audio(tokens, history_prompt=history_prompt, **kwargs)
        return {"wav": wav, "text_inputs": text}

    @staticmethod
    def init_from_config(config, samples=None):
        return Bark(config)
