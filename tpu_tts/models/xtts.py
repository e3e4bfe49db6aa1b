"""XTTS: GPT-based zero-shot multilingual TTS with streaming inference.

TPU-native re-design of /root/reference/TTS/tts/models/xtts.py (conditioning
latents `get_conditioning_latents`:326, `inference`:/`inference_stream`:611,
crossfaded chunks `handle_chunks`:585). Key design changes:
- the whole autoregressive decode is ONE `lax.scan` over a static-shape
  KV-cache with on-device top-k sampling (the reference loops per token in
  Python through HF `generate`);
- streaming is incremental: one prefill program + a fixed-size decode program
  with the KV cache carried on-device between calls; each chunk is vocoded
  with a small left latent context and cropped, instead of re-decoding the
  full history every chunk (the reference's O(T²) cost, SURVEY.md §3.3).
"""

import math
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.audio import jax_transforms as jt
from tpu_tts.config.base import Coqpit
from tpu_tts.layers.xtts.gpt import XttsGPT
from tpu_tts.layers.xtts.perceiver import ConditioningEncoder, PerceiverResampler
from tpu_tts.layers.xtts.tokenizer import VoiceBpeTokenizer
from tpu_tts.models.base_tts import BaseTTSModel
from tpu_tts.vocoder.models.hifigan_generator import HifiganGenerator


@dataclass
class XttsArgs(Coqpit):
    gpt_layers: int = 30
    gpt_n_heads: int = 16
    gpt_n_model_channels: int = 1024
    gpt_number_text_tokens: int = 6681
    gpt_num_audio_tokens: int = 1026
    gpt_start_audio_token: int = 1024
    gpt_stop_audio_token: int = 1025
    gpt_max_text_tokens: int = 402
    gpt_max_audio_tokens: int = 605
    gpt_cond_len: int = 30  # seconds of conditioning audio used
    num_cond_latents: int = 32
    d_vector_dim: int = 512
    decoder_input_dim: int = 1024
    output_sample_rate: int = 24000
    input_sample_rate: int = 22050
    output_hop_length: int = 256
    gpt_code_stride: int = 1024  # ar_mel_length_compression (hifigan_decoder.py:621)
    decoder_upsample_rates: tuple = (8, 8, 2, 2)
    kv_cache_len: int = 1100
    # ------------------------------ fine-tuning (ref trainer/gpt_trainer.py:40)
    gpt_start_text_token: int = 261  # vocab [START]/[STOP] ids
    gpt_stop_text_token: int = 0
    gpt_loss_text_ce_weight: float = 0.01
    gpt_loss_mel_ce_weight: float = 1.0
    dvae_sample_rate: int = 22050
    max_wav_length: int = 255995  # ~11.6 s
    max_text_length: int = 200
    min_conditioning_length: int = 66150  # 3 s
    max_conditioning_length: int = 132300  # 6 s
    mel_norm_file: str = ""  # per-bin mel divisors (mel_stats.pth)
    dvae_checkpoint: str = ""
    tokenizer_file: str = ""


def _torch_linear_interp(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """torch `F.interpolate(mode="linear", align_corners=False,
    scale_factor=scale)` on the time axis of `[B, T, C]`: out length
    floor(T·scale), half-pixel source coordinates computed from the GIVEN
    scale (recompute_scale_factor=False semantics)."""
    T = x.shape[1]
    out_len = int(math.floor(T * scale))
    pos = jnp.clip((jnp.arange(out_len) + 0.5) / scale - 0.5, 0.0, T - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    w = (pos - lo).astype(x.dtype)[None, :, None]
    return x[:, lo] * (1 - w) + x[:, hi] * w


class XttsNet(nn.Module):
    args: tuple

    @property
    def a(self):
        return dict(self.args)

    def setup(self):
        a = self.a
        self.gpt = XttsGPT(
            n_layer=a["gpt_layers"],
            n_head=a["gpt_n_heads"],
            n_embd=a["gpt_n_model_channels"],
            num_text_tokens=a["gpt_number_text_tokens"],
            num_audio_tokens=a["gpt_num_audio_tokens"],
            max_text_tokens=a["gpt_max_text_tokens"],
            max_audio_tokens=a["gpt_max_audio_tokens"],
        )
        self.conditioning_encoder = ConditioningEncoder(
            spec_dim=a.get("num_mels", 80), embedding_dim=a["gpt_n_model_channels"]
        )
        self.conditioning_perceiver = PerceiverResampler(
            dim=a["gpt_n_model_channels"], num_latents=a["num_cond_latents"]
        )
        self.use_ref_speaker_encoder = bool(a.get("_ref_speaker_encoder", False))
        if self.use_ref_speaker_encoder:
            # reference decoder-side ResNet speaker encoder (frozen-BN;
            # ref tts/layers/xtts/hifigan_decoder.py:662)
            from tpu_tts.encoder.models import ResNetSpeakerEncoder

            # proj_dim 512 is hard-coded in the reference HifiDecoder
            # (hifigan_decoder.py:662), independent of d_vector_dim
            self.speaker_encoder = ResNetSpeakerEncoder(
                input_dim=64, proj_dim=512, norm_type="frozen_batch"
            )
        else:
            self.speaker_proj = nn.Dense(a["d_vector_dim"])
        self.hifigan_decoder = HifiganGenerator(
            in_channels=a["decoder_input_dim"],
            out_channels=1,
            upsample_factors=tuple(a["decoder_upsample_rates"]),
            upsample_kernel_sizes=tuple(2 * r for r in a["decoder_upsample_rates"]),
            upsample_initial_channel=512,
            resblock_kernel_sizes=(3, 7, 11),
            resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
            cond_channels=a["d_vector_dim"],
            cond_in_each_up_layer=True,
        )

    # ---------------------------------------------------------- conditioning
    def compute_conditioning(self, mel, spk_mel=None):
        """Reference mel `[B, T, C]` → (gpt cond latents, speaker embedding).

        Flow mirrors ref gpt.py:353 get_style_emb: conv/attn conditioning
        encoder, then the perceiver resampler down to 32 latents. The
        speaker embedding comes from the reference ResNet encoder on
        `spk_mel` (converted checkpoints) or a projection of the latents
        (fresh training)."""
        feats = self.conditioning_encoder(mel)
        latents = self.conditioning_perceiver(feats)
        if self.use_ref_speaker_encoder:
            spk = self.speaker_encoder(spk_mel if spk_mel is not None else mel[..., :64], l2_norm=True)
        else:
            spk = self.speaker_proj(jnp.mean(latents, axis=1))
            spk = spk / jnp.maximum(jnp.linalg.norm(spk, axis=-1, keepdims=True), 1e-12)
        return latents, spk

    # -------------------------------------------------------------- training
    def __call__(self, mel_cond, text_tokens, audio_codes):
        """GPT fine-tuning pass (role of layers/xtts/trainer/gpt_trainer.py:69)."""
        cond, _ = self.compute_conditioning(mel_cond)
        return self.gpt(cond, text_tokens, audio_codes)

    def train_forward(self, mel_cond, text_tokens, text_lengths, audio_codes, code_lengths):
        """Teacher-forced fine-tune pass with the reference's sequence framing
        (ref gpt.py:370 forward), fully static-shape:

        - text: stop token written at position `text_len` and over padding,
          then [start]+x inputs / x+[stop] targets (set_inputs_and_targets);
        - codes: positions ≥ code_len replaced with the stop audio token
          (set_mel_padding) before the same framing; `code_lengths` already
          includes the reference's +3;
        - key-side attention masks keep [start + l tokens] per segment
          (gpt.py:481-494); CE target masks keep positions ≤ l (targets set
          to -1 in the reference, gpt.py:530-535).

        Returns dict with text/mel logits, framed targets, and loss masks.
        """
        a = self.a
        B, Tt = text_tokens.shape
        Tm = audio_codes.shape[1]
        start_t, stop_t = a["gpt_start_text_token"], a["gpt_stop_text_token"]
        start_a, stop_a = a["gpt_start_audio_token"], a["gpt_stop_audio_token"]

        # --- text framing: x = tokens with stop at [len:] (covers the
        # reference's appended stop + padding), inp=[start]+x, tar=x+[stop]
        t_pos = jnp.arange(Tt + 1)[None]
        text_ext = jnp.pad(text_tokens, ((0, 0), (0, 1)))
        text_ext = jnp.where(t_pos < text_lengths[:, None], text_ext, stop_t)
        text_in = jnp.pad(text_ext, ((0, 0), (1, 0)), constant_values=start_t)
        text_tar = jnp.pad(text_ext, ((0, 0), (0, 1)), constant_values=stop_t)

        # --- code framing: real codes end at code_len-3 (set_mel_padding)
        m_pos = jnp.arange(Tm + 1)[None]
        code_ext = jnp.pad(audio_codes, ((0, 0), (0, 1)))
        code_ext = jnp.where(m_pos < (code_lengths - 3)[:, None], code_ext, stop_a)
        code_in = jnp.pad(code_ext, ((0, 0), (1, 0)), constant_values=start_a)
        code_tar = jnp.pad(code_ext, ((0, 0), (0, 1)), constant_values=stop_a)

        # --- key-side attention mask over [cond | text_in | code_in]
        mask_cond = jnp.ones((B, a["num_cond_latents"]), dtype=bool)
        mask_text = jnp.arange(text_in.shape[1])[None] <= text_lengths[:, None]
        mask_mel = jnp.arange(code_in.shape[1])[None] <= code_lengths[:, None]
        attn_mask = jnp.concatenate([mask_cond, mask_text, mask_mel], axis=1)

        cond, _ = self.compute_conditioning(mel_cond)
        out = self.gpt(cond, text_in, code_in, attn_mask=attn_mask)

        # --- CE masks: targets kept for positions ≤ l
        tar_mask_text = (jnp.arange(text_tar.shape[1])[None] <= text_lengths[:, None]).astype(jnp.float32)
        tar_mask_mel = (jnp.arange(code_tar.shape[1])[None] <= code_lengths[:, None]).astype(jnp.float32)
        return {
            "text_logits": out["text_logits"],
            "mel_logits": out["mel_logits"],
            "text_targets": text_tar,
            "mel_targets": code_tar,
            "text_mask": tar_mask_text,
            "mel_mask": tar_mask_mel,
        }

    # ------------------------------------------------------------- inference
    def generate_latents(
        self,
        cond_latents,
        text_tokens,
        rng,
        max_new_tokens: int,
        temperature: float = 0.75,
        top_k: int = 50,
        text_lengths=None,
    ):
        """Sampled AR decode as one scan. Returns (codes, latents, valid).

        With `text_lengths` [B], `text_tokens` is right-padded and a key-side
        mask hides the pad rows (see XttsGPT.prefill) — one compile serves a
        text-length bucket and mixed-length batches."""
        a = self.a
        B = text_tokens.shape[0]
        cache = self.gpt.init_cache(B, a["kv_cache_len"])
        cache, prompt_len, _ = self.gpt.prefill(
            cond_latents, text_tokens, cache, text_lengths=text_lengths
        )
        start = jnp.full((B,), a["gpt_start_audio_token"], dtype=jnp.int32)
        key_valid = None
        if text_lengths is not None:
            key_valid = self.gpt.key_valid_mask(
                cond_latents.shape[1], prompt_len, text_lengths, a["kv_cache_len"]
            )

        def step(carry, i):
            cache, code, stopped, key = carry
            key, sub = jax.random.split(key)
            logits, latent, cache = self.gpt.decode_step(
                code, i, cache, prompt_len + i, key_valid=key_valid
            )
            logits = logits / temperature
            if top_k:
                kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
                logits = jnp.where(logits < kth, -1e9, logits)
            nxt = jax.random.categorical(sub, logits).astype(jnp.int32)
            new_stopped = stopped | (nxt == a["gpt_stop_audio_token"])
            valid = ~stopped
            return (cache, nxt, new_stopped, key), (nxt, latent, valid)

        (_, _, _, _), (codes, latents, valid) = jax.lax.scan(
            step, (cache, start, jnp.zeros((B,), dtype=bool), rng), jnp.arange(max_new_tokens)
        )
        # scan outputs are [T, B, ...] → [B, T, ...]
        return (
            jnp.swapaxes(codes, 0, 1),
            jnp.swapaxes(latents, 0, 1),
            jnp.swapaxes(valid, 0, 1),
        )

    def stream_prefill(self, cond_latents, text_tokens, text_lengths=None, cond_lengths=None,
                       cache_len: int = None):
        """Prefill-only program for incremental streaming: build the KV cache
        over the prompt and return the initial decode carry. With
        `text_lengths`, `text_tokens` is right-padded to a bucket and the
        pad rows are masked; `cond_lengths` does the same for a right-padded
        conditioning track (see XttsGPT.prefill). `cache_len` (static)
        shrinks the allocated cache to just the prompt rows — the pool's
        admission path splices ONLY those rows into a live round's cache
        (the destination column's stale audio region is hidden by the
        `audio_start` key mask), so per-admission allocation drops from the
        full decode cache (~2 GB at B=16) to a few MB."""
        a = self.a
        B = text_tokens.shape[0]
        cache = self.gpt.init_cache(B, cache_len or a["kv_cache_len"])
        cache, prompt_len, _ = self.gpt.prefill(
            cond_latents, text_tokens, cache,
            text_lengths=text_lengths, cond_lengths=cond_lengths,
        )
        start = jnp.full((B,), a["gpt_start_audio_token"], dtype=jnp.int32)
        return cache, prompt_len, start

    def stream_chunk(
        self,
        cache,
        prompt_len,
        code,
        stopped,
        rng,
        i0,
        chunk_len: int,
        temperature: float = 0.75,
        top_k: int = 50,
        text_lengths=None,
        n_cond: int = None,
        cond_lengths=None,
        audio_start=None,
    ):
        """`chunk_len` sampled decode steps starting at absolute step `i0`
        (traced scalar — one compile serves every chunk). Same per-step math
        and key-threading as `generate_latents`, so a chunked run reproduces
        the one-scan run bit for bit. `text_lengths` [B] rebuilds the
        right-padded prompt's key mask (no extra carry state) so the chunk
        program also serves a text-length bucket; `n_cond` is the PADDED
        conditioning-track width the prefill saw (callers may pass stacked
        multi-reference latents wider than the configured num_cond_latents —
        the mask must anchor the text region at the same offset the prefill
        used) and `cond_lengths` [B] each row's real latent count within it.

        `audio_start` [B] supports continuous-batching admission
        (infer/xtts_pool.py): a row spliced into a live round at absolute
        step s0 carries audio_start=s0 — its audio POSITIONS (pos embedding,
        relative step) start at 0 while its cache writes share the round's
        absolute index, so the batch keeps ONE contiguous time-major cache
        write per step; the key mask hides its [prompt_len, prompt_len+s0)
        gap. Rows with audio_start=0 are bit-identical to the plain path."""
        a = self.a
        key_valid = None
        if text_lengths is not None:
            key_valid = self.gpt.key_valid_mask(
                a["num_cond_latents"] if n_cond is None else n_cond,
                prompt_len, text_lengths, a["kv_cache_len"],
                cond_lengths=cond_lengths, audio_start=audio_start,
            )

        def step(carry, i):
            cache, code, stopped, key = carry
            key, sub = jax.random.split(key)
            pos = i if audio_start is None else i - audio_start
            logits, latent, cache = self.gpt.decode_step(
                code, pos, cache, prompt_len + i, key_valid=key_valid
            )
            logits = logits / temperature
            if top_k:
                kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
                logits = jnp.where(logits < kth, -1e9, logits)
            nxt = jax.random.categorical(sub, logits).astype(jnp.int32)
            new_stopped = stopped | (nxt == a["gpt_stop_audio_token"])
            valid = ~stopped
            return (cache, nxt, new_stopped, key), (nxt, latent, valid)

        (cache, code, stopped, rng), (codes, latents, valid) = jax.lax.scan(
            step, (cache, code, stopped, rng), i0 + jnp.arange(chunk_len)
        )
        return (cache, code, stopped, rng), (
            jnp.swapaxes(codes, 0, 1),
            jnp.swapaxes(latents, 0, 1),
            jnp.swapaxes(valid, 0, 1),
        )

    def decode_latents(self, latents, spk_embedding):
        """GPT latents `[B, T, C]` → waveform via the HiFi-GAN decoder.
        Mirrors HifiDecoder.forward (ref hifigan_decoder.py:674-699): the
        latent track is linearly interpolated ×(ar_mel_length_compression /
        output_hop_length) to the vocoder frame rate, then ×(output_sr /
        input_sr) for the sample-rate change, then decoded — one GPT token is
        1024·(24000/22050) output samples, not one hop."""
        a = self.a
        latents = _torch_linear_interp(
            latents, a["gpt_code_stride"] / a["output_hop_length"]
        )
        if a["output_sample_rate"] != a["input_sample_rate"]:
            latents = _torch_linear_interp(
                latents, a["output_sample_rate"] / a["input_sample_rate"]
            )
        return self.hifigan_decoder(latents, g=spk_embedding[:, None, :])

    def init_all(self, mel_cond, text_tokens, audio_codes):
        """Init-only entry touching every submodule (incl. the decoder)."""
        out = self(mel_cond, text_tokens, audio_codes)
        _, spk = self.compute_conditioning(mel_cond)
        self.decode_latents(out["audio_latents"][:, :4], spk)
        return out


class Xtts(BaseTTSModel):
    def __init__(self, config, ap=None, tokenizer=None, speaker_manager=None):
        super().__init__(config, ap, tokenizer, speaker_manager)
        args = config.model_args
        if isinstance(args, dict):
            args = XttsArgs.from_dict(args)
        self.args = args
        self.net = XttsNet(args=tuple(sorted(args.to_dict().items(), key=lambda kv: str(kv[0]))))
        if isinstance(tokenizer, VoiceBpeTokenizer):
            self.bpe = tokenizer
        else:
            vocab = getattr(args, "tokenizer_file", "") or (
                getattr(config, "model_dir", None) and f"{config.model_dir}/vocab.json"
            )
            self.bpe = VoiceBpeTokenizer(vocab or None)
        # resolve [START]/[STOP] framing ids from the vocab when loaded
        # (ref xtts.py:222); the configured defaults otherwise
        if getattr(self.bpe, "is_loaded", False):
            for attr, token in (("gpt_start_text_token", "[START]"), ("gpt_stop_text_token", "[STOP]")):
                tid = self.bpe.tokenizer.token_to_id(token)
                if tid is not None:
                    setattr(self.args, attr, int(tid))
            self.net = XttsNet(args=tuple(sorted(self.args.to_dict().items(), key=lambda kv: str(kv[0]))))
        self._jit = {}
        self._speakers = None  # lazy speakers_xtts.pth (name → cloning latents)

    # ----------------------------------------------------- bundled speakers
    def _bundled_speakers(self) -> Dict:
        """Released XTTS-v2 packs `speakers_xtts.pth`: speaker name →
        precomputed {gpt_cond_latent, speaker_embedding} (ref xtts.py
        SpeakerManager-style lookup in synthesize:382)."""
        if self._speakers is None:
            self._speakers = {}
            model_dir = getattr(self.config, "model_dir", None)
            if model_dir:
                import os

                path = os.path.join(str(model_dir), "speakers_xtts.pth")
                if os.path.exists(path):
                    import torch

                    data = torch.load(path, map_location="cpu", weights_only=False)
                    for name, d in data.items():
                        self._speakers[name] = {
                            k: np.asarray(v.detach() if hasattr(v, "detach") else v)
                            for k, v in d.items()
                        }
        return self._speakers

    def synthesize(
        self,
        text: str,
        config=None,
        speaker_wav=None,
        language: str = "en",
        speaker_id: str = None,
        voice_dirs=None,
        **kwargs,
    ) -> Dict:
        """Self-contained pipeline entry the Synthesizer dispatches to
        (ref xtts.py:382 synthesize → full_inference): resolve cloning
        latents from `speaker_id` (bundled speakers_xtts.pth) or
        `speaker_wav` (file path(s) / array), then run `inference`."""
        cfg = config or self.config
        if speaker_id and speaker_id != "random" and speaker_id in self._bundled_speakers():
            d = self._bundled_speakers()[speaker_id]
            cond = jnp.asarray(d["gpt_cond_latent"], jnp.float32)
            spk = jnp.asarray(d["speaker_embedding"], jnp.float32)
            if cond.ndim == 2:
                cond = cond[None]
            spk = spk.reshape(1, -1)
        elif speaker_wav is not None:
            from tpu_tts.audio.numpy_transforms import load_wav

            files = speaker_wav if isinstance(speaker_wav, (list, tuple)) else [speaker_wav]
            sr = self.args.input_sample_rate
            arrs = [
                w if isinstance(w, np.ndarray) else load_wav(filename=w, sample_rate=sr, resample=True)
                for w in files
            ]
            cond, spk = self.get_conditioning_latents(np.concatenate(arrs), sr=sr)
        else:
            raise ValueError(
                " [!] XTTS needs `speaker_wav` (cloning audio) or a bundled `speaker_id`."
            )
        return self.inference(
            text=text,
            language=language,
            gpt_cond_latent=cond,
            speaker_embedding=spk,
            temperature=kwargs.pop("temperature", getattr(cfg, "temperature", 0.75)),
            top_k=kwargs.pop("top_k", getattr(cfg, "top_k", 50)) or 50,
            **kwargs,
        )

    def init_params(self, rng):
        a = self.args
        mel = jnp.zeros((1, 32, 80))
        text = jnp.zeros((1, 8), dtype=jnp.int32)
        codes = jnp.zeros((1, 12), dtype=jnp.int32)
        self.params = self.net.init(rng, mel, text, codes, method=XttsNet.init_all)["params"]
        return self.params

    # ------------------------------------------------------- torch ingest
    def convert_torch_state_dict(self, state_dict):
        """Reference `Xtts` (v2 perceiver variant) torch weights → our tree
        (parity-tested in tests/test_torch_parity_xtts.py). Switches the net
        to the reference decoder-side ResNet speaker encoder when present."""
        from tpu_tts.models.xtts_convert import convert_xtts_torch_state_dict

        params = convert_xtts_torch_state_dict(state_dict)
        if "conditioning_perceiver" not in params:
            raise NotImplementedError(
                "this checkpoint is the legacy (non-perceiver) XTTS variant — "
                "only XTTS-v2 checkpoints (gpt_use_perceiver_resampler=True) "
                "are supported"
            )
        if "speaker_encoder" in params and not dict(self.net.args).get("_ref_speaker_encoder"):
            net_args = dict(self.net.args)
            net_args["_ref_speaker_encoder"] = True
            self.net = XttsNet(args=tuple(sorted(net_args.items(), key=lambda kv: str(kv[0]))))
            self._jit = {}
        return params

    # ---------------------------------------------------------- conditioning
    def get_conditioning_latents(self, audio: np.ndarray, sr: int = 22050):
        """Cloning audio → (gpt_cond_latent, speaker_embedding)
        (ref xtts.py:326 / get_speaker_embedding:317)."""
        wav = jnp.asarray(audio, dtype=jnp.float32)[None]
        mel = jt.wav_to_mel(
            wav, fft_size=1024, num_mels=80, sample_rate=sr, hop_length=256,
            win_length=1024, fmin=0, fmax=None, center=False,
        )
        mel = jnp.swapaxes(mel, 1, 2)
        spk_mel = None
        if dict(self.net.args).get("_ref_speaker_encoder"):
            # reference speaker-encoder frontend: 16 kHz, preemphasis 0.97,
            # fft 512 / win 400 / hop 160, 64 log-mels
            # (ref hifigan_decoder.py:631 speaker_encoder_audio_config)
            T16 = int(wav.shape[1] * 16000 / sr)
            wav16 = jax.image.resize(wav, (1, T16), method="linear")
            wav16 = jnp.concatenate([wav16[:, :1], wav16[:, 1:] - 0.97 * wav16[:, :-1]], axis=1)
            spk_mel = jt.wav_to_mel(
                wav16, fft_size=512, num_mels=64, sample_rate=16000, hop_length=160,
                win_length=400, fmin=0, fmax=None, center=True,
            )
            spk_mel = jnp.swapaxes(spk_mel, 1, 2)
        fn = self._jit.setdefault(
            ("cond", mel.shape, None if spk_mel is None else spk_mel.shape),
            jax.jit(
                lambda p, m, sm: self.net.apply(
                    {"params": p}, m, sm, method=XttsNet.compute_conditioning
                )
            ),
        )
        return fn(self.params, mel, spk_mel)

    # ---------------------------------------------------------- fine-tuning
    def load_dvae(self, checkpoint_path: str = "", mel_norms_path: str = ""):
        """Build the DVAE that tokenizes target audio for GPT fine-tuning
        (ref gpt_trainer.py:172-191); ingests the released `dvae.pth` when a
        path is given, otherwise random-inits (tests / from-scratch)."""
        from tpu_tts.layers.xtts.dvae import DiscreteVAE, convert_dvae_torch_state_dict

        self.dvae = DiscreteVAE(num_tokens=self.args.gpt_num_audio_tokens - 2)
        path = checkpoint_path or self.args.dvae_checkpoint
        if path:
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=False)
            if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
                sd = sd["model"]
            self.dvae_params = jax.tree.map(jnp.asarray, convert_dvae_torch_state_dict(sd))
        else:
            mel = jnp.zeros((1, 16, 80))
            self.dvae_params = self.dvae.init(
                jax.random.PRNGKey(0), mel, method=DiscreteVAE.get_codebook_indices
            )["params"]
        self.mel_norms = None
        mp = mel_norms_path or self.args.mel_norm_file
        if mp:
            import os

            if os.path.exists(str(mp)):
                import torch

                self.mel_norms = jnp.asarray(
                    np.asarray(torch.load(mp, map_location="cpu", weights_only=False))
                )

    def _style_mel(self, wav):
        """Conditioning mel for the perceiver path (ref gpt_trainer.py:146:
        TorchMelSpectrogram fft 2048 / hop 256 / win 1024 / 80 mels / fmax
        8000 + mel_norms)."""
        a = self.args
        return jt.torchaudio_mel(
            wav, fft_size=2048, hop_length=256, win_length=1024,
            sample_rate=a.input_sample_rate, num_mels=80, fmin=0.0, fmax=8000.0,
            mel_norms=getattr(self, "mel_norms", None),
        )

    def _dvae_mel(self, wav):
        """DVAE mel (ref dvae.py:27 dvae_wav_to_mel: fft 1024 / hop 256 /
        win 1024 / 80 mels / fmax 8000 + mel_norms)."""
        a = self.args
        return jt.torchaudio_mel(
            wav, fft_size=1024, hop_length=256, win_length=1024,
            sample_rate=a.dvae_sample_rate, num_mels=80, fmin=0.0, fmax=8000.0,
            mel_norms=getattr(self, "mel_norms", None),
        )

    def loss_fn(self, params, batch: Dict, rng, optimizer_idx: int = 0):
        """GPT fine-tune loss (ref gpt_trainer.py:298 train_step): weighted
        text CE + mel-code CE over reference-framed sequences. Host batches
        carry raw wavs; conditioning mels and DVAE codes are computed on
        device inside the jitted step (role of format_batch_on_device,
        gpt_trainer.py:258) — the DVAE params are a frozen closure constant."""
        from tpu_tts.layers.xtts.dvae import DiscreteVAE

        a = self.args
        if not (0 <= a.gpt_start_text_token < a.gpt_number_text_tokens):
            raise ValueError(
                f"gpt_start_text_token={a.gpt_start_text_token} is outside the "
                f"text vocab ({a.gpt_number_text_tokens}) — set it (or load a "
                "vocab with [START]/[STOP]); an out-of-range id would train on "
                "NaN embeddings"
            )
        if "audio_codes" in batch:  # precomputed-code path (tests, cached codes)
            cond_mel = batch["cond_mel"]
            codes = batch["audio_codes"]
            code_lengths = batch.get(
                "code_lengths",
                jnp.full(codes.shape[:1], codes.shape[1] + 3, dtype=jnp.int32),
            )
        else:
            if not hasattr(self, "dvae"):
                raise RuntimeError("call load_dvae() before fine-tuning from raw wavs")
            cond_mel = self._style_mel(batch["cond_wav"])
            codes = self.dvae.apply(
                {"params": self.dvae_params},
                self._dvae_mel(batch["wav"]),
                method=DiscreteVAE.get_codebook_indices,
            )
            code_lengths = (
                jnp.ceil(batch["wav_lengths"] / a.gpt_code_stride).astype(jnp.int32) + 3
            )
        # headroom for the reference's +3 framing past the real code length
        codes = jnp.pad(codes, ((0, 0), (0, 3)))
        code_lengths = jnp.minimum(code_lengths, codes.shape[1])
        out = self.net.apply(
            {"params": params},
            cond_mel,
            batch["text_tokens"],
            batch["text_lengths"],
            codes,
            code_lengths,
            method=XttsNet.train_forward,
        )

        def masked_ce(logits, targets, mask):
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
            return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        ce_t = masked_ce(out["text_logits"], out["text_targets"], out["text_mask"])
        ce_c = masked_ce(out["mel_logits"], out["mel_targets"], out["mel_mask"])
        loss = a.gpt_loss_text_ce_weight * ce_t + a.gpt_loss_mel_ce_weight * ce_c
        return loss, {"loss": loss, "loss_text_ce": ce_t, "loss_mel_ce": ce_c}

    def on_init_start(self, trainer):
        """Trainer lifecycle hook: make sure the frozen DVAE tokenizer is
        available before the first train step."""
        if not hasattr(self, "dvae"):
            self.load_dvae()

    def get_data_loader(self, config, assets, is_eval, samples, verbose=True, num_gpus=1, rank=0):
        """Fixed-shape fine-tuning loader (ref gpt_trainer.py:353)."""
        from tpu_tts.layers.xtts.dataset import XttsDataLoader, XttsDataset

        a = self.args
        dataset = XttsDataset(
            samples=samples,
            tokenizer=self.bpe,
            sample_rate=a.input_sample_rate,
            max_text_length=a.max_text_length,
            max_wav_length=a.max_wav_length,
            min_conditioning_length=a.min_conditioning_length,
            max_conditioning_length=a.max_conditioning_length,
            is_eval=is_eval,
            seed=getattr(config, "training_seed", 0),
        )
        return XttsDataLoader(
            dataset,
            batch_size=config.eval_batch_size if is_eval else config.batch_size,
            shuffle=not is_eval,
            drop_last=not is_eval,
            seed=getattr(config, "training_seed", 0),
            num_shards=num_gpus,
            shard_id=rank,
            num_workers=getattr(config, "num_eval_loader_workers" if is_eval else "num_loader_workers", 0),
        )

    def get_optimizer(self):
        """AdamW over the GPT + conditioning stack only — the waveform
        decoder and speaker encoder stay frozen (ref gpt_trainer.py:401
        optimizes `xtts.gpt.parameters()`, which includes the conditioning
        encoder/perceiver submodules)."""
        import optax

        lr = getattr(self.config, "lr", 5e-6)
        params = getattr(self.config, "optimizer_params", None) or {}
        betas = params.get("betas", [0.9, 0.96])
        opt = optax.adamw(
            lr, b1=betas[0], b2=betas[1], eps=params.get("eps", 1e-8),
            weight_decay=params.get("weight_decay", 1e-2),
        )
        trained = ("gpt", "conditioning_encoder", "conditioning_perceiver")

        def mask_fn(tree):
            return {k: jax.tree.map(lambda _: k in trained, v) for k, v in tree.items()}

        return optax.masked(opt, mask_fn)

    # ------------------------------------------------------------- inference
    def inference(
        self,
        text: str = None,
        language: str = "en",
        gpt_cond_latent=None,
        speaker_embedding=None,
        max_new_tokens: int = 256,
        temperature: float = 0.75,
        top_k: int = 50,
        seed: int = 0,
        text_tokens=None,
        **kwargs,
    ) -> Dict:
        if text_tokens is None:
            ids = self.bpe.encode(text, language)
            text_tokens = jnp.asarray(ids, dtype=jnp.int32)[None]
        text_tokens, text_lengths = self._bucket_text(jnp.asarray(text_tokens))
        key = ("gen", text_tokens.shape, max_new_tokens, temperature, top_k)
        if key not in self._jit:
            self._jit[key] = jax.jit(
                lambda p, c, t, tl, r: self.net.apply(
                    {"params": p}, c, t, r, max_new_tokens, temperature, top_k, tl,
                    method=XttsNet.generate_latents,
                )
            )
        codes, latents, valid = self._jit[key](
            self.params, gpt_cond_latent, text_tokens, text_lengths, jax.random.PRNGKey(seed)
        )
        dec_key = ("dec", latents.shape)
        if dec_key not in self._jit:
            self._jit[dec_key] = jax.jit(
                lambda p, l, s: self.net.apply({"params": p}, l, s, method=XttsNet.decode_latents)
            )
        wav = self._jit[dec_key](self.params, latents, speaker_embedding)
        n_valid = int(np.asarray(valid.sum(axis=1))[0])
        return {
            "wav": np.asarray(wav)[0, : self._n_samples(n_valid), 0],
            "gpt_codes": np.asarray(codes),
        }

    # serving text-length bucket (multiples of this many tokens): one XLA
    # compile serves every sentence whose token count falls in the bucket —
    # the role of the reference's dynamic-shape torch runtime, which serves
    # any prompt length with zero recompiles (ref stream_generator.py:930,
    # synthesizer.py:294). Padded rows are hidden by the key-side mask, so
    # padded-vs-exact outputs are bit-identical (tests/test_xtts.py).
    TEXT_BUCKET = 32

    def _bucket_text(self, text_tokens):
        """Right-pad `[B, T]` token ids to the bucket grid; returns
        (padded [B, T_pad], lengths [B]). T_pad is capped at the text
        position-embedding table so long prompts stay in range."""
        from tpu_tts.utils.generic_utils import bucket_len

        B, T = text_tokens.shape
        T_pad = bucket_len(T, self.TEXT_BUCKET, cap=self.args.gpt_max_text_tokens + 2)
        padded = jnp.pad(jnp.asarray(text_tokens, jnp.int32), ((0, 0), (0, T_pad - T)))
        lengths = jnp.full((B,), T, dtype=jnp.int32)
        return padded, lengths

    def _n_samples(self, n_tokens: int) -> int:
        """Output samples per GPT token through decode_latents: interpolation
        x(gpt_code_stride/output_hop_length) x (output_sr/input_sr), then the
        decoder's upsampling — 1024 x 24000/22050 ~ 1114.56 for XTTS-v2."""
        a = self.args
        spf = (
            a.gpt_code_stride / a.output_hop_length
            * (a.output_sample_rate / a.input_sample_rate)
            * int(np.prod(a.decoder_upsample_rates))
        )
        return int(n_tokens * spf)

    def inference_stream(
        self,
        text: str,
        language: str = "en",
        gpt_cond_latent=None,
        speaker_embedding=None,
        stream_chunk_size: int = 20,
        first_chunk_size: int = 8,
        overlap_latents: int = 4,
        max_new_tokens: int = 256,
        temperature: float = 0.75,
        top_k: int = 50,
        seed: int = 0,
        **kwargs,
    ) -> Iterator[np.ndarray]:
        """Incremental streaming (ref inference_stream xtts.py:611 +
        handle_chunks:585): ONE prefill program builds the KV cache, then a
        `stream_chunk_size`-step decode program runs per chunk with the cache
        carried on-device between calls, yielding audio after EVERY chunk —
        first-chunk latency is prefill + one chunk, not the full generation.
        The first chunk is smaller (`first_chunk_size`) so first audio lands
        in ~prefill + first_chunk steps while still covering the compute time
        of the next full chunk. The per-step sampling math (and the key
        threading) matches `generate_latents` bit for bit.
        Each emitted chunk is decoded with `overlap_latents` of left latent
        context so the conv decoder's receptive field sees history.

        The whole chunk pipeline is DEVICE-RESIDENT (r5): the GPT chunk, the
        invalid-tail masking, the overlap-context splice and the decode run
        in two jitted programs with the latent tail carried on-device, and
        the host fetches `(wav, n_valid, all_stopped)` in ONE transfer per
        chunk. The old path bounced latents through host numpy for the
        splice — 3 host↔device round-trips per chunk, which through a
        remote-device transport dominated the chunk cadence (measured 138 ms
        vs ~75 ms compute at B=1 on v5e-behind-tunnel). Masking with the
        monotone `valid` prefix is bit-identical to the old host zero-pad."""
        ids = self.bpe.encode(text, language)
        text_tokens, text_lengths = self._bucket_text(jnp.asarray(ids, dtype=jnp.int32)[None])
        pf_key = ("stream_prefill", text_tokens.shape)
        if pf_key not in self._jit:
            self._jit[pf_key] = jax.jit(
                lambda p, c, t, tl: self.net.apply(
                    {"params": p}, c, t, tl, method=XttsNet.stream_prefill
                )
            )
        n_cond = int(gpt_cond_latent.shape[1])
        ovl = int(overlap_latents)

        def chunk_fn(n_steps):
            key = ("stream_chunk", n_steps, temperature, top_k, n_cond)
            if key not in self._jit:
                # donate the KV cache: without it every chunk call COPIES the
                # whole cache (30 layers x 2 x [B,1100,16,64] bf16 = 128 MB
                # per stream) — measured ~156 ms/chunk at B=1, 5 s at B=32,
                # dwarfing the 59 ms decode itself (scripts/
                # xtts_decode_microbench.py)
                self._jit[key] = jax.jit(
                    lambda p, cache, pl, code, stop, r, i0, tl: self.net.apply(
                        {"params": p}, cache, pl, code, stop, r, i0,
                        n_steps, temperature, top_k, tl, n_cond,
                        method=XttsNet.stream_chunk,
                    ),
                    donate_argnums=(1,),
                )
            return self._jit[key]

        def dec_fn(size, first):
            key = ("stream_dec", size, first, ovl)
            if key not in self._jit:
                def run(p, lats, tail, valid, n_steps, spk):
                    # monotone valid prefix & the max_new_tokens cap → the
                    # masked-to-zero tail equals the old host zero-pad
                    mask = valid & (jnp.arange(lats.shape[1])[None] < n_steps)
                    latsm = lats * mask[:, :, None].astype(lats.dtype)
                    x = latsm if (first or not ovl) else jnp.concatenate([tail, latsm], axis=1)
                    wav = self.net.apply({"params": p}, x, spk, method=XttsNet.decode_latents)
                    return wav[0, :, 0], mask[0].sum().astype(jnp.int32), latsm[:, -ovl:] if ovl else latsm[:, :0]
                self._jit[key] = jax.jit(run)
            return self._jit[key]

        cache, prompt_len, code = self._jit[pf_key](
            self.params, gpt_cond_latent, text_tokens, text_lengths
        )
        stopped = jnp.zeros((text_tokens.shape[0],), dtype=bool)
        rng = jax.random.PRNGKey(seed)
        tail = None  # device [B, ovl, C], carried between chunks
        i0 = 0
        while i0 < max_new_tokens:
            first = i0 == 0
            size = min(first_chunk_size if first else stream_chunk_size, max_new_tokens)
            n_steps = min(size, max_new_tokens - i0)
            (cache, code, stopped, rng), (codes, lats, valid) = chunk_fn(size)(
                self.params, cache, prompt_len, code, stopped, rng, jnp.int32(i0), text_lengths
            )
            if tail is None:
                tail = jnp.zeros((lats.shape[0], ovl, lats.shape[2]), lats.dtype)
            wav_d, nv_d, tail = dec_fn(size, first)(
                self.params, lats, tail, valid, jnp.int32(n_steps), speaker_embedding
            )
            # ONE host transfer per chunk: waveform + valid count + stop flag
            wav, nv, stop_all = jax.device_get((wav_d, nv_d, stopped.all()))
            nv = int(nv)
            if nv > 0:
                lead = 0 if first else self._n_samples(ovl)
                yield np.asarray(wav, dtype=np.float32)[lead : lead + self._n_samples(nv)]
            if bool(stop_all) or nv < n_steps:
                break
            i0 += size

    @staticmethod
    def init_from_config(config, samples=None):
        return Xtts(config)
