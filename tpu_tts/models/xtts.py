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

    # ------------------------------------------------------------- inference
    def generate_latents(
        self,
        cond_latents,
        text_tokens,
        rng,
        max_new_tokens: int,
        temperature: float = 0.75,
        top_k: int = 50,
    ):
        """Sampled AR decode as one scan. Returns (codes, latents, valid)."""
        a = self.a
        B = text_tokens.shape[0]
        cache = self.gpt.init_cache(B, a["kv_cache_len"])
        cache, prompt_len, _ = self.gpt.prefill(cond_latents, text_tokens, cache)
        start = jnp.full((B,), a["gpt_start_audio_token"], dtype=jnp.int32)

        def step(carry, i):
            cache, code, stopped, key = carry
            key, sub = jax.random.split(key)
            logits, latent, cache = self.gpt.decode_step(code, i, cache, prompt_len + i)
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

    def stream_prefill(self, cond_latents, text_tokens):
        """Prefill-only program for incremental streaming: build the KV cache
        over the prompt and return the initial decode carry."""
        a = self.a
        B = text_tokens.shape[0]
        cache = self.gpt.init_cache(B, a["kv_cache_len"])
        cache, prompt_len, _ = self.gpt.prefill(cond_latents, text_tokens, cache)
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
    ):
        """`chunk_len` sampled decode steps starting at absolute step `i0`
        (traced scalar — one compile serves every chunk). Same per-step math
        and key-threading as `generate_latents`, so a chunked run reproduces
        the one-scan run bit for bit."""
        a = self.a

        def step(carry, i):
            cache, code, stopped, key = carry
            key, sub = jax.random.split(key)
            logits, latent, cache = self.gpt.decode_step(code, i, cache, prompt_len + i)
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
        self.bpe = tokenizer if isinstance(tokenizer, VoiceBpeTokenizer) else VoiceBpeTokenizer(
            getattr(config, "model_dir", None) and f"{config.model_dir}/vocab.json"
        )
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
    def loss_fn(self, params, batch: Dict, rng, optimizer_idx: int = 0):
        """GPT fine-tune loss: text CE + mel-code CE (ref gpt_trainer.py)."""
        out = self.net.apply(
            {"params": params}, batch["cond_mel"], batch["text_tokens"], batch["audio_codes"]
        )
        text_t = batch["text_tokens"]
        code_t = batch["audio_codes"]
        lt = out["text_logits"][:, :-1]
        lc = out["mel_logits"][:, :-1]
        ce_t = -jnp.mean(
            jnp.take_along_axis(jax.nn.log_softmax(lt, -1), text_t[:, 1:, None], axis=-1)
        )
        ce_c = -jnp.mean(
            jnp.take_along_axis(jax.nn.log_softmax(lc, -1), code_t[:, 1:, None], axis=-1)
        )
        loss = 0.01 * ce_t + ce_c
        return loss, {"loss": loss, "loss_text_ce": ce_t, "loss_mel_ce": ce_c}

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
        key = ("gen", text_tokens.shape, max_new_tokens, temperature, top_k)
        if key not in self._jit:
            self._jit[key] = jax.jit(
                lambda p, c, t, r: self.net.apply(
                    {"params": p}, c, t, r, max_new_tokens, temperature, top_k,
                    method=XttsNet.generate_latents,
                )
            )
        codes, latents, valid = self._jit[key](
            self.params, gpt_cond_latent, text_tokens, jax.random.PRNGKey(seed)
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
        context so the conv decoder's receptive field sees history."""
        ids = self.bpe.encode(text, language)
        text_tokens = jnp.asarray(ids, dtype=jnp.int32)[None]
        pf_key = ("stream_prefill", text_tokens.shape)
        if pf_key not in self._jit:
            self._jit[pf_key] = jax.jit(
                lambda p, c, t: self.net.apply({"params": p}, c, t, method=XttsNet.stream_prefill)
            )
        def chunk_fn(n_steps):
            key = ("stream_chunk", n_steps, temperature, top_k)
            if key not in self._jit:
                self._jit[key] = jax.jit(
                    lambda p, cache, pl, code, stop, r, i0: self.net.apply(
                        {"params": p}, cache, pl, code, stop, r, i0,
                        n_steps, temperature, top_k,
                        method=XttsNet.stream_chunk,
                    )
                )
            return self._jit[key]
        dec = self._jit.setdefault(
            "dec_stream",
            jax.jit(lambda p, l, s: self.net.apply({"params": p}, l, s, method=XttsNet.decode_latents)),
        )

        cache, prompt_len, code = self._jit[pf_key](self.params, gpt_cond_latent, text_tokens)
        stopped = jnp.zeros((text_tokens.shape[0],), dtype=bool)
        rng = jax.random.PRNGKey(seed)
        # ALL glue happens on host numpy at fixed shapes: anything else (a
        # growing `jnp.concatenate`, a tail `jnp.pad`) hits a new shape per
        # chunk and pays a device-program compile mid-stream
        latent_hist = None  # host [B, n_valid, C] for overlap context
        i0 = 0
        while i0 < max_new_tokens:
            size = min(first_chunk_size if i0 == 0 else stream_chunk_size, max_new_tokens)
            n_steps = min(size, max_new_tokens - i0)
            (cache, code, stopped, rng), (codes, lats, valid) = chunk_fn(size)(
                self.params, cache, prompt_len, code, stopped, rng, jnp.int32(i0)
            )
            lats_np = np.asarray(lats, dtype=np.float32)
            nv = int(np.asarray(valid)[0, :n_steps].sum())
            if nv > 0:
                # fixed decode shape: zero-pad a truncated tail chunk and crop
                # the emitted samples, so the decoder compiles a fixed set of
                # programs (first chunk / steady) regardless of where the
                # generation stops
                new_lat = lats_np[:, :nv]
                if nv < size:
                    pad = np.zeros(
                        (new_lat.shape[0], size - nv, new_lat.shape[2]), new_lat.dtype
                    )
                    new_lat = np.concatenate([new_lat, pad], axis=1)
                if latent_hist is None:
                    chunk_lat, lead = new_lat, 0
                else:
                    ctx = latent_hist[:, -overlap_latents:] if overlap_latents else latent_hist[:, :0]
                    chunk_lat, lead = np.concatenate([ctx, new_lat], axis=1), self._n_samples(ctx.shape[1])
                wav = np.asarray(dec(self.params, jnp.asarray(chunk_lat), speaker_embedding))[0, :, 0]
                yield wav[lead : lead + self._n_samples(nv)]
                latent_hist = new_lat[:, :nv] if latent_hist is None else np.concatenate(
                    [latent_hist, new_lat[:, :nv]], axis=1
                )
            if bool(np.asarray(stopped.all())) or nv < n_steps:
                break
            i0 += size

    @staticmethod
    def init_from_config(config, samples=None):
        return Xtts(config)
