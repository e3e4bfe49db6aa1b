"""VITS: end-to-end VAE + flow + GAN TTS.

TPU-native re-design of /root/reference/TTS/tts/models/vits.py (forward:909,
inference:1089, voice conversion:1176, train_step:1230, on-device features
format_batch_on_device:1495). Differences by design:
- Everything in one jitted loss per optimizer: linear spec and mels are
  computed on-device with the matmul-STFT; MAS runs on-device (lax.scan);
  random windowed decoder training via `rand_segments` under the jit rng.
- D-step and G-step draw independent segment/noise rngs (equivalent to the
  reference's `diff_samples_for_G_and_D=True` mode).
- Inference uses bucketed static mel lengths.

Layout: channels-last `[B, T, C]` everywhere.
"""

import math
import os
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.audio import jax_transforms as jt
from tpu_tts.layers.losses import feature_loss as fm_loss
from tpu_tts.layers.losses import discriminator_loss as d_loss_fn
from tpu_tts.layers.losses import generator_loss as g_adv_loss_fn
from tpu_tts.layers.losses import kl_loss
from tpu_tts.layers.vits import (
    ResidualCouplingBlocks,
    StochasticDurationPredictor,
    VitsDiscriminator,
    VitsPosteriorEncoder,
    VitsTextEncoder,
)
from tpu_tts.layers.common import DurationPredictor
from tpu_tts.models.base_tts import BaseTTSModel
from tpu_tts.text.characters import BaseVocabulary
from tpu_tts.ops.helpers import generate_path, rand_segments, segment, sequence_mask
from tpu_tts.ops.mas import maximum_path_jax
from tpu_tts.vocoder.models.hifigan_generator import HifiganGenerator


class VitsNet(nn.Module):
    """Generator side of VITS (everything except the discriminator)."""

    args: tuple  # frozen tuple of VitsArgs items (hashability for flax)

    @property
    def a(self):
        return dict(self.args)

    @property
    def interp_factor(self) -> int:
        """z upsampling factor for the encoder_sample_rate variant
        (ref vits.py:810 interpolate_factor)."""
        a = self.a
        enc_sr = a.get("encoder_sample_rate")
        if not enc_sr:
            return 1
        return max(int(round(a.get("_output_sample_rate", enc_sr) / enc_sr)), 1)

    def _upsample_z(self, z):
        """Nearest/linear-interpolate z along time (ref vits.py:952)."""
        f = self.interp_factor
        if f == 1:
            return z
        B, T, C = z.shape
        method = "linear" if self.a.get("interpolate_z", True) else "nearest"
        return jax.image.resize(z, (B, T * f, C), method=method)

    def setup(self):
        a = self.a
        self.use_sdp = a["use_sdp"]
        self.spec_segment_size = a["spec_segment_size"]
        embedded_speaker_dim = 0
        if a["use_speaker_embedding"] and a["num_speakers"] > 1:
            embedded_speaker_dim = a["speaker_embedding_channels"]
            self.emb_g = nn.Embed(a["num_speakers"], embedded_speaker_dim)
        elif a["use_d_vector_file"]:
            embedded_speaker_dim = a["d_vector_dim"] or 512
        self.embedded_speaker_dim = embedded_speaker_dim
        lang_dim = a["embedded_language_dim"] if a["use_language_embedding"] else 0
        if lang_dim:
            self.emb_l = nn.Embed(a["num_languages"], lang_dim)
        self.lang_dim = lang_dim

        self.text_encoder = VitsTextEncoder(
            n_vocab=a["num_chars"],
            out_channels=a["hidden_channels"],
            hidden_channels=a["hidden_channels"],
            hidden_channels_ffn=a["hidden_channels_ffn_text_encoder"],
            num_heads=a["num_heads_text_encoder"],
            num_layers=a["num_layers_text_encoder"],
            kernel_size=a["kernel_size_text_encoder"],
            dropout_p=a["dropout_p_text_encoder"],
            language_emb_dim=lang_dim,
        )
        mp_dtype = jnp.bfloat16 if a.get("_mixed_precision") else None
        self.posterior_encoder = VitsPosteriorEncoder(
            in_channels=a["out_channels"],
            out_channels=a["hidden_channels"],
            hidden_channels=a["hidden_channels"],
            kernel_size=a["kernel_size_posterior_encoder"],
            dilation_rate=a["dilation_rate_posterior_encoder"],
            num_layers=a["num_layers_posterior_encoder"],
            cond_channels=embedded_speaker_dim,
            dtype=mp_dtype,
        )
        self.flow = ResidualCouplingBlocks(
            channels=a["hidden_channels"],
            hidden_channels=a["hidden_channels"],
            kernel_size=a["kernel_size_flow"],
            dilation_rate=a["dilation_rate_flow"],
            num_layers=a["num_layers_flow"],
            cond_channels=embedded_speaker_dim,
            dtype=mp_dtype,
        )
        dp_cond = embedded_speaker_dim if a["condition_dp_on_speaker"] else 0
        if self.use_sdp:
            self.duration_predictor = StochasticDurationPredictor(
                in_channels=a["hidden_channels"],
                hidden_channels=192,
                kernel_size=3,
                dropout_p=a["dropout_p_duration_predictor"],
                num_flows=4,
                cond_channels=dp_cond,
                language_emb_dim=lang_dim,
            )
        else:
            self.duration_predictor = DurationPredictor(
                hidden_channels=256,
                kernel_size=3,
                dropout_p=a["dropout_p_duration_predictor"],
                cond_channels=dp_cond,
                language_emb_dim=lang_dim,
            )
        self.waveform_decoder = HifiganGenerator(
            in_channels=a["hidden_channels"],
            out_channels=1,
            resblock_type=str(a["resblock_type_decoder"]),
            resblock_dilation_sizes=tuple(tuple(d) for d in a["resblock_dilation_sizes_decoder"]),
            resblock_kernel_sizes=tuple(a["resblock_kernel_sizes_decoder"]),
            upsample_kernel_sizes=tuple(a["upsample_kernel_sizes_decoder"]),
            upsample_initial_channel=a["upsample_initial_channel_decoder"],
            upsample_factors=tuple(a["upsample_rates_decoder"]),
            cond_channels=embedded_speaker_dim,
            # mixed precision: the decoder is the FLOPs giant of the train
            # step — bf16 compute with fp32 master params (the JAX analogue of
            # the reference's autocast, ref vits.py:1273)
            dtype=jnp.bfloat16 if a.get("_mixed_precision") else None,
        )

    # -------------------------------------------------------------- helpers
    def _cond_embeddings(self, speaker_ids, d_vectors, language_ids):
        g = None
        if speaker_ids is not None and self.a["use_speaker_embedding"]:
            g = self.emb_g(speaker_ids)[:, None, :]
        elif d_vectors is not None:
            g = d_vectors[:, None, :]
        lang_emb = None
        if self.lang_dim and language_ids is not None:
            lang_emb = self.emb_l(language_ids)[:, None, :]
        return g, lang_emb

    def _duration_loss_and_attn(self, z_p, m_p, logs_p, h_text, x_mask, y_mask, g, lang_emb, train):
        """MAS alignment + duration predictor loss (ref forward_mas vits.py:909)."""
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)  # [B, T_en, T_de]
        o_scale = jnp.exp(-2 * logs_p)
        logp1 = jnp.sum(-0.5 * math.log(2 * math.pi) - logs_p, axis=-1, keepdims=True)
        logp2 = jnp.einsum("bec,btc->bet", o_scale, -0.5 * (z_p**2))
        logp3 = jnp.einsum("bec,btc->bet", m_p * o_scale, z_p)
        logp4 = jnp.sum(-0.5 * (m_p**2) * o_scale, axis=-1, keepdims=True)
        logp = logp1 + logp2 + logp3 + logp4
        attn = maximum_path_jax(logp, attn_mask)  # [B, T_en, T_de]
        dr = jnp.sum(attn, axis=-1, keepdims=True)  # [B, T_en, 1]

        dp_in = jax.lax.stop_gradient(h_text) if self.a["detach_dp_input"] else h_text
        dp_g = g
        if dp_g is not None and self.a["detach_dp_input"]:
            dp_g = jax.lax.stop_gradient(dp_g)
        if not self.a["condition_dp_on_speaker"]:
            dp_g = None
        if self.use_sdp:
            nll = self.duration_predictor(
                dp_in, x_mask, dr=dr, g=dp_g, lang_emb=lang_emb, reverse=False, train=train
            )
            loss_duration = jnp.sum(nll.astype(jnp.float32)) / jnp.sum(x_mask)
        else:
            log_durations = self.duration_predictor(dp_in, x_mask, g=dp_g, lang_emb=lang_emb, train=train)
            attn_log_durations = jnp.log(dr + 1) * x_mask
            loss_duration = jnp.sum((log_durations - attn_log_durations) ** 2) / jnp.sum(x_mask)
        return attn, loss_duration

    # -------------------------------------------------------------- training
    def __call__(
        self,
        x,
        x_lengths,
        spec,
        spec_lengths,
        speaker_ids=None,
        d_vectors=None,
        language_ids=None,
        train: bool = True,
    ) -> Dict:
        g, lang_emb = self._cond_embeddings(speaker_ids, d_vectors, language_ids)
        h_text, m_p, logs_p, x_mask = self.text_encoder(x, x_lengths, lang_emb=lang_emb, train=train)
        z, m_q, logs_q, y_mask = self.posterior_encoder(spec, spec_lengths, g=g, train=train)
        z_p = self.flow(z, y_mask, g=g, train=train)

        attn, loss_duration = self._duration_loss_and_attn(
            z_p, m_p, logs_p, h_text, x_mask, y_mask, g, lang_emb, train
        )
        # expand prior to frame level
        m_p_ex = jnp.einsum("bet,bec->btc", attn, m_p)
        logs_p_ex = jnp.einsum("bet,bec->btc", attn, logs_p)

        # random windowed decoding (ref rand_segments + vits.py:1034)
        z_slice, slice_ids = rand_segments(
            self.make_rng("segments"), jnp.swapaxes(z, 1, 2), spec_lengths,
            segment_size=self.spec_segment_size, let_short_samples=True, pad_short=True,
        )
        f = self.interp_factor
        if f > 1:
            # encoder_sample_rate variant: slice the upsampled z at the scaled
            # positions (ref vits.py:946-952)
            z_up = self._upsample_z(z)
            slice_ids = slice_ids * f
            z_slice = segment(
                jnp.swapaxes(z_up, 1, 2), slice_ids, self.spec_segment_size * f, pad_short=True
            )
        z_slice = jnp.swapaxes(z_slice, 1, 2)  # back to [B, seg, C]
        o = self.waveform_decoder(z_slice, g=g)
        return {
            "model_outputs": o,
            "alignments": jnp.swapaxes(attn, 1, 2),
            "m_p": m_p_ex,
            "logs_p": logs_p_ex,
            "z": z,
            "z_p": z_p,
            "m_q": m_q,
            "logs_q": logs_q,
            "y_mask": y_mask,
            "loss_duration": loss_duration,
            "slice_ids": slice_ids,
        }

    # ------------------------------------------------------------- inference
    def inference(
        self,
        x,
        x_lengths,
        y_max_length: int,
        speaker_ids=None,
        d_vectors=None,
        language_ids=None,
        noise_scale: float = None,
        length_scale: float = None,
        sdp_noise_scale: float = None,
        decode: bool = True,
    ) -> Dict:
        a = self.a
        noise_scale = a["inference_noise_scale"] if noise_scale is None else noise_scale
        length_scale = a["length_scale"] if length_scale is None else length_scale
        sdp_noise_scale = a["inference_noise_scale_dp"] if sdp_noise_scale is None else sdp_noise_scale
        g, lang_emb = self._cond_embeddings(speaker_ids, d_vectors, language_ids)
        h_text, m_p, logs_p, x_mask = self.text_encoder(x, x_lengths, lang_emb=lang_emb, train=False)
        dp_g = g if a["condition_dp_on_speaker"] else None
        if self.use_sdp:
            logw = self.duration_predictor(
                h_text, x_mask, g=dp_g, lang_emb=lang_emb, reverse=True,
                noise_scale=sdp_noise_scale, train=False,
            )
        else:
            logw = self.duration_predictor(h_text, x_mask, g=dp_g, lang_emb=lang_emb, train=False)
        w = jnp.exp(logw) * x_mask * length_scale
        w_ceil = jnp.ceil(w) * x_mask
        y_lengths = jnp.maximum(jnp.sum(w_ceil, axis=(1, 2)), 1).astype(jnp.int32)
        y_lengths = jnp.minimum(y_lengths, y_max_length)
        y_mask = sequence_mask(y_lengths, y_max_length).astype(x_mask.dtype)[:, :, None]
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)
        attn = generate_path(w_ceil[:, :, 0], attn_mask)
        m_p_ex = jnp.einsum("bet,bec->btc", attn, m_p)
        logs_p_ex = jnp.einsum("bet,bec->btc", attn, logs_p)
        noise = jax.random.normal(self.make_rng("noise"), m_p_ex.shape)
        z_p = m_p_ex + noise * jnp.exp(logs_p_ex) * noise_scale
        z = self.flow(z_p * y_mask, y_mask, g=g, reverse=True)
        z_in = self._upsample_z(z * y_mask)
        out = {
            "alignments": jnp.swapaxes(attn, 1, 2),
            "y_lengths": y_lengths * self.interp_factor,
            "durations": w_ceil[:, :, 0],
        }
        if decode:
            out["model_outputs"] = self.waveform_decoder(z_in, g=g)
        else:
            out["z_in"] = z_in
            out["g"] = g if g is not None else 0
        return out

    def infer_durations(self, x, x_lengths, length_scale: float = None, sdp_noise_scale: float = None,
                        speaker_ids=None, d_vectors=None, language_ids=None):
        """Stage 1: text encoder + duration predictor only. Returns the
        predicted frame counts so the host can pick a decode bucket (avoids
        decoding a worst-case padded length)."""
        a = self.a
        length_scale = a["length_scale"] if length_scale is None else length_scale
        sdp_noise_scale = a["inference_noise_scale_dp"] if sdp_noise_scale is None else sdp_noise_scale
        g, lang_emb = self._cond_embeddings(speaker_ids, d_vectors, language_ids)
        h_text, m_p, logs_p, x_mask = self.text_encoder(x, x_lengths, lang_emb=lang_emb, train=False)
        dp_g = g if a["condition_dp_on_speaker"] else None
        if self.use_sdp:
            logw = self.duration_predictor(
                h_text, x_mask, g=dp_g, lang_emb=lang_emb, reverse=True,
                noise_scale=sdp_noise_scale, train=False,
            )
        else:
            logw = self.duration_predictor(h_text, x_mask, g=dp_g, lang_emb=lang_emb, train=False)
        w = jnp.exp(logw) * x_mask * length_scale
        w_ceil = jnp.ceil(w) * x_mask
        y_lengths = jnp.maximum(jnp.sum(w_ceil, axis=(1, 2)), 1).astype(jnp.int32)
        return {"w_ceil": w_ceil[:, :, 0], "y_lengths": y_lengths, "m_p": m_p, "logs_p": logs_p, "x_mask": x_mask}

    def infer_decode(self, w_ceil, y_lengths, m_p, logs_p, x_mask, y_max_length: int,
                     noise_scale: float = None, speaker_ids=None, d_vectors=None, language_ids=None,
                     decode: bool = True):
        """Stage 2: expand, flow reverse, waveform decode at a bucketed length.
        With `decode=False` returns the decoder input latent instead (serving
        fast path decodes it with the fused Pallas MRF kernel — see
        tpu_tts/ops/hifigan_pallas.py)."""
        a = self.a
        noise_scale = a["inference_noise_scale"] if noise_scale is None else noise_scale
        g, _ = self._cond_embeddings(speaker_ids, d_vectors, language_ids)
        y_lengths = jnp.minimum(y_lengths, y_max_length)
        y_mask = sequence_mask(y_lengths, y_max_length).astype(x_mask.dtype)[:, :, None]
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)
        attn = generate_path(w_ceil, attn_mask)
        m_p_ex = jnp.einsum("bet,bec->btc", attn, m_p)
        logs_p_ex = jnp.einsum("bet,bec->btc", attn, logs_p)
        noise = jax.random.normal(self.make_rng("noise"), m_p_ex.shape)
        z_p = m_p_ex + noise * jnp.exp(logs_p_ex) * noise_scale
        z = self.flow(z_p * y_mask, y_mask, g=g, reverse=True)
        z_in = self._upsample_z(z * y_mask)
        out = {
            "alignments": jnp.swapaxes(attn, 1, 2),
            "y_lengths": y_lengths * self.interp_factor,
        }
        if decode:
            out["model_outputs"] = self.waveform_decoder(z_in, g=g)
        else:
            out["z_in"] = z_in
            out["g"] = g if g is not None else 0
        return out

    def voice_conversion(self, spec, spec_lengths, g_src, g_tgt):
        """Spec of source speaker → waveform of target speaker
        (ref inference_voice_conversion vits.py:1176)."""
        z, _, _, y_mask = self.posterior_encoder(spec, spec_lengths, g=g_src, train=False)
        z_p = self.flow(z, y_mask, g=g_src)
        z_hat = self.flow(z_p, y_mask, g=g_tgt, reverse=True)
        return self.waveform_decoder(self._upsample_z(z_hat * y_mask), g=g_tgt)


class Vits(BaseTTSModel):
    """Orchestrator: 2-optimizer GAN training (D=idx0, G=idx1)."""

    # bf16 is threaded natively through the FLOPs-heavy submodules (decoder /
    # posterior / flow / discriminator) via flax dtype; the text encoder and
    # duration predictor stay fp32 by design — skip the trainer's generic
    # autocast (train/precision.py)
    handles_mixed_precision = True

    def __init__(self, config, ap=None, tokenizer=None, speaker_manager=None, language_manager=None):
        super().__init__(config, ap, tokenizer, speaker_manager, language_manager)
        args = config.model_args
        if tokenizer is not None and tokenizer.characters is not None:
            args.num_chars = tokenizer.characters.num_chars
        if speaker_manager is not None and args.use_speaker_embedding:
            args.num_speakers = max(args.num_speakers, speaker_manager.num_speakers)
        if language_manager is not None:
            args.num_languages = max(args.num_languages, language_manager.num_languages)
        self.args = args
        self._build_net()
        self.disc = VitsDiscriminator(
            periods=tuple(args.periods_multi_period_discriminator),
            use_spectral_norm=args.use_spectral_norm_disriminator,
            dtype=jnp.bfloat16 if getattr(config, "mixed_precision", False) else None,
        )
        self._infer_cache = {}
        # G-side paired discriminator pass (see loss_fn): hardware A/B knob
        self._paired_disc_g = os.environ.get("TPU_TTS_PAIRED_DISC_G", "1") == "1"

    def _build_net(self):
        net_args = self.args.to_dict()
        # encoder_sample_rate variant (ref vits.py:809): posterior/flow run at
        # the lower rate; z is interpolated ×factor before the decoder
        net_args["_output_sample_rate"] = self.config.audio.sample_rate
        net_args["_mixed_precision"] = bool(getattr(self.config, "mixed_precision", False))
        self.net = VitsNet(args=tuple(sorted(net_args.items(), key=lambda kv: kv[0])))

    def num_optimizers(self) -> int:
        return 2

    # ------------------------------------------------------------------ init
    def init_params(self, rng):
        a = self.args
        B, T_en, T_spec = 2, 8, 12
        x = jnp.zeros((B, T_en), dtype=jnp.int32)
        xl = jnp.full((B,), T_en, dtype=jnp.int32)
        spec = jnp.zeros((B, T_spec, a.out_channels))
        sl = jnp.full((B,), T_spec, dtype=jnp.int32)
        kwargs = {}
        if a.use_speaker_embedding and a.num_speakers > 1:
            kwargs["speaker_ids"] = jnp.zeros((B,), dtype=jnp.int32)
        elif a.use_d_vector_file:
            kwargs["d_vectors"] = jnp.zeros((B, a.d_vector_dim or 512))
        if a.use_language_embedding:
            kwargs["language_ids"] = jnp.zeros((B,), dtype=jnp.int32)
        rng_p, rng_d, r1, r2, r3, r4 = jax.random.split(rng, 6)
        g_vars = self.net.init(
            {"params": rng_p, "posterior": r1, "segments": r2, "sdp": r3, "dropout": r4},
            x, xl, spec, sl, train=True, **kwargs,
        )
        hop = int(np.prod(a.upsample_rates_decoder))
        d_vars = self.disc.init(rng_d, jnp.zeros((B, a.spec_segment_size * hop, 1)))
        self.params = {"generator": g_vars["params"], "discriminator": d_vars["params"]}
        return self.params

    def param_partition(self, params, optimizer_idx: int):
        return params["discriminator"] if optimizer_idx == 0 else params["generator"]

    def param_merge(self, params, subtree, optimizer_idx: int):
        key = "discriminator" if optimizer_idx == 0 else "generator"
        new = dict(params)
        new[key] = subtree
        return new

    # ----------------------------------------------------------- featurizers
    def _spec_from_wav(self, waveform):
        """On-device linear spectrogram, VITS framing. waveform `[B, T, 1]` →
        `[B, T_spec, C]` (replaces format_batch_on_device, ref vits.py:1495)."""
        a = self.config.audio
        spec = jt.wav_to_spec(
            waveform[..., 0], fft_size=a.fft_size, hop_length=a.hop_length, win_length=a.win_length, center=False
        )  # [B, C, T]
        return jnp.swapaxes(spec, 1, 2)

    def _mel_from_spec(self, spec):
        a = self.config.audio
        mel = jt.spec_to_mel(
            jnp.swapaxes(spec, 1, 2), fft_size=a.fft_size, num_mels=a.num_mels,
            sample_rate=a.sample_rate, fmin=a.mel_fmin, fmax=a.mel_fmax,
        )
        return jnp.swapaxes(mel, 1, 2)

    def _mel_from_wav(self, wav):
        a = self.config.audio
        mel = jt.wav_to_mel(
            wav[..., 0], fft_size=a.fft_size, num_mels=a.num_mels, sample_rate=a.sample_rate,
            hop_length=a.hop_length, win_length=a.win_length, fmin=a.mel_fmin, fmax=a.mel_fmax, center=False,
        )
        return jnp.swapaxes(mel, 1, 2)

    def _forward_g(self, g_params, batch, rng, train=True):
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        wav = batch["waveform"]
        spec_lengths = batch["mel_lengths"]
        f = self.net.interp_factor
        if f > 1:
            # encoder_sample_rate variant: posterior spec comes from the
            # downsampled waveform (ref vits.py:812 torchaudio resample;
            # jax.image.resize antialiases on downscale)
            B, T, _ = wav.shape
            wav = jax.image.resize(wav, (B, T // f, 1), method="linear")
            spec_lengths = spec_lengths // f
        spec = self._spec_from_wav(wav)
        return self.net.apply(
            {"params": g_params},
            batch["text_input"],
            batch["text_lengths"],
            spec,
            spec_lengths,
            speaker_ids=batch.get("speaker_ids"),
            d_vectors=batch.get("d_vectors"),
            language_ids=batch.get("language_ids"),
            train=train,
            rngs={"posterior": r1, "segments": r2, "sdp": r3, "dropout": r4},
        ), spec

    # ---------------------------------------------------------------- losses
    def _disc_paired(self, d_params, real, fake):
        """See layers/vits.py paired_disc_apply (the small-kernel attack)."""
        from tpu_tts.layers.vits import paired_disc_apply

        return paired_disc_apply(self.disc, d_params, real, fake)

    def loss_fn(self, params, batch: Dict, rng, optimizer_idx: int = 0):
        hop = int(np.prod(self.args.upsample_rates_decoder))
        if optimizer_idx == 0:
            outputs, _ = self._forward_g(params["generator"], batch, rng, train=True)
            y_hat = jax.lax.stop_gradient(outputs["model_outputs"])
            wav_seg = segment(
                jnp.swapaxes(batch["waveform"], 1, 2),
                outputs["slice_ids"] * hop,
                y_hat.shape[1],
                pad_short=True,
            )
            wav_seg = jnp.swapaxes(wav_seg, 1, 2)
            scores_real, scores_fake, _, _ = self._disc_paired(
                params["discriminator"], wav_seg, y_hat
            )
            loss = d_loss_fn(scores_real, scores_fake) * self.config.disc_loss_alpha
            return loss, {"loss_disc": loss}

        # generator pass
        outputs, spec = self._forward_g(params["generator"], batch, rng, train=True)
        y_hat = outputs["model_outputs"]
        wav_seg = segment(
            jnp.swapaxes(batch["waveform"], 1, 2), outputs["slice_ids"] * hop, y_hat.shape[1], pad_short=True
        )
        wav_seg = jnp.swapaxes(wav_seg, 1, 2)
        d_params = jax.lax.stop_gradient(params["discriminator"])
        if self._paired_disc_g:
            # fewer/larger kernels, but the conv transposes now run over 2B
            # rows (the real half previously had NO backward: it sits on no
            # path to the generator params) — A/B'd on hardware via
            # TPU_TTS_PAIRED_DISC_G (scripts/profile_vits_train.py)
            _, scores_fake, feats_real, feats_fake = self._disc_paired(d_params, wav_seg, y_hat)
        else:
            scores_fake, feats_fake = self.disc.apply({"params": d_params}, y_hat)
            _, feats_real = self.disc.apply({"params": d_params}, wav_seg)

        # mel L1 on the decoded segment
        mel_hat = self._mel_from_wav(y_hat)
        if self.net.interp_factor > 1:
            # encoder-rate spec frames don't align with full-rate mel_hat;
            # compute the GT mel from the full-rate waveform segment instead
            mel_seg = self._mel_from_wav(wav_seg)
        else:
            mel_seg = segment(
                jnp.swapaxes(self._mel_from_spec(spec), 1, 2), outputs["slice_ids"],
                self.args.spec_segment_size, pad_short=True,
            )
            mel_seg = jnp.swapaxes(mel_seg, 1, 2)
        T = min(mel_hat.shape[1], mel_seg.shape[1])
        loss_mel = jnp.mean(jnp.abs(mel_seg[:, :T] - mel_hat[:, :T])) * self.config.mel_loss_alpha
        loss_kl = (
            kl_loss(outputs["z_p"], outputs["logs_q"], outputs["m_p"], outputs["logs_p"], outputs["y_mask"])
            * self.config.kl_loss_alpha
        )
        loss_feat = fm_loss(feats_real, feats_fake) * self.config.feat_loss_alpha
        loss_gen = g_adv_loss_fn(scores_fake) * self.config.gen_loss_alpha
        loss_duration = outputs["loss_duration"] * self.config.dur_loss_alpha
        loss = loss_mel + loss_kl + loss_feat + loss_gen + loss_duration
        logs = {
            "loss_mel": loss_mel,
            "loss_kl": loss_kl,
            "loss_feat": loss_feat,
            "loss_gen": loss_gen,
            "loss_duration": loss_duration,
        }
        if self.args.use_speaker_encoder_as_loss:
            loss_scl = self._speaker_consistency_loss(wav_seg, y_hat)
            if loss_scl is not None:
                loss += loss_scl * getattr(self.config, "speaker_encoder_loss_alpha", 9.0)
                logs["loss_spk_encoder"] = loss_scl
        logs["loss_gen_total"] = loss
        return loss, logs

    def _speaker_consistency_loss(self, wav_real_seg, wav_fake_seg):
        """SCL (ref vits.py:1047): cosine distance between speaker-encoder
        embeddings of the GT and generated waveform segments. Differentiable
        end to end — the mel frontend is matmul-based."""
        enc = getattr(self.speaker_manager, "encoder", None) if self.speaker_manager else None
        if enc is None or enc.params is None:
            return None
        a = enc.audio if isinstance(enc.audio, dict) else enc.audio.to_dict()
        wavs = jnp.concatenate([wav_real_seg, wav_fake_seg], axis=0)[..., 0]
        mel = jt.wav_to_mel(
            wavs, fft_size=a["fft_size"], num_mels=a["num_mels"], sample_rate=a["sample_rate"],
            hop_length=a["hop_length"], win_length=a["win_length"],
            fmin=a.get("mel_fmin", 0.0), fmax=a.get("mel_fmax"), center=True,
        )
        embs = enc.net.apply(
            {"params": jax.lax.stop_gradient(enc.params)}, jnp.swapaxes(mel, 1, 2), l2_norm=True
        )
        gt, syn = jnp.split(embs, 2, axis=0)
        return -jnp.mean(jnp.sum(gt * syn, axis=-1))

    # -------------------------------------------------------------- optimize
    def get_optimizer(self):
        from tpu_tts.train.optimizers import get_optimizer, get_scheduler

        sched_d = get_scheduler(
            self.config.lr_scheduler_disc, self.config.lr_scheduler_disc_params, self.config.lr_disc
        )
        sched_g = get_scheduler(
            self.config.lr_scheduler_gen, self.config.lr_scheduler_gen_params, self.config.lr_gen
        )
        opt_d = get_optimizer(self.config.optimizer, self.config.optimizer_params, None, self.config, schedule=sched_d, optimizer_idx=0)
        opt_g = get_optimizer(self.config.optimizer, self.config.optimizer_params, None, self.config, schedule=sched_g, optimizer_idx=1)
        return [opt_d, opt_g]

    # serving text-length bucket: pad token ids to this grid so the stage-1
    # program compiles once per bucket, not once per sentence length (the
    # role of the reference's dynamic-shape runtime, ref synthesizer.py:294).
    # `x_lengths` masking makes the padded run numerically identical to the
    # exact-length run (tests/test_vits_infer_bucket.py).
    TEXT_BUCKET = 32

    # ------------------------------------------------------------- inference
    def inference(self, x: np.ndarray, aux_input=None, bucket: int = 128) -> Dict:
        """Two-stage bucketed inference: run the cheap duration stage first,
        then decode at the *actual* bucketed mel length — the single-pass
        reference path would decode a worst-case padded length (up to ~20×
        wasted decoder FLOPs, measured in round-1 verification). Text ids are
        right-padded to the TEXT_BUCKET grid so a cold server compiles per
        bucket, not per sentence length."""
        aux_input = aux_input or {}
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[None]
        x_lengths = aux_input.get("x_lengths")
        if x_lengths is None:
            x_lengths = jnp.full((x.shape[0],), x.shape[1], dtype=jnp.int32)
        x_lengths = jnp.asarray(x_lengths)
        from tpu_tts.utils.generic_utils import bucket_len

        T_pad = bucket_len(x.shape[1], self.TEXT_BUCKET)
        if T_pad != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, T_pad - x.shape[1])))
        sid = aux_input.get("speaker_ids")
        dvec = aux_input.get("d_vectors")
        lid = aux_input.get("language_ids")
        rng = jax.random.PRNGKey(int(aux_input.get("seed", 0)))

        key1 = ("stage1", x.shape)
        if key1 not in self._infer_cache:
            self._infer_cache[key1] = jax.jit(
                lambda p, xi, xli, s, d, l, r: self.net.apply(
                    {"params": p}, xi, xli, speaker_ids=s, d_vectors=d, language_ids=l,
                    method=VitsNet.infer_durations, rngs={"sdp": jax.random.fold_in(r, 1)},
                )
            )
        s1 = self._infer_cache[key1](self.params["generator"], x, x_lengths, sid, dvec, lid, rng)
        true_max = int(np.asarray(s1["y_lengths"]).max())
        y_max = max(bucket, int(np.ceil(true_max / bucket)) * bucket)
        if self.args.max_inference_len:
            y_max = min(y_max, self.args.max_inference_len)

        use_pallas = aux_input.get("use_pallas_decoder")
        if use_pallas is None:
            use_pallas = os.environ.get("TPU_TTS_PALLAS_DECODER", "0") == "1"
        use_pallas = bool(use_pallas) and self.net.interp_factor == 1 and str(self.args.resblock_type_decoder) == "1"

        key2 = ("stage2", x.shape, int(y_max), use_pallas)
        if key2 not in self._infer_cache:
            decode = not use_pallas
            stage2 = jax.jit(
                lambda p, w, yl, m, ls, xm, s, d, l, r: self.net.apply(
                    {"params": p}, w, yl, m, ls, xm, y_max,
                    speaker_ids=s, d_vectors=d, language_ids=l, decode=decode,
                    method=VitsNet.infer_decode, rngs={"noise": r},
                )
            )
            if use_pallas:
                from tpu_tts.ops.hifigan_pallas import hifigan_apply_pallas

                a = self.args
                dec = jax.jit(
                    lambda p, z_in, g: hifigan_apply_pallas(
                        p["waveform_decoder"], z_in, None if g.ndim == 0 else g,
                        resblock_kernel_sizes=tuple(a.resblock_kernel_sizes_decoder),
                        resblock_dilation_sizes=tuple(tuple(d) for d in a.resblock_dilation_sizes_decoder),
                        upsample_factors=tuple(a.upsample_rates_decoder),
                    )
                )

                def run(p, w, yl, m, ls, xm, s, d, l, r):
                    out = stage2(p, w, yl, m, ls, xm, s, d, l, r)
                    out["model_outputs"] = dec(p, out.pop("z_in"), out.pop("g"))
                    return out

                self._infer_cache[key2] = run
            else:
                self._infer_cache[key2] = stage2
        out = self._infer_cache[key2](
            self.params["generator"], s1["w_ceil"], s1["y_lengths"], s1["m_p"], s1["logs_p"],
            s1["x_mask"], sid, dvec, lid, rng,
        )
        return out

    def export_serving(
        self,
        output_path: str,
        batch_size: int = 1,
        text_len: int = 128,
        y_max: int = 768,
        use_speaker_id: bool = False,
        use_language_id: bool = False,
        seed: int = 0,
    ) -> str:
        """Serialize single-pass inference to a portable StableHLO artifact —
        the TPU-native counterpart of the reference's ONNX export (ref
        vits.py:1806 `export_onnx`). Weights are embedded; shapes are fixed at
        export (one artifact per serving bucket — the ONNX dynamic-axes role is
        played by exporting several buckets). Inputs: (text_ids [B, T_en],
        text_lengths [B], seed []); optional speaker/language id vectors [B].
        Load with `tpu_tts.utils.export.load_serving_fn`."""
        from tpu_tts.utils.export import export_serving_fn

        params = self.params["generator"]

        def fn(text, text_lengths, seed_, *extra):
            sid = extra[0] if use_speaker_id else None
            lid = extra[-1] if use_language_id else None
            rng = jax.random.PRNGKey(0)
            rng = jax.random.fold_in(rng, seed_)
            out = self.net.apply(
                {"params": params}, text, text_lengths, y_max,
                speaker_ids=sid, language_ids=lid, method=VitsNet.inference,
                rngs={"noise": rng, "sdp": jax.random.fold_in(rng, 1)},
            )
            return out["model_outputs"], out["y_lengths"]

        args = [
            jnp.zeros((batch_size, text_len), dtype=jnp.int32),
            jnp.full((batch_size,), text_len, dtype=jnp.int32),
            jnp.asarray(seed, dtype=jnp.int32),
        ]
        if use_speaker_id:
            args.append(jnp.zeros((batch_size,), dtype=jnp.int32))
        if use_language_id:
            args.append(jnp.zeros((batch_size,), dtype=jnp.int32))
        meta = {
            "model": "vits",
            "sample_rate": int(self.config.audio.sample_rate),
            "hop_length": int(self.config.audio.hop_length),
            "y_max": int(y_max),
            "batch_size": int(batch_size),
            "text_len": int(text_len),
        }
        return export_serving_fn(fn, args, output_path, meta)

    def voice_conversion(self, source_wav: np.ndarray, speaker_cond_src, speaker_cond_tgt) -> np.ndarray:
        """Host entry for VC (ref vits.py:1176)."""
        wav = jnp.asarray(source_wav, dtype=jnp.float32).reshape(1, -1, 1)
        spec = self._spec_from_wav(wav)
        sl = jnp.array([spec.shape[1]], dtype=jnp.int32)

        def embed(cond):
            if isinstance(cond, (int, np.integer)):
                emb_table = self.params["generator"]["emb_g"]["embedding"]
                return jnp.asarray(emb_table)[None, None, int(cond)]
            return jnp.asarray(cond).reshape(1, 1, -1)

        g_src = embed(speaker_cond_src)
        g_tgt = embed(speaker_cond_tgt)
        o = self.net.apply(
            {"params": self.params["generator"]}, spec, sl, g_src, g_tgt, method=VitsNet.voice_conversion,
            rngs={"posterior": jax.random.PRNGKey(0)},
        )
        return np.asarray(o)[0, :, 0]

    # ------------------------------------------------------------ dataloader
    def get_data_loader(self, config, assets, is_eval, samples, verbose, num_gpus, rank=0):
        config.return_wav = True
        config.compute_linear_spec = False  # computed on device
        return super().get_data_loader(config, assets, is_eval, samples, verbose, num_gpus, rank)

    # ------------------------------------------------------- torch ingest
    def convert_torch_state_dict(self, state_dict):
        """Reference `Vits` torch weights → our flax tree (parity-tested in
        tests/test_torch_parity_vits.py)."""
        from tpu_tts.models.vits_convert import convert_vits_torch_state_dict

        return convert_vits_torch_state_dict(state_dict)

    def load_fairseq_checkpoint(self, config, checkpoint_dir: str, eval: bool = True, strict: bool = True):
        """Load a fairseq-MMS VITS release directory (ref vits.py:1727
        `load_fairseq_checkpoint`): `config.json` + `G_100000.pth` +
        `vocab.txt`. Rekeys the fairseq state dict onto reference names and
        runs it through the regular torch→flax converter; rebuilds the
        tokenizer from the released vocab (`basic_cleaners`, no phonemes,
        blank interspersal per the fairseq config)."""
        import json

        from tpu_tts.models.vits_convert import (
            convert_vits_torch_state_dict,
            rehash_fairseq_vits_state_dict,
        )
        from tpu_tts.text.cleaners import basic_cleaners
        from tpu_tts.text.tokenizer import TTSTokenizer
        from tpu_tts.train.torch_convert import load_torch_checkpoint

        config_file = os.path.join(checkpoint_dir, "config.json")
        checkpoint_file = os.path.join(checkpoint_dir, "G_100000.pth")
        vocab_file = os.path.join(checkpoint_dir, "vocab.txt")
        with open(config_file, "r", encoding="utf-8") as f:
            config_org = json.load(f)
        data_org = config_org.get("data", {})
        self.config.audio.sample_rate = data_org["sampling_rate"]
        if "hop_length" in data_org:
            self.config.audio.hop_length = data_org["hop_length"]
        if "win_length" in data_org:
            self.config.audio.win_length = data_org["win_length"]
        if "filter_length" in data_org:
            self.config.audio.fft_size = data_org["filter_length"]
            self.args.out_channels = data_org["filter_length"] // 2 + 1
        # the fairseq config carries the architecture — adopt it so any MMS
        # release shape loads (the reference assumes the default dims)
        _ARCH = {
            "inter_channels": "hidden_channels",
            "filter_channels": "hidden_channels_ffn_text_encoder",
            "n_heads": "num_heads_text_encoder",
            "n_layers": "num_layers_text_encoder",
            "kernel_size": "kernel_size_text_encoder",
            "p_dropout": "dropout_p_text_encoder",
            "resblock": "resblock_type_decoder",
            "resblock_kernel_sizes": "resblock_kernel_sizes_decoder",
            "resblock_dilation_sizes": "resblock_dilation_sizes_decoder",
            "upsample_rates": "upsample_rates_decoder",
            "upsample_initial_channel": "upsample_initial_channel_decoder",
            "upsample_kernel_sizes": "upsample_kernel_sizes_decoder",
            "n_layers_q": "num_layers_posterior_encoder",
        }
        for src, dst in _ARCH.items():
            if src in config_org.get("model", {}):
                setattr(self.args, dst, config_org["model"][src])
        vocab = FairseqVocab(vocab_file)
        self.args.num_chars = vocab.num_chars
        self.config.model_args.num_chars = vocab.num_chars
        self._build_net()
        self.tokenizer = TTSTokenizer(
            use_phonemes=False,
            text_cleaner=basic_cleaners,
            characters=vocab,
            phonemizer=None,
            add_blank=config_org["data"]["add_blank"],
            use_eos_bos=False,
        )
        ckpt = load_torch_checkpoint(checkpoint_file)
        sd = ckpt.get("torch_state_dict")
        if sd is None:
            sd = {k: v for k, v in ckpt.items() if hasattr(v, "shape")}
        params = convert_vits_torch_state_dict(rehash_fairseq_vits_state_dict(sd))
        if strict and "generator" not in params:
            raise ValueError(f"no generator weights recovered from {checkpoint_file}")
        params.setdefault("discriminator", {})  # inference-only release
        self.params = params
        self._infer_cache = {}
        return ckpt

    # -------------------------------------------------------------- factory
    @staticmethod
    def init_from_config(config, samples=None):
        from tpu_tts.audio import AudioProcessor
        from tpu_tts.text.tokenizer import TTSTokenizer
        from tpu_tts.managers import LanguageManager, SpeakerManager

        upsample_rate = int(np.prod(config.model_args.upsample_rates_decoder))
        assert upsample_rate == config.audio.hop_length, (
            f" [!] Product of upsample rates must equal the hop length - {upsample_rate} vs {config.audio.hop_length}"
        )
        ap = AudioProcessor.init_from_config(config, verbose=False)
        tokenizer, new_config = TTSTokenizer.init_from_config(config)
        speaker_manager = SpeakerManager.init_from_config(new_config.model_args, samples)
        language_manager = LanguageManager.init_from_config(new_config)
        return Vits(new_config, ap, tokenizer, speaker_manager, language_manager)


class FairseqVocab(BaseVocabulary):
    """Character vocabulary loaded from a fairseq-MMS `vocab.txt` (one symbol
    per line; line 0 is the blank symbol, pad is the space character) —
    ref vits.py:1982."""

    def __init__(self, vocab_file: str):
        with open(vocab_file, encoding="utf-8") as f:
            symbols = [line.rstrip("\n") for line in f]
        pad = " " if " " in symbols else None
        super().__init__(vocab=symbols, pad=pad, blank=symbols[0] if symbols else None)
