"""DelightfulTTS (arXiv:2110.12612): conformer acoustic model with explicit
(pitch/energy/duration) and implicit (utterance/phoneme prosody) variance
modeling, plus an integrated HiFi-GAN waveform decoder trained end-to-end as a
GAN.

Behavior spec: /root/reference/TTS/tts/models/delightful_tts.py
(DelightfulTtsArgs:579, DelightfulTTS:630, forward:808, train_step:919,
DelightfulTTSLoss:1583) and tts/layers/delightful_tts/acoustic_model.py:24.

TPU redesign:
- pure flax `AcousticModelNet` / orchestrator class implementing the trainer
  GAN contract (D = optimizer_idx 0, G = 1) with params partitioned as
  `{"generator", "discriminator"}` — the reference caches generator outputs
  across the two optimizer steps; here each loss_fn pass is pure and jit-safe.
- mel / energy features are computed ON DEVICE inside `loss_fn` from the
  padded waveform (replacing `format_batch_on_device`, ref :1342) using the
  matmul-STFT in tpu_tts/audio/jax_transforms.py.
- the reference's running-BatchNorm `energy_scaler` (ref :159,:1396) becomes a
  masked per-batch standardization in fp32 — same normalization target,
  no mutable train-time state under jit.
- all shapes static: inference buckets the expanded mel length like
  ForwardTTS; training uses the dataset's bucket-padded batches.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.core import FrozenDict

from tpu_tts.audio import jax_transforms as jt
from dataclasses import dataclass, field

from tpu_tts.config.base import Coqpit
from tpu_tts.layers.delightful import (
    Conformer,
    EmbeddingPadded,
    EnergyAdaptor,
    PhonemeLevelProsodyEncoder,
    PhonemeProsodyPredictor,
    PitchAdaptor,
    UtteranceLevelProsodyEncoder,
    VariancePredictor,
    _norm_last,
    positional_encoding,
)
from tpu_tts.layers.feed_forward import AlignmentNetwork
from tpu_tts.layers.losses import forward_sum_loss
from tpu_tts.layers.vits import VitsDiscriminator
from tpu_tts.models.base_tts import BaseTTSModel
from tpu_tts.ops.helpers import average_over_durations, generate_path, rand_segments, segment, sequence_mask
from tpu_tts.ops.mas import maximum_path_jax
from tpu_tts.vocoder.layers.losses import feature_matching_loss, mse_D_loss, mse_G_loss, multi_scale_stft_loss
from tpu_tts.vocoder.models.hifigan_generator import HifiganGenerator

from flax import linen as nn


@dataclass
class DelightfulTtsArgs(Coqpit):
    """Model args (ref delightful_tts.py:579)."""

    num_chars: int = 100
    spec_segment_size: int = 32
    # conformer encoder / decoder
    n_hidden_conformer_encoder: int = 512
    n_layers_conformer_encoder: int = 6
    n_heads_conformer_encoder: int = 8
    dropout_conformer_encoder: float = 0.1
    kernel_size_conv_mod_conformer_encoder: int = 7
    lrelu_slope: float = 0.3
    n_hidden_conformer_decoder: int = 512
    n_layers_conformer_decoder: int = 6
    n_heads_conformer_decoder: int = 8
    dropout_conformer_decoder: float = 0.1
    kernel_size_conv_mod_conformer_decoder: int = 11
    # reference encoders
    bottleneck_size_p_reference_encoder: int = 4
    bottleneck_size_u_reference_encoder: int = 512
    ref_enc_filters_reference_encoder: list = field(default_factory=lambda: [32, 32, 64, 64, 128, 128])
    ref_enc_size_reference_encoder: int = 3
    ref_enc_strides_reference_encoder: list = field(default_factory=lambda: [1, 2, 1, 2, 1])
    ref_enc_gru_size_reference_encoder: int = 32
    token_num_reference_encoder: int = 32
    predictor_kernel_size_reference_encoder: int = 5
    # variance adaptors
    n_hidden_variance_adaptor: int = 512
    kernel_size_variance_adaptor: int = 5
    dropout_variance_adaptor: float = 0.5
    emb_kernel_size_variance_adaptor: int = 3
    # multi-speaker
    use_speaker_embedding: bool = False
    num_speakers: int = 0
    speakers_file: Optional[str] = None
    d_vector_file: Optional[str] = None
    speaker_embedding_channels: int = 384
    use_d_vector_file: bool = False
    d_vector_dim: int = 0
    length_scale: float = 1.0
    # filled by the model
    out_channels: int = 100
    num_mels: int = 100


class AcousticModelNet(nn.Module):
    """Pure acoustic model (ref acoustic_model.py:24). Channels-last."""

    args: tuple

    @property
    def a(self):
        return dict(self.args)

    def setup(self):
        a = self.a
        self.emb_dim = a["n_hidden_conformer_encoder"]
        spk_dim = 0
        if a["use_speaker_embedding"]:
            spk_dim = a["speaker_embedding_channels"]
            self.emb_g = nn.Embed(max(a["num_speakers"], 1), spk_dim)
        elif a["use_d_vector_file"]:
            spk_dim = a["d_vector_dim"]
        self.spk_dim = spk_dim
        self.src_word_emb = EmbeddingPadded(a["num_chars"], self.emb_dim, padding_idx=a.get("_pad_id", 0))
        self.encoder = Conformer(
            dim=self.emb_dim,
            n_layers=a["n_layers_conformer_encoder"],
            n_heads=a["n_heads_conformer_encoder"],
            speaker_embedding_dim=spk_dim,
            p_dropout=a["dropout_conformer_encoder"],
            kernel_size_conv_mod=a["kernel_size_conv_mod_conformer_encoder"],
            lrelu_slope=a["lrelu_slope"],
        )
        self.pitch_adaptor = PitchAdaptor(
            n_input=self.emb_dim,
            n_hidden=a["n_hidden_variance_adaptor"],
            kernel_size=a["kernel_size_variance_adaptor"],
            emb_kernel_size=a["emb_kernel_size_variance_adaptor"],
            p_dropout=a["dropout_variance_adaptor"],
            lrelu_slope=a["lrelu_slope"],
        )
        self.energy_adaptor = EnergyAdaptor(
            channels_in=self.emb_dim,
            channels_hidden=a["n_hidden_variance_adaptor"],
            kernel_size=a["kernel_size_variance_adaptor"],
            emb_kernel_size=a["emb_kernel_size_variance_adaptor"],
            dropout=a["dropout_variance_adaptor"],
            lrelu_slope=a["lrelu_slope"],
        )
        self.aligner = AlignmentNetwork(
            in_query_channels=a["out_channels"], in_key_channels=self.emb_dim
        )
        self.duration_predictor = VariancePredictor(
            channels=a["n_hidden_variance_adaptor"],
            channels_out=1,
            kernel_size=a["kernel_size_variance_adaptor"],
            p_dropout=a["dropout_variance_adaptor"],
            lrelu_slope=a["lrelu_slope"],
        )
        ref_kw = dict(
            num_mels=a["num_mels"],
            ref_enc_filters=tuple(a["ref_enc_filters_reference_encoder"]),
            ref_enc_size=a["ref_enc_size_reference_encoder"],
            ref_enc_strides=tuple(a["ref_enc_strides_reference_encoder"]),
            ref_enc_gru_size=a["ref_enc_gru_size_reference_encoder"],
        )
        self.utterance_prosody_encoder = UtteranceLevelProsodyEncoder(
            dropout=a["dropout_conformer_encoder"],
            n_hidden=self.emb_dim,
            bottleneck_size_u=a["bottleneck_size_u_reference_encoder"],
            token_num=a["token_num_reference_encoder"],
            **ref_kw,
        )
        self.utterance_prosody_predictor = PhonemeProsodyPredictor(
            hidden_size=self.emb_dim,
            kernel_size=a["predictor_kernel_size_reference_encoder"],
            dropout=a["dropout_conformer_encoder"],
            bottleneck_size=a["bottleneck_size_u_reference_encoder"],
            lrelu_slope=a["lrelu_slope"],
        )
        self.phoneme_prosody_encoder = PhonemeLevelProsodyEncoder(
            dropout=a["dropout_conformer_encoder"],
            n_hidden=self.emb_dim,
            n_heads=a["n_heads_conformer_encoder"],
            bottleneck_size_p=a["bottleneck_size_p_reference_encoder"],
            **ref_kw,
        )
        self.phoneme_prosody_predictor = PhonemeProsodyPredictor(
            hidden_size=self.emb_dim,
            kernel_size=a["predictor_kernel_size_reference_encoder"],
            dropout=a["dropout_conformer_encoder"],
            bottleneck_size=a["bottleneck_size_p_reference_encoder"],
            lrelu_slope=a["lrelu_slope"],
        )
        self.u_bottle_out = nn.Dense(self.emb_dim)
        self.p_bottle_out = nn.Dense(self.emb_dim)
        self.decoder = Conformer(
            dim=a["n_hidden_conformer_decoder"],
            n_layers=a["n_layers_conformer_decoder"],
            n_heads=a["n_heads_conformer_decoder"],
            speaker_embedding_dim=spk_dim,
            p_dropout=a["dropout_conformer_decoder"],
            kernel_size_conv_mod=a["kernel_size_conv_mod_conformer_decoder"],
            lrelu_slope=a["lrelu_slope"],
        )
        self.to_mel = nn.Dense(a["num_mels"])

    # ----------------------------------------------------------------- common
    def _speaker_embedding(self, speaker_ids, d_vectors):
        if d_vectors is not None:
            n = jnp.linalg.norm(d_vectors, axis=-1, keepdims=True)
            return d_vectors / jnp.maximum(n, 1e-12)
        if speaker_ids is not None and self.a["use_speaker_embedding"]:
            e = self.emb_g(speaker_ids)
            return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
        return None

    def _forward_aligner(self, x_emb, mels, src_valid, mel_valid, attn_priors):
        """(durations `[B,T_src]`, soft `[B,T_mel,T_src]`, logp `[B,1,T_mel,T_src]`,
        mas `[B,T_mel,T_src]`) — ref acoustic_model.py:270."""
        attn_soft, attn_logp = self.aligner(mels, x_emb, mask=src_valid, attn_prior=attn_priors)
        attn_mask = src_valid.astype(jnp.float32)[:, :, None] * mel_valid.astype(jnp.float32)[:, None, :]
        logp = jnp.swapaxes(jnp.where(jnp.isfinite(attn_logp), attn_logp, -1e9), 1, 2)  # [B,T_src,T_mel]
        mas = maximum_path_jax(logp, attn_mask)  # [B, T_src, T_mel]
        durations = jnp.sum(mas, axis=-1)
        return durations, attn_soft, attn_logp[:, None], jnp.swapaxes(mas, 1, 2)

    def _expand(self, o_en, dr, src_valid, mel_valid):
        """Repeat encoder frames by durations → `[B, T_mel, C]` + attn."""
        attn = generate_path(dr, (src_valid.astype(o_en.dtype)[:, :, None] * mel_valid.astype(o_en.dtype)[:, None, :]))
        o_ex = jnp.einsum("bst,bsc->btc", attn, o_en)
        return o_ex, jnp.swapaxes(attn, 1, 2)  # attn → [B, T_mel, T_src]

    # ------------------------------------------------------------------ train
    def __call__(
        self,
        tokens,
        src_lens,
        mels,
        mel_lens,
        pitches,
        energies,
        attn_priors=None,
        d_vectors=None,
        speaker_ids=None,
        use_ground_truth: bool = True,
        train: bool = True,
    ) -> Dict:
        """tokens `[B,T_src]`, mels `[B,T_mel,C]`, pitches/energies `[B,T_mel]`,
        attn_priors `[B,T_mel,T_src]` (ref acoustic_model.py:324)."""
        T_src, T_mel = tokens.shape[1], mels.shape[1]
        src_valid = sequence_mask(src_lens, T_src)  # [B, T_src] bool
        mel_valid = sequence_mask(mel_lens, T_mel)
        token_emb = self.src_word_emb(tokens)

        aligner_durations, aligner_soft, aligner_logprob, aligner_mas = self._forward_aligner(
            token_emb, mels, src_valid, mel_valid, attn_priors
        )
        dr = aligner_durations  # [B, T_src]

        g = self._speaker_embedding(speaker_ids, d_vectors)
        encoding = positional_encoding(self.emb_dim, max(T_src, T_mel))
        o_en = self.encoder(token_emb, src_valid, g, encoding, train=train)

        u_prosody_ref = _norm_last(self.utterance_prosody_encoder(mels, mel_lens, train=train))
        u_pred = self.utterance_prosody_predictor(o_en, src_valid, train=train)
        lengths = src_valid.astype(jnp.float32).sum(1)
        u_prosody_pred = _norm_last(u_pred.sum(1, keepdims=True) / lengths[:, None, None])
        o_en = o_en + self.u_bottle_out(u_prosody_ref if use_ground_truth else u_prosody_pred)

        p_prosody_ref = _norm_last(
            self.phoneme_prosody_encoder(o_en, src_valid, mels, mel_lens, encoding, train=train)
        )
        p_prosody_pred = _norm_last(self.phoneme_prosody_predictor(o_en, src_valid, train=train))
        o_en = o_en + self.p_bottle_out(p_prosody_ref if use_ground_truth else p_prosody_pred)

        o_en_res = o_en
        pitch_pred, avg_pitch_target, pitch_emb = self.pitch_adaptor.get_pitch_embedding_train(
            o_en, pitches, dr, src_valid.astype(o_en.dtype), train=train
        )
        energy_pred, avg_energy_target, energy_emb = self.energy_adaptor.get_energy_embedding_train(
            o_en, energies, dr, src_valid.astype(o_en.dtype), train=train
        )
        o_en = o_en + pitch_emb + energy_emb

        log_duration_pred = self.duration_predictor(
            jax.lax.stop_gradient(o_en_res), src_valid.astype(o_en.dtype), train=train
        )

        o_ex, alignments = self._expand(o_en, dr, src_valid, mel_valid)
        x = self.decoder(o_ex, mel_valid, g, encoding, train=train)
        x = self.to_mel(x)

        return {
            "model_outputs": x,  # [B, T_mel, C_mel]
            "pitch_pred": pitch_pred,
            "pitch_target": avg_pitch_target,
            "energy_pred": energy_pred,
            "energy_target": avg_energy_target,
            "u_prosody_pred": u_prosody_pred,
            "u_prosody_ref": u_prosody_ref,
            "p_prosody_pred": p_prosody_pred,
            "p_prosody_ref": p_prosody_ref,
            "alignments": alignments,  # [B, T_mel, T_src]
            "aligner_soft": aligner_soft,
            "aligner_mas": aligner_mas,
            "aligner_durations": aligner_durations,
            "aligner_logprob": aligner_logprob,
            "dr_log_pred": log_duration_pred,  # [B, T_src]
            "dr_log_target": jnp.log(dr + 1),
            "spk_emb": g,
        }

    # -------------------------------------------------------------- inference
    def infer(self, tokens, src_lens, y_max_length: int, d_vectors=None, speaker_ids=None) -> Dict:
        """Duration-driven inference to a STATIC `y_max_length` mel buffer
        (ref acoustic_model.py:459; bucketing replaces dynamic lengths)."""
        a = self.a
        T_src = tokens.shape[1]
        src_valid = sequence_mask(src_lens, T_src)
        token_emb = self.src_word_emb(tokens)
        g = self._speaker_embedding(speaker_ids, d_vectors)
        encoding = positional_encoding(self.emb_dim, max(T_src, y_max_length))
        o_en = self.encoder(token_emb, src_valid, g, encoding, train=False)

        u_pred = self.utterance_prosody_predictor(o_en, src_valid, train=False)
        lengths = src_valid.astype(jnp.float32).sum(1)
        u_prosody_pred = _norm_last(u_pred.sum(1, keepdims=True) / lengths[:, None, None])
        o_en = o_en + self.u_bottle_out(u_prosody_pred)
        p_prosody_pred = _norm_last(self.phoneme_prosody_predictor(o_en, src_valid, train=False))
        o_en = o_en + self.p_bottle_out(p_prosody_pred)

        o_en_res = o_en
        pitch_emb, pitch_pred = self.pitch_adaptor.get_pitch_embedding(o_en, src_valid.astype(o_en.dtype))
        energy_emb, energy_pred = self.energy_adaptor.get_energy_embedding(o_en, src_valid.astype(o_en.dtype))
        o_en = o_en + pitch_emb + energy_emb

        log_dur = self.duration_predictor(o_en_res, src_valid.astype(o_en.dtype), train=False)
        dur = (jnp.exp(log_dur) - 1) * src_valid * a["length_scale"]
        dur = jnp.round(jnp.maximum(dur, 1.0)) * src_valid
        mel_lens = jnp.clip(dur.sum(1).astype(jnp.int32), 1, y_max_length)
        mel_valid = sequence_mask(mel_lens, y_max_length)
        o_ex, alignments = self._expand(o_en, dur, src_valid, mel_valid)
        x = self.decoder(o_ex, mel_valid, g, encoding, train=False)
        x = self.to_mel(x) * mel_valid[:, :, None]
        return {
            "model_outputs": x,
            "alignments": alignments,
            "durations": dur,
            "pitch": pitch_pred,
            "energy": energy_pred,
            "spk_emb": g,
            "mel_lens": mel_lens,
        }


class DelightfulNet(nn.Module):
    """Acoustic model + HiFi-GAN waveform decoder (ref delightful_tts.py:661)."""

    args: tuple
    vocoder: tuple

    @property
    def a(self):
        return dict(self.args)

    def setup(self):
        v = dict(self.vocoder)
        a = self.a
        spk_dim = 0
        if a["use_speaker_embedding"]:
            spk_dim = a["speaker_embedding_channels"]
        elif a["use_d_vector_file"]:
            spk_dim = a["d_vector_dim"]
        self.acoustic_model = AcousticModelNet(args=self.args)
        self.waveform_decoder = HifiganGenerator(
            in_channels=a["num_mels"],
            out_channels=1,
            resblock_type=str(v["resblock_type_decoder"]),
            resblock_dilation_sizes=tuple(tuple(d) for d in v["resblock_dilation_sizes_decoder"]),
            resblock_kernel_sizes=tuple(v["resblock_kernel_sizes_decoder"]),
            upsample_kernel_sizes=tuple(v["upsample_kernel_sizes_decoder"]),
            upsample_initial_channel=v["upsample_initial_channel_decoder"],
            upsample_factors=tuple(v["upsample_rates_decoder"]),
            inference_padding=0,
            cond_channels=spk_dim,
            conv_pre_weight_norm=False,
            conv_post_weight_norm=False,
            conv_post_bias=False,
        )

    def __call__(
        self,
        tokens,
        src_lens,
        mels,
        mel_lens,
        pitches,
        energies,
        attn_priors=None,
        d_vectors=None,
        speaker_ids=None,
        train: bool = True,
    ) -> Dict:
        """Full E2E train forward: acoustic + random-windowed vocoder decode
        (ref delightful_tts.py:808)."""
        outputs = self.acoustic_model(
            tokens, src_lens, mels, mel_lens, pitches, energies,
            attn_priors=attn_priors, d_vectors=d_vectors, speaker_ids=speaker_ids, train=train,
        )
        vocoder_input = outputs["model_outputs"]  # [B, T_mel, C]
        seg_size = self.a["spec_segment_size"]
        seg_rng = self.make_rng("segments")
        slices, slice_ids = rand_segments(
            seg_rng, jnp.swapaxes(vocoder_input, 1, 2), mel_lens, seg_size,
            let_short_samples=True, pad_short=True,
        )
        g = outputs["spk_emb"]
        g_in = g[:, None, :] if g is not None else None
        vocoder_output = self.waveform_decoder(jax.lax.stop_gradient(jnp.swapaxes(slices, 1, 2)), g=g_in)
        outputs["acoustic_model_outputs"] = outputs["model_outputs"]
        outputs["model_outputs"] = vocoder_output  # [B, T_wav_seg, 1]
        outputs["slice_ids"] = slice_ids
        return outputs

    def infer(self, tokens, src_lens, y_max_length: int, d_vectors=None, speaker_ids=None,
              decode: bool = True) -> Dict:
        out = self.acoustic_model.infer(
            tokens, src_lens, y_max_length, d_vectors=d_vectors, speaker_ids=speaker_ids
        )
        g = out["spk_emb"]
        g_in = g[:, None, :] if g is not None else None
        if decode:
            out["model_outputs"] = self.waveform_decoder(out["model_outputs"], g=g_in)
        else:
            out["mel"] = out["model_outputs"]
            out["g"] = g_in if g_in is not None else 0
        return out

    def infer_spec(self, tokens, src_lens, y_max_length: int, d_vectors=None, speaker_ids=None) -> Dict:
        """Spec-decoder-only inference (ref delightful_tts.py:910)."""
        return self.acoustic_model.infer(
            tokens, src_lens, y_max_length, d_vectors=d_vectors, speaker_ids=speaker_ids
        )


class DelightfulTTS(BaseTTSModel):
    """Orchestrator: 2-optimizer GAN (D=idx0, G=idx1), trainer contract."""

    def __init__(self, config, ap=None, tokenizer=None, speaker_manager=None, language_manager=None):
        super().__init__(config, ap, tokenizer, speaker_manager, language_manager)
        args = config.model_args
        if tokenizer is not None and tokenizer.characters is not None:
            args.num_chars = tokenizer.characters.num_chars
        if speaker_manager is not None and args.use_speaker_embedding:
            args.num_speakers = max(args.num_speakers, speaker_manager.num_speakers)
        args.out_channels = config.audio.num_mels
        args.num_mels = config.audio.num_mels
        self.args = args
        net_args = args.to_dict()
        net_args["_pad_id"] = tokenizer.characters.pad_id if tokenizer is not None and tokenizer.characters else 0
        self.net = DelightfulNet(
            args=tuple(sorted(net_args.items(), key=lambda kv: kv[0])),
            vocoder=tuple(sorted(config.vocoder.to_dict().items(), key=lambda kv: kv[0])),
        )
        self.disc = VitsDiscriminator(
            periods=tuple(config.vocoder.periods_discriminator),
            use_spectral_norm=config.vocoder.use_spectral_norm_discriminator,
        )
        self.binary_loss_weight = 1.0
        self._infer_cache = {}

    def num_optimizers(self) -> int:
        return 2

    # ------------------------------------------------------------------ init
    def init_params(self, rng):
        a = self.args
        B, T_src, T_mel = 2, 8, 12
        hop = self.config.audio.hop_length
        tokens = jnp.zeros((B, T_src), dtype=jnp.int32)
        src_lens = jnp.full((B,), T_src, dtype=jnp.int32)
        mels = jnp.zeros((B, T_mel, a.num_mels))
        mel_lens = jnp.full((B,), T_mel, dtype=jnp.int32)
        pitch = jnp.zeros((B, T_mel))
        energy = jnp.zeros((B, T_mel))
        kwargs = {}
        if a.use_speaker_embedding and a.num_speakers > 0:
            kwargs["speaker_ids"] = jnp.zeros((B,), dtype=jnp.int32)
        elif a.use_d_vector_file:
            kwargs["d_vectors"] = jnp.zeros((B, a.d_vector_dim or 512))
        g_rng, d_rng, seg_rng, drop_rng = jax.random.split(rng, 4)
        g_params = self.net.init(
            {"params": g_rng, "segments": seg_rng, "dropout": drop_rng},
            tokens, src_lens, mels, mel_lens, pitch, energy, train=True, **kwargs,
        )["params"]
        wav_seg = jnp.zeros((B, a.spec_segment_size * hop, 1))
        d_params = self.disc.init(d_rng, wav_seg)["params"]
        self.params = {"generator": g_params, "discriminator": d_params}
        return self.params

    def param_partition(self, params, optimizer_idx: int):
        return params["discriminator"] if optimizer_idx == 0 else params["generator"]

    def param_merge(self, params, subtree, optimizer_idx: int):
        key = "discriminator" if optimizer_idx == 0 else "generator"
        new = dict(params)
        new[key] = subtree
        return new

    # ----------------------------------------------------------- featurizers
    def _mel_from_wav(self, wav):
        a = self.config.audio
        mel = jt.wav_to_mel(
            wav[..., 0], fft_size=a.fft_size, num_mels=a.num_mels, sample_rate=a.sample_rate,
            hop_length=a.hop_length, win_length=a.win_length, fmin=a.mel_fmin, fmax=a.mel_fmax, center=False,
        )
        return jnp.swapaxes(mel, 1, 2)  # [B, T, C]

    def _energy_from_wav(self, wav):
        """L2 norm of linear spectrogram frames (ref wav_to_energy :211),
        standardized per batch in fp32 (replaces the running energy_scaler)."""
        a = self.config.audio
        spec = jt.wav_to_spec(
            wav[..., 0].astype(jnp.float32), fft_size=a.fft_size, hop_length=a.hop_length,
            win_length=a.win_length, center=False,
        )  # [B, C, T]
        return jnp.linalg.norm(spec, axis=1)  # [B, T]

    def _forward_g(self, g_params, batch, rng, train=True):
        r_seg, r_drop = jax.random.split(rng)
        wav = batch["waveform"]
        mel = self._mel_from_wav(wav)
        T_mel = mel.shape[1]
        mel_lens = jnp.minimum(batch["mel_lengths"], T_mel)
        mel_valid = sequence_mask(mel_lens, T_mel).astype(mel.dtype)
        mel = mel * mel_valid[:, :, None]
        energy = self._energy_from_wav(wav)[:, :T_mel]
        e_sum = (energy * mel_valid).sum()
        e_n = jnp.maximum(mel_valid.sum(), 1.0)
        e_mean = e_sum / e_n
        e_std = jnp.sqrt(jnp.maximum(((energy - e_mean) ** 2 * mel_valid).sum() / e_n, 1e-8))
        energy = (energy - e_mean) / e_std * mel_valid
        pitch = batch.get("pitch")
        pitch = pitch[:, :T_mel] if pitch is not None else jnp.zeros_like(energy)
        attn_priors = batch.get("attn_priors")
        if attn_priors is not None:
            # dataset priors are sized on host-side mel frames; align to the
            # on-device frame count
            if attn_priors.shape[1] < T_mel:
                attn_priors = jnp.pad(attn_priors, ((0, 0), (0, T_mel - attn_priors.shape[1]), (0, 0)))
            attn_priors = attn_priors[:, :T_mel]
        outputs = self.net.apply(
            {"params": g_params},
            batch["text_input"],
            batch["text_lengths"],
            mel,
            mel_lens,
            pitch,
            energy,
            attn_priors=attn_priors,
            d_vectors=batch.get("d_vectors"),
            speaker_ids=batch.get("speaker_ids"),
            train=train,
            rngs={"segments": r_seg, "dropout": r_drop},
        )
        return outputs, mel, mel_lens

    # ---------------------------------------------------------------- losses
    def loss_fn(self, params, batch: Dict, rng, optimizer_idx: int = 0):
        cfg = self.config
        hop = self.config.audio.hop_length
        seg_size = self.args.spec_segment_size
        if optimizer_idx == 0:
            outputs, _, _ = self._forward_g(params["generator"], batch, rng, train=True)
            y_hat = jax.lax.stop_gradient(outputs["model_outputs"])
            wav_seg = segment(
                jnp.swapaxes(batch["waveform"], 1, 2), outputs["slice_ids"] * hop, seg_size * hop, pad_short=True
            )
            wav_seg = jnp.swapaxes(wav_seg, 1, 2)
            from tpu_tts.layers.vits import paired_disc_apply

            scores_real, scores_fake, _, _ = paired_disc_apply(
                self.disc, params["discriminator"], wav_seg, y_hat
            )
            loss = mse_D_loss(scores_fake, scores_real)[0] * cfg.disc_loss_alpha
        # fp32 loss per project invariant
            loss = loss.astype(jnp.float32)
            return loss, {"loss_disc": loss}

        outputs, mel, mel_lens = self._forward_g(params["generator"], batch, rng, train=True)
        y_hat = outputs["model_outputs"]
        wav_seg = segment(
            jnp.swapaxes(batch["waveform"], 1, 2), outputs["slice_ids"] * hop, seg_size * hop, pad_short=True
        )
        wav_seg = jnp.swapaxes(wav_seg, 1, 2)
        d_params = jax.lax.stop_gradient(params["discriminator"])
        from tpu_tts.layers.vits import paired_disc_apply

        # fewer/larger kernels (see paired_disc_apply); like Vits, the G-side
        # pairing adds conv-transpose work over the real half but measured
        # faster overall on the VITS step (README roofline)
        _, scores_fake, feats_real, feats_fake = paired_disc_apply(
            self.disc, d_params, wav_seg, y_hat
        )

        f32 = lambda t: t.astype(jnp.float32)
        T_src = batch["text_input"].shape[1]
        src_valid = sequence_mask(batch["text_lengths"], T_src).astype(jnp.float32)
        mel_valid = sequence_mask(mel_lens, mel.shape[1]).astype(jnp.float32)

        # acoustic losses (ref DelightfulTTSLoss.forward :1637)
        mel_pred = f32(outputs["acoustic_model_outputs"])
        mel_w = mel_valid[:, :, None]
        mel_loss = jnp.abs((mel_pred - f32(mel)) * mel_w).sum() / jnp.maximum(mel_w.sum() * mel.shape[-1], 1.0)
        p_ref = jax.lax.stop_gradient(f32(outputs["p_prosody_ref"]))
        p_w = src_valid[:, :, None]
        p_prosody_loss = 0.5 * jnp.abs((p_ref - f32(outputs["p_prosody_pred"])) * p_w).sum() / jnp.maximum(
            p_w.sum() * p_ref.shape[-1], 1.0
        )
        u_ref = jax.lax.stop_gradient(f32(outputs["u_prosody_ref"]))
        u_prosody_loss = 0.5 * jnp.mean(jnp.abs(u_ref - f32(outputs["u_prosody_pred"])))
        duration_loss = jnp.sum(
            ((f32(outputs["dr_log_pred"]) - jax.lax.stop_gradient(f32(outputs["dr_log_target"]))) ** 2) * src_valid
        ) / jnp.maximum(src_valid.sum(), 1.0)
        pitch_loss = jnp.sum(
            ((f32(outputs["pitch_pred"]) - jax.lax.stop_gradient(f32(outputs["pitch_target"]))) ** 2) * src_valid
        ) / jnp.maximum(src_valid.sum(), 1.0)
        energy_loss = jnp.sum(
            ((f32(outputs["energy_pred"]) - jax.lax.stop_gradient(f32(outputs["energy_target"]))) ** 2) * src_valid
        ) / jnp.maximum(src_valid.sum(), 1.0)
        aligner_loss = forward_sum_loss(
            f32(outputs["aligner_logprob"]), batch["text_lengths"], mel_lens
        )
        loss = (
            mel_loss * cfg.mel_loss_alpha
            + duration_loss * cfg.dur_loss_alpha
            + u_prosody_loss * cfg.u_prosody_loss_alpha
            + p_prosody_loss * cfg.p_prosody_loss_alpha
            + pitch_loss * cfg.pitch_loss_alpha
            + energy_loss * cfg.energy_loss_alpha
            + aligner_loss * cfg.aligner_loss_alpha
        )
        logs = {
            "loss_mel": mel_loss,
            "loss_duration": duration_loss,
            "loss_u_prosody": u_prosody_loss,
            "loss_p_prosody": p_prosody_loss,
            "loss_pitch": pitch_loss,
            "loss_energy": energy_loss,
            "loss_aligner": aligner_loss,
        }
        if cfg.binary_align_loss_alpha > 0:
            hard = jax.lax.stop_gradient(f32(outputs["aligner_mas"]))
            soft = f32(outputs["aligner_soft"])
            log_sum = (jnp.log(jnp.clip(soft, 1e-12)) * hard).sum()
            binary_loss = -log_sum / jnp.maximum(hard.sum(), 1.0)
            loss = loss + cfg.binary_align_loss_alpha * binary_loss * self.binary_loss_weight
            logs["loss_binary_alignment"] = binary_loss

        # vocoder losses
        loss_feat = feature_matching_loss(feats_fake, feats_real) * cfg.feat_loss_alpha
        loss_gen = mse_G_loss(scores_fake) * cfg.gen_loss_alpha
        mel_slice = segment(jnp.swapaxes(f32(mel), 1, 2), outputs["slice_ids"], seg_size, pad_short=True)
        mel_slice_hat = jnp.swapaxes(self._mel_from_wav(f32(y_hat)), 1, 2)
        T = min(mel_slice.shape[-1], mel_slice_hat.shape[-1])
        loss_voc_mel = jnp.mean(jnp.abs(mel_slice[..., :T] - mel_slice_hat[..., :T])) * cfg.vocoder_mel_loss_alpha
        p = cfg.multi_scale_stft_loss_params
        loss_stft_mg, loss_stft_sc = multi_scale_stft_loss(
            f32(y_hat[..., 0]), f32(wav_seg[..., 0]),
            n_ffts=tuple(p["n_ffts"]), hop_lengths=tuple(p["hop_lengths"]), win_lengths=tuple(p["win_lengths"]),
        )
        loss_stft_mg = loss_stft_mg * cfg.multi_scale_stft_loss_alpha
        loss_stft_sc = loss_stft_sc * cfg.multi_scale_stft_loss_alpha
        loss = loss + loss_feat + loss_gen + loss_voc_mel + loss_stft_mg + loss_stft_sc
        logs.update(
            {
                "vocoder_loss_feat": loss_feat,
                "vocoder_loss_gen": loss_gen,
                "vocoder_loss_mel": loss_voc_mel,
                "vocoder_loss_stft_mg": loss_stft_mg,
                "vocoder_loss_stft_sc": loss_stft_sc,
                "loss_gen_total": loss,
            }
        )
        return loss, logs

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

    # ------------------------------------------------------------- inference
    def inference(self, x: np.ndarray, aux_input=None, bucket: int = 128) -> Dict:
        """Token ids → waveform. Buckets text and mel lengths so each
        (T_src, T_mel) pair compiles once."""
        aux_input = aux_input or {}
        x = np.asarray(x, dtype=np.int32)
        if x.ndim == 1:
            x = x[None]
        n_tokens = x.shape[1]
        t_bucket = 32
        T_src = max(t_bucket, int(np.ceil(n_tokens / t_bucket)) * t_bucket)
        est = n_tokens * 8  # generous frames-per-token estimate
        y_max = max(bucket, int(np.ceil(est / bucket)) * bucket)
        x_pad = np.zeros((x.shape[0], T_src), dtype=np.int32)
        x_pad[:, :n_tokens] = x
        src_lens = np.full((x.shape[0],), n_tokens, dtype=np.int32)
        kwargs = {}
        if aux_input.get("d_vectors") is not None:
            kwargs["d_vectors"] = jnp.asarray(aux_input["d_vectors"], dtype=jnp.float32)
            if kwargs["d_vectors"].ndim == 1:
                kwargs["d_vectors"] = kwargs["d_vectors"][None]
        if aux_input.get("speaker_ids") is not None:
            kwargs["speaker_ids"] = jnp.atleast_1d(jnp.asarray(aux_input["speaker_ids"], dtype=jnp.int32))
        use_pallas = aux_input.get("use_pallas_decoder")
        if use_pallas is None:
            import os

            use_pallas = os.environ.get("TPU_TTS_PALLAS_DECODER", "0") == "1"
        use_pallas = bool(use_pallas) and str(self.config.vocoder.resblock_type_decoder) == "1"
        key = (T_src, y_max, tuple(sorted(kwargs.keys())), use_pallas)
        if key not in self._infer_cache:
            if use_pallas:
                from tpu_tts.ops.hifigan_pallas import hifigan_apply_pallas

                v = self.config.vocoder
                acoustic = jax.jit(
                    lambda p, t, sl, **kw: self.net.apply(
                        {"params": p}, t, sl, y_max, decode=False, method=DelightfulNet.infer, **kw
                    )
                )
                dec = jax.jit(
                    lambda p, mel, g: hifigan_apply_pallas(
                        p["waveform_decoder"], mel, None if g.ndim == 0 else g,
                        resblock_kernel_sizes=tuple(v.resblock_kernel_sizes_decoder),
                        resblock_dilation_sizes=tuple(tuple(d) for d in v.resblock_dilation_sizes_decoder),
                        upsample_factors=tuple(v.upsample_rates_decoder),
                    )
                )

                def run(p, t, sl, **kw):
                    out = acoustic(p, t, sl, **kw)
                    out["model_outputs"] = dec(p, out.pop("mel"), out.pop("g"))
                    return out

                self._infer_cache[key] = run
            else:
                self._infer_cache[key] = jax.jit(
                    lambda p, t, sl, **kw: self.net.apply(
                        {"params": p}, t, sl, y_max, method=DelightfulNet.infer, **kw
                    )
                )
        out = self._infer_cache[key](self.params["generator"], jnp.asarray(x_pad), jnp.asarray(src_lens), **kwargs)
        wav = np.asarray(out["model_outputs"])
        n_frames = int(np.asarray(out["mel_lens"])[0])
        wav = wav[:, : n_frames * self.config.audio.hop_length]
        return {
            "model_outputs": wav,
            "alignments": np.asarray(out["alignments"]),
            "durations": np.asarray(out["durations"]),
        }

    # ------------------------------------------------------------------ data
    def get_data_loader(self, config, assets, is_eval, samples, verbose, num_gpus, rank=0):
        config.compute_f0 = True
        config.return_wav = True
        return super().get_data_loader(config, assets, is_eval, samples, verbose, num_gpus, rank)

    # -------------------------------------------------------------- factory
    @staticmethod
    def init_from_config(config, samples=None):
        from tpu_tts.audio import AudioProcessor
        from tpu_tts.text.tokenizer import TTSTokenizer
        from tpu_tts.managers import SpeakerManager

        ap = AudioProcessor.init_from_config(config)
        tokenizer, new_config = TTSTokenizer.init_from_config(config)
        speaker_manager = SpeakerManager.init_from_config(new_config, samples)
        return DelightfulTTS(new_config, ap=ap, tokenizer=tokenizer, speaker_manager=speaker_manager)
