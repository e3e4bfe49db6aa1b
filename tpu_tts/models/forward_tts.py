"""ForwardTTS: one model covering FastSpeech, FastSpeech2, FastPitch and
SpeedySpeech via config (encoder/decoder types + pitch/energy switches).

TPU-native re-design of /root/reference/TTS/tts/models/forward_tts.py
(`ForwardTTSArgs`:23, `_forward_encoder`:374, `_forward_decoder`:417,
`_forward_pitch_predictor`:453, `_forward_aligner`:525, forward:579,
inference:673). Alignment is learned with the AlignmentNetwork + on-device
MAS + CTC forward-sum loss, or taken from precomputed durations.
"""

import math
from dataclasses import dataclass, field
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.config.base import Coqpit
from tpu_tts.layers.common import DurationPredictor, Conv1d
from tpu_tts.layers.feed_forward import (
    ResidualConv1dBNDecoder,
    ResidualConv1dBNEncoder,
    AlignmentNetwork,
    FFTransformerBlock,
    PositionalEncoding,
    ResidualConv1dBNBlock,
    WaveNetDecoder,
)
from tpu_tts.layers.losses import (
    binary_alignment_loss,
    forward_sum_loss,
    masked_mse_loss,
    masked_l1_loss,
    ssim_loss,
)
from tpu_tts.layers.transformer import RelativePositionTransformer
from tpu_tts.models.base_tts import BaseTTSModel
from tpu_tts.ops.helpers import average_over_durations, generate_path, sequence_mask
from tpu_tts.ops.mas import maximum_path_jax


@dataclass
class ForwardTTSArgs(Coqpit):
    """Mirror of ref forward_tts.py:23."""

    num_chars: Optional[int] = None
    out_channels: int = 80
    hidden_channels: int = 384
    use_aligner: bool = True
    # pitch
    use_pitch: bool = True
    pitch_predictor_hidden_channels: int = 256
    pitch_predictor_kernel_size: int = 3
    pitch_predictor_dropout_p: float = 0.1
    pitch_embedding_kernel_size: int = 3
    # energy
    use_energy: bool = False
    energy_predictor_hidden_channels: int = 256
    energy_predictor_kernel_size: int = 3
    energy_predictor_dropout_p: float = 0.1
    energy_embedding_kernel_size: int = 3
    # duration
    duration_predictor_hidden_channels: int = 256
    duration_predictor_kernel_size: int = 3
    duration_predictor_dropout_p: float = 0.1
    positional_encoding: bool = True
    poisitonal_encoding_use_scale: bool = True
    length_scale: float = 1
    encoder_type: str = "fftransformer"
    encoder_params: dict = field(
        default_factory=lambda: {"hidden_channels_ffn": 1024, "num_heads": 1, "num_layers": 6, "dropout_p": 0.1}
    )
    decoder_type: str = "fftransformer"
    decoder_params: dict = field(
        default_factory=lambda: {"hidden_channels_ffn": 1024, "num_heads": 1, "num_layers": 6, "dropout_p": 0.1}
    )
    detach_duration_predictor: bool = False
    max_duration: int = 75
    num_speakers: int = 1
    use_speaker_embedding: bool = False
    speakers_file: Optional[str] = None
    use_d_vector_file: bool = False
    d_vector_dim: Optional[int] = None
    d_vector_file: Optional[str] = None
    norm_type: str = "batch"  # "frozen_batch" for converted reference ckpts


def _build_coder(kind: str, params: dict, channels: int, out_channels: int, name: str,
                 norm_type: str = "layer"):
    params = dict(params or {})
    if kind == "fftransformer":
        return FFTransformerBlock(
            channels=channels,
            num_heads=params.get("num_heads", 1),
            hidden_channels_ffn=params.get("hidden_channels_ffn", 1024),
            num_layers=params.get("num_layers", 6),
            dropout_p=params.get("dropout_p", 0.1),
            name=name,
        )
    if kind in ("relative_position_transformer",):
        return RelativePositionTransformer(
            out_channels=out_channels,
            hidden_channels=channels,
            hidden_channels_ffn=params.get("hidden_channels_ffn", 1024),
            num_heads=params.get("num_heads", 2),
            num_layers=params.get("num_layers", 6),
            kernel_size=params.get("kernel_size", 3),
            dropout_p=params.get("dropout_p", 0.1),
            rel_attn_window_size=params.get("rel_attn_window_size", 4),
            name=name,
        )
    if kind in ("residual_conv_bn", "residual_conv_bn_encoder", "residual_conv_bn_decoder"):
        # SpeedySpeech: dedicated encoder/decoder wrappers (ref
        # feed_forward/encoder.py:41, decoder.py:125)
        cls = ResidualConv1dBNEncoder if name == "encoder" else ResidualConv1dBNDecoder
        default_dil = (
            (1, 2, 4, 1, 2, 4, 1, 2, 4, 1, 2, 4, 1) if name == "encoder"
            else tuple(4 * [1, 2, 4, 8] + [1])
        )
        return cls(
            hidden_channels=params.get("hidden_channels", channels),
            out_channels=out_channels,
            kernel_size=params.get("kernel_size", 4),
            dilations=tuple(params.get("dilations", default_dil)),
            num_conv_blocks=params.get("num_conv_blocks", 2),
            norm_type=norm_type,
            name=name,
        )
    if kind == "wavenet":
        return WaveNetDecoder(
            hidden_channels=params.get("hidden_channels", channels),
            out_channels=out_channels,
            kernel_size=params.get("kernel_size", 3),
            dilation_rate=params.get("dilation_rate", 1),
            num_layers=params.get("num_layers", 10),
            name=name,
        )
    raise ValueError(f" [!] Unknown encoder/decoder type {kind}")


class ForwardTTSNet(nn.Module):
    args: tuple  # frozen ForwardTTSArgs items

    @property
    def a(self):
        return dict(self.args)

    def setup(self):
        a = self.a
        self.emb = nn.Embed(a["num_chars"], a["hidden_channels"])
        nt = a.get("norm_type", None) or "batch"
        self.encoder = _build_coder(a["encoder_type"], a["encoder_params"], a["hidden_channels"], a["hidden_channels"], "encoder", norm_type=nt)
        self.decoder = _build_coder(a["decoder_type"], a["decoder_params"], a["hidden_channels"], a["hidden_channels"], "decoder", norm_type=nt)
        self.proj = nn.Dense(a["out_channels"])
        if a["positional_encoding"]:
            self.pos_encoder = PositionalEncoding(a["hidden_channels"], use_scale=a["poisitonal_encoding_use_scale"])
        self.duration_predictor = DurationPredictor(
            hidden_channels=a["duration_predictor_hidden_channels"],
            kernel_size=a["duration_predictor_kernel_size"],
            dropout_p=a["duration_predictor_dropout_p"],
        )
        if a["use_pitch"]:
            self.pitch_predictor = DurationPredictor(
                hidden_channels=a["pitch_predictor_hidden_channels"],
                kernel_size=a["pitch_predictor_kernel_size"],
                dropout_p=a["pitch_predictor_dropout_p"],
            )
            self.pitch_emb = Conv1d(a["hidden_channels"], a["pitch_embedding_kernel_size"])
        if a["use_energy"]:
            self.energy_predictor = DurationPredictor(
                hidden_channels=a["energy_predictor_hidden_channels"],
                kernel_size=a["energy_predictor_kernel_size"],
                dropout_p=a["energy_predictor_dropout_p"],
            )
            self.energy_emb = Conv1d(a["hidden_channels"], a["energy_embedding_kernel_size"])
        if a["use_aligner"]:
            self.aligner = AlignmentNetwork(
                in_query_channels=a["out_channels"], in_key_channels=a["hidden_channels"]
            )
        if a["use_speaker_embedding"] and a["num_speakers"] > 1:
            self.emb_g = nn.Embed(a["num_speakers"], a["hidden_channels"])

    def _speaker(self, speaker_ids, d_vectors):
        if speaker_ids is not None and self.a["use_speaker_embedding"]:
            return self.emb_g(speaker_ids)[:, None, :]
        if d_vectors is not None:
            return d_vectors[:, None, :]
        return None

    def _encode(self, x, x_lengths, g, train):
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(jnp.float32)[:, :, None]
        h = self.emb(x)
        if g is not None:
            h = h + g
        o_en = self.encoder(h * x_mask, x_mask, train=train)
        return o_en, x_mask

    def _decode(self, o_en, dr, x_mask, y_lengths, y_max, g, train):
        y_mask = sequence_mask(y_lengths, y_max).astype(jnp.float32)[:, :, None]
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)
        attn = generate_path(dr, attn_mask)  # [B, T_en, T_de]
        o_ex = jnp.einsum("bet,bec->btc", attn, o_en)
        if self.a["positional_encoding"]:
            o_ex = self.pos_encoder(o_ex, y_mask)
        o_de = self.decoder(o_ex, y_mask, train=train)
        return self.proj(o_de) * y_mask, attn, y_mask

    def __call__(
        self,
        x,
        x_lengths,
        y,
        y_lengths,
        dr=None,
        pitch=None,
        energy=None,
        attn_prior=None,
        speaker_ids=None,
        d_vectors=None,
        train: bool = True,
    ) -> Dict:
        a = self.a
        g = self._speaker(speaker_ids, d_vectors)
        o_en, x_mask = self._encode(x, x_lengths, g, train)
        y_max = y.shape[1]
        y_mask1 = sequence_mask(y_lengths, y_max).astype(jnp.float32)[:, :, None]

        # --- alignment --------------------------------------------------------
        alignment_soft = alignment_logprob = alignment_mas = None
        if a["use_aligner"]:
            attn_soft, attn_logp = self.aligner(y, o_en, mask=x_mask[:, :, 0], attn_prior=attn_prior)
            # MAS over [B, T_en, T_de] log-probs
            attn_mask = x_mask * jnp.swapaxes(y_mask1, 1, 2)
            logp = jnp.swapaxes(jnp.where(jnp.isfinite(attn_logp), attn_logp, -1e9), 1, 2)
            alignment_mas = maximum_path_jax(logp, attn_mask)
            dr = jnp.sum(alignment_mas, axis=-1)  # [B, T_en]
            alignment_soft = attn_soft  # [B, T_de, T_en]
            alignment_logprob = attn_logp[:, None]  # [B,1,T_de,T_en]
        dr = jnp.clip(dr, 0, a["max_duration"])
        o_dr_log_target = jnp.log(dr + 1)

        # --- duration predictor ----------------------------------------------
        dp_in = jax.lax.stop_gradient(o_en) if a["detach_duration_predictor"] else o_en
        o_dr_log = self.duration_predictor(dp_in, x_mask, train=train)[:, :, 0]

        # --- pitch / energy ---------------------------------------------------
        o_pitch = avg_pitch = None
        if a["use_pitch"]:
            o_pitch = self.pitch_predictor(o_en, x_mask, train=train)[:, :, 0]
            avg_pitch = average_over_durations(pitch[:, None, :], dr.astype(jnp.int32))[:, 0]  # [B, T_en]
            o_en = o_en + self.pitch_emb(avg_pitch[:, :, None])
        o_energy = avg_energy = None
        if a["use_energy"]:
            o_energy = self.energy_predictor(o_en, x_mask, train=train)[:, :, 0]
            avg_energy = average_over_durations(energy[:, None, :], dr.astype(jnp.int32))[:, 0]
            o_en = o_en + self.energy_emb(avg_energy[:, :, None])

        # --- decode -----------------------------------------------------------
        o_de, attn, y_mask = self._decode(o_en, dr, x_mask, y_lengths, y_max, g, train)
        return {
            "model_outputs": o_de,
            "durations_log": o_dr_log,
            "durations_log_target": o_dr_log_target,
            "durations": dr,
            "pitch_avg": o_pitch,
            "pitch_avg_gt": avg_pitch,
            "energy_avg": o_energy,
            "energy_avg_gt": avg_energy,
            "alignments": jnp.swapaxes(attn, 1, 2),
            "alignment_soft": alignment_soft,
            "alignment_mas": alignment_mas,
            "alignment_logprob": alignment_logprob,
        }

    def inference(self, x, x_lengths, y_max_length: int, speaker_ids=None, d_vectors=None) -> Dict:
        a = self.a
        g = self._speaker(speaker_ids, d_vectors)
        o_en, x_mask = self._encode(x, x_lengths, g, False)
        o_dr_log = self.duration_predictor(o_en, x_mask, train=False)[:, :, 0]
        # ref forward_tts.py:353 format_durations: linear scale → length_scale
        # → floor at 1 → round (padded positions re-masked on our side so
        # bucketed batches don't grow)
        o_dr = (jnp.exp(o_dr_log) - 1.0) * a["length_scale"]
        o_dr = jnp.round(jnp.where(o_dr < 1.0, 1.0, o_dr)) * x_mask[:, :, 0]
        if a["use_pitch"]:
            o_pitch = self.pitch_predictor(o_en, x_mask, train=False)
            o_en = o_en + self.pitch_emb(o_pitch)
        if a["use_energy"]:
            o_energy = self.energy_predictor(o_en, x_mask, train=False)
            o_en = o_en + self.energy_emb(o_energy)
        y_lengths = jnp.minimum(jnp.sum(o_dr, axis=1), y_max_length).astype(jnp.int32)
        o_de, attn, y_mask = self._decode(o_en, o_dr, x_mask, y_lengths, y_max_length, g, False)
        return {
            "model_outputs": o_de,
            "alignments": jnp.swapaxes(attn, 1, 2),
            "durations_log": o_dr_log,
            "y_lengths": y_lengths,
        }


class ForwardTTS(BaseTTSModel):
    def __init__(self, config, ap=None, tokenizer=None, speaker_manager=None):
        super().__init__(config, ap, tokenizer, speaker_manager)
        args = config.model_args
        if tokenizer is not None and tokenizer.characters is not None:
            args.num_chars = tokenizer.characters.num_chars
        if args.num_chars is None:
            args.num_chars = 130
        if speaker_manager is not None and args.use_speaker_embedding:
            args.num_speakers = max(args.num_speakers, speaker_manager.num_speakers)
        self.args = args
        self.net = ForwardTTSNet(args=tuple(sorted(args.to_dict().items())))
        self.binary_loss_warmup_epochs = getattr(config, "binary_loss_warmup_epochs", 150)
        self._infer_cache = {}

    # ------------------------------------------------------------------ pure
    def convert_torch_state_dict(self, state_dict):
        """Reference `ForwardTTS` torch weights → our flax tree (parity-tested
        in tests/test_torch_parity_forward.py). The reference's sinusoidal
        `pos_encoder.pe` is a buffer (recomputed on our side); our learnable
        `pos_encoder/scale` keeps its init value."""
        from tpu_tts.models.forward_convert import convert_forward_tts_torch_state_dict

        if (
            "residual_conv_bn" in (self.args.encoder_type, self.args.decoder_type)
            and self.args.norm_type != "frozen_batch"
        ):  # SpeedySpeech checkpoints carry BatchNorm statistics
            self.args.norm_type = "frozen_batch"
            self.net = ForwardTTSNet(args=tuple(sorted(self.args.to_dict().items())))
            self.params = None
            self._infer_cache = {}
        enc_params = self.args.encoder_params or {}
        num_heads = int(enc_params.get("num_heads", 2))
        params = convert_forward_tts_torch_state_dict(state_dict, num_heads=num_heads)
        if self.params is None:
            self.init_params(jax.random.PRNGKey(0))

        def fill(template, got):
            for k, v in template.items():
                if isinstance(v, dict):
                    fill(v, got.setdefault(k, {}))
                elif k not in got:
                    got[k] = np.asarray(v)

        fill(self.params, params)
        return params

    def init_params(self, rng):
        a = self.args
        B, T_en, T_de = 2, 8, 16
        kwargs = {}
        if a.use_speaker_embedding and a.num_speakers > 1:
            kwargs["speaker_ids"] = jnp.zeros((B,), dtype=jnp.int32)
        elif a.use_d_vector_file:
            kwargs["d_vectors"] = jnp.zeros((B, a.d_vector_dim or 512))
        if a.use_pitch:
            kwargs["pitch"] = jnp.zeros((B, T_de))
        if a.use_energy:
            kwargs["energy"] = jnp.zeros((B, T_de))
        variables = self.net.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 7)},
            jnp.zeros((B, T_en), dtype=jnp.int32),
            jnp.full((B,), T_en, dtype=jnp.int32),
            jnp.zeros((B, T_de, a.out_channels)),
            jnp.full((B,), T_de, dtype=jnp.int32),
            dr=None if a.use_aligner else jnp.ones((B, T_en)),
            **kwargs,
        )
        self.params = variables["params"]
        self.model_state = {k: v for k, v in variables.items() if k != "params"}
        return self.params

    def loss_fn(self, params, batch: Dict, rng, optimizer_idx: int = 0, model_state=None):
        a = self.args
        c = self.config
        outputs, new_state = self.net.apply(
            {"params": params, **(model_state or {})},
            batch["text_input"],
            batch["text_lengths"],
            batch["mel_input"],
            batch["mel_lengths"],
            dr=batch.get("durations"),
            pitch=batch.get("pitch") if a.use_pitch else None,
            energy=batch.get("energy") if a.use_energy else None,
            attn_prior=batch.get("attn_priors"),
            speaker_ids=batch.get("speaker_ids"),
            d_vectors=batch.get("d_vectors"),
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        if not jax.tree_util.tree_leaves(new_state):
            new_state = model_state or {}
        losses = {}
        loss = 0.0
        spec_fn = masked_mse_loss if getattr(c, "spec_loss_type", "mse") == "mse" else masked_l1_loss
        l_spec = spec_fn(outputs["model_outputs"], batch["mel_input"], batch["mel_lengths"])
        loss += c.spec_loss_alpha * l_spec
        losses["loss_spec"] = l_spec
        if getattr(c, "use_ssim_loss", False):
            l_ssim = ssim_loss(outputs["model_outputs"], batch["mel_input"], batch["mel_lengths"])
            loss += c.ssim_loss_alpha * l_ssim
            losses["loss_ssim"] = l_ssim
        l_dur = masked_mse_loss(
            outputs["durations_log"][:, :, None],
            jax.lax.stop_gradient(outputs["durations_log_target"])[:, :, None],
            batch["text_lengths"],
        )
        loss += c.dur_loss_alpha * l_dur
        losses["loss_dur"] = l_dur
        if a.use_pitch:
            l_pitch = masked_mse_loss(
                outputs["pitch_avg"][:, :, None],
                jax.lax.stop_gradient(outputs["pitch_avg_gt"])[:, :, None],
                batch["text_lengths"],
            )
            loss += c.pitch_loss_alpha * l_pitch
            losses["loss_pitch"] = l_pitch
        if a.use_energy:
            l_energy = masked_mse_loss(
                outputs["energy_avg"][:, :, None],
                jax.lax.stop_gradient(outputs["energy_avg_gt"])[:, :, None],
                batch["text_lengths"],
            )
            loss += c.energy_loss_alpha * l_energy
            losses["loss_energy"] = l_energy
        if a.use_aligner and outputs["alignment_logprob"] is not None:
            l_align = forward_sum_loss(
                outputs["alignment_logprob"], batch["text_lengths"], batch["mel_lengths"]
            )
            loss += c.aligner_loss_alpha * l_align
            losses["loss_aligner"] = l_align
            if getattr(c, "binary_align_loss_alpha", 0) > 0:
                hard = jnp.swapaxes(outputs["alignment_mas"], 1, 2)  # [B, T_de, T_en]
                l_bin = binary_alignment_loss(hard, outputs["alignment_soft"])
                loss += c.binary_align_loss_alpha * l_bin
                losses["loss_binary_alignment"] = l_bin
        losses["loss"] = loss
        if model_state is None:
            return loss, losses
        return loss, (losses, new_state)

    # ------------------------------------------------------------- inference
    def inference(self, x: np.ndarray, aux_input=None, bucket: int = 128) -> Dict:
        aux_input = aux_input or {}
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[None]
        x_lengths = aux_input.get("x_lengths")
        if x_lengths is None:
            x_lengths = jnp.full((x.shape[0],), x.shape[1], dtype=jnp.int32)
        est = int(x.shape[1]) * 16
        y_max = max(bucket, int(np.ceil(est / bucket)) * bucket)
        key = (x.shape, int(y_max))
        if key not in self._infer_cache:
            self._infer_cache[key] = jax.jit(
                lambda p, st, xi, xli, sid, dvec: self.net.apply(
                    {"params": p, **st}, xi, xli, y_max, speaker_ids=sid, d_vectors=dvec,
                    method=ForwardTTSNet.inference,
                )
            )
        return self._infer_cache[key](
            self.params, self.model_state or {}, x, jnp.asarray(x_lengths),
            aux_input.get("speaker_ids"), aux_input.get("d_vectors")
        )

    @staticmethod
    def init_from_config(config, samples=None):
        from tpu_tts.audio import AudioProcessor
        from tpu_tts.managers import SpeakerManager
        from tpu_tts.text.tokenizer import TTSTokenizer

        ap = AudioProcessor.init_from_config(config, verbose=False)
        tokenizer, new_config = TTSTokenizer.init_from_config(config)
        speaker_manager = SpeakerManager.init_from_config(new_config, samples)
        return ForwardTTS(new_config, ap, tokenizer, speaker_manager)
