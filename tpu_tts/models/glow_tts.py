"""Glow-TTS: transformer encoder → normalizing-flow decoder with MAS.

TPU-native re-design of /root/reference/TTS/tts/models/glow_tts.py (forward
:193-249, inference:342, train_step:377) and layers/glow_tts/encoder.py:15.
Everything — including MAS — runs on-device inside one jitted function
(the reference ships MAS to CPU each step, helpers.py:187). Inference uses
bucketed static mel lengths to avoid retrace storms.

Layout: channels-last `[B, T, C]`; model I/O mirrors the reference's dict
surface for parity tests.
"""

import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.layers.common import (
    DurationPredictor,
    GatedConvBlock,
    ResidualConv1dLayerNormBlock,
    TimeDepthSeparableConvBlock,
)
from tpu_tts.layers.feed_forward import ResidualConv1dBNBlock
from tpu_tts.layers.glow import GlowDecoder
from tpu_tts.layers.losses import glow_tts_loss
from tpu_tts.layers.transformer import RelativePositionTransformer
from tpu_tts.models.base_tts import BaseTTSModel
from tpu_tts.ops.helpers import generate_path, sequence_mask
from tpu_tts.ops.mas import maximum_path_jax


class GlowTTSEncoder(nn.Module):
    """Text encoder: emb → prenet → rel-pos transformer → (mean, log-scale,
    log-durations) (ref glow_tts/encoder.py:15)."""

    num_chars: int
    out_channels: int
    hidden_channels: int
    hidden_channels_dp: int
    encoder_type: str = "rel_pos_transformer"
    encoder_params: Optional[dict] = None
    dropout_p_dp: float = 0.1
    mean_only: bool = False
    use_prenet: bool = True
    c_in_channels: int = 0
    norm_type: str = "batch"  # BN-based encoder variants; "frozen_batch" on ingest

    @nn.compact
    def __call__(self, x, x_lengths, g=None, train: bool = False):
        params = dict(self.encoder_params or {})
        params.pop("input_length", None)
        emb = nn.Embed(
            self.num_chars,
            self.hidden_channels,
            embedding_init=nn.initializers.normal(self.hidden_channels**-0.5),
            name="emb",
        )
        x = emb(x) * math.sqrt(self.hidden_channels)  # [B, T, C]
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(x.dtype)[:, :, None]
        enc_type = self.encoder_type.lower()
        # prenet per encoder type (ref glow_tts/encoder.py:106-131; gated_conv
        # has none even with use_prenet=True)
        if self.use_prenet and enc_type in ("rel_pos_transformer", "time_depth_separable"):
            x = ResidualConv1dLayerNormBlock(
                hidden_channels=self.hidden_channels,
                out_channels=self.hidden_channels,
                kernel_size=5,
                num_layers=3,
                dropout_p=0.5,
                name="prenet",
            )(x, x_mask, train=train)
        elif self.use_prenet and enc_type == "residual_conv_bn":
            # ref encoder.py:118: 1×1 conv + ReLU (the reference calls it with
            # (x, x_mask), which nn.Sequential can't take — we apply it to the
            # masked input, the intended semantics)
            x = nn.relu(nn.Dense(self.hidden_channels, name="prenet")(x * x_mask))
        if enc_type == "rel_pos_transformer":
            x = RelativePositionTransformer(
                out_channels=self.hidden_channels,
                hidden_channels=self.hidden_channels,
                hidden_channels_ffn=params.get("hidden_channels_ffn", 768),
                num_heads=params.get("num_heads", 2),
                num_layers=params.get("num_layers", 6),
                kernel_size=params.get("kernel_size", 3),
                dropout_p=params.get("dropout_p", 0.1),
                rel_attn_window_size=params.get("rel_attn_window_size", 4),
                name="encoder",
            )(x, x_mask, train=train)
        elif enc_type == "gated_conv":
            x = GatedConvBlock(
                channels=self.hidden_channels,
                kernel_size=params.get("kernel_size", 5),
                dropout_p=params.get("dropout_p", 0.1),
                num_layers=params.get("num_layers", 9),
                name="encoder",
            )(x, x_mask, train=train)
        elif enc_type == "residual_conv_bn":
            x = ResidualConv1dBNBlock(
                hidden_channels=self.hidden_channels,
                out_channels=self.hidden_channels,
                kernel_size=params.get("kernel_size", 4),
                dilations=tuple(params.get("dilations", (1, 2, 4, 1, 2, 4, 1, 2, 4, 1, 2, 4, 1))),
                num_conv_blocks=params.get("num_conv_blocks", 2),
                norm_type=self.norm_type,
                name="encoder",
            )(x, x_mask, train=train)
            # ref encoder.py:120: 1×1 conv → BatchNorm postnet
            from tpu_tts.layers.tacotron import _apply_norm

            x = nn.Dense(self.hidden_channels, name="postnet_conv")(x)
            x = _apply_norm(self.norm_type, self.hidden_channels, "postnet_norm", x, train) * x_mask
        elif enc_type == "time_depth_separable":
            x = TimeDepthSeparableConvBlock(
                hid_channels=self.hidden_channels,
                out_channels=self.hidden_channels,
                num_layers=params.get("num_layers", 9),
                kernel_size=params.get("kernel_size", 5),
                norm_type=self.norm_type,
                name="encoder",
            )(x, x_mask, train=train)
        else:
            raise ValueError(f" [!] Unknown encoder type {self.encoder_type}")

        # duration predictor input: detached features (+ broadcast speaker)
        x_dp = jax.lax.stop_gradient(x)
        if g is not None:
            g_exp = jnp.broadcast_to(g, (x.shape[0], x.shape[1], g.shape[-1]))
            x_dp = jnp.concatenate([x_dp, g_exp], axis=-1)

        x_m = nn.Dense(self.out_channels, name="proj_m")(x) * x_mask
        if not self.mean_only:
            x_logs = nn.Dense(self.out_channels, name="proj_s")(x) * x_mask
        else:
            x_logs = jnp.zeros_like(x_m)
        logw = DurationPredictor(
            hidden_channels=self.hidden_channels_dp,
            kernel_size=3,
            dropout_p=self.dropout_p_dp,
            name="duration_predictor",
        )(x_dp, x_mask, train=train)
        return x_m, x_logs, logw, x_mask


class GlowTTSNet(nn.Module):
    """Full Glow-TTS flax module with forward / inference methods."""

    num_chars: int
    out_channels: int = 80
    hidden_channels_enc: int = 192
    hidden_channels_dec: int = 192
    hidden_channels_dp: int = 256
    encoder_type: str = "rel_pos_transformer"
    encoder_params: Optional[tuple] = None  # tuple of items for hashability
    use_encoder_prenet: bool = True
    dropout_p_dp: float = 0.1
    dropout_p_dec: float = 0.05
    mean_only: bool = True
    kernel_size_dec: int = 5
    dilation_rate: int = 1
    num_flow_blocks_dec: int = 12
    num_block_layers: int = 4
    num_splits: int = 4
    num_squeeze: int = 2
    sigmoid_scale: bool = False
    c_in_channels: int = 0
    num_speakers: int = 0
    use_speaker_embedding: bool = False
    inference_noise_scale: float = 0.33
    length_scale: float = 1.0
    norm_type: str = "batch"  # BN-based encoder variants; "frozen_batch" on ingest

    def setup(self):
        enc_params = dict(self.encoder_params) if self.encoder_params else None
        self.encoder = GlowTTSEncoder(
            num_chars=self.num_chars,
            out_channels=self.out_channels,
            hidden_channels=self.hidden_channels_enc,
            hidden_channels_dp=self.hidden_channels_dp,
            encoder_type=self.encoder_type,
            encoder_params=enc_params,
            dropout_p_dp=self.dropout_p_dp,
            mean_only=self.mean_only,
            use_prenet=self.use_encoder_prenet,
            c_in_channels=self.c_in_channels,
            norm_type=self.norm_type,
        )
        self.decoder = GlowDecoder(
            in_channels=self.out_channels,
            hidden_channels=self.hidden_channels_dec,
            kernel_size=self.kernel_size_dec,
            dilation_rate=self.dilation_rate,
            num_flow_blocks=self.num_flow_blocks_dec,
            num_coupling_layers=self.num_block_layers,
            dropout_p=self.dropout_p_dec,
            num_splits=self.num_splits,
            num_squeeze=self.num_squeeze,
            sigmoid_scale=self.sigmoid_scale,
            c_in_channels=self.c_in_channels,
        )
        if self.use_speaker_embedding and self.num_speakers > 1:
            self.emb_g = nn.Embed(
                self.num_speakers,
                self.hidden_channels_enc,
                embedding_init=nn.initializers.uniform(0.2),
            )

    def _speaker_embedding(self, speaker_ids=None, d_vectors=None):
        if speaker_ids is not None and self.use_speaker_embedding:
            g = self.emb_g(speaker_ids)  # [B, C]
            g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
            return g[:, None, :]  # [B, 1, C]
        if d_vectors is not None:
            g = d_vectors / jnp.maximum(jnp.linalg.norm(d_vectors, axis=-1, keepdims=True), 1e-12)
            return g[:, None, :]
        return None

    @staticmethod
    def compute_outputs(attn, o_mean, o_log_scale, x_mask):
        """attn `[B, T_en, T_de]`, o_* `[B, T_en, C]` → y_* `[B, T_de, C]`
        (ref glow_tts.py:138)."""
        y_mean = jnp.einsum("bet,bec->btc", attn, o_mean, preferred_element_type=jnp.float32)
        y_log_scale = jnp.einsum("bet,bec->btc", attn, o_log_scale, preferred_element_type=jnp.float32)
        o_attn_dur = jnp.log(1 + jnp.sum(attn, axis=-1, keepdims=True)) * x_mask
        return y_mean, y_log_scale, o_attn_dur

    def __call__(self, x, x_lengths, y, y_lengths, speaker_ids=None, d_vectors=None, train: bool = False):
        """Training forward (ref glow_tts.py:193). y: `[B, T_de, C_mel]`."""
        g = self._speaker_embedding(speaker_ids, d_vectors)
        o_mean, o_log_scale, o_dur_log, x_mask = self.encoder(x, x_lengths, g=g, train=train)
        # squeeze-compatible length trimming
        y_max_length = (y.shape[1] // self.num_squeeze) * self.num_squeeze
        y = y[:, :y_max_length]
        y_lengths = (y_lengths // self.num_squeeze) * self.num_squeeze
        y_mask = sequence_mask(y_lengths, y_max_length).astype(x_mask.dtype)[:, :, None]
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)  # [B, T_en, T_de]
        z, logdet = self.decoder(y, y_mask, g=g, reverse=False, train=train)
        # MAS on the Gaussian prior log-likelihood, fully on-device
        o_scale = jnp.exp(-2 * o_log_scale)
        logp1 = jnp.sum(-0.5 * math.log(2 * math.pi) - o_log_scale, axis=-1, keepdims=True)  # [B,T_en,1]
        logp2 = jnp.einsum("bec,btc->bet", o_scale, -0.5 * (z**2))
        logp3 = jnp.einsum("bec,btc->bet", o_mean * o_scale, z)
        logp4 = jnp.sum(-0.5 * (o_mean**2) * o_scale, axis=-1, keepdims=True)
        logp = logp1 + logp2 + logp3 + logp4  # [B, T_en, T_de]
        attn = maximum_path_jax(logp, attn_mask)
        y_mean, y_log_scale, o_attn_dur = self.compute_outputs(attn, o_mean, o_log_scale, x_mask)
        return {
            "z": z,
            "logdet": logdet,
            "y_mean": y_mean,
            "y_log_scale": y_log_scale,
            "alignments": jnp.swapaxes(attn, 1, 2),
            "durations_log": o_dur_log,
            "total_durations_log": o_attn_dur,
            "y_lengths": y_lengths,
        }

    def inference(self, x, x_lengths, y_max_length: int, speaker_ids=None, d_vectors=None, noise_rng=None):
        """Inference with *static* `y_max_length` (bucketed by the caller) —
        the dynamic-length reference path (glow_tts.py:342) made static for
        XLA. Returns mel `[B, y_max_length, C]` and true `y_lengths`."""
        g = self._speaker_embedding(speaker_ids, d_vectors)
        o_mean, o_log_scale, o_dur_log, x_mask = self.encoder(x, x_lengths, g=g, train=False)
        w = (jnp.exp(o_dur_log) - 1) * x_mask * self.length_scale
        w_ceil = jnp.maximum(jnp.ceil(w), 1.0) * x_mask
        y_lengths = jnp.maximum(jnp.sum(w_ceil, axis=(1, 2)), 1).astype(jnp.int32)
        y_lengths = jnp.minimum(y_lengths, y_max_length)
        y_lengths = (y_lengths // self.num_squeeze) * self.num_squeeze
        y_mask = sequence_mask(y_lengths, y_max_length).astype(x_mask.dtype)[:, :, None]
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)
        attn = generate_path(w_ceil[:, :, 0], attn_mask)
        y_mean, y_log_scale, o_attn_dur = self.compute_outputs(attn, o_mean, o_log_scale, x_mask)
        if noise_rng is not None and self.inference_noise_scale > 0:
            noise = jax.random.normal(noise_rng, y_mean.shape) * self.inference_noise_scale
        else:
            noise = 0.0
        z = (y_mean + jnp.exp(y_log_scale) * noise) * y_mask
        y, _ = self.decoder(z, y_mask, g=g, reverse=True)
        return {
            "model_outputs": y,
            "alignments": jnp.swapaxes(attn, 1, 2),
            "durations_log": o_dur_log,
            "y_lengths": y_lengths,
        }

    def decoder_inference(self, y, y_lengths, speaker_ids=None, d_vectors=None):
        """mel → z → mel round trip (ref glow_tts.py:318)."""
        g = self._speaker_embedding(speaker_ids, d_vectors)
        y_mask = sequence_mask(y_lengths, y.shape[1]).astype(y.dtype)[:, :, None]
        z, logdet = self.decoder(y, y_mask, g=g, reverse=False)
        y_out, _ = self.decoder(z, y_mask, g=g, reverse=True)
        return {"model_outputs": y_out, "logdet": logdet}


class GlowTTS(BaseTTSModel):
    """Host-side orchestrator implementing the trainer contract."""

    def __init__(self, config, ap=None, tokenizer=None, speaker_manager=None):
        super().__init__(config, ap, tokenizer, speaker_manager)
        self.num_chars_ = self._compute_num_chars(config, tokenizer)
        use_spk = bool(config.use_speaker_embedding) and self.num_speakers > 1
        c_in = 0
        if use_spk:
            c_in = config.hidden_channels_enc
        elif config.use_d_vector_file:
            c_in = config.d_vector_dim or 512
        self.net = GlowTTSNet(
            num_chars=self.num_chars_,
            out_channels=config.out_channels,
            hidden_channels_enc=config.hidden_channels_enc,
            hidden_channels_dec=config.hidden_channels_dec,
            hidden_channels_dp=config.hidden_channels_dp,
            encoder_type=config.encoder_type,
            encoder_params=tuple(sorted((config.encoder_params or {}).items())),
            use_encoder_prenet=config.use_encoder_prenet,
            dropout_p_dp=config.dropout_p_dp,
            dropout_p_dec=config.dropout_p_dec,
            mean_only=config.mean_only,
            kernel_size_dec=config.kernel_size_dec,
            dilation_rate=config.dilation_rate,
            num_flow_blocks_dec=config.num_flow_blocks_dec,
            num_block_layers=config.num_block_layers,
            num_splits=config.num_splits,
            num_squeeze=config.num_squeeze,
            sigmoid_scale=config.sigmoid_scale,
            c_in_channels=c_in,
            num_speakers=self.num_speakers,
            use_speaker_embedding=use_spk,
            inference_noise_scale=config.inference_noise_scale,
            length_scale=config.length_scale,
            norm_type=getattr(config, "norm_type", None) or "batch",
        )
        self._infer_cache = {}

    @staticmethod
    def _compute_num_chars(config, tokenizer):
        if tokenizer is not None and tokenizer.characters is not None:
            return tokenizer.characters.num_chars
        if config.num_chars:
            return config.num_chars
        return 130

    # ------------------------------------------------------- torch ingest
    def convert_torch_state_dict(self, state_dict):
        """Reference `GlowTTS` torch weights → our flax tree (parity-tested in
        tests/test_torch_parity_glow.py). Reference checkpoints trained
        without rel-attention windows lack `emb_rel_*`; those leaves are
        zero-filled (zero rel contribution == no rel attention)."""
        from tpu_tts.models.glow_convert import convert_glow_tts_torch_state_dict

        if (
            self.net.encoder_type.lower() in ("residual_conv_bn", "time_depth_separable")
            and self.net.norm_type != "frozen_batch"
        ):
            # reference BN encoders → running stats folded into params
            self.net = self.net.clone(norm_type="frozen_batch")
            self._infer_cache = {}
        params = convert_glow_tts_torch_state_dict(
            state_dict, encoder_type=self.net.encoder_type.lower()
        )
        if self.params is None:
            self.init_params(jax.random.PRNGKey(0))

        def fill(template, got, path=""):
            for k, v in template.items():
                if isinstance(v, dict):
                    fill(v, got.setdefault(k, {}), f"{path}/{k}")
                elif k not in got:
                    if "emb_rel" in k:
                        got[k] = np.zeros(v.shape, dtype=np.float32)
                    else:
                        raise KeyError(f"torch checkpoint missing param {path}/{k}")

        fill(jax.tree.map(lambda a: a, self.params), params)
        return params

    # ----------------------------------------------------------------- pure
    def init_params(self, rng: jax.Array):
        B, T_en, T_de = 2, 16, 32
        x = jnp.zeros((B, T_en), dtype=jnp.int32)
        xl = jnp.array([T_en, T_en - 2], dtype=jnp.int32)
        y = jnp.zeros((B, T_de, self.config.out_channels))
        yl = jnp.array([T_de, T_de - 4], dtype=jnp.int32)
        kwargs = {}
        if self.net.use_speaker_embedding:
            kwargs["speaker_ids"] = jnp.zeros((B,), dtype=jnp.int32)
        elif self.config.use_d_vector_file:
            kwargs["d_vectors"] = jnp.zeros((B, self.config.d_vector_dim or 512))
        variables = self.net.init(rng, x, xl, y, yl, **kwargs)
        self.params = variables["params"]
        self.model_state = {k: v for k, v in variables.items() if k != "params"}
        return self.params

    def loss_fn(self, params, batch: Dict, rng: jax.Array, optimizer_idx: int = 0, model_state=None):
        outputs, new_state = self.net.apply(
            {"params": params, **(model_state or {})},
            batch["text_input"],
            batch["text_lengths"],
            batch["mel_input"],
            batch["mel_lengths"],
            speaker_ids=batch.get("speaker_ids"),
            d_vectors=batch.get("d_vectors"),
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        if not jax.tree_util.tree_leaves(new_state):
            new_state = model_state or {}
        losses = glow_tts_loss(
            outputs["z"],
            outputs["y_mean"],
            outputs["y_log_scale"],
            outputs["logdet"],
            outputs["y_lengths"],
            outputs["durations_log"],
            outputs["total_durations_log"],
            batch["text_lengths"],
        )
        if model_state is None:
            return losses["loss"], losses
        return losses["loss"], (losses, new_state)

    # ------------------------------------------------------------- inference
    def inference(self, x: np.ndarray, aux_input=None, bucket: int = 128) -> Dict:
        """Host entry: buckets the max mel length (static shapes per bucket,
        compiled once each) then runs the jitted net."""
        aux_input = aux_input or {}
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[None]
        x_lengths = aux_input.get("x_lengths")
        if x_lengths is None:
            x_lengths = jnp.full((x.shape[0],), x.shape[1], dtype=jnp.int32)
        # conservative upper bound: ~24 frames per input token
        est = int(x.shape[1]) * 24
        y_max = max(bucket, int(np.ceil(est / bucket)) * bucket)
        key = (x.shape, int(y_max))
        if key not in self._infer_cache:
            self._infer_cache[key] = jax.jit(
                lambda p, st, xi, xli, sid, dvec, nrng: self.net.apply(
                    {"params": p, **st},
                    xi,
                    xli,
                    y_max,
                    speaker_ids=sid,
                    d_vectors=dvec,
                    noise_rng=nrng,
                    method=GlowTTSNet.inference,
                )
            )
        out = self._infer_cache[key](
            self.params,
            self.model_state or {},
            x,
            jnp.asarray(x_lengths),
            aux_input.get("speaker_ids"),
            aux_input.get("d_vectors"),
            jax.random.PRNGKey(int(aux_input.get("seed", 0))),
        )
        return out

    # -------------------------------------------------------------- factory
    @staticmethod
    def init_from_config(config, samples=None):
        from tpu_tts.audio import AudioProcessor
        from tpu_tts.text.tokenizer import TTSTokenizer
        from tpu_tts.managers import SpeakerManager

        ap = AudioProcessor.init_from_config(config, verbose=False)
        tokenizer, new_config = TTSTokenizer.init_from_config(config)
        speaker_manager = SpeakerManager.init_from_config(new_config, samples)
        return GlowTTS(new_config, ap, tokenizer, speaker_manager)
