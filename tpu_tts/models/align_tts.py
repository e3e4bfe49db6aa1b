"""AlignTTS: MDN-based alignment with multi-phase training.

TPU-native re-design of /root/reference/TTS/tts/models/align_tts.py (448) +
layers/align_tts/mdn.py + AlignTTSLoss (losses.py:564). The MDN forward
algorithm (losses.py:541 MDNLoss) runs as a `lax.scan` over mel frames; hard
durations come from on-device MAS over the MDN log-likelihood. Training
phases (0: MDN only, 1: +decoder via MAS durations, 2: duration predictor,
3: joint) are switched by `global_step` inside the jit.
"""

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.config.base import Coqpit
from tpu_tts.layers.common import DurationPredictor
from tpu_tts.layers.feed_forward import FFTransformerBlock, PositionalEncoding, ResidualConv1dBNBlock
from tpu_tts.layers.losses import masked_mse_loss, ssim_loss
from tpu_tts.models.base_tts import BaseTTSModel
from tpu_tts.ops.helpers import generate_path, sequence_mask
from tpu_tts.ops.mas import maximum_path_jax


@dataclass
class AlignTTSArgs(Coqpit):
    num_chars: Optional[int] = None
    out_channels: int = 80
    hidden_channels: int = 256
    hidden_channels_dp: int = 256
    encoder_type: str = "fftransformer"
    encoder_params: dict = field(
        default_factory=lambda: {"hidden_channels_ffn": 1024, "num_heads": 2, "num_layers": 6, "dropout_p": 0.1}
    )
    decoder_type: str = "fftransformer"
    decoder_params: dict = field(
        default_factory=lambda: {"hidden_channels_ffn": 1024, "num_heads": 2, "num_layers": 6, "dropout_p": 0.1}
    )
    length_scale: float = 1.0
    num_speakers: int = 0
    use_speaker_embedding: bool = False
    use_d_vector_file: bool = False
    d_vector_dim: int = 0


def mdn_forward_loss(logp: jnp.ndarray, text_lens: jnp.ndarray, mel_lens: jnp.ndarray) -> jnp.ndarray:
    """Forward algorithm over the monotonic lattice (ref MDNLoss losses.py:541-562).
    The lattice terminal is gathered per sample at (text_lens-1, mel_lens-1) —
    exactly the reference's `log_alpha[arange(B), text_lens-1, mel_lens-1]` —
    so bucket-padded mel columns (masked to -1e4 upstream) never leak into the
    NLL. logp `[B, T_en, T_de]` → mean NLL, per-sample normalized by mel length."""
    B, T_en, T_de = logp.shape
    neg = -1e4
    alpha0 = jnp.full((B, T_en), neg)
    alpha0 = alpha0.at[:, 0].set(logp[:, 0, 0])
    tgather = (text_lens - 1)[:, None]
    term0 = jnp.where(mel_lens == 1, jnp.take_along_axis(alpha0, tgather, axis=1)[:, 0], neg)

    def step(carry, inp):
        alpha, term = carry
        t, col = inp
        prev_shift = jnp.concatenate([jnp.full((B, 1), neg), alpha[:, :-1]], axis=1)
        alpha = jnp.logaddexp(alpha, prev_shift) + col
        last = jnp.take_along_axis(alpha, tgather, axis=1)[:, 0]
        term = jnp.where(mel_lens == t + 1, last, term)
        return (alpha, term), None

    cols = jnp.moveaxis(logp, 2, 0)[1:]  # [T_de-1, B, T_en]
    (_, term), _ = jax.lax.scan(step, (alpha0, term0), (jnp.arange(1, T_de), cols))
    return -jnp.mean(term / mel_lens.astype(jnp.float32)) / T_en


class AlignTTSNet(nn.Module):
    args: tuple

    @property
    def a(self):
        return dict(self.args)

    def setup(self):
        a = self.a
        self.emb = nn.Embed(a["num_chars"], a["hidden_channels"])
        enc_p = dict(a["encoder_params"])
        dec_p = dict(a["decoder_params"])
        if a["encoder_type"] == "fftransformer":
            self.encoder = FFTransformerBlock(
                a["hidden_channels"], enc_p.get("num_heads", 2), enc_p.get("hidden_channels_ffn", 1024),
                enc_p.get("num_layers", 6), enc_p.get("dropout_p", 0.1),
            )
        else:
            self.encoder = ResidualConv1dBNBlock(
                a["hidden_channels"], a["hidden_channels"], enc_p.get("kernel_size", 4),
                tuple(enc_p.get("dilations", (1, 2, 4, 1))), enc_p.get("num_conv_blocks", 2),
            )
        if a["decoder_type"] == "fftransformer":
            self.decoder = FFTransformerBlock(
                a["hidden_channels"], dec_p.get("num_heads", 2), dec_p.get("hidden_channels_ffn", 1024),
                dec_p.get("num_layers", 6), dec_p.get("dropout_p", 0.1),
            )
        else:
            self.decoder = ResidualConv1dBNBlock(
                a["hidden_channels"], a["hidden_channels"], dec_p.get("kernel_size", 4),
                tuple(dec_p.get("dilations", (1, 2, 4, 1))), dec_p.get("num_conv_blocks", 2),
            )
        self.pos_encoder = PositionalEncoding(a["hidden_channels"])
        self.mod_layer = nn.Dense(a["hidden_channels"])
        # MDN block: hidden → (mu, log_sigma) over mel dims
        self.mdn_hidden = nn.Dense(a["hidden_channels"])
        self.mdn_out = nn.Dense(2 * a["out_channels"])
        self.duration_predictor = DurationPredictor(
            hidden_channels=a["hidden_channels_dp"], kernel_size=3, dropout_p=0.1
        )
        self.proj = nn.Dense(a["out_channels"])
        if a["use_speaker_embedding"] and a["num_speakers"] > 1:
            self.emb_g = nn.Embed(a["num_speakers"], a["hidden_channels"])

    def _encode(self, x, x_lengths, g=None, train=False):
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(jnp.float32)[:, :, None]
        h = self.emb(x)
        if g is not None:
            h = h + g
        o_en = self.encoder(h * x_mask, x_mask, train=train)
        return o_en, x_mask

    def _mdn(self, o_en):
        h = nn.relu(self.mdn_hidden(o_en))
        stats = self.mdn_out(h)
        mu, log_sigma = jnp.split(stats, 2, axis=-1)
        return mu, log_sigma

    @staticmethod
    def _mdn_logp(mu, log_sigma, y):
        """Gaussian log-likelihood of every (text, mel-frame) pair:
        `[B, T_en, T_de]`."""
        # sum over channels of N(y | mu, sigma)
        const = -0.5 * math.log(2 * math.pi)
        inv_var = jnp.exp(-2 * log_sigma)
        l1 = jnp.sum(const - log_sigma, axis=-1, keepdims=True)
        l2 = jnp.einsum("bec,btc->bet", -0.5 * inv_var, y**2)
        l3 = jnp.einsum("bec,btc->bet", mu * inv_var, y)
        l4 = jnp.sum(-0.5 * mu**2 * inv_var, axis=-1, keepdims=True)
        return l1 + l2 + l3 + l4

    def _decode(self, o_en, dr, x_mask, y_lengths, y_max, train):
        y_mask = sequence_mask(y_lengths, y_max).astype(jnp.float32)[:, :, None]
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)
        attn = generate_path(dr, attn_mask)
        o_ex = jnp.einsum("bet,bec->btc", attn, o_en)
        o_ex = self.pos_encoder(o_ex, y_mask)
        o_ex = self.mod_layer(o_ex)
        o_de = self.decoder(o_ex, y_mask, train=train)
        return self.proj(o_de) * y_mask, attn

    def __call__(self, x, x_lengths, y, y_lengths, speaker_ids=None, train: bool = True) -> Dict:
        g = None
        if speaker_ids is not None and self.a["use_speaker_embedding"]:
            g = self.emb_g(speaker_ids)[:, None, :]
        o_en, x_mask = self._encode(x, x_lengths, g, train)
        mu, log_sigma = self._mdn(o_en)
        y_mask = sequence_mask(y_lengths, y.shape[1]).astype(jnp.float32)[:, :, None]
        attn_mask = x_mask * jnp.swapaxes(y_mask, 1, 2)
        logp = self._mdn_logp(mu, log_sigma, y) * attn_mask + (1 - attn_mask) * -1e4
        attn_mas = maximum_path_jax(logp, attn_mask)
        dr_mas = jnp.sum(attn_mas, axis=-1)  # [B, T_en]
        o_de, attn = self._decode(o_en, dr_mas, x_mask, y_lengths, y.shape[1], train)
        o_dr_log = self.duration_predictor(jax.lax.stop_gradient(o_en), x_mask, train=train)[:, :, 0]
        return {
            "model_outputs": o_de,
            "logp": logp,
            "durations_mas": dr_mas,
            "durations_log": o_dr_log,
            "alignments": jnp.swapaxes(attn, 1, 2),
        }

    def inference(self, x, x_lengths, y_max_length: int, speaker_ids=None) -> Dict:
        g = None
        if speaker_ids is not None and self.a["use_speaker_embedding"]:
            g = self.emb_g(speaker_ids)[:, None, :]
        o_en, x_mask = self._encode(x, x_lengths, g, False)
        o_dr_log = self.duration_predictor(o_en, x_mask, train=False)[:, :, 0]
        dr = jnp.maximum(jnp.round(jnp.exp(o_dr_log) - 1), 0) * x_mask[:, :, 0] * self.a["length_scale"]
        y_lengths = jnp.minimum(jnp.maximum(jnp.sum(dr, axis=1), 1), y_max_length).astype(jnp.int32)
        o_de, attn = self._decode(o_en, dr, x_mask, y_lengths, y_max_length, False)
        return {"model_outputs": o_de, "alignments": jnp.swapaxes(attn, 1, 2), "y_lengths": y_lengths}


class AlignTTS(BaseTTSModel):
    def __init__(self, config, ap=None, tokenizer=None, speaker_manager=None):
        super().__init__(config, ap, tokenizer, speaker_manager)
        args = config.model_args
        if tokenizer is not None and tokenizer.characters is not None:
            args.num_chars = tokenizer.characters.num_chars
        if args.num_chars is None:
            args.num_chars = 130
        self.args = args
        # `None` disables the phase schedule — all losses active every step,
        # training "without phases as in the original paper"
        # (ref align_tts.py:414-428 `_set_phase`)
        self.phase_start_steps = getattr(config, "phase_start_steps", None)
        self.net = AlignTTSNet(args=tuple(sorted(args.to_dict().items())))
        self._infer_cache = {}

    def init_params(self, rng):
        a = self.args
        B, T_en, T_de = 2, 8, 16
        speaker_ids = None
        if a.use_speaker_embedding and a.num_speakers > 1:
            speaker_ids = jnp.zeros((B,), dtype=jnp.int32)
        variables = self.net.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            jnp.zeros((B, T_en), dtype=jnp.int32),
            jnp.full((B,), T_en, dtype=jnp.int32),
            jnp.zeros((B, T_de, a.out_channels)),
            jnp.full((B,), T_de, dtype=jnp.int32),
            speaker_ids=speaker_ids,
        )
        self.params = variables["params"]
        return self.params

    def loss_fn(self, params, batch: Dict, rng, optimizer_idx: int = 0):
        outputs = self.net.apply(
            {"params": params},
            batch["text_input"],
            batch["text_lengths"],
            batch["mel_input"],
            batch["mel_lengths"],
            speaker_ids=batch.get("speaker_ids"),
            train=True,
            rngs={"dropout": rng},
        )
        step = batch.get("global_step", jnp.asarray(10**9))
        if self.phase_start_steps is None:
            # no phase schedule: all losses, like the reference's phase=None path
            phase = jnp.asarray(4, dtype=jnp.int32)
        else:
            # ref align_tts.py:417 counts `i < global_step` over the FULL
            # phase_start_steps list (strict: the switch fires one step AFTER
            # the boundary), giving phase indices 0..len(list)
            bounds = jnp.asarray(self.phase_start_steps)
            phase = jnp.sum(bounds < step)

        l_mdn = mdn_forward_loss(outputs["logp"], batch["text_lengths"], batch["mel_lengths"])
        l_spec = masked_mse_loss(outputs["model_outputs"], batch["mel_input"], batch["mel_lengths"])
        l_ssim = ssim_loss(outputs["model_outputs"], batch["mel_input"], batch["mel_lengths"])
        dur_target = jnp.log(jax.lax.stop_gradient(outputs["durations_mas"]) + 1)
        l_dur = masked_mse_loss(
            outputs["durations_log"][:, :, None], dur_target[:, :, None], batch["text_lengths"]
        )
        # phase gating exactly as ref AlignTTSLoss.forward (losses.py:591-618):
        # 0: mdn · 1: spec+ssim · 2: mdn+spec+ssim · 3: dur · ≥4: all
        use_mdn = (phase == 0) | (phase == 2) | (phase >= 4)
        use_spec = (phase == 1) | (phase == 2) | (phase >= 4)
        use_dur = (phase >= 3)
        c = self.config
        loss = (
            jnp.where(use_mdn, getattr(c, "mdn_alpha", 1.0) * l_mdn, 0.0)
            + jnp.where(
                use_spec,
                getattr(c, "spec_loss_alpha", 1.0) * l_spec + getattr(c, "ssim_alpha", 1.0) * l_ssim,
                0.0,
            )
            + jnp.where(use_dur, getattr(c, "dur_loss_alpha", 1.0) * l_dur, 0.0)
        )
        return loss, {
            "loss": loss,
            "loss_mdn": l_mdn,
            "loss_spec": l_spec,
            "loss_ssim": l_ssim,
            "loss_dur": l_dur,
            "phase": phase,
        }

    def inference(self, x: np.ndarray, aux_input=None, bucket: int = 128) -> Dict:
        aux_input = aux_input or {}
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[None]
        x_lengths = aux_input.get("x_lengths")
        if x_lengths is None:
            x_lengths = jnp.full((x.shape[0],), x.shape[1], dtype=jnp.int32)
        y_max = max(bucket, int(np.ceil(int(x.shape[1]) * 16 / bucket)) * bucket)
        key = (x.shape, int(y_max))
        if key not in self._infer_cache:
            self._infer_cache[key] = jax.jit(
                lambda p, xi, xli, sid: self.net.apply(
                    {"params": p}, xi, xli, y_max, speaker_ids=sid, method=AlignTTSNet.inference
                )
            )
        return self._infer_cache[key](self.params, x, jnp.asarray(x_lengths), aux_input.get("speaker_ids"))

    @staticmethod
    def init_from_config(config, samples=None):
        from tpu_tts.audio import AudioProcessor
        from tpu_tts.managers import SpeakerManager
        from tpu_tts.text.tokenizer import TTSTokenizer

        ap = AudioProcessor.init_from_config(config, verbose=False)
        tokenizer, new_config = TTSTokenizer.init_from_config(config)
        speaker_manager = SpeakerManager.init_from_config(new_config, samples)
        return AlignTTS(new_config, ap, tokenizer, speaker_manager)
