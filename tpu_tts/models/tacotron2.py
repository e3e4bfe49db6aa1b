"""Tacotron2: attention-based autoregressive TTS with DDC support.

TPU-native re-design of /root/reference/TTS/tts/models/tacotron2.py and
base_tacotron.py (`_coarse_decoder_pass`:207): the AR decode is a compiled
scan (tpu_tts/layers/tacotron.py), teacher-forced in training and
stop-token-masked free-running at inference (fixed `max_decoder_steps`).
"""

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.layers.losses import (
    guided_attention_loss,
    masked_l1_loss,
    masked_mse_loss,
    stopnet_bce_loss,
)
from tpu_tts.layers.gst import GST, CapacitronVAE, capacitron_kl_loss


def _cfg_items(cfg):
    """Coqpit/dict style sub-config → hashable items tuple (for flax attrs)."""
    if cfg is None:
        return ()
    d = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
    return tuple((k, v) for k, v in d.items() if isinstance(v, (int, float, str, bool, type(None))))
from tpu_tts.layers.tacotron import Postnet, Tacotron2Decoder, Tacotron2Encoder
from tpu_tts.models.base_tts import BaseTTSModel
from tpu_tts.ops.helpers import sequence_mask


class Tacotron2Net(nn.Module):
    num_chars: int
    out_channels: int = 80
    r: int = 2
    r_init: int = 0  # param-shape r for gradual training (0 → r)
    encoder_dim: int = 512
    attn_type: str = "original"
    attn_kwargs: Optional[tuple] = None
    prenet_dropout_at_inference: bool = False
    max_decoder_steps: int = 500
    use_ddc: bool = False
    ddc_r: int = 6
    num_speakers: int = 0
    use_speaker_embedding: bool = False
    norm_type: str = "layer"  # "frozen_batch" when ingesting reference ckpts
    use_gst: bool = False
    gst: Optional[tuple] = None  # frozen GSTConfig items (ref tacotron2.py:102)
    use_capacitron: bool = False
    capacitron: Optional[tuple] = None  # frozen CapacitronVAEConfig items

    def setup(self):
        self.embedding = nn.Embed(self.num_chars, 512, embedding_init=nn.initializers.normal(0.3))
        self.encoder = Tacotron2Encoder(self.encoder_dim, norm_type=self.norm_type)
        decoder_in = self.encoder_dim
        if self.use_gst:
            g = dict(self.gst or ())
            self.gst_dim = g.get("gst_embedding_dim", 256)
            self.gst_layer = GST(
                num_mel=self.out_channels,
                num_heads=g.get("gst_num_heads", 4),
                num_style_tokens=g.get("gst_num_style_tokens", 10),
                gst_embedding_dim=self.gst_dim,
                norm_type=self.norm_type,
            )
            decoder_in += self.gst_dim
        if self.use_capacitron:
            c = dict(self.capacitron or ())
            self.cap_dim = c.get("capacitron_VAE_embedding_dim", 128)
            self.capacitron_vae_layer = CapacitronVAE(
                num_mel=self.out_channels,
                capacitron_VAE_embedding_dim=self.cap_dim,
                text_summary_embedding_dim=c.get("capacitron_text_summary_embedding_dim", 128)
                if c.get("capacitron_use_text_summary_embeddings", False)
                else None,
                norm_type=self.norm_type,
            )
            decoder_in += self.cap_dim
        self.decoder = Tacotron2Decoder(
            frame_channels=self.out_channels,
            r=self.r,
            r_init=self.r_init,
            encoder_dim=decoder_in,
            attn_type=self.attn_type,
            attn_kwargs=self.attn_kwargs,
            prenet_dropout_at_inference=self.prenet_dropout_at_inference,
            max_decoder_steps=self.max_decoder_steps,
        )
        self.postnet = Postnet(self.out_channels, norm_type=self.norm_type)
        if self.use_ddc:
            self.coarse_decoder = Tacotron2Decoder(
                frame_channels=self.out_channels,
                r=self.ddc_r,
                encoder_dim=decoder_in,
                attn_type=self.attn_type,
                attn_kwargs=self.attn_kwargs,
                max_decoder_steps=self.max_decoder_steps,
            )
        if self.use_speaker_embedding and self.num_speakers > 1:
            self.speaker_embedding = nn.Embed(self.num_speakers, self.encoder_dim)

    def _encode(self, text, text_lengths, speaker_ids, train, style_mel=None, text_emb_for_cap=None, style_mel_lengths=None):
        x_mask = sequence_mask(text_lengths, text.shape[1]).astype(jnp.float32)[:, :, None]
        emb = self.embedding(text)
        enc = self.encoder(emb, x_mask, train=train)
        if self.use_speaker_embedding and speaker_ids is not None:
            g = self.speaker_embedding(speaker_ids)[:, None, :]
            enc = enc + g
        cap_stats = None
        if self.use_gst:
            # style conditioning concat (ref tacotron2.py:175 / base_tacotron compute_gst)
            if style_mel is not None:
                gst_out = self.gst_layer(style_mel=style_mel, train=train)
            else:
                gst_out = jnp.zeros((enc.shape[0], self.gst_dim), dtype=enc.dtype)
            enc = jnp.concatenate(
                [enc, jnp.broadcast_to(gst_out[:, None], (enc.shape[0], enc.shape[1], self.gst_dim))],
                axis=-1,
            )
        if self.use_capacitron:
            if style_mel is not None:
                z, mu, logvar, beta_raw = self.capacitron_vae_layer(
                    reference_mel=style_mel, text_summary=text_emb_for_cap,
                    reference_mel_lengths=style_mel_lengths, text_lengths=text_lengths,
                    train=train,
                )
                cap_stats = (mu, logvar, beta_raw)
            else:
                z = jnp.zeros((enc.shape[0], self.cap_dim), dtype=enc.dtype)
            enc = jnp.concatenate(
                [enc, jnp.broadcast_to(z[:, None], (enc.shape[0], enc.shape[1], self.cap_dim))],
                axis=-1,
            )
        return enc, x_mask, cap_stats

    def __call__(self, text, text_lengths, mel, mel_lengths, speaker_ids=None, train: bool = True) -> Dict:
        # training style conditioning uses the target mel as the reference
        # (ref tacotron2.py:177 compute_gst(encoder_outputs, mel_specs))
        style = mel if (self.use_gst or self.use_capacitron) else None
        enc, x_mask, cap_stats = self._encode(
            text, text_lengths, speaker_ids, train,
            style_mel=style,
            text_emb_for_cap=self.embedding(text) if self.use_capacitron else None,
            style_mel_lengths=mel_lengths if (self.use_gst or self.use_capacitron) else None,
        )
        key_mask = x_mask[:, :, 0] > 0
        # pad mel to a multiple of r
        T_de = mel.shape[1]
        pad = (-T_de) % self.r
        if pad:
            mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)))
        frames, stops, attns = self.decoder(enc, mel, key_mask, train=train)
        postnet_out = frames + self.postnet(frames, train=train)
        out = {
            "decoder_outputs": frames,
            "model_outputs": postnet_out,
            "stop_tokens": stops,
            "alignments": attns,
        }
        if cap_stats is not None:
            out["capacitron_mu"], out["capacitron_logvar"], out["capacitron_beta_raw"] = cap_stats
        if self.use_ddc:
            pad_c = (-mel.shape[1]) % self.ddc_r
            mel_c = jnp.pad(mel, ((0, 0), (0, pad_c), (0, 0))) if pad_c else mel
            frames_c, _, attns_c = self.coarse_decoder(
                jax.lax.stop_gradient(enc), mel_c, key_mask, train=train
            )
            out["coarse_decoder_outputs"] = frames_c[:, : frames.shape[1]]
            out["coarse_alignments"] = attns_c
        return out

    def inference(self, text, text_lengths=None, speaker_ids=None, style_mel=None) -> Dict:
        if text_lengths is None:
            text_lengths = jnp.full((text.shape[0],), text.shape[1], dtype=jnp.int32)
        enc, x_mask, _ = self._encode(text, text_lengths, speaker_ids, False, style_mel=style_mel)
        key_mask = x_mask[:, :, 0] > 0
        frames, stops, attns, lengths = self.decoder.inference(enc, key_mask)
        postnet_out = frames + self.postnet(frames, train=False)
        return {
            "model_outputs": postnet_out,
            "decoder_outputs": frames,
            "stop_tokens": stops,
            "alignments": attns,
            "y_lengths": lengths,
        }


class Tacotron2(BaseTTSModel):
    def __init__(self, config, ap=None, tokenizer=None, speaker_manager=None):
        super().__init__(config, ap, tokenizer, speaker_manager)
        num_chars = tokenizer.characters.num_chars if tokenizer and tokenizer.characters else (config.num_chars or 130)
        attn_kwargs = (
            ("attention_dim", getattr(config, "attention_dim", 128)),
            ("location_attention", getattr(config, "location_attn", True)),
            ("norm", getattr(config, "attention_norm", "softmax")),
            ("forward_attn", getattr(config, "use_forward_attn", False)),
            ("trans_agent", getattr(config, "transition_agent", False)),
            ("forward_attn_mask", getattr(config, "forward_attn_mask", False)),
            ("windowing", getattr(config, "windowing", False)),
        )
        self.net = Tacotron2Net(
            num_chars=num_chars,
            out_channels=config.audio.num_mels,
            r=config.r,
            r_init=config.r,
            attn_type=getattr(config, "attention_type", "original"),
            attn_kwargs=attn_kwargs,
            prenet_dropout_at_inference=getattr(config, "prenet_dropout_at_inference", False),
            max_decoder_steps=getattr(config, "max_decoder_steps", 500),
            use_ddc=getattr(config, "double_decoder_consistency", False),
            ddc_r=getattr(config, "ddc_r", 6),
            num_speakers=self.num_speakers,
            use_speaker_embedding=getattr(config, "use_speaker_embedding", False),
            encoder_dim=getattr(config, "encoder_in_features", 512) or 512,
            use_gst=bool(getattr(config, "use_gst", False)),
            gst=tuple(sorted(_cfg_items(getattr(config, "gst", None)))) or None,
            use_capacitron=bool(getattr(config, "use_capacitron_vae", False)),
            capacitron=tuple(sorted(_cfg_items(getattr(config, "capacitron_vae", None)))) or None,
            # true train-time BatchNorm (running stats threaded as model
            # state) is the from-scratch default, matching the reference's
            # nn.BatchNorm1d encoders/postnets; ingest switches to
            # "frozen_batch" (stats folded into params)
            norm_type=getattr(config, "norm_type", None) or "batch",
        )
        self._infer_cache = {}

    # ------------------------------------------------------- torch ingest
    def convert_torch_state_dict(self, state_dict):
        """Reference `Tacotron2` torch weights → our flax tree (parity-tested
        in tests/test_torch_parity_taco.py). Switches the net to the
        `frozen_batch` norm variant: the reference's BatchNorm layers become
        running-stat affines — identical math to torch eval mode."""
        from tpu_tts.models.tacotron_convert import convert_tacotron2_torch_state_dict

        if self.net.norm_type != "frozen_batch":
            self.net = self.net.clone(norm_type="frozen_batch")
            self._infer_cache = {}
        return convert_tacotron2_torch_state_dict(state_dict)

    def init_params(self, rng):
        B, T_en, T_de = 2, 8, 12
        kwargs = {}
        if self.net.use_speaker_embedding and self.num_speakers > 1:
            kwargs["speaker_ids"] = jnp.zeros((B,), dtype=jnp.int32)
        variables = self.net.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 3),
             "capacitron": jax.random.fold_in(rng, 5)},
            jnp.zeros((B, T_en), dtype=jnp.int32),
            jnp.full((B,), T_en, dtype=jnp.int32),
            jnp.zeros((B, T_de, self.config.audio.num_mels)),
            jnp.full((B,), T_de, dtype=jnp.int32),
            **kwargs,
        )
        self.params = variables["params"]
        self.model_state = {k: v for k, v in variables.items() if k != "params"}
        return self.params

    def loss_fn(self, params, batch: Dict, rng, optimizer_idx: int = 0, model_state=None):
        c = self.config
        outputs, new_state = self.net.apply(
            {"params": params, **(model_state or {})},
            batch["text_input"],
            batch["text_lengths"],
            batch["mel_input"],
            batch["mel_lengths"],
            speaker_ids=batch.get("speaker_ids"),
            train=True,
            rngs={"dropout": rng, "capacitron": jax.random.fold_in(rng, 5)},
            mutable=["batch_stats"],
        )
        if not jax.tree_util.tree_leaves(new_state):
            new_state = model_state or {}
        mel = batch["mel_input"]
        T = min(outputs["decoder_outputs"].shape[1], mel.shape[1])
        spec_fn = masked_mse_loss if getattr(c, "loss_masking", True) else masked_mse_loss
        l_decoder = spec_fn(outputs["decoder_outputs"][:, :T], mel[:, :T], batch["mel_lengths"])
        l_postnet = spec_fn(outputs["model_outputs"][:, :T], mel[:, :T], batch["mel_lengths"])
        stop_lens = jnp.ceil(batch["mel_lengths"] / self.net.r).astype(jnp.int32)
        l_stop = stopnet_bce_loss(
            outputs["stop_tokens"], batch["stop_targets"][:, : outputs["stop_tokens"].shape[1]], stop_lens
        )
        loss = l_decoder + l_postnet + l_stop
        losses = {"decoder_loss": l_decoder, "postnet_loss": l_postnet, "stopnet_loss": l_stop}
        if getattr(c, "ga_alpha", 0.0) > 0:
            l_ga = guided_attention_loss(outputs["alignments"], batch["text_lengths"], stop_lens)
            loss += c.ga_alpha * l_ga
            losses["ga_loss"] = l_ga
        if self.net.use_ddc:
            l_ddc = masked_mse_loss(
                outputs["coarse_decoder_outputs"][:, :T], jax.lax.stop_gradient(outputs["decoder_outputs"])[:, :T],
                batch["mel_lengths"],
            )
            loss += l_ddc
            losses["decoder_coarse_loss"] = l_ddc
        if "capacitron_mu" in outputs:
            # capacity-constrained KL with a learnable Lagrange multiplier
            # (ref losses.py:394-440 + utils/capacitron_optimizer.py). The
            # reference's dual-optimizer two-step becomes a single loss with
            # disjoint gradient paths: the main term sees stop_grad(beta), the
            # beta term enters grad-only (zero value) — optax.multi_transform
            # routes the beta leaf to SGD (see get_optimizer).
            from tpu_tts.layers.gst import capacitron_loss_terms

            term, cap_logs = capacitron_loss_terms(outputs, dict(_cfg_items(getattr(c, "capacitron_vae", None))))
            loss += term
            losses.update(cap_logs)
        losses["loss"] = loss
        if model_state is None:
            return loss, losses
        return loss, (losses, new_state)

    def inference(self, x: np.ndarray, aux_input=None) -> Dict:
        aux_input = aux_input or {}
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[None]
        style_mel = aux_input.get("style_mel")
        if style_mel is not None:
            style_mel = jnp.asarray(style_mel)
            if style_mel.ndim == 2:
                style_mel = style_mel[None]
        key = (x.shape, None if style_mel is None else style_mel.shape)
        if key not in self._infer_cache:
            self._infer_cache[key] = jax.jit(
                lambda p, st, xi, sid, sm: self.net.apply(
                    {"params": p, **st}, xi, speaker_ids=sid, style_mel=sm,
                    method=Tacotron2Net.inference,
                    rngs={"dropout": jax.random.PRNGKey(0), "capacitron": jax.random.PRNGKey(1)},
                )
            )
        return self._infer_cache[key](
            self.params, self.model_state or {}, x, aux_input.get("speaker_ids"), style_mel
        )

    def get_optimizer(self):
        """Capacitron's dual optimizer (ref utils/capacitron_optimizer.py:6):
        beta → SGD, everything else → primary, via optax.multi_transform."""
        from tpu_tts.layers.gst import capacitron_dual_optimizer

        if not getattr(self.config, "use_capacitron_vae", False):
            return super().get_optimizer()
        return capacitron_dual_optimizer(self.config, super().get_optimizer)

    @staticmethod
    def init_from_config(config, samples=None):
        from tpu_tts.audio import AudioProcessor
        from tpu_tts.managers import SpeakerManager
        from tpu_tts.text.tokenizer import TTSTokenizer

        ap = AudioProcessor.init_from_config(config, verbose=False)
        tokenizer, new_config = TTSTokenizer.init_from_config(config)
        speaker_manager = SpeakerManager.init_from_config(new_config, samples)
        return Tacotron2(new_config, ap, tokenizer, speaker_manager)
