"""Tacotron (v1): CBHG encoder/postnet + GRU attention decoder, linear-spec
target.

TPU-native re-design of /root/reference/TTS/tts/models/tacotron.py (409) +
layers/tacotron/tacotron.py (CBHG:94, Decoder:249). The AR decoder is a scan
like Tacotron2's; the CBHG (conv bank + highway + BiGRU) is channels-last.
"""

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.layers.common import Conv1d
from tpu_tts.layers.losses import (
    guided_attention_loss,
    masked_l1_loss,
    masked_mse_loss,
    stopnet_bce_loss,
)
from tpu_tts.layers.tacotron import OriginalAttention, Prenet
from tpu_tts.models.base_tts import BaseTTSModel
from tpu_tts.ops.helpers import sequence_mask


class Highway(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.features, name="H")(x))
        t = jax.nn.sigmoid(nn.Dense(self.features, bias_init=nn.initializers.constant(-1.0), name="T")(x))
        return h * t + x * (1 - t)


class CBHG(nn.Module):
    """Conv bank (k=1..K) → maxpool → conv proj → highway → BiGRU
    (ref layers/tacotron/tacotron.py:94). The reference's BatchNorm
    (momentum=0.99, eps=1e-3) maps onto `norm_type="frozen_batch"`; convs are
    bias-free like the reference's `BatchNormConv1d`."""

    K: int = 16
    conv_bank_features: int = 128
    conv_projections: Tuple[int, ...] = (128, 128)
    highway_features: int = 128
    gru_features: int = 128
    num_highways: int = 4
    norm_type: str = "layer"

    def _norm(self, features, name, x, train):
        from tpu_tts.layers.tacotron import _apply_norm

        # ref BatchNormConv1d (tacotron.py:37): momentum=0.99, eps=1e-3
        return _apply_norm(self.norm_type, features, name, x, train, momentum=0.99, eps=1e-3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T, C]
        banks = []
        for k in range(1, self.K + 1):
            h = Conv1d(self.conv_bank_features, k, use_bias=False, name=f"bank_{k}")(x)
            h = nn.relu(self._norm(self.conv_bank_features, f"bank_norm_{k}", h, train))
            banks.append(h)
        h = jnp.concatenate(banks, axis=-1)
        # NB: the reference's CBHG builds no max-pool — the bank concat feeds
        # the projections directly (layers/tacotron/tacotron.py:165-175
        # `forward`; the paper's pooling stage is absent there)
        for i, ch in enumerate(self.conv_projections):
            h = Conv1d(ch, 3, use_bias=False, name=f"proj_{i}")(h)
            h = self._norm(ch, f"proj_norm_{i}", h, train)
            if i < len(self.conv_projections) - 1:
                h = nn.relu(h)
        h = h + x  # residual
        if h.shape[-1] != self.highway_features:
            h = nn.Dense(self.highway_features, use_bias=False, name="pre_highway")(h)
        for i in range(self.num_highways):
            h = Highway(self.highway_features, name=f"highway_{i}")(h)
        fwd = nn.RNN(nn.GRUCell(self.gru_features), name="gru_fwd")(h)
        bwd = nn.RNN(nn.GRUCell(self.gru_features), reverse=True, keep_order=True, name="gru_bwd")(h)
        return jnp.concatenate([fwd, bwd], axis=-1)


class TacotronDecoderCell(nn.Module):
    """v1 GRU decoder step (ref layers/tacotron/tacotron.py Decoder:249)."""

    frame_channels: int = 80
    r: int = 5
    r_init: int = 0  # param-shape r for gradual training (0 -> r)
    encoder_dim: int = 256
    attn_kwargs: Optional[tuple] = None
    prenet_dropout_at_inference: bool = False

    def setup(self):
        self.prenet = Prenet((256, 128), dropout_at_inference=self.prenet_dropout_at_inference, use_bias=True)
        self.attention_rnn = nn.GRUCell(256)
        kw = dict(self.attn_kwargs or ())
        self.attention = OriginalAttention(
            query_dim=256,
            embedding_dim=self.encoder_dim,
            attention_dim=kw.get("attention_dim", 128),
            location_attention=kw.get("location_attention", True),
            norm=kw.get("norm", "sigmoid"),
            forward_attn=kw.get("forward_attn", False),
            trans_agent=kw.get("trans_agent", False),
            forward_attn_mask=kw.get("forward_attn_mask", False),
            windowing=kw.get("windowing", False),
        )
        self.project_to_decoder_in = nn.Dense(256)
        self.decoder_rnns = [nn.GRUCell(256) for _ in range(2)]
        self.proj_to_mel = nn.Dense(self.frame_channels * (self.r_init or self.r))
        self.stopnet = nn.Dense(1)

    def preprocess_inputs(self, inputs):
        return self.attention.preprocess_inputs(inputs)

    def init_carry(self, B, T_en):
        return {
            "attn_rnn": jnp.zeros((B, 256)),
            "dec_rnns": tuple(jnp.zeros((B, 256)) for _ in range(2)),
            "attn_state": self.attention.init_state(B, T_en),
            "context": jnp.zeros((B, self.encoder_dim)),
        }

    @nn.compact
    def __call__(self, carry, frame_input, inputs, processed_inputs, mask, train: bool):
        prenet_out = self.prenet(frame_input, train=train)
        attn_in = jnp.concatenate([prenet_out, carry["context"]], axis=-1)
        attn_rnn, _ = self.attention_rnn(carry["attn_rnn"], attn_in)
        context, attn_state = self.attention(attn_rnn, inputs, processed_inputs, mask, carry["attn_state"], train)
        dec_in = self.project_to_decoder_in(jnp.concatenate([attn_rnn, context], axis=-1))
        dec_states = []
        h = dec_in
        for i, cell in enumerate(self.decoder_rnns):
            s, _ = cell(carry["dec_rnns"][i], h)
            h = h + s
            dec_states.append(s)
        frames_full = self.proj_to_mel(h)  # [B, mel*r_init]
        frames = frames_full[..., : self.frame_channels * self.r]  # active r
        stop = self.stopnet(jnp.concatenate([h, frames_full], axis=-1))[:, 0]
        new_carry = {
            "attn_rnn": attn_rnn,
            "dec_rnns": tuple(dec_states),
            "attn_state": attn_state,
            "context": context,
        }
        return new_carry, (frames, stop, attn_state["attention_weights"])


class TacotronNet(nn.Module):
    num_chars: int
    decoder_output_dim: int = 80  # mel
    out_channels: int = 513  # linear spec (postnet CBHG output)
    r: int = 5
    r_init: int = 0  # param-shape r for gradual training (0 -> r)
    attn_kwargs: Optional[tuple] = None
    max_decoder_steps: int = 500
    memory_size: int = -1
    use_gst: bool = False
    gst: Optional[tuple] = None  # frozen GSTConfig items (ref tacotron.py GST concat)
    use_capacitron: bool = False
    capacitron: Optional[tuple] = None  # frozen CapacitronVAEConfig items
    norm_type: str = "layer"
    prenet_dropout_at_inference: bool = False
    use_ddc: bool = False
    ddc_r: int = 6

    def setup(self):
        self.embedding = nn.Embed(self.num_chars, 256, embedding_init=nn.initializers.normal(0.3))
        self.encoder_prenet = Prenet((256, 128), dropout_at_inference=self.prenet_dropout_at_inference, use_bias=True)
        self.encoder_cbhg = CBHG(
            K=16, conv_projections=(128, 128), gru_features=128, norm_type=self.norm_type
        )
        encoder_dim = 256
        if self.use_gst:
            from tpu_tts.layers.gst import GST

            g = dict(self.gst or ())
            self.gst_dim = g.get("gst_embedding_dim", 256)
            self.gst_layer = GST(
                num_mel=self.decoder_output_dim,
                num_heads=g.get("gst_num_heads", 4),
                num_style_tokens=g.get("gst_num_style_tokens", 10),
                gst_embedding_dim=self.gst_dim,
                norm_type=self.norm_type,
            )
            encoder_dim += self.gst_dim
        if self.use_capacitron:
            from tpu_tts.layers.gst import CapacitronVAE

            c = dict(self.capacitron or ())
            self.cap_dim = c.get("capacitron_VAE_embedding_dim", 128)
            self.capacitron_vae_layer = CapacitronVAE(
                num_mel=self.decoder_output_dim,
                capacitron_VAE_embedding_dim=self.cap_dim,
                text_summary_embedding_dim=c.get("capacitron_text_summary_embedding_dim", 128)
                if c.get("capacitron_use_text_summary_embeddings", False)
                else None,
                norm_type=self.norm_type,
            )
            encoder_dim += self.cap_dim
        self.cell = TacotronDecoderCell(
            frame_channels=self.decoder_output_dim, r=self.r, r_init=self.r_init,
            encoder_dim=encoder_dim, attn_kwargs=self.attn_kwargs,
            prenet_dropout_at_inference=self.prenet_dropout_at_inference,
        )
        if self.use_ddc:
            # double decoder consistency (ref base_tacotron.py:207
            # `_coarse_decoder_pass`)
            self.coarse_cell = TacotronDecoderCell(
                frame_channels=self.decoder_output_dim, r=self.ddc_r, r_init=self.ddc_r,
                encoder_dim=encoder_dim, attn_kwargs=self.attn_kwargs,
                prenet_dropout_at_inference=self.prenet_dropout_at_inference,
            )
        self.postnet_cbhg = CBHG(
            K=8, conv_bank_features=128, conv_projections=(256, self.decoder_output_dim),
            highway_features=128, gru_features=128, norm_type=self.norm_type,
        )
        self.last_linear = nn.Dense(self.out_channels)

    def _encode(self, text, train, style_mel=None):
        emb = self.embedding(text)
        h = self.encoder_prenet(emb, train=train)
        enc = self.encoder_cbhg(h, train=train)
        cap_stats = None
        if self.use_gst:
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
                z, mu, logvar, beta_raw = self.capacitron_vae_layer(reference_mel=style_mel, text_summary=emb, train=train)
                cap_stats = (mu, logvar, beta_raw)
            else:
                z = jnp.zeros((enc.shape[0], self.cap_dim), dtype=enc.dtype)
            enc = jnp.concatenate(
                [enc, jnp.broadcast_to(z[:, None], (enc.shape[0], enc.shape[1], self.cap_dim))],
                axis=-1,
            )
        return enc, cap_stats

    def _postnet(self, mel, train=False):
        h = self.postnet_cbhg(mel, train=train)
        return self.last_linear(h)

    def __call__(self, text, text_lengths, mel, mel_lengths, train: bool = True) -> Dict:
        enc, cap_stats = self._encode(
            text, train, style_mel=mel if (self.use_gst or self.use_capacitron) else None
        )
        key_mask = sequence_mask(text_lengths, text.shape[1])
        B, T_de, _ = mel.shape
        r = self.r
        pad = (-T_de) % r
        if pad:
            mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)))
            T_de += pad
        steps = T_de // r
        mem_in = mel[:, r - 1 :: r][:, :-1]
        go = jnp.zeros((B, 1, self.decoder_output_dim))
        mem_in = jnp.concatenate([go, mem_in], axis=1)
        processed = self.cell.preprocess_inputs(enc)
        carry = self.cell.init_carry(B, text.shape[1])

        def step(cell, carry, frame_in):
            return cell(carry, frame_in, enc, processed, key_mask, train)

        scan = nn.scan(step, variable_broadcast="params", split_rngs={"params": False, "dropout": True},
                       in_axes=1, out_axes=1)
        _, (frames, stops, attns) = scan(self.cell, carry, mem_in)
        decoder_outputs = frames.reshape(B, steps * r, self.decoder_output_dim)
        postnet_outputs = self._postnet(decoder_outputs)
        out = {
            "decoder_outputs": decoder_outputs,
            "model_outputs": postnet_outputs,
            "stop_tokens": stops,
            "alignments": attns,
        }
        if self.use_ddc:
            enc_sg = jax.lax.stop_gradient(enc)
            rc = self.ddc_r
            pad_c = (-mel.shape[1]) % rc
            mel_c = jnp.pad(mel, ((0, 0), (0, pad_c), (0, 0))) if pad_c else mel
            mem_c = mel_c[:, rc - 1 :: rc][:, :-1]
            mem_c = jnp.concatenate([jnp.zeros((B, 1, self.decoder_output_dim)), mem_c], axis=1)
            processed_c = self.coarse_cell.preprocess_inputs(enc_sg)
            carry_c = self.coarse_cell.init_carry(B, text.shape[1])

            def step_c(cell, carry, frame_in):
                return cell(carry, frame_in, enc_sg, processed_c, key_mask, train)

            scan_c = nn.scan(step_c, variable_broadcast="params",
                             split_rngs={"params": False, "dropout": True}, in_axes=1, out_axes=1)
            _, (frames_c, _, attns_c) = scan_c(self.coarse_cell, carry_c, mem_c)
            frames_c = frames_c.reshape(B, -1, self.decoder_output_dim)
            out["coarse_decoder_outputs"] = frames_c[:, : decoder_outputs.shape[1]]
            out["coarse_alignments"] = attns_c
        if cap_stats is not None:
            out["capacitron_mu"], out["capacitron_logvar"], out["capacitron_beta_raw"] = cap_stats
        return out

    def inference(self, text, text_lengths=None, style_mel=None) -> Dict:
        if text_lengths is None:
            text_lengths = jnp.full((text.shape[0],), text.shape[1], dtype=jnp.int32)
        enc, _ = self._encode(text, False, style_mel=style_mel)
        key_mask = sequence_mask(text_lengths, text.shape[1])
        B = text.shape[0]
        processed = self.cell.preprocess_inputs(enc)
        carry = self.cell.init_carry(B, text.shape[1])
        carry = dict(carry, stopped=jnp.zeros((B,), dtype=bool), frame=jnp.zeros((B, self.decoder_output_dim)))
        steps = self.max_decoder_steps // self.r

        def step(cell, carry, _):
            stopped = carry["stopped"]
            inner = {k: carry[k] for k in ("attn_rnn", "dec_rnns", "attn_state", "context")}
            inner, (frames, stop, attn) = cell(inner, carry["frame"], enc, processed, key_mask, False)
            new_stopped = stopped | (jax.nn.sigmoid(stop) > 0.5)
            valid = (~stopped).astype(frames.dtype)[:, None]
            return dict(inner, stopped=new_stopped, frame=frames[..., -self.decoder_output_dim :]), (
                frames * valid, stop, attn, valid[:, 0],
            )

        scan = nn.scan(step, variable_broadcast="params", split_rngs={"params": False, "dropout": True},
                       in_axes=1, out_axes=1)
        _, (frames, stops, attns, valid) = scan(self.cell, carry, jnp.zeros((B, steps, 1)))
        decoder_outputs = frames.reshape(B, steps * self.r, self.decoder_output_dim)
        postnet_outputs = self._postnet(decoder_outputs)
        lengths = jnp.sum(valid, axis=1).astype(jnp.int32) * self.r
        return {
            "model_outputs": postnet_outputs,
            "decoder_outputs": decoder_outputs,
            "stop_tokens": stops,
            "alignments": attns,
            "y_lengths": lengths,
        }


class Tacotron(BaseTTSModel):
    def __init__(self, config, ap=None, tokenizer=None, speaker_manager=None):
        super().__init__(config, ap, tokenizer, speaker_manager)
        num_chars = tokenizer.characters.num_chars if tokenizer and tokenizer.characters else (config.num_chars or 130)
        attn_kwargs = (
            ("attention_dim", getattr(config, "attention_dim", 128)),
            ("location_attention", getattr(config, "location_attn", True)),
            ("norm", getattr(config, "attention_norm", "sigmoid")),
            ("forward_attn", getattr(config, "use_forward_attn", False)),
            ("trans_agent", getattr(config, "transition_agent", False)),
            ("forward_attn_mask", getattr(config, "forward_attn_mask", False)),
            ("windowing", getattr(config, "windowing", False)),
        )
        self.net = TacotronNet(
            num_chars=num_chars,
            decoder_output_dim=getattr(config, "decoder_output_dim", 80),
            out_channels=getattr(config, "out_channels", 513),
            r=config.r,
            r_init=config.r,
            attn_kwargs=attn_kwargs,
            max_decoder_steps=getattr(config, "max_decoder_steps", 500),
            use_gst=bool(getattr(config, "use_gst", False)),
            gst=tuple(
                sorted(
                    (k, v)
                    for k, v in (getattr(config, "gst", None).to_dict() if getattr(config, "gst", None) else {}).items()
                    if isinstance(v, (int, float, str, bool, type(None)))
                )
            ) or None,
            norm_type=getattr(config, "norm_type", None) or "batch",
            prenet_dropout_at_inference=getattr(config, "prenet_dropout_at_inference", False),
            use_ddc=bool(getattr(config, "double_decoder_consistency", False)),
            ddc_r=getattr(config, "ddc_r", 6),
            use_capacitron=bool(getattr(config, "use_capacitron_vae", False)),
            capacitron=tuple(
                sorted(
                    (k, v)
                    for k, v in (
                        getattr(config, "capacitron_vae", None).to_dict()
                        if getattr(config, "capacitron_vae", None)
                        else {}
                    ).items()
                    if isinstance(v, (int, float, str, bool, type(None)))
                )
            ) or None,
        )
        self._infer_cache = {}

    # ------------------------------------------------------- torch ingest
    def convert_torch_state_dict(self, state_dict):
        """Reference `Tacotron` (v1) torch weights → our flax tree
        (parity-tested in tests/test_torch_parity_taco.py)."""
        from tpu_tts.models.tacotron_convert import convert_tacotron1_torch_state_dict

        if self.net.norm_type != "frozen_batch":  # reference CBHG uses BN
            self.net = self.net.clone(norm_type="frozen_batch")
            self._infer_cache = {}
        return convert_tacotron1_torch_state_dict(state_dict)

    def init_params(self, rng):
        B, T_en, T_de = 2, 8, 10
        variables = self.net.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 3), "capacitron": jax.random.fold_in(rng, 7)},
            jnp.zeros((B, T_en), dtype=jnp.int32),
            jnp.full((B,), T_en, dtype=jnp.int32),
            jnp.zeros((B, T_de, self.net.decoder_output_dim)),
            jnp.full((B,), T_de, dtype=jnp.int32),
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
            train=True,
            rngs={"dropout": rng, "capacitron": jax.random.fold_in(rng, 7)},
            mutable=["batch_stats"],
        )
        if not jax.tree_util.tree_leaves(new_state):
            new_state = model_state or {}
        T = min(outputs["decoder_outputs"].shape[1], batch["mel_input"].shape[1])
        l_decoder = masked_l1_loss(outputs["decoder_outputs"][:, :T], batch["mel_input"][:, :T], batch["mel_lengths"])
        l_postnet = masked_l1_loss(
            outputs["model_outputs"][:, :T], batch["linear_input"][:, :T], batch["mel_lengths"]
        )
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
                outputs["coarse_decoder_outputs"][:, :T],
                jax.lax.stop_gradient(outputs["decoder_outputs"])[:, :T],
                batch["mel_lengths"],
            )
            loss += l_ddc
            losses["decoder_coarse_loss"] = l_ddc
        if "capacitron_mu" in outputs:
            from tpu_tts.layers.gst import capacitron_loss_terms

            cap_cfg = getattr(c, "capacitron_vae", None)
            cap_dict = cap_cfg.to_dict() if hasattr(cap_cfg, "to_dict") else dict(cap_cfg or {})
            term, cap_logs = capacitron_loss_terms(outputs, cap_dict)
            loss += term
            losses.update(cap_logs)
        losses["loss"] = loss
        if model_state is None:
            return loss, losses
        return loss, (losses, new_state)

    def get_optimizer(self):
        """Capacitron dual optimizer (ref utils/capacitron_optimizer.py:6)."""
        from tpu_tts.layers.gst import capacitron_dual_optimizer

        if not getattr(self.config, "use_capacitron_vae", False):
            return super().get_optimizer()
        return capacitron_dual_optimizer(self.config, super().get_optimizer)

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
                lambda p, st, xi, sm: self.net.apply(
                    {"params": p, **st}, xi, style_mel=sm, method=TacotronNet.inference,
                    rngs={"dropout": jax.random.PRNGKey(0), "capacitron": jax.random.PRNGKey(1)},
                )
            )
        return self._infer_cache[key](self.params, self.model_state or {}, x, style_mel)

    @staticmethod
    def init_from_config(config, samples=None):
        from tpu_tts.audio import AudioProcessor
        from tpu_tts.managers import SpeakerManager
        from tpu_tts.text.tokenizer import TTSTokenizer

        ap = AudioProcessor.init_from_config(config, verbose=False)
        tokenizer, new_config = TTSTokenizer.init_from_config(config)
        speaker_manager = SpeakerManager.init_from_config(new_config, samples)
        return Tacotron(new_config, ap, tokenizer, speaker_manager)
