"""Tacotron/Tacotron2 layers: prenet, attention, AR decoder as a scan.

TPU-native re-design of /root/reference/TTS/tts/layers/tacotron/{tacotron2.py
(Encoder:73, Decoder:116, decode():256, Postnet:47), attentions.py
(OriginalAttention:127, GravesAttention:40), common_layers.py (Prenet)}.

The reference's per-frame Python while-loop (`tacotron2.py:348-363`) is the
latency-critical serial path; here both teacher-forced training and inference
are `nn.scan`/`lax.scan` over time with the attention state in the carry —
one compiled kernel for the whole decode. Eval-time attention windowing and
forward-attention masking (host-side heuristics in the reference) run inside
the scan on positional masks, with the window index carried in the attention
state."""

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.layers.common import Conv1d


class Prenet(nn.Module):
    """FC-relu-dropout stack; dropout stays ON at inference (ref common_layers).
    Tacotron2 builds it bias-free; Tacotron v1 keeps the default biases
    (ref common_layers.py:97 `bias=True`)."""

    out_features: Tuple[int, ...] = (256, 256)
    dropout_at_inference: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i, d in enumerate(self.out_features):
            x = nn.relu(nn.Dense(d, use_bias=self.use_bias, name=f"linear_{i}")(x))
            x = nn.Dropout(0.5, deterministic=not (train or self.dropout_at_inference))(x)
        return x


class LocationLayer(nn.Module):
    attention_dim: int
    attention_n_filters: int = 32
    attention_kernel_size: int = 31

    @nn.compact
    def __call__(self, attention_cat):
        # attention_cat: [B, T_en, 2] (prev + cumulated weights)
        x = Conv1d(self.attention_n_filters, self.attention_kernel_size, use_bias=False, name="location_conv")(
            attention_cat
        )
        return nn.Dense(self.attention_dim, use_bias=False, name="location_dense")(x)


class OriginalAttention(nn.Module):
    """Location-sensitive additive attention with optional forward attention
    (ref attentions.py:127), reformulated as a pure per-step function with
    explicit state."""

    query_dim: int
    embedding_dim: int
    attention_dim: int = 128
    location_attention: bool = True
    attention_location_n_filters: int = 32
    attention_location_kernel_size: int = 31
    norm: str = "softmax"
    forward_attn: bool = False
    trans_agent: bool = False
    forward_attn_mask: bool = False
    windowing: bool = False
    # ref attentions.py:198-201 init_win_idx hardcodes these
    win_back: int = 2
    win_front: int = 6

    def setup(self):
        self.query_layer = nn.Dense(self.attention_dim, use_bias=False)
        self.inputs_layer = nn.Dense(self.attention_dim, use_bias=False)
        self.v = nn.Dense(1, use_bias=True)
        if self.location_attention:
            self.location_layer = LocationLayer(
                self.attention_dim, self.attention_location_n_filters, self.attention_location_kernel_size
            )
        if self.trans_agent:
            self.ta = nn.Dense(1, use_bias=True)

    def init_state(self, B: int, T: int) -> Dict:
        state = {
            "attention_weights": jnp.zeros((B, T)),
            "attention_weights_cum": jnp.zeros((B, T)),
        }
        if self.forward_attn:
            alpha = jnp.concatenate([jnp.ones((B, 1)), jnp.zeros((B, T - 1)) + 1e-7], axis=1)
            state["alpha"] = alpha
            state["u"] = 0.5 * jnp.ones((B, 1))
        if self.windowing:
            state["win_idx"] = jnp.full((B,), -1, dtype=jnp.int32)
        return state

    def preprocess_inputs(self, inputs):
        return self.inputs_layer(inputs)

    def __call__(
        self, query, inputs, processed_inputs, mask, state: Dict, train: bool = True
    ) -> Tuple[jnp.ndarray, Dict]:
        """query `[B, C_q]` → (context `[B, D_en]`, new state)."""
        new_state = dict(state)
        T = inputs.shape[1]
        processed_query = self.query_layer(query[:, None, :])  # [B,1,A]
        if self.location_attention:
            attention_cat = jnp.stack(
                [state["attention_weights"], state["attention_weights_cum"]], axis=-1
            )  # [B, T, 2]
            processed_attn = self.location_layer(attention_cat)
            energies = self.v(jnp.tanh(processed_query + processed_attn + processed_inputs))[:, :, 0]
        else:
            energies = self.v(jnp.tanh(processed_query + processed_inputs))[:, :, 0]
        if mask is not None:
            energies = jnp.where(mask, energies, -1e9)
        if self.windowing and not train:
            # eval-only attention windowing (ref attentions.py:245-258,
            # apply_windowing). Per-batch window index instead of the
            # reference's batch-element-0 scalar (identical for B=1, the
            # reference's only inference batch size).
            idx = state["win_idx"][:, None]  # [B,1]
            pos = jnp.arange(T)[None, :]
            in_win = (pos >= idx - self.win_back) & (pos < idx + self.win_front)
            energies = jnp.where(in_win, energies, -1e9)
            # first step (win_idx == -1): pin position 0 to the row max
            # (ref :254-255 "trick"; global max there, row max here)
            first = idx < 0
            row_max = jnp.max(energies, axis=1, keepdims=True)
            energies = jnp.where(first & (pos == 0), row_max, energies)
            new_state["win_idx"] = jnp.argmax(energies, axis=1).astype(jnp.int32)
        if self.norm == "softmax":
            alignment = jax.nn.softmax(energies, axis=-1)
        elif self.norm == "sigmoid":
            s = jax.nn.sigmoid(energies)
            alignment = s / jnp.sum(s, axis=1, keepdims=True)
        else:
            raise ValueError("Unknown attention norm")
        if self.location_attention:
            new_state["attention_weights_cum"] = state["attention_weights_cum"] + alignment
        if self.forward_attn:
            fwd_shifted = jnp.pad(state["alpha"][:, :-1], ((0, 0), (1, 0)))
            alpha = ((1 - state["u"]) * state["alpha"] + state["u"] * fwd_shifted + 1e-8) * alignment
            if self.forward_attn_mask and not train:
                # eval-only incremental-alignment forcing (ref attentions.py:
                # 265-272): zero everything past n+3 and before n-1, smooth
                # n-2 with 0.01·max — where n is the argmax of the shifted
                # alpha. Guarded to n≥2 instead of the reference's negative-
                # index wraparound (a torch slicing artifact when n<2).
                n = jnp.argmax(fwd_shifted, axis=1)[:, None]  # [B,1]
                val = jnp.max(alpha, axis=1, keepdims=True)
                pos = jnp.arange(alpha.shape[1])[None, :]
                alpha = jnp.where(pos >= n + 3, 0.0, alpha)
                alpha = jnp.where(pos < n - 1, 0.0, alpha)
                alpha = jnp.where((pos == n - 2) & (n >= 2), 0.01 * val, alpha)
            alpha = alpha / jnp.sum(alpha, axis=1, keepdims=True)
            alignment = alpha
            new_state["alpha"] = alpha
        context = jnp.einsum("bt,btc->bc", alignment, inputs)
        new_state["attention_weights"] = alignment
        if self.forward_attn and self.trans_agent:
            ta_input = jnp.concatenate([context, query], axis=-1)
            new_state["u"] = jax.nn.sigmoid(self.ta(ta_input))
        return context, new_state


class GravesAttention(nn.Module):
    """GMM (GMMv2b) attention (ref attentions.py:40)."""

    query_dim: int
    K: int = 5

    def setup(self):
        self.N_a = nn.Sequential(
            [nn.Dense(self.query_dim, use_bias=True), nn.relu, nn.Dense(3 * self.K, use_bias=True)]
        )
        self.eps = 1e-5

    def init_state(self, B: int, T: int) -> Dict:
        return {"mu_prev": jnp.zeros((B, self.K)), "attention_weights": jnp.zeros((B, T))}

    def preprocess_inputs(self, inputs):
        return None

    def __call__(self, query, inputs, processed_inputs, mask, state: Dict, train: bool = True):
        T = inputs.shape[1]
        gbk = self.N_a(query)  # [B, 3K]
        g_t, b_t, k_t = jnp.split(gbk, 3, axis=-1)
        sig_t = jax.nn.softplus(b_t) + self.eps
        mu_t = state["mu_prev"] + jax.nn.softplus(k_t)
        g_t = jax.nn.softmax(g_t, axis=-1) + self.eps
        j = jnp.arange(T + 1, dtype=jnp.float32)[None, None, :]  # [1,1,T+1]
        phi_t = g_t[:, :, None] * (1 / (1 + jax.nn.sigmoid((mu_t[:, :, None] - j) / sig_t[:, :, None])))
        alpha_t = jnp.sum(phi_t, axis=1)
        alpha_t = alpha_t[:, 1:] - alpha_t[:, :-1]
        if mask is not None:
            alpha_t = jnp.where(mask, alpha_t, 0.0)
        context = jnp.einsum("bt,btc->bc", alpha_t, inputs)
        return context, {"mu_prev": mu_t, "attention_weights": alpha_t}


def _betabinom_pmf(n: int, a: float, b: float):
    """Beta-binomial pmf over k=0..n (stdlib lgamma; no scipy dependency)."""
    import math

    def lbeta(x, y):
        return math.lgamma(x) + math.lgamma(y) - math.lgamma(x + y)

    pmf = []
    for k in range(n + 1):
        logp = (
            math.lgamma(n + 1)
            - math.lgamma(k + 1)
            - math.lgamma(n - k + 1)
            + lbeta(k + a, n - k + b)
            - lbeta(a, b)
        )
        pmf.append(math.exp(logp))
    return pmf


class MonotonicDynamicConvolutionAttention(nn.Module):
    """Dynamic convolution attention (arXiv:1910.10288; ref attentions.py:323):
    alignment energies from static + dynamically-predicted conv filters over the
    previous attention weights, plus a causal beta-binomial prior that keeps the
    alignment moving forward. Pure per-step function with explicit state."""

    query_dim: int
    embedding_dim: int
    attention_dim: int = 128
    static_filter_dim: int = 8
    static_kernel_size: int = 21
    dynamic_filter_dim: int = 8
    dynamic_kernel_size: int = 21
    prior_filter_len: int = 11
    alpha: float = 0.1
    beta: float = 0.9

    def setup(self):
        self.query_layer = nn.Dense(self.attention_dim)
        self.key_layer = nn.Dense(self.dynamic_filter_dim * self.dynamic_kernel_size, use_bias=False)
        self.static_filter_conv = nn.Conv(
            self.static_filter_dim, (self.static_kernel_size,), padding="SAME", use_bias=False
        )
        self.static_filter_layer = nn.Dense(self.attention_dim, use_bias=False)
        self.dynamic_filter_layer = nn.Dense(self.attention_dim)
        self.v = nn.Dense(1, use_bias=False)
        # prior, reversed for causal cross-correlation (ref :389 flip(0))
        prior = _betabinom_pmf(self.prior_filter_len - 1, self.alpha, self.beta)
        self.prior = jnp.asarray(prior[::-1], dtype=jnp.float32)

    def init_state(self, B: int, T: int) -> Dict:
        w = jnp.zeros((B, T)).at[:, 0].set(1.0)
        return {"attention_weights": w}

    def preprocess_inputs(self, inputs):
        return None

    @staticmethod
    def _unfold(w: jnp.ndarray, k: int, causal: bool) -> jnp.ndarray:
        """[B, T] → sliding windows [B, T, k] (left-pad k-1 if causal, else SAME)."""
        pad = (k - 1, 0) if causal else ((k - 1) // 2, k // 2)
        wp = jnp.pad(w, ((0, 0), pad))
        idx = jnp.arange(w.shape[1])[:, None] + jnp.arange(k)[None, :]
        return wp[:, idx]

    def __call__(self, query, inputs, processed_inputs, mask, state: Dict, train: bool = True):
        w_prev = state["attention_weights"]  # [B, T]
        # causal beta-binomial prior (ref :394-399)
        prior_win = self._unfold(w_prev, self.prior_filter_len, causal=True)
        prior_filter = jnp.log(jnp.clip(prior_win @ self.prior, a_min=1e-6))
        # dynamic filters predicted from the query (ref :400-408)
        G = self.key_layer(jnp.tanh(self.query_layer(query)))  # [B, dyn*k]
        G = G.reshape(-1, self.dynamic_filter_dim, self.dynamic_kernel_size)
        dyn_win = self._unfold(w_prev, self.dynamic_kernel_size, causal=False)  # [B,T,k]
        dynamic_filter = jnp.einsum("btk,bdk->btd", dyn_win, G)
        # static filters (ref :410)
        static_filter = self.static_filter_conv(w_prev[:, :, None])  # [B,T,static]
        energies = (
            self.v(
                jnp.tanh(self.static_filter_layer(static_filter) + self.dynamic_filter_layer(dynamic_filter))
            )[:, :, 0]
            + prior_filter
        )
        alignment = jax.nn.softmax(energies, axis=-1)
        if mask is not None:
            # ref :423 masks AFTER the softmax with a small floor value
            alignment = jnp.where(mask, alignment, 1e-8)
        context = jnp.einsum("bt,btc->bc", alignment, inputs)
        return context, {"attention_weights": alignment}


def init_attn(attn_type: str, **kwargs):
    if attn_type == "original":
        kwargs.pop("K", None)
        return OriginalAttention(**kwargs)
    if attn_type == "graves":
        return GravesAttention(query_dim=kwargs["query_dim"], K=kwargs.get("K", 5))
    if attn_type == "dynamic_convolution":
        return MonotonicDynamicConvolutionAttention(
            query_dim=kwargs["query_dim"],
            embedding_dim=kwargs["embedding_dim"],
            attention_dim=kwargs.get("attention_dim", 128),
        )
    raise ValueError(f" [!] Unknown attention type {attn_type}")


class FrozenBatchNorm(nn.Module):
    """Inference-mode torch BatchNorm as a per-channel affine over running
    stats: y = (x - mean)/sqrt(var + eps) · scale + bias. Used when ingesting
    reference Tacotron checkpoints (their encoders/postnets are BN-based;
    ours trains with LayerNorm — see README deviations)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


def _norm(norm_type: str, features: int, name: str, momentum: float = 0.1, eps: float = 1e-5):
    """Norm factory: "batch" = torch-semantics BatchNorm (training from
    scratch, ref tacotron2.py:30 momentum=0.1 eps=1e-5), "frozen_batch" =
    running stats folded into params (checkpoint ingest), "layer" = LayerNorm
    (stateless alternative, kept for back-compat)."""
    if norm_type == "frozen_batch":
        return FrozenBatchNorm(features, eps=eps, name=name)
    if norm_type == "batch":
        from tpu_tts.layers.common import TorchBatchNorm

        return TorchBatchNorm(features, eps=eps, momentum=momentum, name=name)
    return nn.LayerNorm(name=name)


def _apply_norm(norm_type: str, features: int, name: str, x, train: bool, momentum: float = 0.1, eps: float = 1e-5):
    n = _norm(norm_type, features, name, momentum=momentum, eps=eps)
    if norm_type == "batch":
        return n(x, train)
    return n(x)


class Tacotron2Encoder(nn.Module):
    """3 × [conv5-LN-relu-dropout] → BiLSTM (ref tacotron2.py:73)."""

    output_dim: int = 512
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        for i in range(3):
            x = Conv1d(self.output_dim, 5, name=f"conv_{i}")(x * x_mask)
            x = _apply_norm(self.norm_type, self.output_dim, f"norm_{i}", x, train)
            x = nn.Dropout(0.5, deterministic=not train)(nn.relu(x))
        half = self.output_dim // 2
        fwd = nn.RNN(nn.OptimizedLSTMCell(half), name="lstm_fwd")(x * x_mask)
        bwd = nn.RNN(nn.OptimizedLSTMCell(half), reverse=True, keep_order=True, name="lstm_bwd")(x * x_mask)
        return jnp.concatenate([fwd, bwd], axis=-1) * x_mask


class Postnet(nn.Module):
    """5 × [conv5-LN-(tanh)-dropout] residual refiner (ref tacotron2.py:47)."""

    mel_dim: int = 80
    num_convs: int = 5
    channels: int = 512
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_convs):
            last = i == self.num_convs - 1
            ch = self.mel_dim if last else self.channels
            x = Conv1d(ch, 5, name=f"conv_{i}")(x)
            x = _apply_norm(self.norm_type, ch, f"norm_{i}", x, train)
            if not last:
                x = jnp.tanh(x)
            x = nn.Dropout(0.5, deterministic=not train)(x)
        return x


class Tacotron2DecoderCell(nn.Module):
    """One AR step: prenet → attention LSTM → attention → decoder LSTM →
    frame projection + stop token (ref Decoder.decode tacotron2.py:256)."""

    frame_channels: int = 80
    r: int = 1
    # param-shape reduction factor for gradual training (ref layers/tacotron/
    # tacotron2.py uses `r_init` so `set_r` can shrink r without re-init):
    # projections are sized for r_init and sliced to the active r. 0 → r.
    r_init: int = 0
    encoder_dim: int = 512
    attn_rnn_dim: int = 1024
    decoder_rnn_dim: int = 1024
    prenet_dims: Tuple[int, ...] = (256, 256)
    prenet_dropout_at_inference: bool = True
    attn_type: str = "original"
    attn_kwargs: Optional[tuple] = None

    def setup(self):
        self.prenet = Prenet(self.prenet_dims, dropout_at_inference=self.prenet_dropout_at_inference)
        self.attention_rnn = nn.OptimizedLSTMCell(self.attn_rnn_dim)
        kw = dict(self.attn_kwargs or ())
        self.attention = init_attn(
            self.attn_type,
            query_dim=self.attn_rnn_dim,
            embedding_dim=self.encoder_dim,
            attention_dim=kw.get("attention_dim", 128),
            location_attention=kw.get("location_attention", True),
            attention_location_n_filters=kw.get("attention_location_n_filters", 32),
            attention_location_kernel_size=kw.get("attention_location_kernel_size", 31),
            norm=kw.get("norm", "softmax"),
            forward_attn=kw.get("forward_attn", False),
            trans_agent=kw.get("trans_agent", False),
            forward_attn_mask=kw.get("forward_attn_mask", False),
            windowing=kw.get("windowing", False),
        ) if self.attn_type == "original" else init_attn(
            self.attn_type,
            query_dim=self.attn_rnn_dim,
            embedding_dim=self.encoder_dim,
            attention_dim=kw.get("attention_dim", 128),
            K=kw.get("K", 5),
        )
        self.decoder_rnn = nn.OptimizedLSTMCell(self.decoder_rnn_dim)
        self.linear_projection = nn.Dense(self.frame_channels * (self.r_init or self.r))
        self.stopnet = nn.Dense(1)

    def preprocess_inputs(self, inputs):
        return self.attention.preprocess_inputs(inputs)

    def init_carry(self, rng, B, T_en):
        attn_c = self.attention_rnn.initialize_carry(rng, (B, 1))
        dec_c = self.decoder_rnn.initialize_carry(jax.random.fold_in(rng, 1), (B, 1))
        return {
            "attn_rnn": attn_c,
            "dec_rnn": dec_c,
            "attn_state": self.attention.init_state(B, T_en),
            "context": jnp.zeros((B, self.encoder_dim)),
            "prev_frame": jnp.zeros((B, self.frame_channels * self.r)),
        }

    @nn.compact
    def __call__(self, carry, frame_input, inputs, processed_inputs, mask, train: bool):
        """frame_input: previous mel frame(s) `[B, mel*r]` (teacher-forced or
        own output). Returns (new_carry, (frames, stop_logit, attn_weights))."""
        prenet_out = self.prenet(frame_input[..., : self.frame_channels], train=train)
        cell_in = jnp.concatenate([prenet_out, carry["context"]], axis=-1)
        attn_rnn_state, attn_h = self.attention_rnn(carry["attn_rnn"], cell_in)
        attn_h = nn.Dropout(0.1, deterministic=not train)(attn_h)
        context, attn_state = self.attention(attn_h, inputs, processed_inputs, mask, carry["attn_state"], train)
        dec_in = jnp.concatenate([attn_h, context], axis=-1)
        dec_rnn_state, dec_h = self.decoder_rnn(carry["dec_rnn"], dec_in)
        dec_h = nn.Dropout(0.1, deterministic=not train)(dec_h)
        proj_in = jnp.concatenate([dec_h, context], axis=-1)
        frames_full = self.linear_projection(proj_in)  # [B, mel*r_init]
        frames = frames_full[..., : self.frame_channels * self.r]  # active r
        stop_in = jnp.concatenate([dec_h, frames_full], axis=-1)
        stop = self.stopnet(jax.lax.stop_gradient(stop_in) if False else stop_in)[:, 0]
        new_carry = {
            "attn_rnn": attn_rnn_state,
            "dec_rnn": dec_rnn_state,
            "attn_state": attn_state,
            "context": context,
            "prev_frame": frames,
        }
        return new_carry, (frames, stop, attn_state["attention_weights"])


class Tacotron2Decoder(nn.Module):
    """Scan wrapper: teacher-forced training decode + free-running inference
    (ref Decoder.forward:320 / Decoder.inference:348)."""

    frame_channels: int = 80
    r: int = 1
    r_init: int = 0  # see Tacotron2DecoderCell.r_init
    encoder_dim: int = 512
    attn_rnn_dim: int = 1024
    decoder_rnn_dim: int = 1024
    prenet_dims: Tuple[int, ...] = (256, 256)
    prenet_dropout_at_inference: bool = False
    attn_type: str = "original"
    attn_kwargs: Optional[tuple] = None
    max_decoder_steps: int = 500

    def setup(self):
        self.cell = Tacotron2DecoderCell(
            frame_channels=self.frame_channels,
            r=self.r,
            r_init=self.r_init,
            encoder_dim=self.encoder_dim,
            attn_rnn_dim=self.attn_rnn_dim,
            decoder_rnn_dim=self.decoder_rnn_dim,
            prenet_dims=self.prenet_dims,
            prenet_dropout_at_inference=self.prenet_dropout_at_inference,
            attn_type=self.attn_type,
            attn_kwargs=self.attn_kwargs,
        )

    def __call__(self, inputs, memories, mask, train: bool = True):
        """Teacher forcing. inputs `[B, T_en, D]`, memories `[B, T_de, mel]` →
        (frames `[B, T_de, mel]`, stops `[B, T_de/r]`, attns)."""
        B, T_de, _ = memories.shape
        r = self.r
        steps = T_de // r
        # frames grouped by r: step t consumes frame r*t-1 (last of prev group)
        mem_in = memories[:, r - 1 :: r][:, :-1]  # [B, steps-1, mel]
        go = jnp.zeros((B, 1, self.frame_channels))
        mem_in = jnp.concatenate([go, mem_in], axis=1)  # [B, steps, mel]
        processed_inputs = self.cell.preprocess_inputs(inputs)
        carry = self.cell.init_carry(jax.random.PRNGKey(0), B, inputs.shape[1])

        def step(mdl, carry, frame_in):
            return mdl(carry, frame_in, inputs, processed_inputs, mask, train)

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1,
            out_axes=1,
        )
        _, (frames, stops, attns) = scan(self.cell, carry, mem_in)
        frames = frames.reshape(B, steps * r, self.frame_channels)
        return frames, stops, attns

    def inference(self, inputs, mask=None):
        """Free-running with stop-token early masking (fixed max steps)."""
        B, T_en, _ = inputs.shape
        processed_inputs = self.cell.preprocess_inputs(inputs)
        carry = self.cell.init_carry(jax.random.PRNGKey(0), B, T_en)
        carry = dict(carry, stopped=jnp.zeros((B,), dtype=bool), frame=jnp.zeros((B, self.frame_channels)))
        steps = self.max_decoder_steps // self.r

        def step(mdl, carry, _):
            stopped = carry["stopped"]
            inner = {k: carry[k] for k in ("attn_rnn", "dec_rnn", "attn_state", "context", "prev_frame")}
            inner, (frames, stop, attn) = mdl(inner, carry["frame"], inputs, processed_inputs, mask, False)
            new_stopped = stopped | (jax.nn.sigmoid(stop) > 0.5)
            new_carry = dict(
                inner,
                stopped=new_stopped,
                frame=frames[..., -self.frame_channels :],
            )
            valid = (~stopped).astype(frames.dtype)[:, None]
            return new_carry, (frames * valid, stop, attn, valid[:, 0])

        scan = nn.scan(step, variable_broadcast="params", split_rngs={"params": False, "dropout": True}, in_axes=1, out_axes=1)
        _, (frames, stops, attns, valid) = scan(self.cell, carry, jnp.zeros((B, steps, 1)))
        frames = frames.reshape(B, steps * self.r, self.frame_channels)
        lengths = jnp.sum(valid, axis=1).astype(jnp.int32) * self.r
        return frames, stops, attns, lengths
