"""DelightfulTTS layer library: Conformer blocks, prosody reference encoders,
variance adaptors (arXiv:2110.12612).

Behavior spec: /root/reference/TTS/tts/layers/delightful_tts/
(conformer.py, conv_layers.py, encoders.py, networks.py, variance_predictor.py,
pitch_adaptor.py:10, energy_adaptor.py:10, phoneme_prosody_predictor.py:7).

TPU redesign notes:
- channels-last `[B, T, C]` throughout (the reference permutes around
  channels-first convs; here convs are natively NWC so the permutes vanish).
- masks are boolean VALID masks `[B, T]` (True = keep). The reference uses
  inverted "padding" masks; every consumer here takes valid masks and the
  orchestrator builds them once from lengths with `sequence_mask`.
- the reference's `nn.GRU` + pack_padded_sequence becomes a masked
  `flax.linen.RNN` scan with the final state gathered at `len - 1` — fixed
  shapes, no host sync.
- torch `InstanceNorm1d(affine=False)` applied to `[B, x, C]` tensors
  normalizes over the LAST axis only (num_features is never checked); that
  exact semantic is kept in `_norm_last`.
"""

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def positional_encoding(d_model: int, length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal table `[1, length, d_model]` (ref networks.py:18)."""
    position = jnp.arange(length, dtype=dtype)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=dtype) * -(math.log(10000.0) / d_model))
    pe = jnp.zeros((length, d_model), dtype=dtype)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe[None]


def _norm_last(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm1d(affine=False) over the last axis (see module docstring)."""
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class EmbeddingPadded(nn.Module):
    """Token embedding with a hard-zero pad row (ref networks.py:135)."""

    num_embeddings: int
    embedding_dim: int
    padding_idx: int = 0

    @nn.compact
    def __call__(self, idx):
        emb = nn.Embed(
            self.num_embeddings,
            self.embedding_dim,
            embedding_init=nn.initializers.normal(stddev=math.sqrt(2 / self.embedding_dim)),
            name="embeddings",
        )(idx)
        return emb * (idx != self.padding_idx)[..., None]


class BSConv1d(nn.Module):
    """Blueprint-separable conv: depthwise then pointwise (ref conv_layers.py:224)."""

    channels_out: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        x = nn.Conv(c_in, (self.kernel_size,), padding="SAME", feature_group_count=c_in, name="depthwise")(x)
        return nn.Conv(self.channels_out, (1,), name="pointwise")(x)


class ConvTransposed(nn.Module):
    """BSConv over `[B, T, C]` (the reference's transposes are layout-only;
    ref conv_layers.py:291)."""

    channels_out: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x):
        return BSConv1d(self.channels_out, self.kernel_size, name="conv")(x)


class Conv1dGLU(nn.Module):
    """DeepVoice-3 gated conv with speaker conditioning (ref conv_layers.py:264)."""

    d_model: int
    kernel_size: int
    embedding_dim: int

    @nn.compact
    def __call__(self, x, embeddings):
        residual = x
        h = BSConv1d(2 * self.d_model, self.kernel_size, name="conv")(x)
        a, b = jnp.split(h, 2, axis=-1)
        emb = nn.Dense(self.d_model, name="embedding_proj")(embeddings)
        a = a + jax.nn.soft_sign(emb)[:, None, :]
        x = a * jax.nn.sigmoid(b)
        return (x + residual) * math.sqrt(0.5)


class CoordConv1d(nn.Module):
    """Conv with appended coordinate (+radius) channels (ref conv_layers.py:377,
    AddCoords:352; arXiv:1811.02122)."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    with_r: bool = True

    @nn.compact
    def __call__(self, x):
        B, T, _ = x.shape
        coords = jnp.linspace(-1.0, 1.0, T, dtype=x.dtype) if T > 1 else jnp.zeros((1,), dtype=x.dtype)
        coords = jnp.broadcast_to(coords[None, :, None], (B, T, 1))
        feats = [x, coords]
        if self.with_r:
            feats.append(jnp.abs(coords))
        x = jnp.concatenate(feats, axis=-1)
        pad = self.kernel_size // 2
        return nn.Conv(
            self.out_channels, (self.kernel_size,), strides=(self.stride,), padding=((pad, pad),), name="conv"
        )(x)


class InstanceNorm1dAffine(nn.Module):
    """torch InstanceNorm1d(affine=True): per-channel stats over time."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # x: [B, T, C]; normalize over T per (B, C)
        mean = x.mean(axis=1, keepdims=True)
        var = x.var(axis=1, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


# --------------------------------------------------------------------------- #
# Conformer                                                                   #
# --------------------------------------------------------------------------- #


class RelativeMultiHeadAttention(nn.Module):
    """Transformer-XL relative-position MHA (ref conformer.py:334)."""

    d_model: int
    num_heads: int

    @staticmethod
    def _relative_shift(pos_score: jnp.ndarray) -> jnp.ndarray:
        b, h, l1, l2 = pos_score.shape
        padded = jnp.pad(pos_score, ((0, 0), (0, 0), (0, 0), (1, 0)))
        padded = padded.reshape(b, h, l2 + 1, l1)
        return padded[:, :, 1:].reshape(b, h, l1, l2)

    @nn.compact
    def __call__(self, query, key, value, pos_embedding, valid_mask):
        """valid_mask `[B, 1, 1, T_k]` or `[B, 1, T_q, T_k]` boolean (True=keep)."""
        B = query.shape[0]
        h, d_head = self.num_heads, self.d_model // self.num_heads
        q = nn.Dense(self.d_model, name="query_proj")(query).reshape(B, -1, h, d_head)
        k = nn.Dense(self.d_model, use_bias=False, name="key_proj")(key).reshape(B, -1, h, d_head)
        v = nn.Dense(self.d_model, use_bias=False, name="value_proj")(value).reshape(B, -1, h, d_head)
        pos = nn.Dense(self.d_model, use_bias=False, name="pos_proj")(pos_embedding).reshape(-1, pos_embedding.shape[1], h, d_head)
        u_bias = self.param("u_bias", nn.initializers.xavier_uniform(), (h, d_head))
        v_bias = self.param("v_bias", nn.initializers.xavier_uniform(), (h, d_head))

        content_score = jnp.einsum("bqhd,bkhd->bhqk", q + u_bias, k)
        pos_score = jnp.einsum("bqhd,bkhd->bhqk", q + v_bias, jnp.broadcast_to(pos, k.shape[:1] + pos.shape[1:]))
        pos_score = self._relative_shift(pos_score)
        score = (content_score + pos_score) / math.sqrt(self.d_model)
        score = jnp.where(valid_mask, score, -1e9)
        attn = jax.nn.softmax(score, axis=-1)
        context = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, -1, self.d_model)
        return nn.Dense(self.d_model, name="out_proj")(context), attn


class ConformerMultiHeadedSelfAttention(nn.Module):
    """MHSA wrapper: truncates the positional table to key length and applies
    dropout (ref conformer.py:297)."""

    d_model: int
    num_heads: int
    dropout_p: float

    @nn.compact
    def __call__(self, query, key, value, valid_mask, encoding, train: bool = False):
        encoding = encoding[:, : key.shape[1]]
        out, attn = RelativeMultiHeadAttention(self.d_model, self.num_heads, name="attention")(
            query, key, value, encoding, valid_mask
        )
        out = nn.Dropout(self.dropout_p, deterministic=not train)(out)
        return out, attn


class ConformerFeedForward(nn.Module):
    """Pre-norm conv feed-forward, half-step residual (ref conformer.py:178)."""

    d_model: int
    kernel_size: int = 3
    dropout: float = 0.1
    lrelu_slope: float = 0.3
    expansion_factor: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.LayerNorm(name="ln")(x)
        x = nn.Conv(self.d_model * self.expansion_factor, (self.kernel_size,), padding="SAME", name="conv_1")(x)
        x = jax.nn.leaky_relu(x, self.lrelu_slope)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.d_model, (1,), name="conv_2")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return 0.5 * x


class ConformerConvModule(nn.Module):
    """GLU-gated pointwise + depthwise conv module (ref conformer.py:234)."""

    d_model: int
    kernel_size: int = 7
    expansion_factor: int = 2
    dropout: float = 0.1
    lrelu_slope: float = 0.3

    @nn.compact
    def __call__(self, x, train: bool = False):
        inner = self.d_model * self.expansion_factor
        x = nn.LayerNorm(name="ln_1")(x)
        x = nn.Conv(inner * 2, (1,), name="conv_1")(x)
        out, gate = jnp.split(x, 2, axis=-1)
        x = out * jax.nn.leaky_relu(gate, self.lrelu_slope)  # GLUActivation (ref networks.py:78)
        x = nn.Conv(inner, (self.kernel_size,), padding="SAME", feature_group_count=inner, name="depthwise")(x)
        x = nn.GroupNorm(num_groups=1, name="ln_2")(x)
        x = jax.nn.leaky_relu(x, self.lrelu_slope)
        x = nn.Conv(self.d_model, (1,), name="conv_2")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class ConformerBlock(nn.Module):
    """FF → conv → MHSA → conv with residuals (ref conformer.py:93)."""

    d_model: int
    n_heads: int
    kernel_size_conv_mod: int
    speaker_embedding_dim: int
    dropout: float
    lrelu_slope: float = 0.3

    @nn.compact
    def __call__(self, x, valid_mask, attn_valid_mask, speaker_embedding, encoding, train: bool = False):
        if speaker_embedding is not None:
            x = Conv1dGLU(
                self.d_model, self.kernel_size_conv_mod, self.speaker_embedding_dim, name="conditioning"
            )(x, speaker_embedding)
        x = ConformerFeedForward(
            self.d_model, dropout=self.dropout, lrelu_slope=self.lrelu_slope, name="ff"
        )(x, train=train) + x
        x = ConformerConvModule(
            self.d_model, self.kernel_size_conv_mod, dropout=self.dropout, lrelu_slope=self.lrelu_slope,
            name="conformer_conv_1",
        )(x, train=train) + x
        res = x
        x = nn.LayerNorm(name="ln")(x)
        x, _ = ConformerMultiHeadedSelfAttention(self.d_model, self.n_heads, self.dropout, name="slf_attn")(
            x, x, x, attn_valid_mask, encoding, train=train
        )
        x = x + res
        x = x * valid_mask[:, :, None]
        x = ConformerConvModule(
            self.d_model, self.kernel_size_conv_mod, dropout=self.dropout, lrelu_slope=self.lrelu_slope,
            name="conformer_conv_2",
        )(x, train=train) + x
        return x


class Conformer(nn.Module):
    """Conformer stack (ref conformer.py:18)."""

    dim: int
    n_layers: int
    n_heads: int
    speaker_embedding_dim: int
    p_dropout: float
    kernel_size_conv_mod: int
    lrelu_slope: float = 0.3

    @nn.compact
    def __call__(self, x, valid_mask, speaker_embedding, encoding, train: bool = False):
        attn_valid_mask = valid_mask[:, None, None, :]  # [B,1,1,T]
        for i in range(self.n_layers):
            x = ConformerBlock(
                self.dim,
                self.n_heads,
                self.kernel_size_conv_mod,
                self.speaker_embedding_dim,
                self.p_dropout,
                self.lrelu_slope,
                name=f"block_{i}",
            )(x, valid_mask, attn_valid_mask, speaker_embedding, encoding, train=train)
        return x


# --------------------------------------------------------------------------- #
# Prosody reference encoders                                                  #
# --------------------------------------------------------------------------- #


class ReferenceEncoder(nn.Module):
    """Mel reference encoder: CoordConv + strided convs + GRU (ref encoders.py:24).

    Returns (outputs `[B, T', H]`, final_state `[B, H]`, out_lens `[B]`).
    """

    num_mels: int
    ref_enc_filters: Sequence[int] = (32, 32, 64, 64, 128, 128)
    ref_enc_size: int = 3
    ref_enc_strides: Sequence[int] = (1, 2, 1, 2, 1)
    ref_enc_gru_size: int = 32

    @nn.compact
    def __call__(self, mels, mel_lens):
        """mels `[B, T, num_mels]`, mel_lens `[B]`."""
        from tpu_tts.ops.helpers import sequence_mask

        K = len(self.ref_enc_filters)
        strides = [1] + list(self.ref_enc_strides)
        x = mels * sequence_mask(mel_lens, mels.shape[1]).astype(mels.dtype)[:, :, None]
        pad = self.ref_enc_size // 2
        for i in range(K):
            if i == 0:
                x = CoordConv1d(self.ref_enc_filters[0], self.ref_enc_size, stride=strides[0], name="conv_0")(x)
            else:
                x = nn.Conv(
                    self.ref_enc_filters[i],
                    (self.ref_enc_size,),
                    strides=(strides[i],),
                    padding=((pad, pad),),
                    name=f"conv_{i}",
                )(x)
            x = jax.nn.leaky_relu(x, 0.3)
            x = InstanceNorm1dAffine(self.ref_enc_filters[i], name=f"norm_{i}")(x)
        out_lens = mel_lens
        for s in strides:
            if s > 1:
                out_lens = jnp.ceil(out_lens / s).astype(jnp.int32)
        out_mask = sequence_mask(out_lens, x.shape[1]).astype(x.dtype)
        x = x * out_mask[:, :, None]
        outputs = nn.RNN(nn.GRUCell(self.ref_enc_gru_size), name="gru")(x)
        # final valid state (pack_padded_sequence equivalent)
        idx = jnp.clip(out_lens - 1, 0, x.shape[1] - 1)
        final = jnp.take_along_axis(outputs, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        return outputs, final, out_lens


class StyleEmbedAttention(nn.Module):
    """Attention over learned style tokens (ref networks.py:96)."""

    num_units: int
    num_heads: int
    key_dim: int

    @nn.compact
    def __call__(self, query, key_soft):
        h = self.num_heads
        d = self.num_units // h
        q = nn.Dense(self.num_units, use_bias=False, name="W_query")(query)
        k = nn.Dense(self.num_units, use_bias=False, name="W_key")(key_soft)
        v = nn.Dense(self.num_units, use_bias=False, name="W_value")(key_soft)
        B, Tq, _ = q.shape
        Tk = k.shape[1]
        q = q.reshape(B, Tq, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, Tk, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, Tk, h, d).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (self.key_dim**0.5)
        scores = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", scores, v)
        return out.transpose(0, 2, 1, 3).reshape(B, Tq, self.num_units)


class STL(nn.Module):
    """Style Token Layer (ref networks.py:186)."""

    n_hidden: int
    token_num: int = 32

    @nn.compact
    def __call__(self, x):
        """x `[B, E//2]` → `[B, 1, E]`."""
        embed = self.param("embed", nn.initializers.normal(0.5), (self.token_num, self.n_hidden))
        keys = jnp.tanh(embed)[None].repeat(x.shape[0], axis=0)  # [B, token_num, E]
        query = x[:, None, :]  # [B, 1, E//2]
        return StyleEmbedAttention(self.n_hidden, 1, self.n_hidden, name="attention")(query, keys)


class UtteranceLevelProsodyEncoder(nn.Module):
    """Utterance prosody: ref encoder final state → STL → bottleneck
    (ref encoders.py:128)."""

    num_mels: int
    ref_enc_filters: Sequence[int]
    ref_enc_size: int
    ref_enc_strides: Sequence[int]
    ref_enc_gru_size: int
    dropout: float
    n_hidden: int
    bottleneck_size_u: int
    token_num: int

    @nn.compact
    def __call__(self, mels, mel_lens, train: bool = False):
        """mels `[B, T, C]` → `[B, 1, bottleneck_size_u]`."""
        _, memory, _ = ReferenceEncoder(
            self.num_mels, self.ref_enc_filters, self.ref_enc_size, self.ref_enc_strides, self.ref_enc_gru_size,
            name="encoder",
        )(mels, mel_lens)
        q = nn.Dense(self.n_hidden // 2, name="encoder_prj")(memory)
        out = STL(self.n_hidden, self.token_num, name="stl")(q)
        out = nn.Dense(self.bottleneck_size_u, name="encoder_bottleneck")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class PhonemeLevelProsodyEncoder(nn.Module):
    """Phoneme prosody: text queries attend over ref-encoded mel frames
    (ref encoders.py:200)."""

    num_mels: int
    ref_enc_filters: Sequence[int]
    ref_enc_size: int
    ref_enc_strides: Sequence[int]
    ref_enc_gru_size: int
    dropout: float
    n_hidden: int
    n_heads: int
    bottleneck_size_p: int

    @nn.compact
    def __call__(self, x, src_valid_mask, mels, mel_lens, encoding, train: bool = False):
        """x `[B, T_src, E]` → `[B, T_src, bottleneck_size_p]`."""
        from tpu_tts.ops.helpers import sequence_mask

        outputs, _, out_lens = ReferenceEncoder(
            self.num_mels, self.ref_enc_filters, self.ref_enc_size, self.ref_enc_strides, self.ref_enc_gru_size,
            name="encoder",
        )(mels, mel_lens)
        embedded_prosody = nn.Dense(self.n_hidden, name="encoder_prj")(outputs)
        attn_valid = sequence_mask(out_lens, outputs.shape[1])[:, None, None, :]
        x, _ = ConformerMultiHeadedSelfAttention(self.n_hidden, self.n_heads, self.dropout, name="attention")(
            x, embedded_prosody, embedded_prosody, attn_valid, encoding, train=train
        )
        x = nn.Dense(self.bottleneck_size_p, name="encoder_bottleneck")(x)
        return x * src_valid_mask[:, :, None]


# --------------------------------------------------------------------------- #
# Variance adaptors                                                           #
# --------------------------------------------------------------------------- #


class VariancePredictor(nn.Module):
    """2× BSConv + LN + dropout, linear head (ref variance_predictor.py:7)."""

    channels: int
    channels_out: int = 1
    kernel_size: int = 5
    p_dropout: float = 0.5
    lrelu_slope: float = 0.3

    @nn.compact
    def __call__(self, x, valid_mask, train: bool = False):
        """x `[B, T, C]`, valid_mask `[B, T]` → `[B, T]` (channels_out=1)."""
        for i in range(2):
            x = ConvTransposed(self.channels, self.kernel_size, name=f"conv_{i}")(x)
            x = jax.nn.leaky_relu(x, self.lrelu_slope)
            x = nn.LayerNorm(name=f"ln_{i}")(x)
            x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = nn.Dense(self.channels_out, name="linear_layer")(x)
        x = x[..., 0] if self.channels_out == 1 else x
        return x * valid_mask


class PhonemeProsodyPredictor(nn.Module):
    """Prosody predictor: conv stack + bottleneck head (ref
    phoneme_prosody_predictor.py:7)."""

    hidden_size: int
    kernel_size: int
    dropout: float
    bottleneck_size: int
    lrelu_slope: float = 0.3

    @nn.compact
    def __call__(self, x, valid_mask, train: bool = False):
        for i in range(2):
            x = ConvTransposed(self.hidden_size, self.kernel_size, name=f"conv_{i}")(x)
            x = jax.nn.leaky_relu(x, self.lrelu_slope)
            x = nn.LayerNorm(name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = x * valid_mask[:, :, None]
        return nn.Dense(self.bottleneck_size, name="predictor_bottleneck")(x)


class PitchAdaptor(nn.Module):
    """Pitch predictor + pitch embedding conv (ref pitch_adaptor.py:10)."""

    n_input: int
    n_hidden: int
    kernel_size: int = 5
    emb_kernel_size: int = 3
    p_dropout: float = 0.5
    lrelu_slope: float = 0.3

    def setup(self):
        self.pitch_predictor = VariancePredictor(
            channels=self.n_hidden,
            channels_out=1,
            kernel_size=self.kernel_size,
            p_dropout=self.p_dropout,
            lrelu_slope=self.lrelu_slope,
        )
        self.pitch_emb = nn.Conv(self.n_input, (self.emb_kernel_size,), padding="SAME")

    def get_pitch_embedding_train(self, x, target, dr, valid_mask, train: bool = False):
        """x `[B,T_src,C]`, target `[B,T_mel]`, dr `[B,T_src]` →
        (pred `[B,T_src]`, avg target `[B,T_src]`, emb `[B,T_src,C]`)."""
        from tpu_tts.ops.helpers import average_over_durations

        pitch_pred = self.pitch_predictor(x, valid_mask, train=train)
        avg_target = average_over_durations(target[:, None, :], dr.astype(jnp.int32))[:, 0]  # [B, T_src]
        emb = self.pitch_emb(avg_target[:, :, None])
        return pitch_pred, avg_target, emb

    def get_pitch_embedding(self, x, valid_mask, pitch_transform=None, pitch_mean=None, pitch_std=None):
        pitch_pred = self.pitch_predictor(x, valid_mask, train=False)
        if pitch_transform is not None:
            pitch_pred = pitch_transform(pitch_pred, valid_mask.sum(), pitch_mean, pitch_std)
        emb = self.pitch_emb(pitch_pred[:, :, None])
        return emb, pitch_pred


class EnergyAdaptor(nn.Module):
    """Energy predictor + embedding conv (ref energy_adaptor.py:10)."""

    channels_in: int
    channels_hidden: int
    kernel_size: int = 5
    emb_kernel_size: int = 3
    dropout: float = 0.5
    lrelu_slope: float = 0.3

    def setup(self):
        self.energy_predictor = VariancePredictor(
            channels=self.channels_hidden,
            channels_out=1,
            kernel_size=self.kernel_size,
            p_dropout=self.dropout,
            lrelu_slope=self.lrelu_slope,
        )
        self.energy_emb = nn.Conv(self.channels_hidden, (self.emb_kernel_size,), padding="SAME")

    def get_energy_embedding_train(self, x, target, dr, valid_mask, train: bool = False):
        from tpu_tts.ops.helpers import average_over_durations

        energy_pred = self.energy_predictor(x, valid_mask, train=train)
        avg_target = average_over_durations(target[:, None, :], dr.astype(jnp.int32))[:, 0]
        emb = self.energy_emb(avg_target[:, :, None])
        return energy_pred, avg_target, emb

    def get_energy_embedding(self, x, valid_mask, energy_transform=None):
        energy_pred = self.energy_predictor(x, valid_mask, train=False)
        if energy_transform is not None:
            energy_pred = energy_transform(energy_pred, valid_mask.sum(axis=-1))
        emb = self.energy_emb(energy_pred[:, :, None])
        return emb, energy_pred
