"""Feed-forward encoder/decoder blocks for the ForwardTTS family.

Mirror of /root/reference/TTS/tts/layers/{generic/transformer.py (FFTransformer
:6), feed_forward/encoder.py (encoder registry :137-145), feed_forward/
decoder.py (incl. residual_conv_bn / wavenet variants), generic/res_conv_bn.py,
generic/pos_encoding.py, generic/aligner.py (AlignmentNetwork:7)}.
"""

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.layers.common import WN, Conv1d


class FFTransformerLayer(nn.Module):
    """Self-attention + conv FFN transformer layer (ref transformer.py:6)."""

    channels: int
    num_heads: int
    hidden_channels_ffn: int = 1024
    kernel_size_fft: int = 3
    dropout_p: float = 0.1

    @nn.compact
    def __call__(self, x, key_padding_mask=None, train: bool = False):
        # key_padding_mask: [B, T] True where VALID
        attn_mask = None
        if key_padding_mask is not None:
            attn_mask = key_padding_mask[:, None, None, :]  # [B,1,1,T]
        x2 = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.channels,
            dropout_rate=self.dropout_p,
            deterministic=not train,
            name="self_attn",
        )(x, x, mask=attn_mask)
        drop = nn.Dropout(self.dropout_p, deterministic=not train)
        # note: reference adds src twice (src + dropout(src2); norm1(src+src2))
        x = x + drop(x2)
        x = nn.LayerNorm(name="norm1")(x + x2)
        y = Conv1d(self.hidden_channels_ffn, self.kernel_size_fft, name="conv1")(x)
        y = Conv1d(self.channels, self.kernel_size_fft, name="conv2")(nn.relu(y))
        y = drop(y)
        x = nn.LayerNorm(name="norm2")(x + y)
        return x


class FFTransformerBlock(nn.Module):
    channels: int
    num_heads: int
    hidden_channels_ffn: int
    num_layers: int
    dropout_p: float

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, train: bool = False):
        kpm = None
        if x_mask is not None:
            kpm = x_mask[:, :, 0] > 0
        for i in range(self.num_layers):
            x = FFTransformerLayer(
                self.channels, self.num_heads, self.hidden_channels_ffn,
                dropout_p=self.dropout_p, name=f"fft_{i}",
            )(x, key_padding_mask=kpm, train=train)
        if x_mask is not None:
            x = x * x_mask
        return x


def _ff_norm(norm_type: str, features: int, name: str, x, train: bool = False):
    """Apply the configured norm (ref generic/res_conv_bn.py:39 uses
    nn.BatchNorm1d defaults: momentum=0.1, eps=1e-5)."""
    from tpu_tts.layers.tacotron import _apply_norm

    return _apply_norm(norm_type, features, name, x, train)


class Conv1dBN(nn.Module):
    """Valid conv → zero-pad output → relu → norm (ref generic/
    res_conv_bn.py:18 `Conv1dBN`: padding is applied AFTER the convolution,
    so boundary rows are relu(0) pushed through the norm — replicated
    exactly for checkpoint parity)."""

    out_channels: int
    kernel_size: int
    dilation: int = 1
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, x, x_mask=None, train: bool = False):
        pad = self.dilation * (self.kernel_size - 1)
        ps, pe = pad // 2, pad - pad // 2
        T = x.shape[1]
        # pre-pad + zeroing the boundary rows == the reference's valid conv
        # followed by output zero-padding, but survives T < receptive field.
        # With a mask the end boundary tracks each sample's true length, so
        # bucket-padded inference reproduces the reference's unpadded run.
        x = jnp.pad(x, ((0, 0), (ps, pe), (0, 0)))
        x = nn.Conv(self.out_channels, (self.kernel_size,), kernel_dilation=(self.dilation,),
                    padding="VALID", name="conv1d")(x)
        if pad:
            idx = jnp.arange(T)
            if x_mask is not None and not isinstance(x_mask, float):
                lengths = jnp.sum(x_mask[:, :, 0], axis=1)
                edge = (idx[None, :] >= ps) & (idx[None, :] < jnp.maximum(lengths - pe, ps)[:, None])
                edge = edge.astype(x.dtype)[:, :T][:, :, None]
            else:
                edge = ((idx >= ps) & (idx < max(T - pe, ps))).astype(x.dtype)[None, :, None]
            x = x[:, :T] * edge
        else:
            x = x[:, :T]
        x = nn.relu(x)
        return _ff_norm(self.norm_type, self.out_channels, "norm", x, train)


class Conv1dBNBlock(nn.Module):
    """`num_conv_blocks` chained Conv1dBN at one dilation
    (ref res_conv_bn.py:49)."""

    out_channels: int
    hidden_channels: int
    kernel_size: int
    dilation: int = 1
    num_conv_blocks: int = 2
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, x, x_mask=None, train: bool = False):
        for i in range(self.num_conv_blocks):
            ch = self.out_channels if i == self.num_conv_blocks - 1 else self.hidden_channels
            x = Conv1dBN(ch, self.kernel_size, self.dilation, self.norm_type, name=f"conv_bn_{i}")(x, x_mask, train)
        return x


class ResidualConv1dBNBlock(nn.Module):
    """Dilated conv-relu-norm residual stacks (ref res_conv_bn.py:83), the
    SpeedySpeech encoder/decoder core. `norm_type="frozen_batch"` reproduces
    the reference's BatchNorm for checkpoint ingest; "layer" trains
    stateless."""

    hidden_channels: int
    out_channels: int
    kernel_size: int
    dilations: Tuple[int, ...]
    num_conv_blocks: int = 2
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, train: bool = False):
        if x_mask is None:
            x_mask = 1.0
        o = x * x_mask
        for b, d in enumerate(self.dilations):
            res = o
            ch = self.out_channels if b == len(self.dilations) - 1 else self.hidden_channels
            o = Conv1dBNBlock(
                ch, self.hidden_channels, self.kernel_size, d,
                self.num_conv_blocks, self.norm_type, name=f"res_block_{b}",
            )(o, x_mask if not isinstance(x_mask, float) else None, train)
            o = (o + res) * x_mask
        return o


class ResidualConv1dBNEncoder(nn.Module):
    """SpeedySpeech encoder (ref feed_forward/encoder.py:41): 1×1 prenet,
    residual conv stack, conv-relu-norm-conv postnet with an input residual."""

    hidden_channels: int
    out_channels: int
    kernel_size: int = 4
    dilations: Tuple[int, ...] = (1, 2, 4, 1, 2, 4, 1, 2, 4, 1, 2, 4, 1)
    num_conv_blocks: int = 2
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, train: bool = False):
        if x_mask is None:
            x_mask = 1.0
        o = nn.relu(nn.Dense(self.hidden_channels, name="prenet")(x)) * x_mask
        o = ResidualConv1dBNBlock(
            self.hidden_channels, self.hidden_channels, self.kernel_size,
            tuple(self.dilations), self.num_conv_blocks, self.norm_type,
            name="res_conv_block",
        )(o, x_mask, train=train)
        o = o + x
        o = nn.relu(nn.Dense(self.hidden_channels, name="postnet_0")(o))
        o = _ff_norm(self.norm_type, self.hidden_channels, "postnet_norm", o, train)
        o = nn.Dense(self.out_channels, name="postnet_1")(o) * x_mask
        return o * x_mask


class ResidualConv1dBNDecoder(nn.Module):
    """SpeedySpeech decoder (ref feed_forward/decoder.py:125): residual conv
    stack, 1×1 post conv with input residual, Conv1dBNBlock postnet. The
    reference's final 1×1 conv to `out_channels` is the model-level `proj`."""

    hidden_channels: int
    out_channels: int
    kernel_size: int = 4
    dilations: Tuple[int, ...] = tuple(4 * [1, 2, 4, 8] + [1])
    num_conv_blocks: int = 2
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, train: bool = False):
        if x_mask is None:
            x_mask = 1.0
        o = ResidualConv1dBNBlock(
            self.hidden_channels, self.hidden_channels, self.kernel_size,
            tuple(self.dilations), self.num_conv_blocks, self.norm_type,
            name="res_conv_block",
        )(x, x_mask, train=train)
        o = nn.Dense(self.hidden_channels, name="post_conv")(o) + x
        o = Conv1dBNBlock(
            self.hidden_channels, self.hidden_channels, self.kernel_size, 1,
            num_conv_blocks=2, norm_type=self.norm_type, name="postnet_block",
        )(o, x_mask if not isinstance(x_mask, float) else None, train)
        return o * x_mask


class WaveNetDecoder(nn.Module):
    """WN-based decoder variant (ref feed_forward/decoder.py:192)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int = 3
    dilation_rate: int = 1
    num_layers: int = 10

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, train: bool = False):
        x = WN(
            hidden_channels=self.hidden_channels,
            kernel_size=self.kernel_size,
            dilation_rate=self.dilation_rate,
            num_layers=self.num_layers,
            name="wn",
        )(x, x_mask, g=g, train=train)
        return Conv1d(self.out_channels, 1, name="proj")(x) * (x_mask if x_mask is not None else 1.0)


class PositionalEncoding(nn.Module):
    """Sinusoidal positional encoding with optional learned scale
    (ref generic/pos_encoding.py)."""

    channels: int
    use_scale: bool = False
    max_len: int = 10000

    @nn.compact
    def __call__(self, x, x_mask=None):
        T = x.shape[1]
        position = np.arange(self.max_len)[:, None].astype(np.float32)
        # NB: the reference MULTIPLIES by 10000^(2i/C) (pos_encoding.py:29) —
        # the inverse of the standard transformer formula; replicated for
        # checkpoint parity
        div_term = np.power(10000.0, np.arange(0, self.channels, 2).astype(np.float32) / self.channels)
        pe = np.zeros((self.max_len, self.channels), dtype=np.float32)
        pe[:, 0::2] = np.sin(position * div_term)
        pe[:, 1::2] = np.cos(position * div_term)[:, : self.channels // 2]
        pe_t = jnp.asarray(pe[None, :T])
        x = x * math.sqrt(self.channels)  # ref pos_encoding.py:47
        if x_mask is not None:
            pe_t = pe_t * x_mask
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (1,))
            x = x + scale * pe_t
        else:
            x = x + pe_t
        if x_mask is not None:
            x = x * x_mask
        return x


class AlignmentNetwork(nn.Module):
    """Gaussian-attention aligner (ref generic/aligner.py:7).

    queries (mel) `[B, T_de, C_q]`, keys (text enc) `[B, T_en, C_k]` →
    (attn soft `[B, T_de, T_en]`, attn_logp `[B, T_de, T_en]`).
    """

    in_query_channels: int = 80
    in_key_channels: int = 512
    attn_channels: int = 80
    temperature: float = 0.0005

    @nn.compact
    def __call__(self, queries, keys, mask=None, attn_prior=None):
        key_out = Conv1d(self.in_key_channels * 2, 3, name="key_conv1")(keys)
        key_out = Conv1d(self.attn_channels, 1, name="key_conv2")(nn.relu(key_out))

        q = Conv1d(self.in_query_channels * 2, 3, name="query_conv1")(queries)
        q = Conv1d(self.in_query_channels, 1, name="query_conv2")(nn.relu(q))
        q = Conv1d(self.attn_channels, 1, name="query_conv3")(nn.relu(q))

        # L2 distance: [B, T_de, T_en]
        attn_factor = jnp.sum(
            (q[:, :, None, :] - key_out[:, None, :, :]) ** 2, axis=-1
        )
        attn_logp = -self.temperature * attn_factor
        if attn_prior is not None:
            attn_logp = jax.nn.log_softmax(attn_logp, axis=-1) + jnp.log(attn_prior + 1e-8)
        if mask is not None:
            # mask: [B, T_en] valid text positions
            attn_logp = jnp.where(mask[:, None, :] > 0, attn_logp, -np.inf)
        attn = jax.nn.softmax(attn_logp, axis=-1)
        return attn, attn_logp
