"""EnCodec neural audio codec (SEANet encoder/decoder + residual VQ) in flax.

Bark's waveform stage is the external `encodec` package's 24 kHz model
(ref /root/reference/TTS/tts/models/bark.py:49 `EncodecModel.
encodec_model_24khz`, used through `quantizer.decode` + `decoder` in
layers/bark/inference_funcs.py:600-606 and `encodec.encode` for voice
cloning, inference_funcs.py:124). This is a TPU-native re-implementation of
that architecture: channels-last `[B, T, C]`, static-shape causal padding
computed at trace time, the 2-layer LSTM as a single fused-gate `lax.scan`,
and nearest-neighbour RVQ as batched matmuls. Weight-norm is folded into
plain kernels at conversion time.

Layer indices mirror the upstream `decoder.model.{i}` / `encoder.model.{i}`
ModuleList numbering so checkpoint conversion is mechanical.
"""

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _pad1d(x, pad_left: int, pad_right: int, mode: str):
    """Pad time axis of `[B, T, C]`; reflect falls back over a zero-extended
    tail when the signal is shorter than the pad (upstream `_pad1d`)."""
    if mode != "reflect":
        return jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))
    length = x.shape[1]
    max_pad = max(pad_left, pad_right)
    extra = 0
    if length <= max_pad:
        extra = max_pad - length + 1
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="reflect")
    end = x.shape[1] - extra
    return x[:, :end]


class ECConv1d(nn.Module):
    """Causal/asymmetric-padded conv (upstream SEANetConv1d semantics)."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    causal: bool = True
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        k_eff = (self.kernel_size - 1) * self.dilation + 1
        pad_total = k_eff - self.stride
        length = x.shape[1]
        n_frames = (length - k_eff + pad_total) / self.stride + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride + k_eff - pad_total
        extra = ideal - length
        if self.causal:
            x = _pad1d(x, pad_total, extra, self.pad_mode)
        else:
            right = pad_total // 2
            x = _pad1d(x, pad_total - right, right + extra, self.pad_mode)
        return nn.Conv(
            self.features, (self.kernel_size,), strides=(self.stride,),
            kernel_dilation=(self.dilation,), padding="VALID", name="conv",
        )(x)


class ECConvTranspose1d(nn.Module):
    """Transposed conv with causal right-trim (trim_right_ratio=1)."""

    features: int
    kernel_size: int
    stride: int
    causal: bool = True
    trim_right_ratio: float = 1.0

    @nn.compact
    def __call__(self, x):
        pad_total = self.kernel_size - self.stride
        y = nn.ConvTranspose(
            self.features, (self.kernel_size,), strides=(self.stride,),
            padding="VALID", name="conv",
        )(x)
        if self.causal:
            pad_right = math.ceil(pad_total * self.trim_right_ratio)
        else:
            pad_right = pad_total // 2
        pad_left = pad_total - pad_right
        end = y.shape[1] - pad_right
        return y[:, pad_left:end]


class ECLSTM(nn.Module):
    """num_layers stacked LSTM + residual, torch gate packing (i,f,g,o).

    Weights are stored in the torch layout (`w_ih` `[4H, in]`, `w_hh`
    `[4H, H]`) so checkpoints copy in directly; the whole stack runs as one
    `lax.scan` over time with fused gate matmuls.
    """

    dim: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        H = self.dim
        h = x
        for layer in range(self.num_layers):
            w_ih = self.param(f"w_ih_l{layer}", nn.initializers.lecun_normal(), (4 * H, h.shape[-1]))
            w_hh = self.param(f"w_hh_l{layer}", nn.initializers.lecun_normal(), (4 * H, H))
            b_ih = self.param(f"b_ih_l{layer}", nn.initializers.zeros, (4 * H,))
            b_hh = self.param(f"b_hh_l{layer}", nn.initializers.zeros, (4 * H,))
            # hoist the input projection out of the scan: one big MXU matmul
            gates_x = jnp.einsum("btc,gc->btg", h, w_ih) + b_ih + b_hh

            def step(carry, gx, _w_hh=w_hh):
                h_prev, c_prev = carry
                gates = gx + h_prev @ _w_hh.T
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
                hh = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (hh, c), hh

            init = (jnp.zeros((B, H), h.dtype), jnp.zeros((B, H), h.dtype))
            _, out = jax.lax.scan(step, init, jnp.swapaxes(gates_x, 0, 1))
            h = jnp.swapaxes(out, 0, 1)
        return x + h


class ECResnetBlock(nn.Module):
    """SEANet residual unit: ELU→conv(k,dil)→ELU→conv(1) + conv1x1 shortcut."""

    dim: int
    dilations: Tuple[int, int] = (1, 1)
    kernel_sizes: Tuple[int, int] = (3, 1)
    compress: int = 2
    causal: bool = True
    pad_mode: str = "reflect"
    conv_shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        hidden = self.dim // self.compress
        h = x
        n = len(self.kernel_sizes)
        for i, (k, d) in enumerate(zip(self.kernel_sizes, self.dilations)):
            out = self.dim if i == n - 1 else hidden
            h = jax.nn.elu(h)
            h = ECConv1d(out, k, dilation=d, causal=self.causal,
                         pad_mode=self.pad_mode, name=f"block_{2 * i + 1}")(h)
        if self.conv_shortcut:
            x = ECConv1d(self.dim, 1, causal=self.causal, pad_mode=self.pad_mode,
                         name="shortcut")(x)
        return x + h


class EncodecDecoder(nn.Module):
    """SEANet decoder; submodule names = upstream `decoder.model.{i}`."""

    hidden_size: int = 128
    num_filters: int = 32
    upsampling_ratios: Sequence[int] = (8, 5, 4, 2)
    num_residual_layers: int = 1
    dilation_growth_rate: int = 2
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    compress: int = 2
    causal: bool = True
    pad_mode: str = "reflect"
    audio_channels: int = 1
    num_lstm_layers: int = 2
    trim_right_ratio: float = 1.0

    @nn.compact
    def __call__(self, emb):
        """emb `[B, T, hidden]` (quantizer output) → wav `[B, T*prod(r), 1]`."""
        # upstream ModuleList indices: 0 conv, 1 lstm, then per ratio
        # [ELU, convT, res*nrl], then [ELU, conv]
        scaling = int(2 ** len(self.upsampling_ratios))
        x = ECConv1d(scaling * self.num_filters, self.kernel_size, causal=self.causal,
                     pad_mode=self.pad_mode, name="layer_0")(emb)
        x = ECLSTM(scaling * self.num_filters, self.num_lstm_layers, name="layer_1")(x)
        i = 2
        for ratio in self.upsampling_ratios:
            current = scaling * self.num_filters
            i += 1  # ELU slot in the upstream ModuleList
            x = ECConvTranspose1d(current // 2, ratio * 2, ratio, causal=self.causal,
                                  trim_right_ratio=self.trim_right_ratio, name=f"layer_{i}")(
                jax.nn.elu(x))
            i += 1
            for j in range(self.num_residual_layers):
                x = ECResnetBlock(
                    current // 2, (self.dilation_growth_rate ** j, 1),
                    (self.residual_kernel_size, 1), self.compress, self.causal,
                    self.pad_mode, name=f"layer_{i}")(x)
                i += 1
            scaling //= 2
        i += 1  # final ELU slot
        return ECConv1d(self.audio_channels, self.last_kernel_size, causal=self.causal,
                        pad_mode=self.pad_mode, name=f"layer_{i}")(jax.nn.elu(x))


class EncodecEncoder(nn.Module):
    """SEANet encoder; submodule names = upstream `encoder.model.{i}`."""

    hidden_size: int = 128
    num_filters: int = 32
    upsampling_ratios: Sequence[int] = (8, 5, 4, 2)
    num_residual_layers: int = 1
    dilation_growth_rate: int = 2
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    compress: int = 2
    causal: bool = True
    pad_mode: str = "reflect"
    num_lstm_layers: int = 2

    @nn.compact
    def __call__(self, wav):
        """wav `[B, T, 1]` → emb `[B, ceil(T/prod(r)), hidden]`."""
        i = 0
        x = ECConv1d(self.num_filters, self.kernel_size, causal=self.causal,
                     pad_mode=self.pad_mode, name=f"layer_{i}")(wav)
        scaling = 1
        for ratio in reversed(list(self.upsampling_ratios)):
            current = scaling * self.num_filters
            for j in range(self.num_residual_layers):
                i += 1
                x = ECResnetBlock(
                    current, (self.dilation_growth_rate ** j, 1),
                    (self.residual_kernel_size, 1), self.compress, self.causal,
                    self.pad_mode, name=f"layer_{i}")(x)
            i += 1  # ELU slot
            i += 1
            x = ECConv1d(current * 2, ratio * 2, stride=ratio, causal=self.causal,
                         pad_mode=self.pad_mode, name=f"layer_{i}")(jax.nn.elu(x))
            scaling *= 2
        i += 1
        x = ECLSTM(scaling * self.num_filters, self.num_lstm_layers, name=f"layer_{i}")(x)
        i += 2  # ELU slot
        return ECConv1d(self.hidden_size, self.last_kernel_size, causal=self.causal,
                        pad_mode=self.pad_mode, name=f"layer_{i}")(jax.nn.elu(x))


class EncodecQuantizer(nn.Module):
    """Residual vector quantizer: codebooks `[n_q, size, dim]`."""

    num_quantizers: int = 32
    codebook_size: int = 1024
    codebook_dim: int = 128

    def setup(self):
        self.embed = self.param(
            "embed", nn.initializers.normal(1.0),
            (self.num_quantizers, self.codebook_size, self.codebook_dim),
        )

    def decode(self, codes):
        """codes `[B, T, n_q']` (n_q' <= num_quantizers) → emb `[B, T, dim]`."""
        n_q = codes.shape[-1]
        out = 0.0
        for q in range(n_q):
            out = out + jnp.take(self.embed[q], codes[..., q], axis=0)
        return out

    def encode(self, emb, n_q: Optional[int] = None):
        """emb `[B, T, dim]` → codes `[B, T, n_q]` by residual nearest-
        neighbour search (upstream EuclideanCodebook.quantize)."""
        n_q = self.num_quantizers if n_q is None else n_q
        residual = emb
        codes = []
        for q in range(n_q):
            cb = self.embed[q]  # [size, dim]
            dist = (
                -jnp.sum(residual**2, -1, keepdims=True)
                + 2 * residual @ cb.T
                - jnp.sum(cb**2, -1)[None, None]
            )
            idx = jnp.argmax(dist, axis=-1)
            codes.append(idx)
            residual = residual - jnp.take(cb, idx, axis=0)
        return jnp.stack(codes, axis=-1)

    def __call__(self, codes):  # init path
        return self.decode(codes)


class EncodecModel(nn.Module):
    """encode(wav)→codes / decode(codes)→wav, 24 kHz Bark configuration."""

    hidden_size: int = 128
    num_filters: int = 32
    upsampling_ratios: Sequence[int] = (8, 5, 4, 2)
    num_quantizers: int = 32
    codebook_size: int = 1024
    num_residual_layers: int = 1
    num_lstm_layers: int = 2
    causal: bool = True
    pad_mode: str = "reflect"
    sample_rate: int = 24000

    def setup(self):
        kw = dict(
            hidden_size=self.hidden_size, num_filters=self.num_filters,
            upsampling_ratios=tuple(self.upsampling_ratios),
            num_residual_layers=self.num_residual_layers,
            num_lstm_layers=self.num_lstm_layers, causal=self.causal,
            pad_mode=self.pad_mode,
        )
        self.encoder = EncodecEncoder(name="encoder", **kw)
        self.decoder = EncodecDecoder(name="decoder", **kw)
        self.quantizer = EncodecQuantizer(
            self.num_quantizers, self.codebook_size, self.hidden_size, name="quantizer"
        )

    @property
    def frame_rate(self):
        hop = 1
        for r in self.upsampling_ratios:
            hop *= r
        return self.sample_rate / hop

    def encode(self, wav, n_q: Optional[int] = None):
        """wav `[B, T, 1]` → codes `[B, T_fr, n_q]`."""
        return self.quantizer.encode(self.encoder(wav), n_q=n_q)

    def decode(self, codes):
        """codes `[B, T_fr, n_q]` → wav `[B, T_fr*hop, 1]`."""
        return self.decoder(self.quantizer.decode(codes))

    def __call__(self, wav):  # init/roundtrip path
        return self.decode(self.encode(wav))
