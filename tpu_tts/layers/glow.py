"""Normalizing-flow layers for the Glow-TTS decoder.

Functional mirror of /root/reference/TTS/tts/layers/glow_tts/{glow.py,
decoder.py} and generic/normalization.py:66 (ActNorm): squeeze → N × [ActNorm,
InvConvNear, affine CouplingBlock(WN)] → unsqueeze, each invertible with
log-determinants. Layout is channels-last `[B, T, C]`; masks `[B, T, 1]`.

TPU note: InvConvNear's grouped 1×1 conv is expressed as a plain einsum over a
`[num_splits, num_splits]` matrix (a tiny MXU matmul broadcast over B·T·C');
its inverse is computed on the fly in reverse mode (4×4 — negligible).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_tts.layers.common import WN, WNConv1d


def squeeze(x, x_mask=None, num_sqz=2):
    """`[B, T, C] → [B, T//s, C*s]` interleaving frames into channels
    (ref decoder.py:8)."""
    b, t, c = x.shape
    t = (t // num_sqz) * num_sqz
    x = x[:, :t]
    # reference layout: out channel block k (size c) holds frame offset k
    x_sqz = x.reshape(b, t // num_sqz, num_sqz, c)
    x_sqz = x_sqz.reshape(b, t // num_sqz, num_sqz * c)  # [frame0_c..., frame1_c...]
    # match torch ordering: channels [c*num_sqz] = concat over sqz index of c
    if x_mask is not None:
        x_mask = x_mask[:, num_sqz - 1 :: num_sqz]
    else:
        x_mask = jnp.ones((b, t // num_sqz, 1), dtype=x.dtype)
    return x_sqz * x_mask, x_mask


def unsqueeze(x, x_mask=None, num_sqz=2):
    """Inverse of `squeeze` (ref decoder.py:31)."""
    b, t, c = x.shape
    x_unsqz = x.reshape(b, t, num_sqz, c // num_sqz).reshape(b, t * num_sqz, c // num_sqz)
    if x_mask is not None:
        x_mask = jnp.repeat(x_mask, num_sqz, axis=1)
    else:
        x_mask = jnp.ones((b, t * num_sqz, 1), dtype=x.dtype)
    return x_unsqz * x_mask, x_mask


class ActNorm(nn.Module):
    """Activation normalization bijector (ref normalization.py:66).

    Note: the reference supports data-dependent init (DDI) on the first
    batches; this build initializes logs/bias to zeros (standard Glow practice
    when DDI is off) — `initialize_from_data` provides explicit DDI values.
    """

    channels: int

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse: bool = False, train: bool = False):
        if x_mask is None:
            x_mask = jnp.ones((x.shape[0], x.shape[1], 1), dtype=x.dtype)
        x_len = jnp.sum(x_mask, axis=(1, 2))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        if reverse:
            z = (x - bias) * jnp.exp(-logs) * x_mask
            return z, None
        z = (bias + jnp.exp(logs) * x) * x_mask
        logdet = jnp.sum(logs) * x_len
        return z, logdet


class InvConvNear(nn.Module):
    """Invertible grouped 1×1 convolution (ref glow.py:71)."""

    channels: int
    num_splits: int = 4
    no_jacobian: bool = False

    def _init_weight(self, key):
        w = jax.random.normal(key, (self.num_splits, self.num_splits))
        q, _ = jnp.linalg.qr(w)
        q = jnp.where(jnp.linalg.det(q) < 0, q.at[:, 0].multiply(-1.0), q)
        return q

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse: bool = False, train: bool = False):
        b, t, c = x.shape
        s = self.num_splits
        assert c % s == 0
        if x_mask is None:
            x_mask = jnp.ones((b, t, 1), dtype=x.dtype)
            x_len = jnp.full((b,), t, dtype=x.dtype)
        else:
            x_len = jnp.sum(x_mask, axis=(1, 2))

        weight = self.param("weight", self._init_weight)

        # channel regrouping, matching torch's view/permute on [B, C, T]:
        # c = [2, c//s, s//2] -> groups [s = 2*(s//2), c//s]
        xg = x.reshape(b, t, 2, c // s, s // 2)
        xg = xg.transpose(0, 1, 2, 4, 3).reshape(b, t, s, c // s)

        if reverse:
            w = jnp.linalg.inv(weight.astype(jnp.float32)).astype(weight.dtype)
            logdet = None
        else:
            w = weight
            if self.no_jacobian:
                logdet = 0
            else:
                _, logabsdet = jnp.linalg.slogdet(weight.astype(jnp.float32))
                logdet = logabsdet * (c / s) * x_len

        z = jnp.einsum("btsc,rs->btrc", xg, w, preferred_element_type=jnp.float32)
        z = z.reshape(b, t, 2, s // 2, c // s).transpose(0, 1, 2, 4, 3).reshape(b, t, c)
        return z * x_mask, logdet


class CouplingBlock(nn.Module):
    """Affine coupling with a WN inner network (ref glow.py:146)."""

    in_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    num_layers: int
    c_in_channels: int = 0
    dropout_p: float = 0.0
    sigmoid_scale: bool = False

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse: bool = False, train: bool = False):
        if x_mask is None:
            x_mask = 1.0
        half = self.in_channels // 2
        x_0, x_1 = x[..., :half], x[..., half:]

        h = WNConv1d(self.hidden_channels, 1, name="start")(x_0) * x_mask
        h = WN(
            hidden_channels=self.hidden_channels,
            kernel_size=self.kernel_size,
            dilation_rate=self.dilation_rate,
            num_layers=self.num_layers,
            c_in_channels=self.c_in_channels,
            dropout_p=self.dropout_p,
            name="wn",
        )(h, x_mask, g=g, train=train)
        out = nn.Dense(
            self.in_channels, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros, name="end"
        )(h)

        t_shift = out[..., :half]
        s = out[..., half:]
        if self.sigmoid_scale:
            s = jnp.log(1e-6 + jax.nn.sigmoid(s + 2))

        if reverse:
            z_1 = (x_1 - t_shift) * jnp.exp(-s) * x_mask
            logdet = None
        else:
            z_1 = (t_shift + jnp.exp(s) * x_1) * x_mask
            logdet = jnp.sum(s * x_mask, axis=(1, 2))
        return jnp.concatenate([x_0, z_1], axis=-1), logdet


class GlowDecoder(nn.Module):
    """Stack of flow blocks with squeeze/unsqueeze (ref decoder.py:51)."""

    in_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    num_flow_blocks: int
    num_coupling_layers: int
    dropout_p: float = 0.0
    num_splits: int = 4
    num_squeeze: int = 2
    sigmoid_scale: bool = False
    c_in_channels: int = 0

    def setup(self):
        flows = []
        ch = self.in_channels * self.num_squeeze
        for i in range(self.num_flow_blocks):
            flows.append(ActNorm(channels=ch, name=f"actnorm_{i}"))
            flows.append(InvConvNear(channels=ch, num_splits=self.num_splits, name=f"invconv_{i}"))
            flows.append(
                CouplingBlock(
                    in_channels=ch,
                    hidden_channels=self.hidden_channels,
                    kernel_size=self.kernel_size,
                    dilation_rate=self.dilation_rate,
                    num_layers=self.num_coupling_layers,
                    c_in_channels=self.c_in_channels,
                    dropout_p=self.dropout_p,
                    sigmoid_scale=self.sigmoid_scale,
                    name=f"coupling_{i}",
                )
            )
        self.flows = flows

    def __call__(self, x, x_mask, g=None, reverse: bool = False, train: bool = False):
        """x: `[B, T, C]`, g: `[B, 1, C_g]` → (z, total logdet)."""
        if self.num_squeeze > 1:
            x, x_mask = squeeze(x, x_mask, self.num_squeeze)
        logdet_tot = 0.0 if not reverse else None
        flows = self.flows if not reverse else list(reversed(self.flows))
        for f in flows:
            x, logdet = f(x, x_mask, g=g, reverse=reverse, train=train)
            if not reverse:
                logdet_tot = logdet_tot + logdet
        if self.num_squeeze > 1:
            x, x_mask = unsqueeze(x, x_mask, self.num_squeeze)
        return x, logdet_tot
