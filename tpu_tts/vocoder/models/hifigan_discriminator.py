"""HiFi-GAN discriminators (flax): MPD + MSD.

Mirror of /root/reference/TTS/vocoder/models/hifigan_discriminator.py
(DiscriminatorP:9, MultiPeriodDiscriminator:78, DiscriminatorS:117,
MultiScaleDiscriminator:162). Spectral norm (used by the first MSD scale) is
implemented as stateless on-the-fly power iteration so the train step stays a
pure function.
"""

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1


def _spectral_normalize(w: jnp.ndarray, n_iters: int = 3) -> jnp.ndarray:
    """σ_max-normalize a conv kernel (flattened to [out, -1]), stateless."""
    out_ch = w.shape[-1]
    mat = w.reshape(-1, out_ch).T  # [out, in*k]
    u = jnp.ones((mat.shape[0],), dtype=w.dtype) / jnp.sqrt(mat.shape[0])
    for _ in range(n_iters):
        v = mat.T @ u
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u = mat @ v
        u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
    sigma = u @ (mat @ v)
    return w / jnp.maximum(sigma, 1e-12)


class NormConv(nn.Module):
    """1D/2D conv with weight-norm or spectral-norm, NHWC/NHC layouts."""

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...] = (1,)
    groups: int = 1
    use_spectral_norm: bool = False
    padding: Tuple[Tuple[int, int], ...] = None
    dtype: Optional[Any] = None  # compute dtype (norms run fp32 on fp32 params)

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kshape = tuple(self.kernel_size) + (in_ch // self.groups, self.features)
        v = self.param("v", nn.initializers.he_normal(in_axis=tuple(range(len(kshape) - 1)), out_axis=len(kshape) - 1), kshape)
        if self.use_spectral_norm:
            kernel = _spectral_normalize(v)
        else:
            g = self.param(
                "g",
                lambda _k: jnp.sqrt(
                    jnp.sum(jax.lax.stop_gradient(v) ** 2, axis=tuple(range(len(kshape) - 1))) + 1e-12
                ),
            )
            norm = jnp.sqrt(jnp.sum(v**2, axis=tuple(range(len(kshape) - 1)), keepdims=True) + 1e-12)
            kernel = v / norm * g
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
        nd = len(self.kernel_size)
        pad = self.padding
        if pad is None:
            pad = tuple((k // 2, k // 2) for k in self.kernel_size)
        dn = ("NHC", "HIO", "NHC") if nd == 1 else ("NHWC", "HWIO", "NHWC")
        strides = self.strides if len(self.strides) == nd else self.strides * nd
        y = jax.lax.conv_general_dilated(
            x.astype(kernel.dtype), kernel, window_strides=strides, padding=list(pad),
            dimension_numbers=dn, feature_group_count=self.groups,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return y + b.astype(y.dtype)


class DiscriminatorP(nn.Module):
    """Period discriminator: fold wav by `period` into 2D, conv stack (ref :9)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    use_spectral_norm: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        """x: `[B, T, 1]` → (score `[B, N]`, feature list)."""
        feat = []
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, c)  # NHWC: H=t/p, W=p
        k = self.kernel_size
        chans = [32, 128, 512, 1024]
        for i, ch in enumerate(chans):
            x = NormConv(
                ch, (k, 1), strides=(self.stride, 1), use_spectral_norm=self.use_spectral_norm,
                padding=((k // 2, k // 2), (0, 0)), dtype=self.dtype, name=f"convs_{i}",
            )(x)
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            feat.append(x)
        x = NormConv(1024, (k, 1), strides=(1, 1), use_spectral_norm=self.use_spectral_norm,
                     padding=((2, 2), (0, 0)), dtype=self.dtype, name="convs_4")(x)
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        feat.append(x)
        x = NormConv(1, (3, 1), strides=(1, 1), use_spectral_norm=self.use_spectral_norm,
                     padding=((1, 1), (0, 0)), dtype=self.dtype, name="conv_post")(x)
        feat.append(x)
        return x.reshape(b, -1), feat


class DiscriminatorS(nn.Module):
    """Scale discriminator: grouped 1D conv stack (ref :117).

    `slim=True` selects the VITS-specific channel schedule
    (ref TTS/tts/layers/vits/discriminator.py:8 — fewer, wider-stride convs)."""

    use_spectral_norm: bool = False
    slim: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        """x: `[B, T, 1]` → (score, features)."""
        feat = []
        if self.slim:
            specs = [
                (16, 15, 1, 1, 7),
                (64, 41, 4, 4, 20),
                (256, 41, 4, 16, 20),
                (1024, 41, 4, 64, 20),
                (1024, 41, 4, 256, 20),
                (1024, 5, 1, 1, 2),
            ]
        else:
            specs = [
                (128, 15, 1, 1, 7),
                (128, 41, 2, 4, 20),
                (256, 41, 2, 16, 20),
                (512, 41, 4, 16, 20),
                (1024, 41, 4, 16, 20),
                (1024, 41, 1, 16, 20),
                (1024, 5, 1, 1, 2),
            ]
        for i, (ch, k, s, g, p) in enumerate(specs):
            x = NormConv(ch, (k,), strides=(s,), groups=g, use_spectral_norm=self.use_spectral_norm,
                         padding=((p, p),), dtype=self.dtype, name=f"convs_{i}")(x)
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            feat.append(x)
        x = NormConv(1, (3,), strides=(1,), padding=((1, 1),), use_spectral_norm=self.use_spectral_norm,
                     dtype=self.dtype, name="conv_post")(x)
        feat.append(x)
        return x.reshape(x.shape[0], -1), feat


class MultiPeriodDiscriminator(nn.Module):
    """MPD over periods (2,3,5,7,11) (ref :78)."""

    use_spectral_norm: bool = False
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        scores, feats = [], []
        for p in self.periods:
            score, feat = DiscriminatorP(p, use_spectral_norm=self.use_spectral_norm, dtype=self.dtype, name=f"disc_p{p}")(x)
            scores.append(score)
            feats.append(feat)
        return scores, feats


def _avg_pool(x, window=4, stride=2):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, 1), (1, stride, 1), [(0, 0), (2, 2), (0, 0)]
    ) / window


class MultiScaleDiscriminator(nn.Module):
    """MSD: 3 scales with avg-pool downsampling; first scale spectral-normed
    (ref :162)."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        scores, feats = [], []
        for i in range(3):
            score, feat = DiscriminatorS(use_spectral_norm=(i == 0), dtype=self.dtype, name=f"disc_s{i}")(x)
            scores.append(score)
            feats.append(feat)
            if i < 2:
                x = _avg_pool(x)
        return scores, feats


class HifiganDiscriminator(nn.Module):
    """MPD + MSD combined (ref :202)."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        """x: `[B, T, 1]` → (list of scores, list of per-layer features)."""
        p_scores, p_feats = MultiPeriodDiscriminator(dtype=self.dtype, name="mpd")(x)
        s_scores, s_feats = MultiScaleDiscriminator(dtype=self.dtype, name="msd")(x)
        return p_scores + s_scores, p_feats + s_feats
