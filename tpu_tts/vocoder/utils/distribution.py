"""Output distributions for WaveRNN: gaussian + discretized mixture of
logistics (mirror of /root/reference/TTS/vocoder/utils/distribution.py:9,43,112)."""

import math

import jax
import jax.numpy as jnp


def gaussian_loss(y_hat: jnp.ndarray, y: jnp.ndarray, log_std_min: float = -7.0) -> jnp.ndarray:
    """y_hat `[B, T, 2]` (mean, log_std), y `[B, T, 1]`."""
    mean = y_hat[..., 0:1]
    log_std = jnp.clip(y_hat[..., 1:2], log_std_min)
    log_probs = -0.5 * (
        math.log(2.0 * math.pi) + 2.0 * log_std + ((y - mean) ** 2) * jnp.exp(-2.0 * log_std)
    )
    return -jnp.mean(log_probs)


def sample_from_gaussian(y_hat: jnp.ndarray, rng, log_std_min: float = -7.0, scale_factor: float = 0.6):
    mean = y_hat[..., 0]
    log_std = jnp.clip(y_hat[..., 1], log_std_min)
    u = jax.random.normal(rng, mean.shape)
    return jnp.clip(mean + u * jnp.exp(log_std) * scale_factor, -1.0, 1.0)


def discretized_mix_logistic_loss(
    y_hat: jnp.ndarray, y: jnp.ndarray, num_classes: int = 65536, log_scale_min: float = None
) -> jnp.ndarray:
    """y_hat `[B, T, 3K]` mixture params, y `[B, T, 1]` in [-1, 1]."""
    if log_scale_min is None:
        log_scale_min = math.log(1e-14)
    K = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :K]
    means = y_hat[..., K : 2 * K]
    log_scales = jnp.clip(y_hat[..., 2 * K :], log_scale_min)
    centered = y - means  # broadcast [B,T,K]
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / (num_classes - 1))
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered - 1.0 / (num_classes - 1))
    cdf_min = jax.nn.sigmoid(min_in)
    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)
    inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.clip(cdf_delta, 1e-12)),
        log_pdf_mid - math.log((num_classes - 1) / 2),
    )
    log_probs = jnp.where(y < -0.999, log_cdf_plus, jnp.where(y > 0.999, log_one_minus_cdf_min, inner))
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    return -jnp.mean(jax.nn.logsumexp(log_probs, axis=-1))


def sample_from_discretized_mix_logistic(y_hat: jnp.ndarray, rng, log_scale_min: float = None):
    """y_hat `[..., 3K]` → samples in [-1, 1]."""
    if log_scale_min is None:
        log_scale_min = math.log(1e-14)
    K = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :K]
    r1, r2 = jax.random.split(rng)
    # gumbel-max mixture selection
    g = -jnp.log(-jnp.log(jax.random.uniform(r1, logit_probs.shape, minval=1e-5, maxval=1 - 1e-5)))
    sel = jax.nn.one_hot(jnp.argmax(logit_probs + g, axis=-1), K)
    means = jnp.sum(y_hat[..., K : 2 * K] * sel, axis=-1)
    log_scales = jnp.clip(jnp.sum(y_hat[..., 2 * K :] * sel, axis=-1), log_scale_min)
    u = jax.random.uniform(r2, means.shape, minval=1e-5, maxval=1 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log(1.0 - u))
    return jnp.clip(x, -1.0, 1.0)
