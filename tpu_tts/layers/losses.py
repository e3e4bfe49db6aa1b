"""TTS loss functions (pure JAX).

Functional counterparts of /root/reference/TTS/tts/layers/losses.py. Losses are
computed in fp32 regardless of model compute dtype (the reference forces fp32
criteria under AMP — vits.py:1273).
"""

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tpu_tts.ops.helpers import sequence_mask

_LOG_2PI = math.log(2 * math.pi)


def glow_tts_loss(
    z: jnp.ndarray,
    means: jnp.ndarray,
    scales: jnp.ndarray,
    log_det: jnp.ndarray,
    y_lengths: jnp.ndarray,
    o_dur_log: jnp.ndarray,
    o_attn_dur: jnp.ndarray,
    x_lengths: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Glow-TTS MLE + duration loss (ref losses.py:508).

    Shapes (channels-last): z/means/scales `[B, T, C]`, log_det `[B]`,
    o_dur_log/o_attn_dur `[B, T_en, 1]`.
    """
    z = z.astype(jnp.float32)
    means = means.astype(jnp.float32)
    scales = scales.astype(jnp.float32)
    pz = jnp.sum(scales) + 0.5 * jnp.sum(jnp.exp(-2 * scales) * (z - means) ** 2)
    n_elems = jnp.sum(y_lengths).astype(jnp.float32) * z.shape[-1]
    log_mle = 0.5 * _LOG_2PI + (pz - jnp.sum(log_det)) / n_elems
    loss_dur = jnp.sum((o_dur_log.astype(jnp.float32) - o_attn_dur.astype(jnp.float32)) ** 2) / jnp.sum(
        x_lengths
    ).astype(jnp.float32)
    return {"loss": log_mle + loss_dur, "log_mle": log_mle, "loss_dur": loss_dur}


def masked_mse_loss(x: jnp.ndarray, target: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """MSE over valid positions only. x/target `[B, T, C]`, lengths `[B]`."""
    mask = sequence_mask(lengths, x.shape[1]).astype(jnp.float32)[:, :, None]
    diff = (x.astype(jnp.float32) - target.astype(jnp.float32)) ** 2 * mask
    return jnp.sum(diff) / (jnp.sum(mask) * x.shape[-1])


def masked_l1_loss(x: jnp.ndarray, target: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    mask = sequence_mask(lengths, x.shape[1]).astype(jnp.float32)[:, :, None]
    diff = jnp.abs(x.astype(jnp.float32) - target.astype(jnp.float32)) * mask
    return jnp.sum(diff) / (jnp.sum(mask) * x.shape[-1])


def mse_loss(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def l1_loss(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x.astype(jnp.float32) - target.astype(jnp.float32)))


def kl_loss(
    z_p: jnp.ndarray,
    logs_q: jnp.ndarray,
    m_p: jnp.ndarray,
    logs_p: jnp.ndarray,
    z_mask: jnp.ndarray,
) -> jnp.ndarray:
    """VITS KL divergence between posterior and flow-prior (ref losses.py:VitsGeneratorLoss).
    All `[B, T, C]`, z_mask `[B, T, 1]`."""
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    z_mask = z_mask.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    kl = jnp.sum(kl * z_mask)
    return kl / jnp.sum(z_mask)


def forward_sum_loss(
    attn_logprob: jnp.ndarray, in_lens: jnp.ndarray, out_lens: jnp.ndarray, blank_logprob: float = -1.0
) -> jnp.ndarray:
    """CTC-style alignment loss for the aligner network (ref losses.py:279).

    attn_logprob: `[B, 1, T_de, T_en]` unnormalized attention log-probs.
    Implemented as a log-domain forward algorithm over the (blank+text) graph.
    """
    B, _, T_de, T_en = attn_logprob.shape
    # pad a blank token column at index 0
    logp = jnp.concatenate(
        [jnp.full((B, 1, T_de, 1), blank_logprob, dtype=attn_logprob.dtype), attn_logprob], axis=-1
    )[:, 0]  # [B, T_de, T_en+1]
    logp = jax.nn.log_softmax(logp, axis=-1)

    # CTC forward over targets [1..T_en_b] with blanks between (standard CTC
    # with label sequence = 1,2,...,N). S = 2*T_en+1 states.
    S = 2 * T_en + 1
    s_idx = jnp.arange(S)
    labels = jnp.where(s_idx % 2 == 1, (s_idx + 1) // 2, 0)  # blank=0, else text idx

    neg_inf = -1e30

    def get_emit(t):
        return logp[:, t, :][:, labels]  # [B, S]

    alpha0 = jnp.full((B, S), neg_inf)
    alpha0 = alpha0.at[:, 0].set(logp[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(logp[:, 0, 1] if T_en > 0 else neg_inf)

    def step(alpha, t):
        prev1 = jnp.concatenate([jnp.full((B, 1), neg_inf), alpha[:, :-1]], axis=1)
        prev2 = jnp.concatenate([jnp.full((B, 2), neg_inf), alpha[:, :-2]], axis=1)
        # transitions from s-2 only allowed for label states (odd s); labels
        # are all distinct so no same-label constraint needed
        allow2 = (s_idx % 2 == 1)[None, :]
        stacked = jnp.stack([alpha, prev1, jnp.where(allow2, prev2, neg_inf)], axis=0)
        alpha_new = jax.nn.logsumexp(stacked, axis=0) + get_emit(t)
        # mask emissions beyond per-sample out_len: freeze alpha after end
        valid = (t < out_lens)[:, None]
        alpha_new = jnp.where(valid, alpha_new, alpha)
        return alpha_new, None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, T_de))
    # final prob: states 2*in_len (last blank) or 2*in_len-1 (last label)
    last_blank = jnp.take_along_axis(alpha, (2 * in_lens)[:, None], axis=1)[:, 0]
    last_label = jnp.take_along_axis(alpha, (2 * in_lens - 1)[:, None], axis=1)[:, 0]
    total = jnp.logaddexp(last_blank, last_label)
    return -jnp.mean(total / out_lens.astype(jnp.float32))


def guided_attention_loss(attn: jnp.ndarray, input_lens: jnp.ndarray, output_lens: jnp.ndarray, sigma: float = 0.4) -> jnp.ndarray:
    """Penalize off-diagonal attention (Tacotron GA loss, ref losses.py:221).
    attn: `[B, T_de, T_en]` alignments."""
    B, T_de, T_en = attn.shape
    de = jnp.arange(T_de, dtype=jnp.float32)[None, :, None]
    en = jnp.arange(T_en, dtype=jnp.float32)[None, None, :]
    ilens = input_lens.astype(jnp.float32)[:, None, None]
    olens = output_lens.astype(jnp.float32)[:, None, None]
    W = 1.0 - jnp.exp(-((en / ilens - de / olens) ** 2) / (2 * sigma**2))
    mask = (de < olens) & (en < ilens)
    losses = attn.astype(jnp.float32) * W * mask
    return jnp.sum(losses) / jnp.maximum(jnp.sum(mask), 1.0)


def stopnet_bce_loss(logits: jnp.ndarray, targets: jnp.ndarray, lengths: jnp.ndarray, pos_weight: float = 10.0) -> jnp.ndarray:
    """BCE-with-logits on stop tokens, positive-weighted (ref BCELossMasked)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)
    mask = sequence_mask(lengths, logits.shape[1]).astype(jnp.float32)
    return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    import numpy as np

    coords = np.arange(size) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), dtype=jnp.float32)


def ssim_loss(x: jnp.ndarray, y: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """1 - SSIM over masked spectrograms (role of ref tts/utils/ssim.py:155).
    x/y: `[B, T, C]` treated as single-channel images."""
    mask = sequence_mask(lengths, x.shape[1]).astype(jnp.float32)[:, :, None]
    x = (x * mask).astype(jnp.float32)[..., None]  # [B, T, C, 1] NHWC
    y = (y * mask).astype(jnp.float32)[..., None]
    # normalize into [0, 1] jointly (SSIM needs a bounded dynamic range)
    mn = jnp.minimum(x.min(), y.min())
    mx = jnp.maximum(x.max(), y.max())
    rng_ = jnp.maximum(mx - mn, 1e-6)
    x = (x - mn) / rng_
    y = (y - mn) / rng_
    k = _gaussian_kernel()[:, :, None, None]  # HWIO

    def f(z):
        return jax.lax.conv_general_dilated(
            z, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    c1, c2 = 0.01**2, 0.03**2
    mu_x, mu_y = f(x), f(y)
    sigma_x = f(x * x) - mu_x**2
    sigma_y = f(y * y) - mu_y**2
    sigma_xy = f(x * y) - mu_x * mu_y
    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    )
    return 1.0 - jnp.mean(ssim_map)


def binary_alignment_loss(alignment_hard: jnp.ndarray, alignment_soft: jnp.ndarray) -> jnp.ndarray:
    """Force soft attention toward the MAS hard alignment (ref losses.py:821)."""
    log_soft = jnp.log(jnp.clip(alignment_soft, 1e-12))
    masked = jnp.where(alignment_hard == 1, log_soft, 0.0)
    return -jnp.sum(masked) / jnp.maximum(jnp.sum(alignment_hard), 1.0)


def feature_loss(feats_real, feats_generated) -> jnp.ndarray:
    """GAN feature-matching loss (ref vocoder losses / vits)."""
    loss = 0.0
    for dr, dg in zip(feats_real, feats_generated):
        for rl, gl in zip(dr, dg):
            rl = jax.lax.stop_gradient(rl).astype(jnp.float32)
            gl = gl.astype(jnp.float32)
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def generator_loss(scores_fake) -> jnp.ndarray:
    """LSGAN generator loss over a list of discriminator outputs."""
    loss = 0.0
    for dg in scores_fake:
        loss += jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
    return loss


def discriminator_loss(scores_real, scores_fake) -> jnp.ndarray:
    """LSGAN discriminator loss."""
    loss = 0.0
    for dr, dg in zip(scores_real, scores_fake):
        loss += jnp.mean((1.0 - dr.astype(jnp.float32)) ** 2) + jnp.mean(dg.astype(jnp.float32) ** 2)
    return loss
