"""Vocoder losses (pure JAX) — mirror of /root/reference/TTS/vocoder/layers/
losses.py (STFTLoss:15, MultiScaleSTFTLoss:37, L1SpecLoss:61, MSE/Hinge G&D
:99-150, MelganFeatureLoss:151, GeneratorLoss:218, DiscriminatorLoss:311).

STFTs run on-device via the matmul-STFT (tpu_tts.audio.jax_transforms), so the
whole GAN loss graph stays inside one jit.
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_tts.audio.jax_transforms import stft_magnitude, wav_to_mel


def stft_loss(y_hat: jnp.ndarray, y: jnp.ndarray, n_fft: int, hop_length: int, win_length: int):
    """Single-resolution (spectral-convergence, log-magnitude) pair (ref :15).
    y/y_hat: `[B, T]`."""
    y_hat_M = stft_magnitude(y_hat, fft_size=n_fft, hop_length=hop_length, win_length=win_length)
    y_M = stft_magnitude(y, fft_size=n_fft, hop_length=hop_length, win_length=win_length)
    y_M = y_M.astype(jnp.float32)
    y_hat_M = y_hat_M.astype(jnp.float32)
    loss_mag = jnp.mean(jnp.abs(jnp.log(jnp.clip(y_M, 1e-5)) - jnp.log(jnp.clip(y_hat_M, 1e-5))))
    loss_sc = jnp.linalg.norm(y_M - y_hat_M) / jnp.maximum(jnp.linalg.norm(y_M), 1e-8)
    return loss_mag, loss_sc


def multi_scale_stft_loss(
    y_hat: jnp.ndarray,
    y: jnp.ndarray,
    n_ffts: Tuple[int, ...] = (1024, 2048, 512),
    hop_lengths: Tuple[int, ...] = (120, 240, 50),
    win_lengths: Tuple[int, ...] = (600, 1200, 240),
):
    """Multi-resolution STFT loss (ref :37)."""
    N = len(n_ffts)
    loss_sc = 0.0
    loss_mag = 0.0
    for n_fft, hop, win in zip(n_ffts, hop_lengths, win_lengths):
        lm, lsc = stft_loss(y_hat, y, n_fft, hop, win)
        loss_mag += lm
        loss_sc += lsc
    return loss_mag / N, loss_sc / N


def l1_spec_loss(
    y_hat: jnp.ndarray,
    y: jnp.ndarray,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    num_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    use_mel: bool = True,
):
    """L1 log-spectrogram distance, optionally on mel (ref :61)."""
    if use_mel:
        s_hat = wav_to_mel(
            y_hat, fft_size=n_fft, num_mels=num_mels, sample_rate=sample_rate,
            hop_length=hop_length, win_length=win_length, fmin=fmin, fmax=fmax,
        )
        s = wav_to_mel(
            y, fft_size=n_fft, num_mels=num_mels, sample_rate=sample_rate,
            hop_length=hop_length, win_length=win_length, fmin=fmin, fmax=fmax,
        )
    else:
        s_hat = jnp.log(jnp.clip(stft_magnitude(y_hat, fft_size=n_fft, hop_length=hop_length, win_length=win_length), 1e-5))
        s = jnp.log(jnp.clip(stft_magnitude(y, fft_size=n_fft, hop_length=hop_length, win_length=win_length), 1e-5))
    return jnp.mean(jnp.abs(s.astype(jnp.float32) - s_hat.astype(jnp.float32)))


# ----------------------------------------------------------------- GAN pieces

def mse_G_loss(scores_fake: List[jnp.ndarray]) -> jnp.ndarray:
    loss = 0.0
    for sf in scores_fake:
        loss += jnp.mean((1.0 - sf.astype(jnp.float32)) ** 2)
    return loss / len(scores_fake)


def hinge_G_loss(scores_fake: List[jnp.ndarray]) -> jnp.ndarray:
    loss = 0.0
    for sf in scores_fake:
        loss += -jnp.mean(sf.astype(jnp.float32))
    return loss / len(scores_fake)


def mse_D_loss(scores_fake: List[jnp.ndarray], scores_real: List[jnp.ndarray]):
    loss, real_l, fake_l = 0.0, 0.0, 0.0
    for sf, sr in zip(scores_fake, scores_real):
        lr = jnp.mean((1.0 - sr.astype(jnp.float32)) ** 2)
        lf = jnp.mean(sf.astype(jnp.float32) ** 2)
        real_l += lr
        fake_l += lf
        loss += lr + lf
    n = len(scores_fake)
    return loss / n, real_l / n, fake_l / n


def hinge_D_loss(scores_fake: List[jnp.ndarray], scores_real: List[jnp.ndarray]):
    loss, real_l, fake_l = 0.0, 0.0, 0.0
    for sf, sr in zip(scores_fake, scores_real):
        lr = jnp.mean(jax.nn.relu(1.0 - sr.astype(jnp.float32)))
        lf = jnp.mean(jax.nn.relu(1.0 + sf.astype(jnp.float32)))
        real_l += lr
        fake_l += lf
        loss += lr + lf
    n = len(scores_fake)
    return loss / n, real_l / n, fake_l / n


def feature_matching_loss(feats_fake, feats_real) -> jnp.ndarray:
    """L1 between D features of fake and real (ref MelganFeatureLoss:151)."""
    loss = 0.0
    count = 0
    for d_fake, d_real in zip(feats_fake, feats_real):
        for f_fake, f_real in zip(d_fake, d_real):
            loss += jnp.mean(jnp.abs(f_fake.astype(jnp.float32) - jax.lax.stop_gradient(f_real).astype(jnp.float32)))
            count += 1
    return loss / max(count, 1)


# ------------------------------------------------------------------ composite

class GeneratorLossConfig:
    """Weights/switches bundle read from a vocoder GAN config (ref :218)."""

    def __init__(self, C):
        self.use_stft_loss = getattr(C, "use_stft_loss", False)
        self.use_subband_stft_loss = getattr(C, "use_subband_stft_loss", False)
        self.use_mse_gan_loss = getattr(C, "use_mse_gan_loss", True)
        self.use_hinge_gan_loss = getattr(C, "use_hinge_gan_loss", False)
        self.use_feat_match_loss = getattr(C, "use_feat_match_loss", True)
        self.use_l1_spec_loss = getattr(C, "use_l1_spec_loss", False)
        self.stft_loss_weight = getattr(C, "stft_loss_weight", 0.0)
        self.subband_stft_loss_weight = getattr(C, "subband_stft_loss_weight", 0.0)
        self.mse_gan_loss_weight = getattr(C, "mse_G_loss_weight", 1.0)
        self.hinge_gan_loss_weight = getattr(C, "hinge_G_loss_weight", 0.0)
        self.feat_match_loss_weight = getattr(C, "feat_match_loss_weight", 100.0)
        self.l1_spec_loss_weight = getattr(C, "l1_spec_loss_weight", 0.0)
        self.stft_loss_params = getattr(C, "stft_loss_params", None) or {
            "n_ffts": [1024, 2048, 512], "hop_lengths": [120, 240, 50], "win_lengths": [600, 1200, 240]
        }
        self.subband_stft_loss_params = getattr(C, "subband_stft_loss_params", None) or {
            "n_ffts": [384, 683, 171], "hop_lengths": [30, 60, 10], "win_lengths": [150, 300, 60]
        }
        self.l1_spec_params = {
            "sample_rate": C.audio.sample_rate,
            "n_fft": C.audio.fft_size,
            "hop_length": C.audio.hop_length,
            "win_length": C.audio.win_length,
            "num_mels": C.audio.num_mels,
            "fmin": C.audio.mel_fmin,
            "fmax": C.audio.mel_fmax,
        }


def generator_loss(
    cfg: GeneratorLossConfig,
    y_hat=None,
    y=None,
    scores_fake=None,
    feats_fake=None,
    feats_real=None,
    y_hat_sub=None,
    y_sub=None,
) -> Dict[str, jnp.ndarray]:
    """Composite G loss (ref GeneratorLoss.forward:246)."""
    gen_loss = 0.0
    adv_loss = 0.0
    out = {}
    if cfg.use_stft_loss:
        mag, sc = multi_scale_stft_loss(
            y_hat[:, :, 0] if y_hat.ndim == 3 else y_hat,
            y[:, :, 0] if y.ndim == 3 else y,
            tuple(cfg.stft_loss_params["n_ffts"]),
            tuple(cfg.stft_loss_params["hop_lengths"]),
            tuple(cfg.stft_loss_params["win_lengths"]),
        )
        out["G_stft_loss_mg"] = mag
        out["G_stft_loss_sc"] = sc
        gen_loss += cfg.stft_loss_weight * (mag + sc)
    if cfg.use_subband_stft_loss:
        mag, sc = multi_scale_stft_loss(
            y_hat_sub.reshape(-1, y_hat_sub.shape[1]),
            y_sub.reshape(-1, y_sub.shape[1]),
            tuple(cfg.subband_stft_loss_params["n_ffts"]),
            tuple(cfg.subband_stft_loss_params["hop_lengths"]),
            tuple(cfg.subband_stft_loss_params["win_lengths"]),
        )
        out["G_subband_stft_loss_mg"] = mag
        out["G_subband_stft_loss_sc"] = sc
        gen_loss += cfg.subband_stft_loss_weight * (mag + sc)
    if cfg.use_l1_spec_loss:
        l1 = l1_spec_loss(
            y_hat[:, :, 0] if y_hat.ndim == 3 else y_hat,
            y[:, :, 0] if y.ndim == 3 else y,
            **cfg.l1_spec_params,
        )
        out["G_l1_spec_loss"] = l1
        gen_loss += cfg.l1_spec_loss_weight * l1
    if cfg.use_mse_gan_loss and scores_fake is not None:
        mse = mse_G_loss(scores_fake)
        out["G_mse_fake_loss"] = mse
        adv_loss += cfg.mse_gan_loss_weight * mse
    if cfg.use_hinge_gan_loss and scores_fake is not None:
        hinge = hinge_G_loss(scores_fake)
        out["G_hinge_fake_loss"] = hinge
        adv_loss += cfg.hinge_gan_loss_weight * hinge
    if cfg.use_feat_match_loss and feats_fake is not None:
        fm = feature_matching_loss(feats_fake, feats_real)
        out["G_feat_match_loss"] = fm
        adv_loss += cfg.feat_match_loss_weight * fm
    out["loss"] = gen_loss + adv_loss
    out["G_gen_loss"] = gen_loss
    out["G_adv_loss"] = adv_loss
    return out


def discriminator_loss(cfg, scores_fake, scores_real) -> Dict[str, jnp.ndarray]:
    """Composite D loss (ref DiscriminatorLoss:311)."""
    use_mse = getattr(cfg, "use_mse_gan_loss", True)
    out = {}
    loss = 0.0
    if use_mse:
        total, lr, lf = mse_D_loss(scores_fake, scores_real)
        out["D_mse_gan_loss"] = total
        out["D_mse_gan_real_loss"] = lr
        out["D_mse_gan_fake_loss"] = lf
        loss += total
    if getattr(cfg, "use_hinge_gan_loss", False):
        total, lr, lf = hinge_D_loss(scores_fake, scores_real)
        out["D_hinge_gan_loss"] = total
        loss += total
    out["loss"] = loss
    return out
