"""UnivNet spectrogram discriminator + MPD combo (flax).

Mirror of /root/reference/TTS/vocoder/models/univnet_discriminator.py:95
(multi-resolution STFT discriminators + the HiFi-GAN MPD).
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_tts.audio.jax_transforms import stft_complex
from tpu_tts.vocoder.models.hifigan_discriminator import MultiPeriodDiscriminator, NormConv


class SpecDiscriminator(nn.Module):
    """2D convs over an STFT magnitude (one resolution)."""

    fft_size: int = 1024
    hop_length: int = 120
    win_length: int = 600

    @nn.compact
    def __call__(self, x):
        # x: [B, T, 1] waveform -> magnitude [B, frames, freq, 1]
        re, im = stft_complex(
            x[..., 0], fft_size=self.fft_size, hop_length=self.hop_length, win_length=self.win_length
        )
        mag = jnp.sqrt(re**2 + im**2 + 1e-9)[..., None]
        feats = []
        h = mag
        specs = [(32, (3, 9), (1, 1)), (32, (3, 9), (1, 2)), (32, (3, 9), (1, 2)), (32, (3, 9), (1, 2)), (32, (3, 3), (1, 1))]
        for i, (ch, k, s) in enumerate(specs):
            h = NormConv(ch, k, strides=s, use_spectral_norm=True, name=f"conv_{i}")(h)
            h = jax.nn.leaky_relu(h, 0.2)
            feats.append(h)
        score = NormConv(1, (3, 3), strides=(1, 1), use_spectral_norm=True, name="conv_post")(h)
        feats.append(score)
        return score.reshape(score.shape[0], -1), feats


class UnivnetDiscriminator(nn.Module):
    """Multi-resolution spec discriminators + MPD (ref :95)."""

    resolutions: Tuple[Tuple[int, int, int], ...] = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))

    @nn.compact
    def __call__(self, x):
        scores, feats = [], []
        for i, (n_fft, hop, win) in enumerate(self.resolutions):
            s, f = SpecDiscriminator(n_fft, hop, win, name=f"spec_{i}")(x)
            scores.append(s)
            feats.append(f)
        p_scores, p_feats = MultiPeriodDiscriminator(name="mpd")(x)
        return scores + p_scores, feats + p_feats
