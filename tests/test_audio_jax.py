"""Parity tests: JAX/TPU DSP (matmul-STFT) vs the numpy reference oracles."""

import numpy as np
import torch

from tpu_tts.audio import jax_transforms as jt
from tpu_tts.audio import numpy_transforms as nt


def _sine(sr=22050, dur=0.6, f=330.0):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_stft_magnitude_matches_numpy():
    y = _sine()
    mag_jax = np.asarray(jt.stft_magnitude(y, fft_size=1024, hop_length=256, win_length=1024))
    mag_np = np.abs(nt.stft(y=y, fft_size=1024, hop_length=256, win_length=1024)).T
    assert mag_jax.shape == mag_np.shape
    np.testing.assert_allclose(mag_jax, mag_np, atol=2e-3, rtol=1e-3)


def test_stft_batched():
    y = np.stack([_sine(f=220.0), _sine(f=440.0)])
    mag = np.asarray(jt.stft_magnitude(y, fft_size=512, hop_length=128))
    assert mag.shape[0] == 2
    one = np.asarray(jt.stft_magnitude(y[0], fft_size=512, hop_length=128))
    np.testing.assert_allclose(mag[0], one, atol=1e-5)


def test_istft_round_trip():
    y = _sine()
    re, im = jt.stft_complex(y, fft_size=1024, hop_length=256)
    y2 = np.asarray(jt.istft(re, im, fft_size=1024, hop_length=256))
    n = min(len(y), len(y2))
    np.testing.assert_allclose(y[1024 : n - 1024], y2[1024 : n - 1024], atol=1e-4)


def test_wav_to_spec_matches_torch_vits_semantics():
    """Exact VITS framing: reflect pad (n_fft-hop)/2, center=False."""
    y = _sine()
    fft_size, hop, win = 1024, 256, 1024
    spec_jax = np.asarray(jt.wav_to_spec(y, fft_size=fft_size, hop_length=hop, win_length=win))
    yt = torch.from_numpy(y.astype(np.float64))
    pad = int((fft_size - hop) / 2)
    yt = torch.nn.functional.pad(yt.view(1, 1, -1), (pad, pad), mode="reflect").view(-1)
    ref = torch.stft(
        yt, fft_size, hop_length=hop, win_length=win,
        window=torch.hann_window(win, dtype=torch.float64),
        center=False, return_complex=True,
    )
    ref_mag = torch.sqrt(ref.real**2 + ref.imag**2 + 1e-6).numpy()
    assert spec_jax.shape == ref_mag.shape
    np.testing.assert_allclose(spec_jax, ref_mag, atol=2e-3, rtol=1e-3)


def test_wav_to_mel_shapes_and_finite():
    y = np.stack([_sine(), _sine(f=110.0)])
    mel = np.asarray(
        jt.wav_to_mel(
            y, fft_size=1024, num_mels=80, sample_rate=22050,
            hop_length=256, win_length=1024, fmin=0, fmax=None,
        )
    )
    assert mel.shape[:2] == (2, 80)
    assert np.isfinite(mel).all()
    # log compression floor
    assert mel.min() >= np.log(1e-5) - 1e-5


def test_griffin_lim_on_device():
    y = _sine(dur=0.4)
    kw = dict(fft_size=1024, hop_length=256, win_length=1024)
    mag = jt.stft_magnitude(y, **kw)
    y2 = np.asarray(jt.griffin_lim(mag, num_iter=30, **kw))
    mag2 = np.asarray(jt.stft_magnitude(y2, **kw))
    err = np.mean((np.asarray(mag) - mag2) ** 2) / np.mean(np.asarray(mag) ** 2)
    assert err < 0.08


def test_dynamic_range_compression_round_trip():
    x = np.abs(np.random.RandomState(0).randn(4, 8)).astype(np.float32) + 0.1
    c = jt.dynamic_range_compression(x)
    x2 = np.asarray(jt.dynamic_range_decompression(c))
    np.testing.assert_allclose(x, x2, rtol=1e-5)
