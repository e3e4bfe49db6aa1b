"""On-device DSP as JAX/XLA ops, designed for the TPU MXU.

TPU-first design note: instead of an FFT, the STFT here is expressed as two
matmuls against windowed DFT cosine/sine bases. For TTS frame sizes
(fft_size ≤ 2048) this keeps the whole featurization path on the MXU, lets XLA
fuse window × DFT × |.| × mel-projection × log into one pipeline, and is both
faster and more fusion-friendly than `jnp.fft` on TPU. The iSTFT overlap-add is
a transposed convolution (again MXU work), so Griffin-Lim runs fully on-device
as a `lax.fori_loop`.

Semantics mirror the reference's two STFT flavors:
- librosa-style `center=True` reflect padding
  (/root/reference/TTS/utils/audio/numpy_transforms.py:173 and
  torch_transforms.py:6) used by AudioProcessor / TorchSTFT.
- VITS-style `center=False` with manual `(n_fft - hop)/2` reflect padding and
  `sqrt(power + 1e-6)` magnitude (/root/reference/TTS/tts/models/vits.py:96).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.audio.numpy_transforms import (
    _pad_window,
    get_window,
    mel_filterbank,
)

# ---------------------------------------------------------------------------
# Cached host-side constant builders (become XLA constants under jit)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _dft_bases(fft_size: int, win_length: int, window: str) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT bases. Returns (cos, -sin) each `[fft_size, n_freq]`."""
    w = _pad_window(get_window(window, win_length), fft_size)
    n = np.arange(fft_size)[:, None]
    k = np.arange(fft_size // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / fft_size
    cos_b = (np.cos(ang) * w[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * w[:, None]).astype(np.float32)
    return cos_b, sin_b


@functools.lru_cache(maxsize=32)
def _idft_bases(fft_size: int, win_length: int, window: str) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed inverse-rDFT bases mapping `[n_freq] → [fft_size]` (incl. the
    synthesis window), accounting for hermitian symmetry weights."""
    w = _pad_window(get_window(window, win_length), fft_size)
    n_freq = fft_size // 2 + 1
    n = np.arange(fft_size)[None, :]
    k = np.arange(n_freq)[:, None]
    ang = 2.0 * np.pi * n * k / fft_size
    # irfft(X)[n] = (1/N) * sum_k weight_k * (Re X_k cos - Im X_k sin)
    weight = np.full((n_freq, 1), 2.0)
    weight[0] = 1.0
    if fft_size % 2 == 0:
        weight[-1] = 1.0
    cos_b = (np.cos(ang) * weight / fft_size * w[None, :]).astype(np.float32)
    sin_b = (-np.sin(ang) * weight / fft_size * w[None, :]).astype(np.float32)
    return cos_b, sin_b


@functools.lru_cache(maxsize=32)
def _mel_basis_cached(sample_rate, fft_size, num_mels, mel_fmin, mel_fmax) -> np.ndarray:
    return mel_filterbank(
        sample_rate=sample_rate,
        fft_size=fft_size,
        num_mels=num_mels,
        mel_fmin=mel_fmin,
        mel_fmax=mel_fmax,
    )


# ---------------------------------------------------------------------------
# Framing
# ---------------------------------------------------------------------------


def frame_signal(y: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Frame `[..., T] → [..., num_frames, frame_length]` (static shapes)."""
    num_frames = 1 + (y.shape[-1] - frame_length) // hop_length
    idx = np.arange(num_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    return y[..., idx]


def _reflect_pad_last(y: jnp.ndarray, pad: int) -> jnp.ndarray:
    cfg = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
    return jnp.pad(y, cfg, mode="reflect")


# ---------------------------------------------------------------------------
# STFT magnitude / mel
# ---------------------------------------------------------------------------


def stft_complex(
    y: jnp.ndarray,
    *,
    fft_size: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real/imag STFT `[..., num_frames, n_freq]` via MXU matmuls."""
    win_length = win_length or fft_size
    cos_b, sin_b = _dft_bases(fft_size, win_length, window)
    if center:
        y = _reflect_pad_last(y, fft_size // 2)
    frames = frame_signal(y, fft_size, hop_length)
    re = jnp.matmul(frames, jnp.asarray(cos_b), preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, jnp.asarray(sin_b), preferred_element_type=jnp.float32)
    return re, im


def stft_magnitude(
    y: jnp.ndarray,
    *,
    fft_size: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """|STFT| with librosa-compatible centering: `[..., num_frames, n_freq]`."""
    re, im = stft_complex(
        y, fft_size=fft_size, hop_length=hop_length, win_length=win_length, window=window, center=center
    )
    return jnp.sqrt(jnp.clip(re * re + im * im, min=eps))


def istft(
    re: jnp.ndarray,
    im: jnp.ndarray,
    *,
    fft_size: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
) -> jnp.ndarray:
    """Inverse STFT from real/imag `[..., num_frames, n_freq]` via transposed
    conv overlap-add with squared-window normalization."""
    win_length = win_length or fft_size
    cos_b, sin_b = _idft_bases(fft_size, win_length, window)
    # windowed time-domain frames: [..., num_frames, fft_size]
    frames = jnp.matmul(re, jnp.asarray(cos_b), preferred_element_type=jnp.float32) + jnp.matmul(
        im, jnp.asarray(sin_b), preferred_element_type=jnp.float32
    )
    lead_shape = frames.shape[:-2]
    num_frames = frames.shape[-2]
    x = frames.reshape((-1, num_frames, fft_size))
    # overlap-add as conv_transpose: input [B, T, n_fft]; kernel diag placing
    # channel k at offset k: [kw=fft_size, in=fft_size, out=1]
    kernel = np.zeros((fft_size, fft_size, 1), dtype=np.float32)
    # conv_transpose spatially flips the kernel, so place channel k at
    # mirrored width index to land it at output offset k
    kernel[fft_size - 1 - np.arange(fft_size), np.arange(fft_size), 0] = 1.0
    # full overlap-add: padding (k-1, k-1) around the stride-dilated input
    out = jax.lax.conv_transpose(
        x,
        jnp.asarray(kernel),
        strides=(hop_length,),
        padding=[(fft_size - 1, fft_size - 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )[..., 0]
    total = fft_size + hop_length * (num_frames - 1)
    out = out[..., :total]
    # squared-window normalization (precomputed on host)
    w = _pad_window(get_window(window, win_length), fft_size)
    wsum = np.zeros(total, dtype=np.float32)
    for i in range(num_frames):
        wsum[i * hop_length : i * hop_length + fft_size] += (w * w).astype(np.float32)
    wsum = np.where(wsum > 1e-10, wsum, 1.0)
    out = out / jnp.asarray(wsum)
    if center:
        out = out[..., fft_size // 2 : total - fft_size // 2]
    return out.reshape(lead_shape + (out.shape[-1],))


def griffin_lim(
    spec: jnp.ndarray,
    *,
    fft_size: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: str = "hann",
    num_iter: int = 60,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """On-device Griffin-Lim. `spec`: magnitude `[..., num_frames, n_freq]`.

    Mirrors /root/reference/TTS/utils/audio/numpy_transforms.py:222 but runs as
    a jittable fori_loop of MXU stft/istft pairs.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    kw = dict(fft_size=fft_size, hop_length=hop_length, win_length=win_length, window=window)
    phase = jax.random.uniform(rng, spec.shape, minval=0.0, maxval=2.0 * np.pi)
    re, im = spec * jnp.cos(phase), spec * jnp.sin(phase)
    y = istft(re, im, **kw)

    def body(_, y):
        re, im = stft_complex(y, **kw)
        mag = jnp.sqrt(jnp.clip(re * re + im * im, min=1e-10))
        re, im = spec * re / mag, spec * im / mag
        return istft(re, im, **kw)

    return jax.lax.fori_loop(0, num_iter, body, y)


# ---------------------------------------------------------------------------
# Reference-compatible featurization entry points
# ---------------------------------------------------------------------------


def amp_to_db(x: jnp.ndarray, gain: float = 1.0, base: float = 10.0) -> jnp.ndarray:
    """AudioProcessor-style dB (reference numpy_transforms.py:61)."""
    log = jnp.log10 if base == 10 else jnp.log
    return gain * log(jnp.clip(x, min=1e-8))


def db_to_amp(x: jnp.ndarray, gain: float = 1.0, base: float = 10.0) -> jnp.ndarray:
    return jnp.power(base, x / gain) if base == 10 else jnp.exp(x / gain)


def dynamic_range_compression(x: jnp.ndarray, gain: float = 1.0, clip_val: float = 1e-5) -> jnp.ndarray:
    """VITS/HiFi-GAN-style log compression (reference vits.py:78)."""
    return jnp.log(jnp.clip(x, min=clip_val) * gain)


def dynamic_range_decompression(x: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
    return jnp.exp(x) / gain


def torchaudio_mel(
    y: jnp.ndarray,
    *,
    fft_size: int,
    hop_length: int,
    win_length: int,
    sample_rate: int,
    num_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = True,
    log_clamp: float = 1e-5,
    mel_norms: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """torchaudio.transforms.MelSpectrogram semantics (power=2, center=True
    reflect, slaney norm; torchaudio defaults to the HTK mel scale) + the
    tortoise log-clamp/per-bin normalization (reference
    tts/layers/tortoise/arch_utils.py:299 `TorchMelSpectrogram`; set
    `htk=False` for the librosa-mel `TorchSTFT` path of
    utils/audio/torch_transforms.py used by `wav_to_univnet_mel`).

    `[..., T] → [..., T_frames, num_mels]` (channels-last)."""
    from tpu_tts.audio.numpy_transforms import mel_filterbank

    re, im = stft_complex(
        y, fft_size=fft_size, hop_length=hop_length, win_length=win_length, center=True
    )
    power = re * re + im * im  # [..., T_frames, n_freq]
    basis = mel_filterbank(
        sample_rate=sample_rate, fft_size=fft_size, num_mels=num_mels,
        mel_fmin=fmin, mel_fmax=fmax, htk=htk, norm="slaney",
    )  # [num_mels, n_freq]
    mel = jnp.matmul(power, jnp.asarray(basis.T), preferred_element_type=jnp.float32)
    mel = jnp.log(jnp.clip(mel, min=log_clamp))
    if mel_norms is not None:
        mel = mel / jnp.asarray(mel_norms)
    return mel


def wav_to_spec(
    y: jnp.ndarray,
    *,
    fft_size: int,
    hop_length: int,
    win_length: int,
    center: bool = False,
) -> jnp.ndarray:
    """VITS-semantics linear magnitude spectrogram: `[..., T] → [..., C, T_spec]`.

    Matches /root/reference/TTS/tts/models/vits.py:96 — manual
    `(n_fft - hop)/2` reflect pad, center=False, `sqrt(power + 1e-6)`.
    """
    if not center:
        y = _reflect_pad_last(y, (fft_size - hop_length) // 2)
    re, im = stft_complex(
        y, fft_size=fft_size, hop_length=hop_length, win_length=win_length, center=center
    )
    spec = jnp.sqrt(re * re + im * im + 1e-6)
    return jnp.swapaxes(spec, -1, -2)


def spec_to_mel(
    spec: jnp.ndarray,
    *,
    fft_size: int,
    num_mels: int,
    sample_rate: int,
    fmin: float,
    fmax: Optional[float],
) -> jnp.ndarray:
    """`[..., C, T] → [..., num_mels, T]` log-mel (reference vits.py:141)."""
    basis = jnp.asarray(_mel_basis_cached(sample_rate, fft_size, num_mels, fmin, fmax))
    mel = jnp.matmul(basis, spec, preferred_element_type=jnp.float32)
    return dynamic_range_compression(mel)


def wav_to_mel(
    y: jnp.ndarray,
    *,
    fft_size: int,
    num_mels: int,
    sample_rate: int,
    hop_length: int,
    win_length: int,
    fmin: float,
    fmax: Optional[float],
    center: bool = False,
) -> jnp.ndarray:
    """VITS-semantics log-mel: `[..., T] → [..., num_mels, T_spec]`
    (reference vits.py:160)."""
    spec = wav_to_spec(y, fft_size=fft_size, hop_length=hop_length, win_length=win_length, center=center)
    return spec_to_mel(
        spec, fft_size=fft_size, num_mels=num_mels, sample_rate=sample_rate, fmin=fmin, fmax=fmax
    )
