import numpy as np
import pytest
import torch

from tpu_tts.audio import numpy_transforms as nt
from tpu_tts.audio.processor import AudioProcessor


def _sine(sr=22050, dur=0.7, f=220.0):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_mel_scale_slaney_anchors():
    # Slaney scale: linear below 1 kHz with slope 3/200, log above.
    assert nt.hz_to_mel(0.0) == 0.0
    assert np.isclose(nt.hz_to_mel(1000.0), 15.0)
    assert np.isclose(nt.hz_to_mel(200.0 / 3.0), 1.0)
    assert np.isclose(nt.mel_to_hz(15.0), 1000.0)
    assert np.isclose(nt.mel_to_hz(nt.hz_to_mel(4321.0)), 4321.0)
    # HTK variant
    assert np.isclose(nt.hz_to_mel(1000.0, htk=True), 1000.0, atol=1.0)


def test_mel_filterbank_structure():
    fb = nt.mel_filterbank(sample_rate=22050, fft_size=1024, num_mels=80)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has some support; supports shift monotonically upward
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    assert fb.sum() > 0
    # slaney norm: filter areas ~ 2/bandwidth -> higher filters have lower peaks
    assert fb[0].max() > fb[-1].max()


def test_stft_matches_torch():
    y = _sine()
    D = nt.stft(y=y, fft_size=1024, hop_length=256, win_length=1024)
    ref = torch.stft(
        torch.from_numpy(y.astype(np.float64)),
        n_fft=1024,
        hop_length=256,
        win_length=1024,
        window=torch.hann_window(1024, dtype=torch.float64),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).numpy()
    assert D.shape == ref.shape
    np.testing.assert_allclose(np.abs(D), np.abs(ref), atol=1e-8)


def test_stft_istft_round_trip():
    y = _sine()
    kw = dict(fft_size=1024, hop_length=256, win_length=1024)
    D = nt.stft(y=y, **kw)
    y2 = nt.istft(y=D, hop_length=256, win_length=1024)
    n = min(len(y), len(y2))
    # interior must reconstruct nearly exactly
    np.testing.assert_allclose(y[1024 : n - 1024], y2[1024 : n - 1024], atol=1e-6)


def test_griffin_lim_recovers_sine():
    y = _sine(dur=0.5)
    kw = dict(fft_size=1024, hop_length=256, win_length=1024)
    S = np.abs(nt.stft(y=y, **kw))
    y2 = nt.griffin_lim(spec=S, num_iter=40, seed=0, **kw)
    S2 = np.abs(nt.stft(y=y2, **kw))
    err = np.mean((S - S2) ** 2) / np.mean(S**2)
    assert err < 0.05


def test_amp_db_round_trip():
    x = np.abs(np.random.RandomState(0).randn(80, 50)) + 1e-3
    for base in (10, np.e):
        db = nt.amp_to_db(x=x, gain=20 if base == 10 else 1, base=base)
        x2 = nt.db_to_amp(x=db, gain=20 if base == 10 else 1, base=base)
        np.testing.assert_allclose(x, x2, rtol=1e-6)


def test_preemphasis_round_trip():
    y = _sine()
    z = nt.preemphasis(x=y, coef=0.97)
    y2 = nt.deemphasis(x=z, coef=0.97)
    np.testing.assert_allclose(y, y2, atol=1e-6)


def test_mulaw_round_trip():
    y = _sine()
    enc = nt.mulaw_encode(wav=y, mulaw_qc=10)
    assert enc.min() >= 0 and enc.max() <= 1023
    dec = nt.mulaw_decode(wav=2 * enc / 1023 - 1, mulaw_qc=10)
    assert np.abs(dec - y).max() < 0.01


def test_quantize_round_trip():
    y = _sine()
    q = nt.quantize(x=y, quantize_bits=10)
    y2 = nt.dequantize(x=q, quantize_bits=10)
    np.testing.assert_allclose(y, y2, atol=1e-6)


def test_compute_f0_sine():
    sr = 22050
    y = _sine(sr=sr, dur=0.6, f=220.0)
    f0 = nt.compute_f0(
        x=y, pitch_fmin=60, pitch_fmax=600, hop_length=256, win_length=1024, sample_rate=sr
    )
    voiced = f0[f0 > 0]
    assert len(voiced) > len(f0) // 2
    assert abs(np.median(voiced) - 220.0) < 5.0


def test_pyin_voicing_decision():
    """pyin's Viterbi voicing must zero unvoiced (noise/silence) frames and
    track voiced ones — the reference's `f0[~voiced_mask] = 0` semantics
    (ref numpy_transforms.py:298), which plain YIN thresholding lacks."""
    sr = 22050
    rng = np.random.default_rng(0)
    tone = _sine(sr=sr, dur=1.0, f=196.0)
    noise = 0.002 * rng.standard_normal(sr // 2)
    y = np.concatenate([noise, tone, noise])
    f0 = nt.compute_f0(
        x=y, pitch_fmin=1, pitch_fmax=640, hop_length=256, win_length=1024, sample_rate=sr
    )
    n_edge = len(noise) // 256
    head, mid, tail = f0[: n_edge - 4], f0[n_edge + 8 : -n_edge - 8], f0[-(n_edge - 4):]
    assert (head > 0).mean() < 0.3, "leading noise mostly voiced"
    assert (tail > 0).mean() < 0.3, "trailing noise mostly voiced"
    assert (mid > 0).mean() > 0.9, "tone frames not voiced"
    assert abs(np.median(mid[mid > 0]) - 196.0) < 4.0


def test_pyin_octave_continuity():
    """The pitch-transition prior must prevent frame-to-frame octave jumps on
    a steady harmonic tone (the failure mode of per-frame YIN)."""
    sr = 22050
    t = np.arange(int(sr * 1.2)) / sr
    y = sum((0.5 / h) * np.sin(2 * np.pi * 150.0 * h * t) for h in range(1, 6))
    f0, flag, _ = nt.pyin(
        y, fmin=50, fmax=600, sr=sr, frame_length=1024, hop_length=256
    )
    v = f0[8:-8][flag[8:-8]]
    assert len(v) > 50
    jumps = np.abs(np.diff(np.log2(v)))
    assert np.max(jumps) < 0.5, "octave jump within a steady tone"
    assert abs(np.median(v) - 150.0) < 3.0


def test_load_save_wav(tmp_path):
    y = _sine()
    p = str(tmp_path / "x.wav")
    nt.save_wav(wav=y, path=p, sample_rate=22050)
    y2 = nt.load_wav(filename=p, sample_rate=22050)
    assert abs(len(y) - len(y2)) < 2
    c = np.corrcoef(y[: len(y2)], y2[: len(y)])[0, 1]
    assert c > 0.99


def test_trim_silence():
    sr = 22050
    sig = _sine(sr=sr, dur=0.4)
    pad = np.zeros(sr // 2, dtype=np.float32)
    y = np.concatenate([pad, sig, pad])
    out = nt.trim_silence(wav=y, sample_rate=sr, trim_db=45, win_length=1024, hop_length=256)
    assert len(out) < len(sig) + 4096
    assert len(out) > len(sig) // 2


@pytest.fixture
def ap():
    return AudioProcessor(
        sample_rate=22050,
        num_mels=80,
        min_level_db=-100,
        frame_shift_ms=None,
        frame_length_ms=None,
        hop_length=256,
        win_length=1024,
        ref_level_db=20,
        fft_size=1024,
        power=1.5,
        preemphasis=0.0,
        signal_norm=True,
        symmetric_norm=True,
        max_norm=4.0,
        mel_fmin=0,
        mel_fmax=8000,
        pitch_fmin=1,
        pitch_fmax=640,
        spec_gain=20,
        clip_norm=True,
        griffin_lim_iters=20,
        do_trim_silence=False,
        verbose=False,
    )


def test_processor_mel_norm_range(ap):
    y = _sine()
    m = ap.melspectrogram(y)
    assert m.shape[0] == 80
    assert m.min() >= -4.0 - 1e-5 and m.max() <= 4.0 + 1e-5
    # denormalize -> normalize round trip
    d = ap.denormalize(m)
    m2 = ap.normalize(d)
    np.testing.assert_allclose(m, m2, atol=1e-4)


def test_processor_asymmetric_norm():
    ap = AudioProcessor(
        sample_rate=22050, num_mels=80, min_level_db=-100, hop_length=256, win_length=1024,
        ref_level_db=20, fft_size=1024, power=1.5, signal_norm=True, symmetric_norm=False,
        max_norm=4.0, mel_fmin=0, mel_fmax=8000, spec_gain=20, clip_norm=True,
        griffin_lim_iters=10, verbose=False,
    )
    m = ap.melspectrogram(_sine())
    assert m.min() >= 0.0


def test_processor_inv_melspectrogram(ap):
    y = _sine(dur=0.5)
    m = ap.melspectrogram(y)
    w = ap.inv_melspectrogram(m)
    assert np.isfinite(w).all()
    assert len(w) > 0
