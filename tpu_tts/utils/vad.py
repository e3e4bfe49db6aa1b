"""Voice activity detection + silence removal.

Role of /root/reference/TTS/utils/vad.py (which wraps Silero-VAD via
torch.hub — a network-downloaded model, unavailable in a zero-egress build).
This build ships a self-contained statistical VAD implementing the
Moattar-Homayounpour (Eusipco 2009) algorithm: per-frame energy, dominant
frequency, and spectral flatness compared against adaptively tracked noise
floors, with hangover smoothing. Unlike a fixed peak-relative energy gate it
adapts to stationary noise, so `remove_silence_using_vad` behaves usefully on
noisy recordings. Same surface as the reference (`get_vad_model_and_utils`,
`remove_silence`).
"""

from typing import List, Tuple

import numpy as np


def _frame(wav: np.ndarray, frame: int, hop: int) -> np.ndarray:
    n = 1 + max(0, (len(wav) - frame)) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
    return wav[idx]


def _vad_decisions(
    wav: np.ndarray,
    sample_rate: int,
    frame_ms: float = 10.0,
    e_snr_thresh_db: float = 8.0,
    f_prim_thresh: float = 185.0,
    sf_prim_thresh: float = 5.0,
) -> np.ndarray:
    """Per-frame speech/silence decisions — Moattar-Homayounpour (2009)
    feature set (energy, dominant frequency, spectral flatness vs adaptively
    tracked noise floors), with the paper's dimensionally unsound absolute
    energy threshold replaced by a scale-invariant SNR test (frame energy
    >= `e_snr_thresh_db` over the tracked floor)."""
    frame = max(int(sample_rate * frame_ms / 1000), 32)
    hop = frame
    frames = _frame(wav, frame, hop)
    n = frames.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)

    energy = np.sum(frames**2, axis=1) + 1e-12
    spec = np.abs(np.fft.rfft(frames * np.hanning(frame)[None, :], axis=1)) + 1e-12
    freqs = np.fft.rfftfreq(frame, 1.0 / sample_rate)
    dom_freq = freqs[np.argmax(spec[:, 1:], axis=1) + 1]  # skip DC
    # spectral flatness in dB: 10 log10(geometric / arithmetic mean)
    sfm = -10.0 * np.log10(np.exp(np.mean(np.log(spec), axis=1)) / np.mean(spec, axis=1))

    # noise floors initialized from the first ~30 frames' minima
    head = min(30, n)
    min_e = float(np.min(energy[:head]))
    min_f = float(np.min(dom_freq[:head]))
    min_sf = float(np.min(sfm[:head]))

    speech = np.zeros(n, dtype=bool)
    silence_count = 0
    for i in range(n):
        snr_db = 10.0 * np.log10(energy[i] / max(min_e, 1e-12))
        e_cond = snr_db >= e_snr_thresh_db
        counter = int(e_cond)
        if dom_freq[i] - min_f >= f_prim_thresh:
            counter += 1
        if sfm[i] - min_sf >= sf_prim_thresh:
            counter += 1
        # energy rise is NECESSARY (white noise randomly satisfies the
        # frequency/flatness conditions alone), plus one spectral cue
        if e_cond and counter > 1:
            speech[i] = True
        else:
            # adapt the energy noise floor on silence frames
            min_e = (silence_count * min_e + energy[i]) / (silence_count + 1)
            silence_count += 1
    return speech


def _smooth(speech: np.ndarray, min_speech: int, min_sil: int) -> np.ndarray:
    """Hangover: fill silence runs < min_sil, drop speech runs < min_speech."""
    out = speech.copy()
    n = len(out)
    # fill short silences between speech
    i = 0
    while i < n:
        if not out[i]:
            j = i
            while j < n and not out[j]:
                j += 1
            if 0 < i and j < n and (j - i) < min_sil:
                out[i:j] = True
            i = j
        else:
            i += 1
    # drop short speech bursts
    i = 0
    while i < n:
        if out[i]:
            j = i
            while j < n and out[j]:
                j += 1
            if (j - i) < min_speech:
                out[i:j] = False
            i = j
        else:
            i += 1
    return out


def get_speech_timestamps(
    wav: np.ndarray,
    sample_rate: int = 16000,
    threshold_db: float = -40.0,  # kept for back-compat; adaptive path ignores it
    min_speech_ms: float = 100.0,
    min_silence_ms: float = 120.0,
    frame_ms: float = 10.0,
) -> List[dict]:
    """Return [{'start': sample, 'end': sample}] speech segments."""
    frame = max(int(sample_rate * frame_ms / 1000), 32)
    if len(wav) < frame:
        return [{"start": 0, "end": len(wav)}] if np.abs(wav).max() > 0 else []
    speech = _vad_decisions(wav, sample_rate, frame_ms)
    min_speech = max(1, int(min_speech_ms / 1000 * sample_rate / frame))
    min_sil = max(1, int(min_silence_ms / 1000 * sample_rate / frame))
    speech = _smooth(speech, min_speech, min_sil)

    segments = []
    i, n = 0, len(speech)
    while i < n:
        if speech[i]:
            j = i
            while j < n and speech[j]:
                j += 1
            segments.append({"start": i * frame, "end": min(j * frame, len(wav))})
            i = j
        else:
            i += 1
    return segments


def get_vad_model_and_utils(use_cuda: bool = False, use_onnx: bool = False):
    """Surface-compatible loader; returns (model, utils) where utils mirrors
    the silero tuple layout (only `get_speech_timestamps` is functional)."""
    return None, (get_speech_timestamps, None, None, None, None)


def remove_silence(
    model_and_utils,
    audio_path: str,
    out_path: str,
    vad_sample_rate: int = 8000,
    trim_just_beginning_and_end: bool = True,
    use_cuda: bool = False,
) -> Tuple[str, bool]:
    """Trim silences from a wav file (ref vad.py:48)."""
    from tpu_tts.audio.numpy_transforms import load_wav, save_wav
    import scipy.io.wavfile

    sr, _ = scipy.io.wavfile.read(audio_path)
    wav = load_wav(filename=audio_path)
    segments = get_speech_timestamps(wav, sample_rate=sr)
    if not segments:
        save_wav(wav=wav, path=out_path, sample_rate=sr)
        return out_path, False
    if trim_just_beginning_and_end:
        new_wav = wav[segments[0]["start"] : segments[-1]["end"]]
    else:
        new_wav = np.concatenate([wav[s["start"] : s["end"]] for s in segments])
    save_wav(wav=new_wav, path=out_path, sample_rate=sr)
    return out_path, True
