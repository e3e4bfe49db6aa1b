"""Voice activity detection + silence removal.

Role of /root/reference/TTS/utils/vad.py (which wraps Silero-VAD via
torch.hub — unavailable offline). This build ships a self-contained
energy + spectral-flatness VAD with the same surface
(`get_vad_model_and_utils`, `remove_silence`).
"""

from typing import List, Tuple

import numpy as np


def _frame_energies(wav: np.ndarray, frame: int, hop: int) -> np.ndarray:
    n = 1 + max(0, (len(wav) - frame)) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
    frames = wav[idx]
    return np.sqrt(np.mean(frames**2, axis=1) + 1e-12)


def get_speech_timestamps(
    wav: np.ndarray,
    sample_rate: int = 16000,
    threshold_db: float = -40.0,
    min_speech_ms: float = 100.0,
    min_silence_ms: float = 120.0,
    frame_ms: float = 30.0,
) -> List[dict]:
    """Return [{'start': sample, 'end': sample}] speech segments."""
    frame = int(sample_rate * frame_ms / 1000)
    hop = frame // 2
    if len(wav) < frame:
        return [{"start": 0, "end": len(wav)}] if np.abs(wav).max() > 0 else []
    rms = _frame_energies(wav, frame, hop)
    peak = rms.max() + 1e-12
    db = 20 * np.log10(rms / peak + 1e-12)
    speech = db > threshold_db
    # merge short silences, drop short speech bursts
    min_speech = max(1, int(min_speech_ms / 1000 * sample_rate / hop))
    min_sil = max(1, int(min_silence_ms / 1000 * sample_rate / hop))
    segments = []
    i = 0
    n = len(speech)
    while i < n:
        if speech[i]:
            j = i
            sil = 0
            while j < n and sil < min_sil:
                sil = sil + 1 if not speech[j] else 0
                j += 1
            end = j - sil
            if end - i >= min_speech:
                segments.append({"start": i * hop, "end": min(end * hop + frame, len(wav))})
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
