"""Tortoise voice-directory loading (ref TTS/tts/layers/tortoise/
audio_utils.py:88 `get_voices` / :120 `load_voice`).

A voice is a directory of reference clips; `<name>.pth` files hold
precomputed (auto, diffusion) conditioning latents. This host-side loader
returns `(voice_samples, conditioning_latents)` — exactly one of the two is
non-None, matching the reference contract."""

import os
from glob import glob
from typing import Dict, List, Optional, Tuple

import numpy as np


def get_voices(extra_voice_dirs: Optional[List[str]] = None) -> Dict[str, List[str]]:
    """Map voice name → list of clip/latent paths (ref audio_utils.py:88)."""
    voices: Dict[str, List[str]] = {}
    for d in extra_voice_dirs or []:
        if not os.path.isdir(d):
            continue
        for sub in sorted(os.listdir(d)):
            sub_path = os.path.join(d, sub)
            if os.path.isdir(sub_path):
                clips = sorted(
                    glob(os.path.join(sub_path, "*.wav"))
                    + glob(os.path.join(sub_path, "*.npy"))
                    + glob(os.path.join(sub_path, "*.pth"))
                )
                if clips:
                    voices[sub] = clips
    return voices


def _load_clip(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if path.endswith(".wav"):
        import scipy.io.wavfile as wavfile

        _, wav = wavfile.read(path)
        wav = wav.astype(np.float32)
        if wav.dtype != np.float32 or np.abs(wav).max() > 4.0:
            wav = wav / 32768.0
        return wav
    raise ValueError(f"unsupported clip format: {path}")


def load_voice(voice: str, extra_voice_dirs: Optional[List[str]] = None
               ) -> Tuple[Optional[List[np.ndarray]], Optional[Tuple]]:
    """ref audio_utils.py:120: 'random' → (None, None); a `.pth` entry wins
    and is returned as precomputed latents; otherwise the wav clips."""
    if voice in (None, "random"):
        return None, None
    if "&" in voice:  # multi-voice combination (ref load_voices :140)
        samples = []
        for v in voice.split("&"):
            s, _ = load_voice(v, extra_voice_dirs)
            samples.extend(s or [])
        return samples or None, None
    voices = get_voices(extra_voice_dirs)
    if voice not in voices:
        raise KeyError(f"voice {voice!r} not found in {extra_voice_dirs}")
    paths = voices[voice]
    latents = [p for p in paths if p.endswith(".pth")]
    if latents:
        from tpu_tts.train.torch_convert import load_torch_checkpoint

        ckpt = load_torch_checkpoint(latents[0])
        auto = np.asarray(ckpt.get("auto_conditioning", ckpt.get(0)))
        diff = np.asarray(ckpt.get("diffusion_conditioning", ckpt.get(1)))
        return None, (auto, diff)
    return [_load_clip(p) for p in paths if not p.endswith(".pth")], None
