"""tpu-tts: a TPU-native text-to-speech framework (JAX / XLA / Pallas / pjit).

Built from scratch with the capabilities of the reference Coqui TTS v0.22.0
(see SURVEY.md); not a port — the compute path is functional JAX with Pallas
kernels, parallelism is mesh/`pjit` over ICI, and the runtime around it is
re-designed for XLA's compilation model.
"""

from pathlib import Path

with open(Path(__file__).parent / "VERSION", "r", encoding="utf-8") as f:
    __version__ = f.read().strip()


def __getattr__(name):
    # Lazy: importing `tpu_tts` must stay cheap (no jax import at module load).
    if name == "TTS":
        from tpu_tts.api import TTS

        return TTS
    raise AttributeError(f"module 'tpu_tts' has no attribute '{name}'")
