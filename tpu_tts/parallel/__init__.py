from tpu_tts.parallel.platform import maybe_force_platform

__all__ = ["maybe_force_platform"]
