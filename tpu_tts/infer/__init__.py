from tpu_tts.infer.synthesizer import Synthesizer

__all__ = ["Synthesizer"]
