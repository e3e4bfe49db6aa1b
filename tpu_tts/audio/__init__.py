from tpu_tts.audio.processor import AudioProcessor, StandardScaler

__all__ = ["AudioProcessor", "StandardScaler"]
