from tpu_tts.train.trainer import Trainer, TrainerArgs

__all__ = ["Trainer", "TrainerArgs"]
