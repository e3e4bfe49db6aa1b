from tpu_tts.configs.shared_configs import BaseTTSConfig, CapacitronVAEConfig, GSTConfig
from tpu_tts.configs.glow_tts_config import GlowTTSConfig
from tpu_tts.configs.vits_config import VitsConfig
from tpu_tts.configs.bark_tortoise_configs import BarkConfig, TortoiseConfig
from tpu_tts.configs.overflow_config import NeuralhmmTTSConfig, OverflowConfig
from tpu_tts.configs.xtts_config import XttsConfig
from tpu_tts.configs.align_tts_config import AlignTTSConfig
from tpu_tts.configs.delightful_tts_config import DelightfulTTSConfig
from tpu_tts.configs.tacotron2_config import Tacotron2Config, TacotronConfig
from tpu_tts.configs.forward_tts_configs import (
    FastPitchConfig,
    FastSpeechConfig,
    Fastspeech2Config,
    SpeedySpeechConfig,
)

__all__ = [
    "BaseTTSConfig",
    "GSTConfig",
    "CapacitronVAEConfig",
    "GlowTTSConfig",
    "DelightfulTTSConfig",
    "VitsConfig",
    "FastPitchConfig",
    "FastSpeechConfig",
    "Fastspeech2Config",
    "SpeedySpeechConfig",
]
