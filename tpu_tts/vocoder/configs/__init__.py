from tpu_tts.vocoder.configs.shared_configs import (
    BaseGANVocoderConfig,
    BaseVocoderConfig,
)
from tpu_tts.vocoder.configs.wavegrad_config import WavegradConfig, WavernnConfig
from tpu_tts.vocoder.configs.gan_configs import (
    FullbandMelganConfig,
    HifiganConfig,
    MelganConfig,
    MultibandMelganConfig,
    ParallelWaveganConfig,
    UnivnetConfig,
)

__all__ = [
    "BaseVocoderConfig",
    "BaseGANVocoderConfig",
    "HifiganConfig",
    "MelganConfig",
    "FullbandMelganConfig",
    "MultibandMelganConfig",
    "ParallelWaveganConfig",
    "UnivnetConfig",
    "WavegradConfig",
    "WavernnConfig",
]
