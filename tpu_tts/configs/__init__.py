from tpu_tts.configs.shared_configs import BaseTTSConfig, CapacitronVAEConfig, GSTConfig
from tpu_tts.configs.glow_tts_config import GlowTTSConfig

__all__ = ["BaseTTSConfig", "GSTConfig", "CapacitronVAEConfig", "GlowTTSConfig"]
