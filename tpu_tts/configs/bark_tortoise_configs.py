"""Bark and Tortoise configs (mirrors of /root/reference/TTS/tts/configs/
{bark_config.py, tortoise_config.py})."""

from dataclasses import dataclass, field
from typing import Optional

from tpu_tts.config import register_config_class
from tpu_tts.configs.shared_configs import BaseTTSConfig
from tpu_tts.models.bark import BarkArgs
from tpu_tts.models.tortoise import TortoiseArgs


@register_config_class("bark")
@dataclass
class BarkConfig(BaseTTSConfig):
    model: str = "bark"
    model_args: BarkArgs = field(default_factory=BarkArgs)
    num_chars: int = 0


@register_config_class("tortoise")
@dataclass
class TortoiseConfig(BaseTTSConfig):
    model: str = "tortoise"
    model_args: TortoiseArgs = field(default_factory=TortoiseArgs)
    model_dir: Optional[str] = None
    temperature: float = 0.2
    length_penalty: float = 1.0
    repetition_penalty: float = 2.0
    top_p: float = 0.8
    cond_free_k: float = 2.0
    diffusion_temperature: float = 1.0
    num_autoregressive_samples: int = 16
    diffusion_iterations: int = 30
    sampler: str = "ddim"
