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
    """Bark config; constants mirror ref configs/bark_config.py:55-70."""

    model: str = "bark"
    model_args: BarkArgs = field(default_factory=BarkArgs)
    num_chars: int = 0
    CONTEXT_WINDOW_SIZE: int = 1024
    SEMANTIC_RATE_HZ: float = 49.9
    SEMANTIC_VOCAB_SIZE: int = 10_000
    CODEBOOK_SIZE: int = 1024
    N_COARSE_CODEBOOKS: int = 2
    N_FINE_CODEBOOKS: int = 8
    COARSE_RATE_HZ: int = 75
    SAMPLE_RATE: int = 24_000
    TEXT_ENCODING_OFFSET: int = 10_048
    SEMANTIC_PAD_TOKEN: int = 10_000
    TEXT_PAD_TOKEN: int = 129_595
    SEMANTIC_INFER_TOKEN: int = 129_599
    COARSE_SEMANTIC_PAD_TOKEN: int = 12_048
    COARSE_INFER_TOKEN: int = 12_050
    # scaled-down test knobs (reference values are the literals 256 / 768)
    TEXT_CONTEXT: int = 256
    SEMANTIC_STEPS: int = 768


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
