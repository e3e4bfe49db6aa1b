"""NeuralHMM-TTS and OverFlow configs (mirrors of /root/reference/TTS/tts/
configs/{neuralhmm_tts_config.py, overflow_config.py})."""

from dataclasses import dataclass, field
from typing import List, Optional

from tpu_tts.config import register_config_class
from tpu_tts.configs.shared_configs import BaseTTSConfig
from tpu_tts.models.neuralhmm_tts import NeuralhmmTTSArgs
from tpu_tts.models.overflow import OverflowArgs


@register_config_class("neuralhmm_tts")
@dataclass
class NeuralhmmTTSConfig(BaseTTSConfig):
    model: str = "neuralhmm_tts"
    model_args: NeuralhmmTTSArgs = field(default_factory=NeuralhmmTTSArgs)
    optimizer: str = "adam"
    optimizer_params: dict = field(default_factory=lambda: {"weight_decay": 1e-6})
    lr: float = 1e-3
    grad_clip: float = 40000.0
    # dataset normalization statistics (ref tts/models/neuralhmm_tts.py:263:
    # computed over the training set on first run, then loaded)
    mel_statistics_parameter_path: Optional[str] = None
    force_generate_statistics: bool = False
    min_seq_len: int = 3
    max_seq_len: int = 500
    r: int = 1
    test_sentences: List[str] = field(
        default_factory=lambda: ["Be a voice, not an echo."]
    )


@register_config_class("overflow")
@dataclass
class OverflowConfig(BaseTTSConfig):
    model: str = "overflow"
    model_args: OverflowArgs = field(default_factory=OverflowArgs)
    optimizer: str = "adam"
    optimizer_params: dict = field(default_factory=lambda: {"weight_decay": 1e-6})
    lr: float = 1e-3
    grad_clip: float = 40000.0
    # dataset normalization statistics (ref tts/models/neuralhmm_tts.py:263:
    # computed over the training set on first run, then loaded)
    mel_statistics_parameter_path: Optional[str] = None
    force_generate_statistics: bool = False
    min_seq_len: int = 3
    max_seq_len: int = 500
    r: int = 1
    test_sentences: List[str] = field(
        default_factory=lambda: ["Be a voice, not an echo."]
    )
