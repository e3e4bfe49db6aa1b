"""FreeVC config (mirror of /root/reference/TTS/vc/configs/freevc_config.py)."""

from dataclasses import dataclass, field
from typing import Optional

from tpu_tts.config import register_config_class
from tpu_tts.config.shared_configs import BaseAudioConfig, BaseTrainingConfig
from tpu_tts.vc.models.freevc import FreeVCArgs


@register_config_class("freevc")
@dataclass
class FreeVCConfig(BaseTrainingConfig):
    model: str = "freevc"
    audio: BaseAudioConfig = field(
        default_factory=lambda: BaseAudioConfig(
            sample_rate=16000, fft_size=1280, win_length=1280, hop_length=320, num_mels=80
        )
    )
    model_args: FreeVCArgs = field(default_factory=FreeVCArgs)
    grad_clip: float = 5.0
    lr_gen: float = 0.0002
    lr_disc: float = 0.0002
    optimizer: str = "adamw"
    optimizer_params: dict = field(default_factory=lambda: {"betas": [0.8, 0.99], "eps": 1e-9, "weight_decay": 0.01})
