"""AlignTTS config (mirror of /root/reference/TTS/tts/configs/align_tts_config.py)."""

from dataclasses import dataclass, field
from typing import List, Optional

from tpu_tts.config import register_config_class
from tpu_tts.configs.shared_configs import BaseTTSConfig
from tpu_tts.models.align_tts import AlignTTSArgs


@register_config_class("align_tts")
@dataclass
class AlignTTSConfig(BaseTTSConfig):
    model: str = "align_tts"
    model_args: AlignTTSArgs = field(default_factory=AlignTTSArgs)
    phase_start_steps: Optional[List[int]] = None

    ssim_alpha: float = 1.0
    spec_loss_alpha: float = 1.0
    dur_loss_alpha: float = 1.0
    mdn_alpha: float = 1.0

    use_speaker_embedding: bool = False
    use_d_vector_file: bool = False
    d_vector_file: Optional[str] = None

    optimizer: str = "adam"
    optimizer_params: dict = field(default_factory=lambda: {"betas": [0.9, 0.998], "weight_decay": 1e-6})
    lr_scheduler: Optional[str] = None
    lr: float = 1e-4
    grad_clip: float = 5.0

    min_seq_len: int = 2
    max_seq_len: int = 300
    r: int = 1

    test_sentences: List[str] = field(
        default_factory=lambda: [
            "It took me quite a long time to develop a voice, and now that I have it I'm not going to be silent.",
            "Be a voice, not an echo.",
            "I'm sorry Dave. I'm afraid I can't do that.",
            "This cake is great. It's so delicious and moist.",
            "Prior to November 22, 1963.",
        ]
    )
