"""XTTS config (mirror of /root/reference/TTS/tts/configs/xtts_config.py)."""

from dataclasses import dataclass, field
from typing import List, Optional

from tpu_tts.config import register_config_class
from tpu_tts.configs.shared_configs import BaseTTSConfig
from tpu_tts.models.xtts import XttsArgs


@register_config_class("xtts")
@dataclass
class XttsConfig(BaseTTSConfig):
    model: str = "xtts"
    model_args: XttsArgs = field(default_factory=XttsArgs)
    model_dir: Optional[str] = None
    languages: List[str] = field(
        default_factory=lambda: [
            "en", "es", "fr", "de", "it", "pt", "pl", "tr", "ru", "nl", "cs", "ar", "zh-cn", "hu", "ko", "ja", "hi",
        ]
    )
    temperature: float = 0.75
    length_penalty: float = 1.0
    repetition_penalty: float = 10.0
    top_k: int = 50
    top_p: float = 0.85
    num_gpt_outputs: int = 1
    gpt_cond_len: int = 30
    gpt_cond_chunk_len: int = 4
    max_ref_len: int = 30
    sound_norm_refs: bool = False
