"""Configs for the ForwardTTS family (mirrors of /root/reference/TTS/tts/
configs/{fast_pitch_config.py, fast_speech_config.py, fastspeech2_config.py,
speedy_speech_config.py}). All use base_model="forward_tts"."""

from dataclasses import dataclass, field
from typing import List

from tpu_tts.config import register_config_class
from tpu_tts.configs.shared_configs import BaseTTSConfig
from tpu_tts.models.forward_tts import ForwardTTSArgs

_TEST_SENTENCES = [
    "It took me quite a long time to develop a voice, and now that I have it I'm not going to be silent.",
    "Be a voice, not an echo.",
    "I'm sorry Dave. I'm afraid I can't do that.",
    "This cake is great. It's so delicious and moist.",
    "Prior to November 22, 1963.",
]


@dataclass
class _ForwardBase(BaseTTSConfig):
    base_model: str = "forward_tts"
    model_args: ForwardTTSArgs = field(default_factory=ForwardTTSArgs)
    # multi-speaker passthrough
    num_speakers: int = 0
    speakers_file: str = None
    use_speaker_embedding: bool = False
    use_d_vector_file: bool = False
    d_vector_file: str = None
    d_vector_dim: int = 0
    # optimizer
    optimizer: str = "adam"
    optimizer_params: dict = field(default_factory=lambda: {"betas": [0.9, 0.998], "weight_decay": 1e-6})
    lr_scheduler: str = "noam"
    lr_scheduler_params: dict = field(default_factory=lambda: {"warmup_steps": 4000})
    lr: float = 1e-4
    grad_clip: float = 5.0
    # losses
    spec_loss_type: str = "mse"
    duration_loss_type: str = "mse"
    use_ssim_loss: bool = True
    ssim_loss_alpha: float = 1.0
    spec_loss_alpha: float = 1.0
    aligner_loss_alpha: float = 1.0
    pitch_loss_alpha: float = 0.1
    energy_loss_alpha: float = 0.1
    dur_loss_alpha: float = 0.1
    binary_align_loss_alpha: float = 0.1
    binary_loss_warmup_epochs: int = 150
    # dataset
    min_seq_len: int = 13
    max_seq_len: int = 200
    r: int = 1
    compute_f0: bool = False
    f0_cache_path: str = None
    energy_cache_path: str = None
    test_sentences: List[str] = field(default_factory=lambda: list(_TEST_SENTENCES))


@register_config_class("fast_pitch")
@dataclass
class FastPitchConfig(_ForwardBase):
    model: str = "fast_pitch"
    compute_f0: bool = True

    def __post_init__(self):
        self.model_args.use_pitch = True


@register_config_class("fast_speech")
@dataclass
class FastSpeechConfig(_ForwardBase):
    model: str = "fast_speech"

    def __post_init__(self):
        self.model_args.use_pitch = False


@register_config_class("fastspeech2")
@dataclass
class Fastspeech2Config(_ForwardBase):
    model: str = "fastspeech2"
    compute_f0: bool = True
    compute_energy: bool = True

    def __post_init__(self):
        self.model_args.use_pitch = True
        self.model_args.use_energy = True


def _speedy_args():
    """ref tts/configs/speedy_speech_config.py model_args defaults."""
    return ForwardTTSArgs(
        use_pitch=False,
        hidden_channels=128,
        positional_encoding=True,
        encoder_type="residual_conv_bn",
        encoder_params={
            "kernel_size": 4,
            "dilations": [1, 2, 4, 1, 2, 4, 1, 2, 4, 1, 2, 4, 1],
            "num_conv_blocks": 2,
        },
        decoder_type="residual_conv_bn",
        decoder_params={
            "kernel_size": 4,
            "dilations": [1, 2, 4, 8, 1, 2, 4, 8, 1, 2, 4, 8, 1],
            "num_conv_blocks": 2,
        },
    )


@register_config_class("speedy_speech")
@dataclass
class SpeedySpeechConfig(_ForwardBase):
    model: str = "speedy_speech"
    model_args: ForwardTTSArgs = field(default_factory=_speedy_args)
