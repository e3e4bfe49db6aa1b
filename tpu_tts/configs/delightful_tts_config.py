"""DelightfulTTS config (mirror of /root/reference/TTS/tts/configs/
delightful_tts_config.py:9 and models/delightful_tts.py VocoderConfig:536,
DelightfulTtsAudioConfig:550)."""

from dataclasses import dataclass, field
from typing import List, Optional

from tpu_tts.config import register_config_class
from tpu_tts.config.base import Coqpit
from tpu_tts.config.shared_configs import BaseAudioConfig
from tpu_tts.configs.shared_configs import BaseTTSConfig
from tpu_tts.models.delightful_tts import DelightfulTtsArgs


@dataclass
class VocoderConfig(Coqpit):
    resblock_type_decoder: str = "1"
    resblock_kernel_sizes_decoder: List[int] = field(default_factory=lambda: [3, 7, 11])
    resblock_dilation_sizes_decoder: List[List[int]] = field(
        default_factory=lambda: [[1, 3, 5], [1, 3, 5], [1, 3, 5]]
    )
    upsample_rates_decoder: List[int] = field(default_factory=lambda: [8, 8, 2, 2])
    upsample_initial_channel_decoder: int = 512
    upsample_kernel_sizes_decoder: List[int] = field(default_factory=lambda: [16, 16, 4, 4])
    use_spectral_norm_discriminator: bool = False
    upsampling_rates_discriminator: List[int] = field(default_factory=lambda: [4, 4, 4, 4])
    periods_discriminator: List[int] = field(default_factory=lambda: [2, 3, 5, 7, 11])
    pretrained_model_path: Optional[str] = None


def _delightful_audio() -> BaseAudioConfig:
    """100-mel, 0..8k audio defaults (ref DelightfulTtsAudioConfig:550)."""
    return BaseAudioConfig(
        sample_rate=22050,
        hop_length=256,
        win_length=1024,
        fft_size=1024,
        mel_fmin=0.0,
        mel_fmax=8000.0,
        num_mels=100,
        pitch_fmax=640.0,
    )


@register_config_class("delightful_tts")
@dataclass
class DelightfulTTSConfig(BaseTTSConfig):
    model: str = "delightful_tts"
    audio: BaseAudioConfig = field(default_factory=_delightful_audio)
    model_args: DelightfulTtsArgs = field(default_factory=DelightfulTtsArgs)
    use_attn_priors: bool = True

    # vocoder
    vocoder: VocoderConfig = field(default_factory=VocoderConfig)
    init_discriminator: bool = True

    # optimizer
    steps_to_start_discriminator: int = 200000
    grad_clip: float = 1000.0
    lr_gen: float = 0.0002
    lr_disc: float = 0.0002
    lr_scheduler_gen: str = "exponential"
    lr_scheduler_gen_params: dict = field(default_factory=lambda: {"gamma": 0.999875, "last_epoch": -1})
    lr_scheduler_disc: str = "exponential"
    lr_scheduler_disc_params: dict = field(default_factory=lambda: {"gamma": 0.999875, "last_epoch": -1})
    scheduler_after_epoch: bool = True
    optimizer: str = "adamw"
    optimizer_params: dict = field(default_factory=lambda: {"betas": [0.8, 0.99], "eps": 1e-9, "weight_decay": 0.01})

    # acoustic model loss params (ref delightful_tts_config.py:88)
    ssim_loss_alpha: float = 1.0
    mel_loss_alpha: float = 1.0
    aligner_loss_alpha: float = 1.0
    pitch_loss_alpha: float = 1.0
    energy_loss_alpha: float = 1.0
    u_prosody_loss_alpha: float = 0.5
    p_prosody_loss_alpha: float = 0.5
    dur_loss_alpha: float = 1.0
    char_dur_loss_alpha: float = 0.01
    binary_align_loss_alpha: float = 0.1
    binary_loss_warmup_epochs: int = 10

    # vocoder loss params
    disc_loss_alpha: float = 1.0
    gen_loss_alpha: float = 1.0
    feat_loss_alpha: float = 1.0
    vocoder_mel_loss_alpha: float = 10.0
    multi_scale_stft_loss_alpha: float = 2.5
    multi_scale_stft_loss_params: dict = field(
        default_factory=lambda: {
            "n_ffts": [1024, 2048, 512],
            "hop_lengths": [120, 240, 50],
            "win_lengths": [600, 1200, 240],
        }
    )

    # data loader params
    return_wav: bool = True
    use_weighted_sampler: bool = False
    weighted_sampler_attrs: dict = field(default_factory=dict)
    weighted_sampler_multipliers: dict = field(default_factory=dict)
    r: int = 1
    compute_f0: bool = True
    f0_cache_path: Optional[str] = None
    attn_prior_cache_path: Optional[str] = None

    # multi-speaker
    num_speakers: int = 0
    use_speaker_embedding: bool = False
    speakers_file: Optional[str] = None
    speaker_embedding_channels: int = 256
    language_ids_file: Optional[str] = None
    use_language_embedding: bool = False
    use_d_vector_file: bool = False
    d_vector_file: Optional[str] = None
    d_vector_dim: Optional[int] = None

    test_sentences: List[str] = field(
        default_factory=lambda: [
            "It took me quite a long time to develop a voice, and now that I have it I'm not going to be silent.",
            "Be a voice, not an echo.",
        ]
    )

    def __post_init__(self):
        if hasattr(super(), "__post_init__"):
            super().__post_init__()
        # propagate multi-speaker settings to model_args (ref :154)
        if self.num_speakers > 0:
            self.model_args.num_speakers = self.num_speakers
        if self.use_speaker_embedding:
            self.model_args.use_speaker_embedding = True
        if self.speakers_file:
            self.model_args.speakers_file = self.speakers_file
        if self.use_d_vector_file:
            self.model_args.use_d_vector_file = True
        if self.d_vector_dim is not None and self.d_vector_dim > 0:
            self.model_args.d_vector_dim = self.d_vector_dim
        if self.d_vector_file:
            self.model_args.d_vector_file = self.d_vector_file
