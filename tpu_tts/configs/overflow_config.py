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
    """Flat fields mirror the reference exactly (ref tts/configs/
    neuralhmm_tts_config.py:100-130) so reference config.json files load
    as-is; they're merged into `model_args` when the latter is left default
    (see models/neuralhmm_tts.py merge_flat_config_into_args)."""

    model: str = "neuralhmm_tts"
    model_args: NeuralhmmTTSArgs = field(default_factory=NeuralhmmTTSArgs)
    # --- reference flat fields ---
    num_chars: Optional[int] = None
    state_per_phone: int = 2
    encoder_in_out_features: int = 512
    encoder_n_convolutions: int = 3
    out_channels: int = 80
    ar_order: int = 1
    sampling_temp: float = 0.0
    deterministic_transition: bool = True
    duration_threshold: float = 0.43
    use_grad_checkpointing: bool = True
    max_sampling_time: int = 1000
    prenet_type: str = "original"
    prenet_dim: int = 256
    prenet_n_layers: int = 2
    prenet_dropout: float = 0.5
    prenet_dropout_at_inference: bool = True
    memory_rnn_dim: int = 1024
    outputnet_size: List[int] = field(default_factory=lambda: [1024])
    flat_start_params: dict = field(
        default_factory=lambda: {"mean": 0.0, "std": 1.0, "transition_p": 0.14}
    )
    std_floor: float = 0.001
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
    """Flat fields mirror the reference exactly (ref tts/configs/
    overflow_config.py:100-160); see NeuralhmmTTSConfig."""

    model: str = "overflow"
    model_args: OverflowArgs = field(default_factory=OverflowArgs)
    # --- reference flat fields ---
    num_chars: Optional[int] = None
    state_per_phone: int = 2
    encoder_in_out_features: int = 512
    encoder_n_convolutions: int = 3
    out_channels: int = 80
    ar_order: int = 1
    sampling_temp: float = 0.334
    deterministic_transition: bool = True
    duration_threshold: float = 0.55
    use_grad_checkpointing: bool = True
    max_sampling_time: int = 1000
    prenet_type: str = "original"
    prenet_dim: int = 256
    prenet_n_layers: int = 2
    prenet_dropout: float = 0.5
    prenet_dropout_at_inference: bool = False
    memory_rnn_dim: int = 1024
    outputnet_size: List[int] = field(default_factory=lambda: [1024])
    flat_start_params: dict = field(
        default_factory=lambda: {"mean": 0.0, "std": 1.0, "transition_p": 0.14}
    )
    std_floor: float = 0.01
    # glow decoder (ref overflow_config.py)
    hidden_channels_dec: int = 150
    kernel_size_dec: int = 5
    dilation_rate: int = 1
    num_flow_blocks_dec: int = 12
    num_block_layers: int = 4
    dropout_p_dec: float = 0.05
    num_splits: int = 4
    num_squeeze: int = 2
    sigmoid_scale: bool = False
    c_in_channels: int = 0
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
