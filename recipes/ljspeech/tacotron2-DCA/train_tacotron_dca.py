"""LJSpeech Tacotron2 dynamic-convolution-attention recipe (behavioral mirror
of /root/reference/recipes/ljspeech/tacotron2-DCA/train_tacotron_dca.py)."""

import os

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

from tpu_tts.config.shared_configs import BaseAudioConfig, BaseDatasetConfig
from tpu_tts.configs.tacotron2_config import Tacotron2Config
from tpu_tts.data import load_tts_samples
from tpu_tts.models.tacotron2 import Tacotron2
from tpu_tts.train import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))
dataset_config = BaseDatasetConfig(
    formatter="ljspeech", meta_file_train="metadata.csv", path=os.path.join(output_path, "../../LJSpeech-1.1/")
)
audio_config = BaseAudioConfig(
    sample_rate=22050,
    do_trim_silence=True,
    trim_db=60.0,
    signal_norm=False,
    mel_fmin=0.0,
    mel_fmax=8000,
    spec_gain=1.0,
    log_func="np.log",
    ref_level_db=20,
    preemphasis=0.0,
)

config = Tacotron2Config(
    audio=audio_config,
    batch_size=64,
    eval_batch_size=16,
    num_loader_workers=4,
    num_eval_loader_workers=4,
    run_eval=True,
    test_delay_epochs=-1,
    ga_alpha=0.0,
    decoder_loss_alpha=0.25,
    postnet_loss_alpha=0.25,
    postnet_diff_spec_alpha=0,
    decoder_diff_spec_alpha=0,
    decoder_ssim_alpha=0,
    postnet_ssim_alpha=0,
    r=2,
    attention_type="dynamic_convolution",
    double_decoder_consistency=False,
    epochs=1000,
    text_cleaner="phoneme_cleaners",
    use_phonemes=True,
    phoneme_language="en-us",
    phoneme_cache_path=os.path.join(output_path, "phoneme_cache"),
    print_step=25,
    print_eval=True,
    mixed_precision=False,
    output_path=output_path,
    datasets=[dataset_config],
)

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        config.datasets, eval_split=True,
        eval_split_max_size=config.eval_split_max_size, eval_split_size=config.eval_split_size,
    )
    model = Tacotron2.init_from_config(config, samples=train_samples + eval_samples)
    trainer = Trainer(
        TrainerArgs(), config, output_path, model=model,
        train_samples=train_samples, eval_samples=eval_samples,
    )
    trainer.fit()
