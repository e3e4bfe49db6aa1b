"""Belarusian (bel-alex73) HiFi-GAN vocoder recipe (behavioral mirror of /root/reference/recipes/bel-alex73/train_hifigan.py, on the
tpu_tts trainer)."""

import os

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

from tpu_tts.config.shared_configs import BaseAudioConfig
from tpu_tts.train import Trainer, TrainerArgs
from tpu_tts.vocoder.configs import HifiganConfig
from tpu_tts.vocoder.datasets import load_wav_data
from tpu_tts.vocoder.models.gan import GAN

output_path = "/storage/output-hifigan/"

audio_config = BaseAudioConfig(
    mel_fmin=50,
    mel_fmax=8000,
    hop_length=256,
    stats_path="/storage/TTS/scale_stats.npy",
)

config = HifiganConfig(
    batch_size=74,
    eval_batch_size=16,
    num_loader_workers=8,
    num_eval_loader_workers=8,
    lr_disc=0.0002,
    lr_gen=0.0002,
    run_eval=True,
    test_delay_epochs=5,
    epochs=1000,
    use_noise_augment=True,
    seq_len=8192,
    pad_short=2000,
    save_step=5000,
    print_step=50,
    print_eval=True,
    mixed_precision=False,
    eval_split_size=30,
    save_n_checkpoints=2,
    save_best_after=5000,
    data_path="/storage/filtered_dataset",
    output_path=output_path,
    audio=audio_config,
)

if __name__ == "__main__":
    eval_samples, train_samples = load_wav_data(config.data_path, config.eval_split_size)
    model = GAN.init_from_config(config)
    trainer = Trainer(
        TrainerArgs(), config, output_path, model=model,
        train_samples=train_samples, eval_samples=eval_samples,
    )
    trainer.fit()
