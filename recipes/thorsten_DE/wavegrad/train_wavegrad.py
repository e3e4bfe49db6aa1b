"""Thorsten-DE WaveGrad vocoder recipe (behavioral mirror of /root/reference/recipes/thorsten_DE/wavegrad/train_wavegrad.py, on the
tpu_tts trainer)."""

import os

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

from tpu_tts.train import Trainer, TrainerArgs
from tpu_tts.vocoder.configs import WavegradConfig
from tpu_tts.vocoder.datasets import load_wav_data
from tpu_tts.vocoder.models.wavegrad import Wavegrad

output_path = os.path.dirname(os.path.abspath(__file__))

config = WavegradConfig(
    batch_size=32,
    eval_batch_size=16,
    num_loader_workers=4,
    num_eval_loader_workers=4,
    run_eval=True,
    test_delay_epochs=-1,
    epochs=1000,
    seq_len=6144,
    pad_short=2000,
    use_noise_augment=True,
    eval_split_size=50,
    print_step=50,
    print_eval=True,
    mixed_precision=False,
    data_path=os.path.join(output_path, "../thorsten-de/wavs/"),
    output_path=output_path,
)


def ensure_dataset():
    """Download the dataset if not already present (ref recipe download gate)."""
    if not os.path.exists(config.data_path):
        from tpu_tts.utils.downloaders import download_thorsten_de

        print("Downloading dataset")
        download_path = os.path.abspath(os.path.join(os.path.abspath(config.data_path), "../../"))
        download_thorsten_de(download_path)

if __name__ == "__main__":
    ensure_dataset()
    eval_samples, train_samples = load_wav_data(config.data_path, config.eval_split_size)
    model = Wavegrad.init_from_config(config)
    trainer = Trainer(
        TrainerArgs(), config, output_path, model=model,
        train_samples=train_samples, eval_samples=eval_samples,
    )
    trainer.fit()
