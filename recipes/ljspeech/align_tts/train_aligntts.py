"""LJSpeech AlignTTS recipe (behavioral mirror of /root/reference/recipes/
ljspeech/align_tts/train_aligntts.py)."""

import os

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

from tpu_tts.config.shared_configs import BaseDatasetConfig
from tpu_tts.configs.align_tts_config import AlignTTSConfig
from tpu_tts.data import load_tts_samples
from tpu_tts.models.align_tts import AlignTTS
from tpu_tts.train import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))
dataset_config = BaseDatasetConfig(
    formatter="ljspeech", meta_file_train="metadata.csv", path=os.path.join(output_path, "../../LJSpeech-1.1/")
)

config = AlignTTSConfig(
    batch_size=32,
    eval_batch_size=16,
    num_loader_workers=4,
    num_eval_loader_workers=4,
    run_eval=True,
    test_delay_epochs=-1,
    epochs=1000,
    text_cleaner="english_cleaners",
    use_phonemes=False,
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
    model = AlignTTS.init_from_config(config, samples=train_samples + eval_samples)
    trainer = Trainer(
        TrainerArgs(), config, output_path, model=model,
        train_samples=train_samples, eval_samples=eval_samples,
    )
    trainer.fit()
