"""Thorsten-DE Glow-TTS recipe (behavioral mirror of /root/reference/recipes/thorsten_DE/glow_tts/train_glowtts.py, on the
tpu_tts trainer)."""

import os

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

from tpu_tts.config.shared_configs import BaseDatasetConfig
from tpu_tts.configs.glow_tts_config import GlowTTSConfig
from tpu_tts.data import load_tts_samples
from tpu_tts.models.glow_tts import GlowTTS
from tpu_tts.train import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))

dataset_config = BaseDatasetConfig(
    formatter="thorsten", meta_file_train="metadata.csv", path=os.path.join(output_path, "../thorsten-de/")
)


def ensure_dataset():
    """Download the dataset if not already present (ref recipe download gate)."""
    if not os.path.exists(dataset_config.path):
        from tpu_tts.utils.downloaders import download_thorsten_de

        print("Downloading dataset")
        download_thorsten_de(os.path.split(os.path.abspath(dataset_config.path))[0])

config = GlowTTSConfig(
    batch_size=32,
    eval_batch_size=16,
    num_loader_workers=4,
    num_eval_loader_workers=4,
    run_eval=True,
    test_delay_epochs=-1,
    epochs=1000,
    text_cleaner="phoneme_cleaners",
    use_phonemes=True,
    phoneme_language="de",
    phoneme_cache_path=os.path.join(output_path, "phoneme_cache"),
    print_step=25,
    print_eval=True,
    mixed_precision=True,
    test_sentences=[
        "Es hat mich viel Zeit gekostet ein Stimme zu entwickeln, jetzt wo ich sie habe werde ich nicht mehr schweigen.",
        "Sei eine Stimme, kein Echo.",
        "Es tut mir Leid David. Das kann ich leider nicht machen.",
        "Dieser Kuchen ist großartig. Er ist so lecker und feucht.",
        "Vor dem 22. November 1963.",
    ],
    output_path=output_path,
    datasets=[dataset_config],
)

if __name__ == "__main__":
    ensure_dataset()
    train_samples, eval_samples = load_tts_samples(
        config.datasets,
        eval_split=True,
        eval_split_max_size=config.eval_split_max_size,
        eval_split_size=config.eval_split_size,
    )
    model = GlowTTS.init_from_config(config, samples=train_samples + (eval_samples or []))
    trainer = Trainer(
        TrainerArgs(), model.config, output_path, model=model,
        train_samples=train_samples, eval_samples=eval_samples,
    )
    trainer.fit()
