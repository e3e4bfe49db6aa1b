"""VCTK multi-speaker DelightfulTTS recipe (behavioral mirror of /root/reference/recipes/vctk/delightful_tts/train_delightful_tts.py, on the
tpu_tts trainer)."""

import os

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

from tpu_tts.config.shared_configs import BaseDatasetConfig
from tpu_tts.configs.delightful_tts_config import DelightfulTTSConfig
from tpu_tts.data import load_tts_samples
from tpu_tts.models.delightful_tts import DelightfulTTS
from tpu_tts.train import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))

dataset_path = os.path.join(output_path, "../VCTK/")


def ensure_dataset():
    """Download VCTK if not already present (ref recipe download gate)."""
    if not os.path.exists(dataset_path):
        from tpu_tts.utils.downloaders import download_vctk

        print("Downloading VCTK dataset")
        download_vctk(dataset_path)


dataset_config = BaseDatasetConfig(
    dataset_name="vctk", formatter="vctk", meta_file_train="", path=dataset_path, language="en-us"
)

config = DelightfulTTSConfig(
    run_name="delightful_tts_vctk",
    run_description="Train like in the DelightfulTTS paper.",
    batch_size=32,
    eval_batch_size=16,
    num_loader_workers=10,
    num_eval_loader_workers=10,
    precompute_num_workers=40,
    compute_input_seq_cache=True,
    compute_f0=True,
    f0_cache_path=os.path.join(output_path, "f0_cache"),
    run_eval=True,
    test_delay_epochs=-1,
    epochs=1000,
    text_cleaner="english_cleaners",
    use_phonemes=True,
    phoneme_language="en-us",
    phoneme_cache_path=os.path.join(output_path, "phoneme_cache"),
    print_step=50,
    print_eval=False,
    mixed_precision=True,
    output_path=output_path,
    datasets=[dataset_config],
    start_by_longest=True,
    binary_align_loss_alpha=0.0,
    use_attn_priors=False,
    max_text_len=60,
    steps_to_start_discriminator=10000,
    use_speaker_embedding=True,
)

if __name__ == "__main__":
    ensure_dataset()
    train_samples, eval_samples = load_tts_samples(
        config.datasets,
        eval_split=True,
        eval_split_max_size=config.eval_split_max_size,
        eval_split_size=config.eval_split_size,
    )
    model = DelightfulTTS.init_from_config(config, samples=train_samples + (eval_samples or []))
    trainer = Trainer(
        TrainerArgs(), model.config, output_path, model=model,
        train_samples=train_samples, eval_samples=eval_samples,
    )
    trainer.fit()
