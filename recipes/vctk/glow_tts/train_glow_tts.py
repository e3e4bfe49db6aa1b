"""VCTK multi-speaker Glow-TTS recipe (behavioral mirror of /root/reference/recipes/vctk/glow_tts/train_glow_tts.py, on the
tpu_tts trainer)."""

import os

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

from tpu_tts.config.shared_configs import BaseAudioConfig, BaseDatasetConfig
from tpu_tts.configs.glow_tts_config import GlowTTSConfig
from tpu_tts.data import load_tts_samples
from tpu_tts.models.glow_tts import GlowTTS
from tpu_tts.train import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))

dataset_path = os.path.join(output_path, "../VCTK/")


def ensure_dataset():
    """Download VCTK if not already present (ref recipe download gate)."""
    if not os.path.exists(dataset_path):
        from tpu_tts.utils.downloaders import download_vctk

        print("Downloading VCTK dataset")
        download_vctk(dataset_path)


dataset_config = BaseDatasetConfig(formatter="vctk", meta_file_train="", path=dataset_path)

audio_config = BaseAudioConfig(sample_rate=22050, resample=True, do_trim_silence=True, trim_db=23.0)

config = GlowTTSConfig(
    batch_size=64,
    eval_batch_size=16,
    num_loader_workers=4,
    num_eval_loader_workers=4,
    precompute_num_workers=4,
    run_eval=True,
    test_delay_epochs=-1,
    epochs=1000,
    text_cleaner="phoneme_cleaners",
    use_phonemes=True,
    phoneme_language="en-us",
    phoneme_cache_path=os.path.join(output_path, "phoneme_cache"),
    print_step=25,
    print_eval=False,
    mixed_precision=True,
    audio=audio_config,
    output_path=output_path,
    datasets=[dataset_config],
    use_speaker_embedding=True,
    min_text_len=0,
    max_text_len=500,
    min_audio_len=0,
    max_audio_len=500000,
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
