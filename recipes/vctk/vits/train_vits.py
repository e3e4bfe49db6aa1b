"""VCTK multi-speaker VITS recipe (mirror of /root/reference/recipes/vctk/
vits/train_vits.py) — config #4 in BASELINE.json."""

import os

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

from tpu_tts.config.shared_configs import BaseDatasetConfig
from tpu_tts.configs.vits_config import VitsArgs, VitsAudioConfig, VitsConfig
from tpu_tts.data import load_tts_samples
from tpu_tts.models.vits import Vits
from tpu_tts.train import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))
dataset_config = BaseDatasetConfig(
    formatter="vctk", meta_file_train="", path=os.path.join(output_path, "../VCTK/"), language="en-gb"
)

audio_config = VitsAudioConfig(
    sample_rate=22050, win_length=1024, hop_length=256, num_mels=80, mel_fmin=0, mel_fmax=None
)

vitsArgs = VitsArgs(use_speaker_embedding=True)

config = VitsConfig(
    model_args=vitsArgs,
    audio=audio_config,
    run_name="vits_vctk",
    batch_size=32,
    eval_batch_size=16,
    batch_group_size=5,
    num_loader_workers=4,
    num_eval_loader_workers=4,
    run_eval=True,
    test_delay_epochs=-1,
    epochs=1000,
    text_cleaner="english_cleaners",
    use_phonemes=True,
    phoneme_language="en",
    phoneme_cache_path=os.path.join(output_path, "phoneme_cache"),
    compute_input_seq_cache=True,
    print_step=25,
    print_eval=False,
    mixed_precision=True,
    max_text_len=325,
    output_path=output_path,
    datasets=[dataset_config],
    use_speaker_embedding=True,
)

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        config.datasets,
        eval_split=True,
        eval_split_max_size=config.eval_split_max_size,
        eval_split_size=config.eval_split_size,
    )
    model = Vits.init_from_config(config, samples=train_samples + eval_samples)
    trainer = Trainer(
        TrainerArgs(), model.config, output_path, model=model,
        train_samples=train_samples, eval_samples=eval_samples,
    )
    trainer.fit()
