"""Belarusian (bel-alex73) Glow-TTS recipe (behavioral mirror of /root/reference/recipes/bel-alex73/train_glowtts.py, on the
tpu_tts trainer)."""

import os

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

from tpu_tts.config.shared_configs import BaseAudioConfig, BaseDatasetConfig
from tpu_tts.text.characters import CharactersConfig
from tpu_tts.configs.glow_tts_config import GlowTTSConfig
from tpu_tts.data import load_tts_samples
from tpu_tts.models.glow_tts import GlowTTS
from tpu_tts.train import Trainer, TrainerArgs

output_path = "/storage/output-glowtts/"

dataset_config = BaseDatasetConfig(
    formatter="bel_tts_formatter",
    meta_file_train="ipa_final_dataset.csv",
    path=os.path.join(output_path, "/storage/filtered_dataset/"),
)

characters = CharactersConfig(
    characters_class="tpu_tts.text.characters.Graphemes",
    pad="_",
    eos="~",
    bos="^",
    blank="@",
    characters="Iabdfgijklmnprstuvxz\u0254\u025b\u0263\u0268\u026b\u0271\u0282\u0290\u02b2\u02c8\u02d0\u032f\u0361\u03b2",
    punctuations="!,.?: -\u2012\u2013\u2014\u2026",
)

audio_config = BaseAudioConfig(
    mel_fmin=50,
    mel_fmax=8000,
    hop_length=256,
    stats_path="/storage/TTS/scale_stats.npy",
)

config = GlowTTSConfig(
    batch_size=96,
    eval_batch_size=32,
    num_loader_workers=8,
    num_eval_loader_workers=8,
    use_noise_augment=True,
    run_eval=True,
    test_delay_epochs=-1,
    epochs=1000,
    print_step=50,
    print_eval=True,
    output_path=output_path,
    add_blank=True,
    datasets=[dataset_config],
    enable_eos_bos_chars=True,
    mixed_precision=False,
    save_step=10000,
    save_n_checkpoints=2,
    save_best_after=5000,
    text_cleaner="no_cleaners",
    audio=audio_config,
    test_sentences=[],
    use_phonemes=True,
    phoneme_language="be",
)

if __name__ == "__main__":
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
