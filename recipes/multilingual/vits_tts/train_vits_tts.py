"""Multilingual (M-AILABS) VITS recipe (behavioral mirror of /root/reference/
recipes/multilingual/vits_tts/train_vits_tts.py): language embeddings +
language-weighted sampling over per-language dataset configs."""

import os
from glob import glob

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

from tpu_tts.config.shared_configs import BaseDatasetConfig
from tpu_tts.configs.vits_config import VitsArgs, VitsAudioConfig, VitsConfig
from tpu_tts.data import load_tts_samples
from tpu_tts.models.vits import Vits
from tpu_tts.text.characters import CharactersConfig
from tpu_tts.train import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))
mailabs_path = os.environ.get("MAILABS_PATH", os.path.join(output_path, "mailabs/**"))
dataset_paths = glob(mailabs_path)
dataset_config = [
    BaseDatasetConfig(formatter="mailabs", meta_file_train=None, path=path, language=path.split("/")[-1])
    for path in dataset_paths
] or [BaseDatasetConfig(formatter="mailabs", meta_file_train=None, path=mailabs_path, language="en_US")]

audio_config = VitsAudioConfig(
    sample_rate=16000, win_length=1024, hop_length=256, num_mels=80, mel_fmin=0, mel_fmax=None
)
vits_args = VitsArgs(
    use_language_embedding=True,
    embedded_language_dim=4,
    use_speaker_embedding=True,
    use_sdp=False,
)

config = VitsConfig(
    model_args=vits_args,
    audio=audio_config,
    run_name="vits_mailabs",
    use_speaker_embedding=True,
    batch_size=32,
    eval_batch_size=16,
    batch_group_size=0,
    num_loader_workers=4,
    num_eval_loader_workers=4,
    run_eval=True,
    test_delay_epochs=-1,
    epochs=1000,
    text_cleaner="multilingual_cleaners",
    use_phonemes=False,
    phoneme_language="en-us",
    phoneme_cache_path=os.path.join(output_path, "phoneme_cache"),
    compute_input_seq_cache=True,
    print_step=25,
    use_language_weighted_sampler=True,
    print_eval=False,
    mixed_precision=False,
    min_audio_len=32 * 256 * 4,
    max_audio_len=160000,
    output_path=output_path,
    datasets=dataset_config,
    characters=CharactersConfig(
        pad="<PAD>",
        eos="<EOS>",
        bos="<BOS>",
        blank="<BLNK>",
        characters="!¡'(),-.:;¿?abcdefghijklmnopqrstuvwxyzµßàáâäåæçèéêëìíîïñòóôöùúûüąćęłńœśşźżƒабвгдежзийклмнопрстуфхцчшщъыьэюяёєіїґӧ «°±µ»$%&‘’‚“`”„",
        punctuations="!¡'(),-.:;¿? ",
        phonemes=None,
    ),
)

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        config.datasets, eval_split=True,
        eval_split_max_size=config.eval_split_max_size, eval_split_size=config.eval_split_size,
    )
    model = Vits.init_from_config(config, samples=train_samples + eval_samples)
    trainer = Trainer(
        TrainerArgs(), config, output_path, model=model,
        train_samples=train_samples, eval_samples=eval_samples,
    )
    trainer.fit()
