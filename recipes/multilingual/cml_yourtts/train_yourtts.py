"""YourTTS on CML-TTS + LibriTTS — the CML-TTS-paper experiment (behavioral
mirror of /root/reference/recipes/multilingual/cml_yourtts/train_yourtts.py,
on the tpu_tts trainer). Speaker d-vectors are computed per dataset with
`tpu_tts.bin.compute_embeddings` if missing."""

import os

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

from tpu_tts.config.shared_configs import BaseDatasetConfig
from tpu_tts.configs.vits_config import VitsArgs, VitsAudioConfig, VitsConfig
from tpu_tts.data import load_tts_samples
from tpu_tts.models.vits import Vits
from tpu_tts.train import Trainer, TrainerArgs

CURRENT_PATH = os.path.dirname(os.path.abspath(__file__))
RUN_NAME = "YourTTS-CML-TTS"
OUT_PATH = CURRENT_PATH
RESTORE_PATH = os.environ.get("YOURTTS_RESTORE", "")  # converted checkpoint to fine-tune from
BATCH_SIZE = 32
SAMPLE_RATE = 24000

CML_DATASET_PATH = os.path.join(CURRENT_PATH, "datasets/CML-TTS-Dataset/")
LIBRITTS_DOWNLOAD_PATH = os.path.join(CURRENT_PATH, "datasets/LibriTTS/")


def ensure_dataset():
    """Download LibriTTS train-clean-360 if missing (ref recipe gate)."""
    if not os.path.exists(LIBRITTS_DOWNLOAD_PATH):
        from tpu_tts.utils.downloaders import download_libri_tts

        print(">>> Downloading LibriTTS dataset:")
        download_libri_tts(LIBRITTS_DOWNLOAD_PATH, subset="libri-tts-clean-360")


libritts_config = BaseDatasetConfig(
    formatter="libri_tts",
    dataset_name="libri_tts",
    meta_file_train="",
    meta_file_val="",
    path=os.path.join(LIBRITTS_DOWNLOAD_PATH, "train-clean-360/"),
    language="en",
)

_CML_LANGS = [
    ("portuguese", "pt-br"), ("polish", "pl"), ("italian", "it"), ("french", "fr"),
    ("dutch", "du"), ("german", "ge"), ("spanish", "sp"),
]
DATASETS_CONFIG_LIST = [libritts_config] + [
    BaseDatasetConfig(
        formatter="cml_tts",
        dataset_name="cml_tts",
        meta_file_train="train.csv",
        meta_file_val="",
        path=os.path.join(CML_DATASET_PATH, f"cml_tts_dataset_{name}_v0.1/"),
        language=lang,
    )
    for name, lang in _CML_LANGS
]

# speaker encoder used to compute the d-vectors (H/ASP ResNet release)
SPEAKER_ENCODER_CHECKPOINT_PATH = os.environ.get("SE_CHECKPOINT", "")
SPEAKER_ENCODER_CONFIG_PATH = os.environ.get("SE_CONFIG", "")

D_VECTOR_FILES = []
for dataset_conf in DATASETS_CONFIG_LIST:
    embeddings_file = os.path.join(dataset_conf.path, "speakers.pth")
    if not os.path.isfile(embeddings_file) and SPEAKER_ENCODER_CHECKPOINT_PATH:
        from tpu_tts.bin.compute_embeddings import compute_embeddings

        print(f">>> Computing the speaker embeddings for the {dataset_conf.dataset_name} dataset")
        compute_embeddings(
            SPEAKER_ENCODER_CHECKPOINT_PATH,
            SPEAKER_ENCODER_CONFIG_PATH,
            embeddings_file,
            formatter_name=dataset_conf.formatter,
            dataset_name=dataset_conf.dataset_name,
            dataset_path=dataset_conf.path,
            meta_file_train=dataset_conf.meta_file_train,
            meta_file_val=dataset_conf.meta_file_val,
        )
    D_VECTOR_FILES.append(embeddings_file)

audio_config = VitsAudioConfig(
    sample_rate=SAMPLE_RATE,
    hop_length=256,
    win_length=1024,
    fft_size=1024,
    mel_fmin=0.0,
    mel_fmax=None,
    num_mels=80,
)

model_args = VitsArgs(
    spec_segment_size=62,
    hidden_channels=192,
    hidden_channels_ffn_text_encoder=768,
    num_heads_text_encoder=2,
    num_layers_text_encoder=10,
    kernel_size_text_encoder=3,
    dropout_p_text_encoder=0.1,
    d_vector_file=D_VECTOR_FILES,
    use_d_vector_file=True,
    d_vector_dim=512,
    speaker_encoder_model_path=SPEAKER_ENCODER_CHECKPOINT_PATH,
    speaker_encoder_config_path=SPEAKER_ENCODER_CONFIG_PATH,
    resblock_type_decoder="2",  # the paper accidentally trained YourTTS with type-2 blocks
    use_speaker_encoder_as_loss=False,
    use_language_embedding=True,
    embedded_language_dim=4,
)

config = VitsConfig(
    output_path=OUT_PATH,
    model_args=model_args,
    run_name=RUN_NAME,
    project_name="YourTTS",
    run_description="YourTTS trained using the CML-TTS and LibriTTS datasets",
    dashboard_logger="tensorboard",
    audio=audio_config,
    batch_size=BATCH_SIZE,
    batch_group_size=48,
    eval_batch_size=BATCH_SIZE,
    num_loader_workers=8,
    eval_split_max_size=256,
    print_step=50,
    plot_step=100,
    save_step=5000,
    save_n_checkpoints=2,
    save_checkpoints=True,
    print_eval=False,
    use_phonemes=False,
    phonemizer="espeak",
    phoneme_language="en",
    compute_input_seq_cache=True,
    add_blank=True,
    text_cleaner="multilingual_cleaners",
    datasets=DATASETS_CONFIG_LIST,
    mixed_precision=True,
    test_sentences=[],
    use_weighted_sampler=True,
    weighted_sampler_attrs={"language": 1.0},
    speaker_encoder_loss_alpha=9.0,
)

if __name__ == "__main__":
    ensure_dataset()
    train_samples, eval_samples = load_tts_samples(
        config.datasets,
        eval_split=True,
        eval_split_max_size=config.eval_split_max_size,
        eval_split_size=config.eval_split_size,
    )
    model = Vits.init_from_config(config, samples=train_samples + (eval_samples or []))
    trainer = Trainer(
        TrainerArgs(restore_path=RESTORE_PATH), model.config, OUT_PATH, model=model,
        train_samples=train_samples, eval_samples=eval_samples,
    )
    trainer.fit()
