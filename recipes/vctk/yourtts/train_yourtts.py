"""VCTK YourTTS recipe (behavioral mirror of /root/reference/recipes/vctk/
yourtts/train_yourtts.py, minus the download steps): multi-speaker VITS with
d-vectors, speaker-consistency loss, and ResBlock type 2 decoder."""

import os

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

from tpu_tts.config.shared_configs import BaseDatasetConfig
from tpu_tts.configs.vits_config import VitsArgs, VitsAudioConfig, VitsConfig
from tpu_tts.data import load_tts_samples
from tpu_tts.models.vits import Vits
from tpu_tts.train import Trainer, TrainerArgs

output_path = os.path.dirname(os.path.abspath(__file__))
vctk_path = os.environ.get("VCTK_PATH", os.path.join(output_path, "../VCTK/"))
# d-vector files precomputed with
#   python -m tpu_tts.bin.compute_embeddings --model_path <se.ckpt> --config_path <se.json> \
#       --formatter_name vctk --dataset_path <VCTK> --output_path <embeddings.pth>
D_VECTOR_FILES = [os.path.join(vctk_path, "speakers.pth")]

dataset_config = BaseDatasetConfig(
    formatter="vctk", dataset_name="vctk", meta_file_train="", path=vctk_path, language="en"
)
audio_config = VitsAudioConfig(
    sample_rate=16000, hop_length=256, win_length=1024, fft_size=1024, mel_fmin=0.0, mel_fmax=None, num_mels=80
)
model_args = VitsArgs(
    d_vector_file=D_VECTOR_FILES,
    use_d_vector_file=True,
    d_vector_dim=512,
    num_layers_text_encoder=10,
    resblock_type_decoder="2",  # the paper (accidentally) used ResNet blocks type 2
    use_speaker_encoder_as_loss=False,
)

config = VitsConfig(
    output_path=output_path,
    model_args=model_args,
    audio=audio_config,
    run_name="YourTTS-EN-VCTK",
    project_name="YourTTS",
    run_description="YourTTS trained on VCTK",
    batch_size=32,
    batch_group_size=48,
    eval_batch_size=16,
    num_loader_workers=8,
    print_step=50,
    plot_step=100,
    save_step=5000,
    save_n_checkpoints=2,
    save_checkpoints=True,
    print_eval=False,
    compute_input_seq_cache=True,
    add_blank=True,
    text_cleaner="multilingual_cleaners",
    phoneme_cache_path=None,
    precompute_num_workers=12,
    start_by_longest=True,
    datasets=[dataset_config],
    use_speaker_embedding=False,
    use_d_vector_file=True,
    d_vector_file=D_VECTOR_FILES,
    d_vector_dim=512,
    speaker_encoder_loss_alpha=9.0,
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
