"""LJSpeech XTTS-v1.1 GPT fine-tune recipe (behavioral mirror of /root/reference/
recipes/ljspeech/xtts_v1/train_gpt_xtts.py, minus the checkpoint downloads —
point XTTS_CHECKPOINT at a converted orbax checkpoint, see
tpu_tts/models/xtts_convert.py)."""

import os

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

from tpu_tts.config.shared_configs import BaseDatasetConfig
from tpu_tts.configs.xtts_config import XttsConfig
from tpu_tts.data import load_tts_samples
from tpu_tts.models.xtts import Xtts
from tpu_tts.train import Trainer, TrainerArgs

output_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "run", "training")
XTTS_CHECKPOINT = os.environ.get("XTTS_CHECKPOINT", "")  # converted base model to fine-tune

dataset_config = BaseDatasetConfig(
    formatter="ljspeech",
    dataset_name="ljspeech",
    path=os.path.join(os.path.dirname(os.path.abspath(__file__)), "../../LJSpeech-1.1/"),
    meta_file_train="metadata.csv",
    language="en",
)

config = XttsConfig(
    output_path=output_path,
    run_name="GPT_XTTS_LJSpeech_FT",
    project_name="XTTS_trainer",
    run_description="GPT XTTS fine-tuning",
    batch_size=3,
    batch_group_size=48,
    eval_batch_size=3,
    num_loader_workers=8,
    eval_split_max_size=256,
    print_step=50,
    plot_step=100,
    save_step=1000,
    save_n_checkpoints=1,
    save_checkpoints=True,
    print_eval=False,
    optimizer="adamw",
    optimizer_params={"betas": [0.9, 0.96], "eps": 1e-8, "weight_decay": 1e-2},
    lr=5e-6,
    lr_scheduler="exponential",
    lr_scheduler_params={"gamma": 0.5, "decay_steps": 50000},
    epochs=1000,
    datasets=[dataset_config],
)

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        config.datasets, eval_split=True,
        eval_split_max_size=config.eval_split_max_size, eval_split_size=0.02,
    )
    model = Xtts.init_from_config(config)
    if XTTS_CHECKPOINT:
        model.load_checkpoint(config, XTTS_CHECKPOINT, eval=False)
    trainer = Trainer(
        TrainerArgs(), config, output_path, model=model,
        train_samples=train_samples, eval_samples=eval_samples,
    )
    trainer.fit()
