"""XTTS GPT fine-tune glue (mirror of /root/reference/TTS/demos/xtts_ft_demo/
utils/gpt_train.py): builds the fine-tune config over a prepared dataset and
runs the Trainer on the XTTS GPT loss path."""

import os
from typing import Optional, Tuple


def train_gpt(
    language: str,
    num_epochs: int,
    batch_size: int,
    train_csv: str,
    eval_csv: str,
    output_path: str,
    xtts_checkpoint: Optional[str] = None,
    lr: float = 5e-6,
) -> Tuple[str, str]:
    """Fine-tune the XTTS GPT on a two-column dataset. Returns
    (best_checkpoint_path, run_config_path)."""
    from tpu_tts.config.shared_configs import BaseDatasetConfig
    from tpu_tts.configs.xtts_config import XttsConfig
    from tpu_tts.data import load_tts_samples
    from tpu_tts.models.xtts import Xtts
    from tpu_tts.train.trainer import Trainer, TrainerArgs

    dataset = BaseDatasetConfig(
        formatter="coqui",
        dataset_name="ft_dataset",
        path=os.path.dirname(train_csv),
        meta_file_train=os.path.basename(train_csv),
        meta_file_val=os.path.basename(eval_csv),
        language=language,
    )
    config = XttsConfig(
        run_name="xtts_ft",
        epochs=num_epochs,
        batch_size=batch_size,
        eval_batch_size=batch_size,
        output_path=output_path,
        lr=lr,
        optimizer="adamw",
        optimizer_params={"betas": [0.9, 0.96], "eps": 1e-8, "weight_decay": 1e-2},
        save_step=1000,
        print_step=50,
        datasets=[dataset],
    )
    model = Xtts.init_from_config(config)
    if xtts_checkpoint:
        model.load_checkpoint(config, xtts_checkpoint, eval=False)
    train_samples, eval_samples = load_tts_samples(
        config.datasets, eval_split=True, eval_split_size=0.1
    )
    trainer = Trainer(
        TrainerArgs(), config, output_path, model=model,
        train_samples=train_samples, eval_samples=eval_samples,
    )
    trainer.fit()
    cfg_path = os.path.join(output_path, "config.json")
    best = os.path.join(output_path, "best_model")
    return best, cfg_path
