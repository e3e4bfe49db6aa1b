"""Train a vocoder model — mirror of /root/reference/TTS/bin/train_vocoder.py:17."""

import os
import sys
from dataclasses import dataclass

from tpu_tts.parallel import maybe_force_platform, maybe_init_distributed

maybe_force_platform()
maybe_init_distributed()

from tpu_tts.config import load_config
from tpu_tts.train import Trainer, TrainerArgs
from tpu_tts.bin.train_tts import TrainTTSArgs, parse_args


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    train_args, rest = parse_args(argv)
    if train_args.continue_path:
        train_args.config_path = os.path.join(train_args.continue_path, "config.json")
    config = load_config(train_args.config_path)
    rest = config.parse_args(rest, arg_prefix="coqpit")

    from tpu_tts.vocoder.datasets import load_wav_data, load_wav_feat_data
    from tpu_tts.vocoder.models import setup_model

    if not config.feature_path:
        eval_samples, train_samples = None, None
        train_samples, eval_samples = _split(load_wav_data(config.data_path, config.eval_split_size))
    else:
        train_samples, eval_samples = _split(
            load_wav_feat_data(config.data_path, config.feature_path, config.eval_split_size)
        )

    model = setup_model(config)
    output_path = train_args.continue_path if train_args.continue_path else config.output_path
    trainer = Trainer(
        TrainerArgs.from_dict(train_args.to_dict()),
        config,
        output_path,
        model=model,
        train_samples=train_samples,
        eval_samples=eval_samples,
    )
    trainer.fit()


def _split(pair):
    train, eval_ = pair
    return train, eval_


if __name__ == "__main__":
    main()
