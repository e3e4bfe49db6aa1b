"""Train a `tts` model — mirror of /root/reference/TTS/bin/train_tts.py:16.

Usage:
    python -m tpu_tts.bin.train_tts --config_path <config.json> \
        [--restore_path ...] [--continue_path ...] [--coqpit.field value ...]
"""

import os
import sys
from dataclasses import dataclass, field

from tpu_tts.parallel import maybe_force_platform, maybe_init_distributed

maybe_force_platform()
maybe_init_distributed()

from tpu_tts.config import load_config, register_config
from tpu_tts.config.base import Coqpit
from tpu_tts.data import load_tts_samples
from tpu_tts.models import setup_model
from tpu_tts.train import Trainer, TrainerArgs


@dataclass
class TrainTTSArgs(TrainerArgs):
    config_path: str = ""


def parse_args(argv):
    args = TrainTTSArgs()
    rest = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--") and "." not in a[2:]:
            key = a[2:]
            if hasattr(args, key):
                if i + 1 < len(argv):
                    val = argv[i + 1]
                    args.set_dotted(key, val)
                    i += 2
                    continue
            rest.append(a)
            i += 1
        else:
            rest.append(a)
            i += 1
    return args, rest


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    train_args, rest = parse_args(argv)

    if train_args.continue_path:
        train_args.config_path = os.path.join(train_args.continue_path, "config.json")

    config = load_config(train_args.config_path)
    rest = config.parse_args(rest, arg_prefix="coqpit")
    if rest:
        print(f" [!] Unused args: {rest}")

    train_samples, eval_samples = load_tts_samples(
        config.datasets,
        eval_split=True,
        eval_split_max_size=config.eval_split_max_size,
        eval_split_size=config.eval_split_size,
    )

    model = setup_model(config, samples=train_samples + (eval_samples or []))

    output_path = train_args.continue_path if train_args.continue_path else config.output_path
    trainer = Trainer(
        TrainerArgs.from_dict(train_args.to_dict()),
        model.config,
        output_path,
        model=model,
        train_samples=train_samples,
        eval_samples=eval_samples,
    )
    trainer.fit()


if __name__ == "__main__":
    main()
