"""List unique characters in a dataset (mirror of /root/reference/TTS/bin/
find_unique_chars.py)."""

import argparse

from tpu_tts.config import load_config
from tpu_tts.data import load_tts_samples


def main(argv=None):
    parser = argparse.ArgumentParser(description="Find all the unique characters in a dataset.")
    parser.add_argument("--config_path", type=str, required=True)
    args = parser.parse_args(argv)
    c = load_config(args.config_path)
    train_items, eval_items = load_tts_samples(
        c.datasets, eval_split=True, eval_split_max_size=c.eval_split_max_size, eval_split_size=c.eval_split_size
    )
    items = train_items + (eval_items or [])
    texts = "".join(item["text"] for item in items)
    chars = set(texts)
    lower_chars = filter(lambda c: c.islower(), chars)
    chars_force_lower = {c.lower() for c in chars}
    print(f" > Number of unique characters: {len(chars)}")
    print(f" > Unique characters: {''.join(sorted(chars))}")
    print(f" > Unique lower characters: {''.join(sorted(lower_chars))}")
    print(f" > Unique all forced to lower characters: {''.join(sorted(chars_force_lower))}")


if __name__ == "__main__":
    main()
