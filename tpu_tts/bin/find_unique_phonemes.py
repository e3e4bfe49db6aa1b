"""List unique phonemes in a dataset (mirror of /root/reference/TTS/bin/
find_unique_phonemes.py)."""

import argparse
import multiprocessing
from functools import partial

from tpu_tts.config import load_config
from tpu_tts.data import load_tts_samples
from tpu_tts.text.phonemizers import DEF_LANG_TO_PHONEMIZER, get_phonemizer_by_name


def compute_phonemes(item, phonemizer):
    text = item["text"]
    ph = phonemizer.phonemize(text).replace("|", "")
    return set(ph)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Find all the unique phonemes in a dataset.")
    parser.add_argument("--config_path", type=str, required=True)
    args = parser.parse_args(argv)
    c = load_config(args.config_path)
    train_items, eval_items = load_tts_samples(
        c.datasets, eval_split=True, eval_split_max_size=c.eval_split_max_size, eval_split_size=c.eval_split_size
    )
    items = train_items + (eval_items or [])
    print("Num items:", len(items))
    language = c.phoneme_language
    phonemizer = get_phonemizer_by_name(DEF_LANG_TO_PHONEMIZER[language], language=language)
    phonemes = set()
    for item in items:
        phonemes.update(compute_phonemes(item, phonemizer))
    print(f" > Number of unique phonemes: {len(phonemes)}")
    print(f" > Unique phonemes: {''.join(sorted(phonemes))}")


if __name__ == "__main__":
    main()
