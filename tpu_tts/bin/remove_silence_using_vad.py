"""Batch silence removal over a dataset (mirror of /root/reference/TTS/bin/
remove_silence_using_vad.py, with the built-in VAD)."""

import argparse
import glob
import multiprocessing
import os
import pathlib

from tpu_tts.utils.vad import get_vad_model_and_utils, remove_silence


def _process(args_tuple):
    input_path, output_path, model_and_utils, trim_edges = args_tuple
    output_dir = os.path.dirname(output_path)
    os.makedirs(output_dir, exist_ok=True)
    return remove_silence(model_and_utils, input_path, output_path, trim_just_beginning_and_end=trim_edges)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--input_dir", type=str, required=True)
    parser.add_argument("-o", "--output_dir", type=str, required=True)
    parser.add_argument("-g", "--glob", type=str, default="**/*.wav")
    parser.add_argument("-t", "--trim_just_beginning_and_end", type=bool, default=True)
    parser.add_argument("--num_processes", type=int, default=4)
    args = parser.parse_args(argv)

    files = sorted(glob.glob(os.path.join(args.input_dir, args.glob), recursive=True))
    print(f" > {len(files)} files found.")
    model_and_utils = get_vad_model_and_utils()
    work = [
        (f, os.path.join(args.output_dir, os.path.relpath(f, args.input_dir)), model_and_utils, args.trim_just_beginning_and_end)
        for f in files
    ]
    with multiprocessing.Pool(args.num_processes) as pool:
        results = pool.map(_process, work)
    n_speech = sum(1 for _, has in results if has)
    print(f" > Done. {n_speech}/{len(files)} files contained speech.")


if __name__ == "__main__":
    main()
