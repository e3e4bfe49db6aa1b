"""Batch-resample a wav directory (mirror of /root/reference/TTS/bin/resample.py)."""

import argparse
import glob
import os
from multiprocessing import Pool
from shutil import copytree

import numpy as np
import scipy.io.wavfile

from tpu_tts.audio.numpy_transforms import load_wav, save_wav


def resample_file(func_args):
    filename, output_sr = func_args
    y = load_wav(filename=filename, sample_rate=output_sr, resample=True)
    save_wav(wav=y, path=filename, sample_rate=output_sr)


def resample_files(input_dir, output_sr, output_dir=None, file_ext="wav", n_jobs=10):
    if output_dir:
        print("Recursively copying the input folder...")
        copytree(input_dir, output_dir)
        input_dir = output_dir
    print("Resampling the audio files...")
    audio_files = glob.glob(os.path.join(input_dir, f"**/*.{file_ext}"), recursive=True)
    print(f"Found {len(audio_files)} files...")
    audio_files = list(zip(audio_files, len(audio_files) * [output_sr]))
    with Pool(processes=n_jobs) as p:
        p.map(resample_file, audio_files)
    print("Done !")


def main(argv=None):
    parser = argparse.ArgumentParser(description="Resample a folder recursively, overwriting files in place.")
    parser.add_argument("--input_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--output_sr", type=int, default=22050)
    parser.add_argument("--file_ext", type=str, default="wav")
    parser.add_argument("--n_jobs", type=int, default=None)
    args = parser.parse_args(argv)
    resample_files(args.input_dir, args.output_sr, args.output_dir, args.file_ext, args.n_jobs or 10)


if __name__ == "__main__":
    main()
