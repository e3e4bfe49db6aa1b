"""Compute mean/var spectrogram stats over a dataset → `scale_stats.npy`.

Mirror of /root/reference/TTS/bin/compute_statistics.py; the output feeds
`audio.stats_path` configs for mean-var spectrogram normalization.
"""

import argparse
import glob
import os
import sys

import numpy as np

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()


def main(argv=None):
    parser = argparse.ArgumentParser(description="Compute mean and variance of spectrogram features.")
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--out_path", type=str, required=True)
    parser.add_argument("--data_path", type=str, default=None, help="Override config wav path.")
    args = parser.parse_args(argv)

    from tpu_tts.audio import AudioProcessor
    from tpu_tts.config import load_config
    from tpu_tts.data import load_tts_samples

    config = load_config(args.config_path)
    config.audio.signal_norm = False
    config.audio.stats_path = None
    ap = AudioProcessor.init_from_config(config, verbose=False)

    if args.data_path:
        wav_files = glob.glob(os.path.join(args.data_path, "**", "*.wav"), recursive=True)
        items = [{"audio_file": p} for p in wav_files]
    else:
        train_items, _ = load_tts_samples(config.datasets, eval_split=False)
        items = train_items

    mel_sum = mel_square_sum = 0.0
    linear_sum = linear_square_sum = 0.0
    N = 0
    for idx, item in enumerate(items):
        wav = ap.load_wav(item["audio_file"])
        linear = ap.spectrogram(wav)
        mel = ap.melspectrogram(wav)
        N += mel.shape[1]
        mel_sum += mel.sum(1)
        linear_sum += linear.sum(1)
        mel_square_sum += (mel**2).sum(1)
        linear_square_sum += (linear**2).sum(1)
        if idx % 100 == 0:
            print(f" > {idx}/{len(items)}", flush=True)

    mel_mean = mel_sum / N
    mel_scale = np.sqrt(mel_square_sum / N - mel_mean**2)
    linear_mean = linear_sum / N
    linear_scale = np.sqrt(linear_square_sum / N - linear_mean**2)

    stats = {
        "mel_mean": mel_mean,
        "mel_std": mel_scale,
        "linear_mean": linear_mean,
        "linear_std": linear_scale,
        "audio_config": config.audio.to_dict(),
    }
    np.save(args.out_path, stats, allow_pickle=True)
    print(f" > stats saved to {args.out_path}")


if __name__ == "__main__":
    main()
