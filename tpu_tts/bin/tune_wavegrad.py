"""Search the best WaveGrad inference noise schedule (mirror of
/root/reference/TTS/bin/tune_wavegrad.py)."""

import argparse
import itertools

import numpy as np

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()


def main(argv=None):
    import jax

    from tpu_tts.audio import AudioProcessor
    from tpu_tts.config import load_config
    from tpu_tts.train.checkpoint import load_checkpoint
    from tpu_tts.vocoder.datasets import load_wav_data
    from tpu_tts.vocoder.models.wavegrad import Wavegrad

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--num_iter", type=int, default=50, help="Steps in the candidate schedules.")
    parser.add_argument("--search_depth", type=int, default=3)
    parser.add_argument("--num_samples", type=int, default=1)
    parser.add_argument("--output_path", type=str, default="best_noise_schedule.npy")
    args = parser.parse_args(argv)

    config = load_config(args.config_path)
    ap = AudioProcessor.init_from_config(config, verbose=False)
    model = Wavegrad(config)
    model.init_params(jax.random.PRNGKey(0))
    state = load_checkpoint(args.model_path)
    model.params = state["model"]

    _, eval_files = load_wav_data(args.data_path, max(args.num_samples, 1))
    wavs = [np.asarray(ap.load_wav(p), dtype=np.float32) for p in eval_files[: args.num_samples]]
    mels = [ap.melspectrogram(w).T for w in wavs]

    best = (np.inf, None)
    exponents = np.linspace(-6, -1, args.search_depth)
    for lo_e, hi_e in itertools.product(exponents, exponents):
        if hi_e <= lo_e:
            continue
        beta = np.linspace(10.0**lo_e, 10.0**hi_e, args.num_iter)
        model.compute_noise_level(beta)
        err = 0.0
        for wav, mel in zip(wavs, mels):
            y = model.inference(mel.astype(np.float32))[0, :, 0]
            n = min(len(y), len(wav))
            mel_hat = ap.melspectrogram(y[:n])
            mel_gt = ap.melspectrogram(wav[:n])
            T = min(mel_hat.shape[1], mel_gt.shape[1])
            err += float(np.mean(np.abs(mel_hat[:, :T] - mel_gt[:, :T])))
        if err < best[0]:
            best = (err, beta)
            print(f" > new best mel-MAE {err:.4f} for schedule [1e{lo_e:.1f}, 1e{hi_e:.1f}]")
    np.save(args.output_path, {"beta": best[1]}, allow_pickle=True)
    print(f" > Best schedule saved to {args.output_path} (mel MAE {best[0]:.4f})")


if __name__ == "__main__":
    main()
