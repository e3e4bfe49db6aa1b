"""Extract attention alignments (teacher durations) from a trained AR model.

Mirror of /root/reference/TTS/bin/compute_attention_masks.py: writes per-clip
alignment `.npy` files + `metadata_attn_mask.txt` consumed by
`meta_file_attn_mask` dataset configs.
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
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--dataset_metafile", type=str, default="metadata.csv")
    parser.add_argument("--data_path", type=str, default=None)
    parser.add_argument("--output_path", type=str, required=True)
    parser.add_argument("--use_cuda", type=bool, default=False)
    parser.add_argument("--batch_size", type=int, default=16)
    args = parser.parse_args(argv)

    config = load_config(args.config_path)
    if args.data_path:
        config.datasets[0].path = args.data_path
        config.datasets[0].meta_file_train = args.dataset_metafile
    model = setup_model(config)
    state = load_checkpoint(args.model_path)
    model.params = state["model"]

    samples, _ = load_tts_samples(config.datasets, eval_split=False)
    os.makedirs(args.output_path, exist_ok=True)
    loader = model.get_data_loader(config, {}, is_eval=True, samples=samples, verbose=False, num_gpus=1)
    metadata = []
    for batch in loader:
        out = model.net.apply(
            {"params": model.params},
            jnp.asarray(batch["text_input"]),
            jnp.asarray(batch["text_lengths"]),
            jnp.asarray(batch["mel_input"]),
            jnp.asarray(batch["mel_lengths"]),
            train=False,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        aligns = np.asarray(out["alignments"])  # [B, T_de(or steps), T_en]
        for b in range(aligns.shape[0]):
            wav_path = batch["item_idxs"][b]
            align = aligns[b]
            out_file = os.path.join(
                args.output_path, os.path.splitext(os.path.basename(wav_path))[0] + "_attn.npy"
            )
            np.save(out_file, align)
            metadata.append(f"{wav_path}|{out_file}")
    meta_path = os.path.join(args.output_path, "metadata_attn_mask.txt")
    with open(meta_path, "w", encoding="utf-8") as f:
        f.write("\n".join(metadata))
    print(f" > Saved {len(metadata)} attention masks; metafile at {meta_path}")


if __name__ == "__main__":
    main()
