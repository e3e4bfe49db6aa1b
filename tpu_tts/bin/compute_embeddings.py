"""Compute d-vectors for every dataset clip → `speakers.pth`/`.json`.

Mirror of /root/reference/TTS/bin/compute_embeddings.py; the output feeds
`d_vector_file` configs (YourTTS/VITS d-vector training).
"""

import argparse
import os
import sys

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()


def compute_embeddings(
    model_path,
    config_path,
    output_path,
    formatter_name=None,
    dataset_name=None,
    dataset_path=None,
    meta_file_train=None,
    meta_file_val=None,
    config_dataset_path=None,
    no_eval=False,
):
    from tpu_tts.config import load_config
    from tpu_tts.config.shared_configs import BaseDatasetConfig
    from tpu_tts.data import load_tts_samples
    from tpu_tts.managers import SpeakerManager, save_file

    if config_dataset_path:
        c_dataset = load_config(config_dataset_path)
        meta_data_train, meta_data_eval = load_tts_samples(c_dataset.datasets, eval_split=not no_eval)
    else:
        c_dataset = BaseDatasetConfig(
            formatter=formatter_name,
            dataset_name=dataset_name or formatter_name,
            path=dataset_path,
            meta_file_train=meta_file_train or "",
            meta_file_val=meta_file_val or "",
        )
        meta_data_train, meta_data_eval = load_tts_samples(c_dataset, eval_split=not no_eval)

    samples = meta_data_train + (meta_data_eval or [])
    manager = SpeakerManager(encoder_model_path=model_path, encoder_config_path=config_path)

    embeddings = {}
    for idx, sample in enumerate(samples):
        clip_name = os.path.splitext(os.path.basename(sample["audio_file"]))[0]
        emb = manager.compute_embedding_from_clip(sample["audio_file"])
        embeddings[clip_name] = {"name": sample["speaker_name"], "embedding": emb}
        if idx % 50 == 0:
            print(f" > {idx}/{len(samples)}", flush=True)

    if os.path.isdir(output_path):
        output_path = os.path.join(output_path, "speakers.json")
    save_file(embeddings, output_path)
    print(f" > Saved {len(embeddings)} embeddings to {output_path}")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Compute embedding vectors for each audio file in a dataset."
    )
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--config_dataset_path", type=str, default=None)
    parser.add_argument("--output_path", type=str, default="speakers.json")
    parser.add_argument("--formatter_name", type=str, default=None)
    parser.add_argument("--dataset_name", type=str, default=None)
    parser.add_argument("--dataset_path", type=str, default=None)
    parser.add_argument("--meta_file_train", type=str, default=None)
    parser.add_argument("--meta_file_val", type=str, default=None)
    parser.add_argument("--no_eval", action="store_true")
    args = parser.parse_args(argv)
    compute_embeddings(
        args.model_path,
        args.config_path,
        args.output_path,
        formatter_name=args.formatter_name,
        dataset_name=args.dataset_name,
        dataset_path=args.dataset_path,
        meta_file_train=args.meta_file_train,
        meta_file_val=args.meta_file_val,
        config_dataset_path=args.config_dataset_path,
        no_eval=args.no_eval,
    )


if __name__ == "__main__":
    main()
