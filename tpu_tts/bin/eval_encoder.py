"""Evaluate a speaker encoder: mean intra/inter-class cosine similarity
(mirror of /root/reference/TTS/bin/eval_encoder.py)."""

import argparse

import numpy as np

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()


def main(argv=None):
    import jax

    from tpu_tts.config import load_config
    from tpu_tts.data import load_tts_samples
    from tpu_tts.encoder.models import setup_encoder_model
    from tpu_tts.train.checkpoint import load_checkpoint

    parser = argparse.ArgumentParser()
    parser.add_argument("model_path", type=str)
    parser.add_argument("config_path", type=str)
    parser.add_argument("config_dataset_path", type=str)
    args = parser.parse_args(argv)

    config = load_config(args.config_path)
    ds_config = load_config(args.config_dataset_path) if args.config_dataset_path != args.config_path else config
    model = setup_encoder_model(config)
    model.init_params(jax.random.PRNGKey(0))
    state = load_checkpoint(args.model_path)
    model.params = state["model"]

    samples, _ = load_tts_samples(ds_config.datasets, eval_split=False)
    from tpu_tts.audio import AudioProcessor

    ap = AudioProcessor.init_from_config(config, verbose=False)
    embs, labels = [], []
    for s in samples:
        wav = ap.load_wav(s["audio_file"])
        embs.append(model.compute_embedding(wav))
        labels.append(s["speaker_name"])
    embs = np.stack(embs)
    embs = embs / np.linalg.norm(embs, axis=1, keepdims=True)
    labels = np.array(labels)
    sim = embs @ embs.T
    same = labels[:, None] == labels[None, :]
    np.fill_diagonal(same, False)
    diff = ~same
    np.fill_diagonal(diff, False)
    intra = sim[same].mean() if same.any() else float("nan")
    inter = sim[diff].mean() if diff.any() else float("nan")
    print(f" > {len(samples)} utterances, {len(set(labels))} speakers")
    print(f" > mean intra-speaker cosine: {intra:.4f}")
    print(f" > mean inter-speaker cosine: {inter:.4f}")
    print(f" > separation margin: {intra - inter:.4f}")


if __name__ == "__main__":
    main()
