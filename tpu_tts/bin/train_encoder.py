"""Train a speaker/emotion encoder with GE2E/AngleProto.

Mirror of /root/reference/TTS/bin/train_encoder.py (bespoke loop — not the
Trainer — with PerfectBatchSampler and NoamLR).
"""

import os
import sys
import time

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from tpu_tts.audio import AudioProcessor
    from tpu_tts.config import load_config
    from tpu_tts.data import load_tts_samples
    from tpu_tts.data.samplers import PerfectBatchSampler
    from tpu_tts.encoder.dataset import EncoderDataset
    from tpu_tts.encoder.losses import angle_proto_loss, ge2e_loss
    from tpu_tts.encoder.models import setup_encoder_model
    from tpu_tts.train.checkpoint import save_checkpoint
    from tpu_tts.train.optimizers import get_optimizer, noam_schedule

    argv = argv if argv is not None else sys.argv[1:]
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--restore_path", default="")
    parser.add_argument("--max_steps", type=int, default=0, help="stop early (0 = config epochs)")
    args, rest = parser.parse_known_args(argv)

    config = load_config(args.config_path)
    config.parse_args(rest, arg_prefix="coqpit")
    ap = AudioProcessor.init_from_config(config, verbose=False)

    train_items, _ = load_tts_samples(config.datasets, eval_split=False)
    label_key = getattr(config, "class_name_key", "speaker_name")
    dataset = EncoderDataset(
        config,
        ap,
        train_items,
        voice_len=config.voice_len,
        num_classes_in_batch=config.num_classes_in_batch,
        num_utter_per_class=config.num_utter_per_class,
        augmentation_config=config.audio_augmentation,
        label_key=label_key,
    )
    items_for_sampler = [{"class_name": it[label_key]} for it in dataset.items]
    sampler = PerfectBatchSampler(
        items_for_sampler,
        dataset.get_class_list(),
        batch_size=config.num_classes_in_batch * config.num_utter_per_class,
        num_classes_in_batch=config.num_classes_in_batch,
        drop_last=True,
    )

    model = setup_encoder_model(config)
    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)
    if args.restore_path:
        from tpu_tts.train.checkpoint import load_checkpoint

        _st = load_checkpoint(args.restore_path)
        params = _st["model"]
        if "model_state" in _st:
            model.model_state = _st["model_state"]
    loss_params = {"w": jnp.array(10.0), "b": jnp.array(-5.0)}
    all_params = {"model": params, "loss": loss_params}
    model_state = model.model_state or {}

    schedule = noam_schedule(config.lr, config.warmup_steps) if config.lr_decay else config.lr
    opt = get_optimizer(config.optimizer, config.optimizer_params, None, config, schedule=schedule)
    opt_state = opt.init(all_params)
    S, U = config.num_classes_in_batch, config.num_utter_per_class
    use_ge2e = config.loss == "ge2e"

    @jax.jit
    def train_step(all_params, model_state, opt_state, wavs):
        def loss_of(p):
            feats = model.features_from_wav(wavs)
            d, new_state = model.embed_train(p["model"], feats, model_state)
            d = d.reshape(S, U, -1)
            if use_ge2e:
                return ge2e_loss(d, p["loss"]["w"], p["loss"]["b"]), new_state
            return angle_proto_loss(d, p["loss"]["w"], p["loss"]["b"]), new_state

        (loss, new_state), grads = jax.value_and_grad(loss_of, has_aux=True)(all_params)
        updates, opt_state = opt.update(grads, opt_state, all_params)
        return optax.apply_updates(all_params, updates), new_state, opt_state, loss

    out_dir = config.output_path
    os.makedirs(out_dir, exist_ok=True)
    step = 0
    for epoch in range(config.epochs):
        for batch_idxs in sampler:
            t0 = time.time()
            batch = dataset.collate_fn([dataset[i] for i in batch_idxs])
            all_params, model_state, opt_state, loss = train_step(
                all_params, model_state, opt_state, jnp.asarray(batch["wavs"]))
            step += 1
            if step % config.print_step == 0:
                print(f" | > step {step} loss {float(loss):.5f} ({time.time()-t0:.2f}s)", flush=True)
            if step % config.save_step == 0:
                save_checkpoint({"model": jax.device_get(all_params["model"]), "model_state": jax.device_get(model_state), "step": step}, out_dir, step, config)
            if args.max_steps and step >= args.max_steps:
                save_checkpoint({"model": jax.device_get(all_params["model"]), "model_state": jax.device_get(model_state), "step": step}, out_dir, step, config)
                print(" > Done (max_steps).")
                return
    save_checkpoint({"model": jax.device_get(all_params["model"]), "model_state": jax.device_get(model_state), "step": step}, out_dir, step, config)


if __name__ == "__main__":
    main()
