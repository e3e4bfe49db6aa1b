"""GAN vocoder wrapper: composes any generator + discriminator pair.

Mirror of /root/reference/TTS/vocoder/models/gan.py:21 (`train_step`:68 with
optimizer_idx alternation, PQMF hooks:104, steps_to_start_discriminator:254),
re-designed functionally: optimizer_idx 0 = discriminator pass, 1 = generator
pass; params live in `{"generator": ..., "discriminator": ...}` and
`param_partition/param_merge` route gradients per optimizer.
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.models.base_tts import BaseTTSModel
from tpu_tts.vocoder.layers.losses import (
    GeneratorLossConfig,
    discriminator_loss,
    generator_loss,
)


class GAN(BaseTTSModel):
    def __init__(self, config, ap=None):
        super().__init__(config, ap=ap)
        from tpu_tts.vocoder.models import setup_discriminator, setup_generator

        self.generator = setup_generator(config)
        self.discriminator = setup_discriminator(config)
        self.gen_loss_cfg = GeneratorLossConfig(config)
        self.use_pqmf = getattr(config, "use_pqmf", False)
        if self.use_pqmf:
            from tpu_tts.vocoder.layers.pqmf import PQMF

            self.pqmf = PQMF(N=4, taps=62, cutoff=0.15, beta=9.0)
        else:
            self.pqmf = None

    def num_optimizers(self) -> int:
        return 2

    def handles_mixed_precision(self) -> bool:
        """hifigan G/D consume flax `dtype` natively (setup_generator passes
        bf16); every other generator/discriminator family relies on the
        trainer's generic autocast (train/precision.py)."""
        gen = str(getattr(self.config, "generator_model", "")).lower()
        disc = str(getattr(self.config, "discriminator_model", "")).lower()
        return "hifigan" in gen and ("hifigan" in disc or not disc)

    # ------------------------------------------------------- torch ingest
    def convert_torch_state_dict(self, state_dict):
        """Reference vocoder `GAN` torch weights → our flax tree
        (parity-tested in tests/test_torch_parity_vocoder.py)."""
        from tpu_tts.vocoder.models.vocoder_convert import convert_gan_torch_state_dict

        name = str(getattr(self.config, "generator_model", "hifigan")).lower()
        params = convert_gan_torch_state_dict(state_dict, generator_name=name)
        if not params.get("generator"):
            raise ValueError(
                f"no generator weights found in checkpoint ({len(state_dict)} "
                "tensors) — not a reference vocoder GAN state dict?"
            )
        if "discriminator" not in params:
            # generator-only release checkpoint: keep a fresh discriminator so
            # fine-tuning still works
            if self.params is None:
                self.init_params(jax.random.PRNGKey(0))
            params["discriminator"] = self.params["discriminator"]
        return params

    # ------------------------------------------------------------------ pure
    def init_params(self, rng):
        B, T_mel, C = 2, 8, self.config.audio.num_mels
        hop = self.config.audio.hop_length
        if self._disc_needs_cond:
            # random-window D slices fixed window sizes; init needs ≥ max window
            T_mel = max(self.discriminator.window_sizes) // hop + 1
        mel = jnp.zeros((B, T_mel, C))
        g_rng, d_rng = jax.random.split(rng)
        g_params = self.generator.init(g_rng, mel)["params"]
        y = self._gen_apply(g_params, mel)
        if self.pqmf is not None:
            y = self.pqmf.synthesis(y)
        if self._disc_needs_cond:
            d_params = self.discriminator.init(d_rng, y, mel, None)["params"]
        else:
            d_params = self.discriminator.init(d_rng, y)["params"]
        self.params = {"generator": g_params, "discriminator": d_params}
        return self.params

    def param_partition(self, params, optimizer_idx: int):
        return params["discriminator"] if optimizer_idx == 0 else params["generator"]

    def param_merge(self, params, subtree, optimizer_idx: int):
        key = "discriminator" if optimizer_idx == 0 else "generator"
        new = dict(params)
        new[key] = subtree
        return new

    def _gen_apply(self, g_params, mel):
        return self.generator.apply({"params": g_params}, mel)

    @property
    def _disc_needs_cond(self) -> bool:
        from tpu_tts.vocoder.models.random_window_discriminator import RandomWindowDiscriminator

        return isinstance(self.discriminator, RandomWindowDiscriminator)

    def _disc_apply(self, d_params, y, cond=None, rng=None):
        if self._disc_needs_cond:
            out = self.discriminator.apply({"params": d_params}, y, cond, rng)
        else:
            out = self.discriminator.apply({"params": d_params}, y)
        if isinstance(out, tuple):
            scores, feats = out
        else:
            scores, feats = out, None
        if not isinstance(scores, list):
            scores, feats = [scores], [feats] if feats is not None else None
        return scores, feats

    def _disc_apply_paired(self, d_params, real, fake, cond=None, rng=None):
        """ONE discriminator pass over [real; fake] stacked on the batch axis
        (per-row outputs identical to two passes; every kernel is twice as
        large and the backward emits half as many small fusions — same
        attack as Vits._disc_paired on the small-kernel train bound).

        The random-window discriminator keeps two separate passes: its
        window draws must stay aligned per row between real and fake, and a
        stacked batch would give the two halves different windows."""
        if self._disc_needs_cond:
            s_fake, f_fake = self._disc_apply(d_params, fake, cond, rng)
            s_real, f_real = self._disc_apply(d_params, real, cond, rng)
            return s_real, s_fake, f_real, f_fake
        B = real.shape[0]
        scores, feats = self._disc_apply(d_params, jnp.concatenate([real, fake], axis=0))
        s_real = jax.tree.map(lambda s: s[:B], scores)
        s_fake = jax.tree.map(lambda s: s[B:], scores)
        f_real = None if feats is None else jax.tree.map(lambda f: f[:B], feats)
        f_fake = None if feats is None else jax.tree.map(lambda f: f[B:], feats)
        return s_real, s_fake, f_real, f_fake

    def loss_fn(self, params, batch: Dict, rng, optimizer_idx: int = 0):
        mel = batch["mel_input"]  # [B, T_mel, C]
        y_real = batch["waveform"]  # [B, T, 1]
        y_hat_mb = self._gen_apply(params["generator"], mel)
        y_hat = self.pqmf.synthesis(y_hat_mb) if self.pqmf is not None else y_hat_mb
        # clip to the real length (transposed convs may overshoot by padding)
        T = min(y_hat.shape[1], y_real.shape[1])
        y_hat = y_hat[:, :T]
        y_real = y_real[:, :T]

        if optimizer_idx == 0:
            # ---- discriminator pass (fake detached) -------------------------
            y_hat_d = jax.lax.stop_gradient(y_hat)
            scores_real, scores_fake, _, _ = self._disc_apply_paired(
                params["discriminator"], y_real, y_hat_d, mel, rng
            )
            losses = discriminator_loss(self.config, scores_fake, scores_real)
            return losses["loss"], losses

        # ---- generator pass -------------------------------------------------
        d_params = jax.lax.stop_gradient(params["discriminator"])
        _, scores_fake, feats_real, feats_fake = self._disc_apply_paired(
            d_params, y_real, y_hat, mel, rng
        )
        y_sub = None
        if self.pqmf is not None:
            y_sub = self.pqmf.analysis(y_real)
        losses = generator_loss(
            self.gen_loss_cfg,
            y_hat=y_hat,
            y=y_real,
            scores_fake=scores_fake,
            feats_fake=feats_fake,
            feats_real=feats_real,
            y_hat_sub=y_hat_mb if self.pqmf is not None else None,
            y_sub=y_sub,
        )
        return losses["loss"], losses

    # ------------------------------------------------------------- optimizers
    def get_optimizer(self):
        from tpu_tts.train.optimizers import get_optimizer, get_scheduler

        sched_d = get_scheduler(
            getattr(self.config, "lr_scheduler_disc", None),
            getattr(self.config, "lr_scheduler_disc_params", {}) or {},
            getattr(self.config, "lr_disc", self.config.lr),
        )
        sched_g = get_scheduler(
            getattr(self.config, "lr_scheduler_gen", None),
            getattr(self.config, "lr_scheduler_gen_params", {}) or {},
            getattr(self.config, "lr_gen", self.config.lr),
        )
        opt_d = get_optimizer(self.config.optimizer, self.config.optimizer_params, None, self.config, schedule=sched_d, optimizer_idx=0)
        opt_g = get_optimizer(self.config.optimizer, self.config.optimizer_params, None, self.config, schedule=sched_g, optimizer_idx=1)
        return [opt_d, opt_g]

    # -------------------------------------------------------------- inference
    def inference(self, mel: np.ndarray) -> np.ndarray:
        """mel `[B, T, C]` (or `[T, C]`) → waveform `[B, T*hop, 1]`."""
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        fn = jax.jit(lambda p, m: self._gen_apply(p, m))
        y = fn(self.params["generator"], mel)
        if self.pqmf is not None:
            y = jax.jit(self.pqmf.synthesis)(y)
        return np.asarray(y)

    # ------------------------------------------------------------- dataloader
    def get_data_loader(self, config, assets, is_eval, samples, verbose, num_gpus, rank=0):
        from tpu_tts.vocoder.datasets.gan_dataset import GANDataset, GANDataLoader

        dataset = GANDataset(
            ap=self.ap,
            items=samples,
            seq_len=config.seq_len,
            hop_len=self.ap.hop_length,
            pad_short=config.pad_short,
            conv_pad=config.conv_pad,
            return_pairs=getattr(config, "diff_samples_for_G_and_D", False),
            is_training=not is_eval,
            use_noise_augment=config.use_noise_augment and not is_eval,
            use_cache=config.use_cache,
        )
        return GANDataLoader(
            dataset,
            batch_size=config.eval_batch_size if is_eval else config.batch_size,
            shuffle=not is_eval,
            drop_last=not is_eval,
            seed=getattr(config, "training_seed", 0),
            num_shards=num_gpus,
            shard_id=rank,
            num_workers=getattr(config, "num_eval_loader_workers" if is_eval else "num_loader_workers", 0),
        )

    @staticmethod
    def init_from_config(config, samples=None):
        from tpu_tts.audio import AudioProcessor

        ap = AudioProcessor.init_from_config(config, verbose=False)
        return GAN(config, ap=ap)
