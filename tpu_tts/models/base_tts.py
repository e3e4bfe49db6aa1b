"""Base class for acoustic models — the trainer-facing contract.

JAX re-design of /root/reference/TTS/model.py:11 (`BaseTrainerModel`) and
/root/reference/TTS/tts/models/base_tts.py:24 (`BaseTTS`): the model object is
a *host-side orchestrator* holding a pure flax module (`self.net`), while every
compute-path method (`loss_fn`, `inference_fn`) is a pure function of
(params, batch, rng) suitable for `jax.value_and_grad` under `pjit`.

Contract consumed by tpu_tts.train.Trainer (SURVEY.md §1.2):
- `init_params(rng)`, `loss_fn(params, batch, rng, optimizer_idx)` (pure)
- `get_optimizer() / get_lr() / get_scheduler()`
- `get_data_loader(...)`, `format_batch(batch)` (host), on-device featurization
  inside `loss_fn` itself (the jit boundary replaces `format_batch_on_device`)
- `inference(...)`, `load_checkpoint(...)`, `init_from_config(...)`
- logging hooks `train_log/eval_log/test_run`
"""

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BaseTTSModel:
    """Orchestrator base: config + audio processor + tokenizer + managers."""

    def __init__(self, config, ap=None, tokenizer=None, speaker_manager=None, language_manager=None):
        self.config = config
        self.ap = ap
        self.tokenizer = tokenizer
        self.speaker_manager = speaker_manager
        self.language_manager = language_manager
        self.net = None  # flax module, set by subclass
        self.params = None  # current parameter pytree (host-side convenience)
        # non-parameter collections (e.g. BatchNorm `batch_stats`), threaded
        # through the trainer step explicitly — see Trainer._make_step_fn
        self.model_state: Dict = {}

    # ------------------------------------------------------------------ setup
    @property
    def num_speakers(self) -> int:
        if self.speaker_manager is not None:
            return self.speaker_manager.num_speakers
        return getattr(self.config, "num_speakers", 0) or 0

    def get_aux_input(self, **kwargs) -> Dict:
        return {"speaker_id": None, "style_wav": None, "d_vector": None, "language_id": None}

    # ------------------------------------------------- gradual training (r)
    def set_r(self, new_r: int):
        """Switch the decoder reduction factor without re-initializing params:
        tacotron-family nets size their frame projections for `r_init` and
        slice to the active `r` (ref layers/tacotron/tacotron2.py `set_r`).
        Triggers a re-trace on the next jit."""
        if not hasattr(self.net, "r"):
            raise AttributeError(f"{type(self).__name__} has no reduction factor")
        if new_r > (getattr(self.net, "r_init", 0) or self.net.r):
            raise ValueError(f"new r={new_r} exceeds r_init={getattr(self.net, 'r_init', self.net.r)}")
        self.net = self.net.clone(r=int(new_r))
        self._infer_cache = {}

    def on_epoch_start(self, trainer) -> bool:
        """Gradual-training schedule `[[step, r, batch_size], ...]` (ref
        base_tacotron.py on_epoch_start + utils/training.py:33). Returns True
        when the trainer must rebuild its jitted steps / data loader."""
        gt = getattr(self.config, "gradual_training", None)
        if not gt:
            return False
        from tpu_tts.train.training import gradual_training_scheduler

        new_r, new_bs = gradual_training_scheduler(trainer.total_steps_done, self.config)
        changed = False
        if new_bs and new_bs != self.config.batch_size:
            self.config.batch_size = int(new_bs)
            changed = True
        if new_r and new_r != self.net.r:
            self.set_r(new_r)
            print(f" > Gradual training: r={new_r}, batch_size={new_bs}")
            changed = True
        return changed

    def on_init_start(self, trainer):
        """Persist `speakers.pth` / `language_ids.json` next to the run config
        and point the config at them (ref tts/models/base_tts.py:420-441), so a
        checkpoint directory is self-contained for later synthesis."""
        import os

        if self.speaker_manager is not None and self.speaker_manager.name_to_id:
            path = os.path.join(trainer.output_path, "speakers.pth")
            self.speaker_manager.save_ids_to_file(path)
            if trainer.config.has("speakers_file"):
                trainer.config.speakers_file = path
            if trainer.config.has("model_args") and trainer.config.model_args.has("speakers_file"):
                trainer.config.model_args.speakers_file = path
            print(f" > `speakers.pth` saved to {path}.", flush=True)
        if self.language_manager is not None and self.language_manager.name_to_id:
            path = os.path.join(trainer.output_path, "language_ids.json")
            self.language_manager.save_ids_to_file(path)
            if trainer.config.has("language_ids_file"):
                trainer.config.language_ids_file = path
            if trainer.config.has("model_args") and trainer.config.model_args.has("language_ids_file"):
                trainer.config.model_args.language_ids_file = path
            print(f" > `language_ids.json` saved to {path}.", flush=True)

    # ------------------------------------------------------------- pure fns
    def init_params(self, rng: jax.Array):
        raise NotImplementedError

    def loss_fn(self, params, batch: Dict, rng: jax.Array, optimizer_idx: int = 0) -> Tuple[jnp.ndarray, Dict]:
        """Pure loss: returns (scalar loss, dict of scalar logs). Subclasses
        implement; must be jit/grad-safe (static shapes, no host calls)."""
        raise NotImplementedError

    def num_optimizers(self) -> int:
        return 1

    # --------------------------------------------------------------- trainer
    def get_optimizer(self):
        from tpu_tts.train.optimizers import get_optimizer

        return get_optimizer(
            self.config.optimizer, self.config.optimizer_params or {}, self.config.lr, self.config
        )

    def get_lr(self):
        return self.config.lr

    def get_scheduler(self):
        from tpu_tts.train.optimizers import get_scheduler

        return get_scheduler(self.config.lr_scheduler, self.config.lr_scheduler_params or {}, self.config.lr)

    def get_criterion(self):
        return None

    def get_sampler(self, config, dataset, num_gpus=1):
        return None

    def get_data_loader(self, config, assets, is_eval, samples, verbose, num_gpus, rank=0):
        from tpu_tts.data.dataset import TTSDataset, TTSDataLoader

        dataset = TTSDataset(
            outputs_per_step=getattr(config, "r", 1),
            compute_linear_spec=getattr(config, "compute_linear_spec", False),
            compute_f0=getattr(config, "compute_f0", False),
            f0_cache_path=getattr(config, "f0_cache_path", None),
            compute_energy=getattr(config, "compute_energy", False),
            energy_cache_path=getattr(config, "energy_cache_path", None),
            samples=samples,
            ap=self.ap,
            return_wav=getattr(config, "return_wav", False),
            batch_group_size=0 if is_eval else config.batch_group_size * config.batch_size,
            min_text_len=config.min_text_len,
            max_text_len=config.max_text_len,
            min_audio_len=config.min_audio_len,
            max_audio_len=config.max_audio_len,
            phoneme_cache_path=config.phoneme_cache_path,
            precompute_num_workers=config.precompute_num_workers,
            use_noise_augment=False if is_eval else config.use_noise_augment,
            use_attn_prior=getattr(config, "use_attn_priors", False),
            attn_prior_cache_path=getattr(config, "attn_prior_cache_path", None),
            speaker_id_mapping=(self.speaker_manager.name_to_id if self.speaker_manager else None),
            d_vector_mapping=(
                self.speaker_manager.embeddings_by_names()
                if self.speaker_manager and getattr(self.config, "use_d_vector_file", False)
                else None
            ),
            language_id_mapping=(self.language_manager.name_to_id if self.language_manager else None),
            tokenizer=self.tokenizer,
            start_by_longest=config.start_by_longest,
        )
        dataset.preprocess_samples()
        weights = None if is_eval else self._sampler_weights(config, dataset.samples)
        return TTSDataLoader(
            dataset,
            batch_size=config.eval_batch_size if is_eval else config.batch_size,
            shuffle=not is_eval and config.shuffle,
            drop_last=not is_eval,
            seed=getattr(config, "training_seed", 0),
            weights=weights,
            num_shards=num_gpus,  # per-PROCESS batch slicing (ref DistributedSampler)
            shard_id=rank,
            num_workers=getattr(config, "num_eval_loader_workers" if is_eval else "num_loader_workers", 0),
        )

    @staticmethod
    def _sampler_weights(config, samples):
        """Compose speaker/language/length balancer weights
        (ref base_tts.get_sampler weighted-sampler stack)."""
        import numpy as np

        from tpu_tts.managers import (
            get_language_balancer_weights,
            get_length_balancer_weights,
            get_speaker_balancer_weights,
        )

        weights = None
        if getattr(config, "use_speaker_weighted_sampler", False):
            w = get_speaker_balancer_weights(samples) * config.speaker_weighted_sampler_alpha
            weights = w if weights is None else weights + w
        if getattr(config, "use_language_weighted_sampler", False):
            w = get_language_balancer_weights(samples) * config.language_weighted_sampler_alpha
            weights = w if weights is None else weights + w
        if getattr(config, "use_length_weighted_sampler", False):
            alpha = getattr(config, "length_weighted_sampler_alpha", 1.0)
            w = get_length_balancer_weights(samples) * alpha
            weights = w if weights is None else weights + w
        return weights

    def format_batch(self, batch: Dict) -> Dict:
        """Host-side batch formatting; arrays stay numpy until the jit call."""
        return batch

    # --------------------------------------------------------------- logging
    def train_log(self, batch, outputs, logger, assets, steps):
        pass

    def eval_log(self, batch, outputs, logger, assets, steps):
        pass

    def test_run(self, params, assets) -> Tuple[Dict, Dict]:
        return {}, {}

    # ------------------------------------------------------------ checkpoint
    def load_checkpoint(self, config, checkpoint_path, eval=True, strict=True, cache=False):
        """Load an orbax checkpoint dir, or a reference torch `.pth` when the
        model implements `convert_torch_state_dict` (ref io.py:load_fsspec)."""
        if str(checkpoint_path).endswith((".pth", ".pth.tar", ".pt")):
            return self.load_torch_checkpoint(checkpoint_path)
        from tpu_tts.train.checkpoint import load_checkpoint as _load

        state = _load(checkpoint_path)
        self.params = state["model"]
        if "model_state" in state:
            self.model_state = state["model_state"]
        return state

    def load_torch_checkpoint(self, checkpoint_path):
        """Ingest a reference torch checkpoint via the model's converter."""
        convert = getattr(self, "convert_torch_state_dict", None)
        if convert is None:
            raise NotImplementedError(
                f"{type(self).__name__} has no torch checkpoint converter yet"
            )
        from tpu_tts.train.torch_convert import load_torch_checkpoint

        ckpt = load_torch_checkpoint(checkpoint_path)
        sd = ckpt.get("torch_state_dict")
        if sd is None:  # flat state dict file
            sd = {k: v for k, v in ckpt.items() if hasattr(v, "shape")}
        params = convert(sd)
        import jax

        if not any(hasattr(x, "shape") for x in jax.tree_util.tree_leaves(params)):
            raise ValueError(
                f"converting {checkpoint_path} produced an empty parameter tree "
                f"({len(sd)} source tensors) — wrong model type for this checkpoint?"
            )
        self.params = params
        return ckpt

    @staticmethod
    def init_from_config(config, samples=None):
        raise NotImplementedError
