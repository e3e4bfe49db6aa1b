"""WaveRNN: sample-level autoregressive GRU vocoder.

TPU-native re-design of /root/reference/TTS/vocoder/models/wavernn.py
(modes int/mold/gauss :228, batched folded inference with crossfade-unfold
`inference`:315 / `fold_with_overlap`:423, upsample net :82). The per-sample
Python loop becomes a `lax.scan`; long utterances are folded into a batch of
overlapping segments (the parallelism source on TPU) and cross-faded back.
"""

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.config.base import Coqpit
from tpu_tts.layers.common import Conv1d
from tpu_tts.vocoder.utils.distribution import (
    discretized_mix_logistic_loss,
    gaussian_loss,
    sample_from_discretized_mix_logistic,
    sample_from_gaussian,
)


@dataclass
class WavernnArgs(Coqpit):
    rnn_dims: int = 512
    fc_dims: int = 512
    compute_dims: int = 128
    res_out_dims: int = 128
    num_res_blocks: int = 10
    use_aux_net: bool = True
    use_upsample_net: bool = True
    upsample_factors: List[int] = field(default_factory=lambda: [4, 8, 8])
    mode: str = "mold"
    mulaw: bool = True
    pad: int = 2
    feat_dims: int = 80
    norm_type: str = "batch"  # ref wavernn.py:35 BatchNorm1d; "frozen_batch" on ingest


class MelResNet(nn.Module):
    """Aux conv resnet over mels (ref wavernn.py:35; BatchNorm1d defaults)."""

    res_out_dims: int
    compute_dims: int
    num_res_blocks: int
    pad: int
    norm_type: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from tpu_tts.layers.tacotron import _apply_norm

        k = self.pad * 2 + 1
        h = nn.Conv(self.compute_dims, (k,), padding="VALID", use_bias=False, name="conv_in")(x)
        h = nn.relu(_apply_norm(self.norm_type, self.compute_dims, "norm_in", h, train))
        for i in range(self.num_res_blocks):
            res = h
            y = nn.Conv(self.compute_dims, (1,), use_bias=False, name=f"res{i}_conv1")(h)
            y = nn.relu(_apply_norm(self.norm_type, self.compute_dims, f"res{i}_norm1", y, train))
            y = nn.Conv(self.compute_dims, (1,), use_bias=False, name=f"res{i}_conv2")(y)
            y = _apply_norm(self.norm_type, self.compute_dims, f"res{i}_norm2", y, train)
            h = y + res
        return nn.Conv(self.res_out_dims, (1,), name="conv_out")(h)


class UpsampleNetwork(nn.Module):
    """Stretch + smoothing convs, with aux resnet branch (ref wavernn.py:82)."""

    feat_dims: int
    upsample_scales: Tuple[int, ...]
    compute_dims: int
    res_out_dims: int
    num_res_blocks: int
    pad: int
    use_aux_net: bool
    norm_type: str = "batch"

    @nn.compact
    def __call__(self, m, train: bool = False):
        total_scale = int(np.prod(self.upsample_scales))
        aux = None
        if self.use_aux_net:
            aux = MelResNet(self.res_out_dims, self.compute_dims, self.num_res_blocks, self.pad,
                            norm_type=self.norm_type, name="resnet")(m, train)
            aux = jnp.repeat(aux, total_scale, axis=1)
        x = m
        for i, s in enumerate(self.upsample_scales):
            x = jnp.repeat(x, s, axis=1)
            k = 2 * s + 1
            # one shared temporal smoothing kernel across all mel channels,
            # initialized to a moving average — exactly the reference's
            # Conv2d(1, 1, (1, 2s+1), bias=False).fill_(1/k) on [B,1,C,T]
            # (ref wavernn.py:103-108)
            kern = self.param(f"smooth_{i}_kernel", nn.initializers.constant(1.0 / k), (k,))
            C = x.shape[-1]
            w = jnp.broadcast_to(kern[:, None, None], (k, 1, C)).astype(x.dtype)
            x = jax.lax.conv_general_dilated(
                x, w, (1,), [(s, s)],
                dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=C,
            )
        x = x[:, self.pad * total_scale : -self.pad * total_scale]
        return x, aux


class WavernnCell(nn.Module):
    """Per-sample computation (shared by train/inference)."""

    rnn_dims: int
    fc_dims: int
    n_classes: int
    aux_dims: int
    use_aux_net: bool

    def setup(self):
        self.I = nn.Dense(self.rnn_dims)
        self.rnn1 = nn.GRUCell(self.rnn_dims)
        self.rnn2 = nn.GRUCell(self.rnn_dims)
        self.fc1 = nn.Dense(self.fc_dims)
        self.fc2 = nn.Dense(self.fc_dims)
        self.fc3 = nn.Dense(self.n_classes)

    def __call__(self, h1, h2, x_prev, mel_t, aux_t):
        # aux routing mirrors ref wavernn.py: a1→I, a2→rnn2, a3→fc1, a4→fc2
        if self.use_aux_net:
            a1, a2, a3, a4 = jnp.split(aux_t, 4, axis=-1)
            x = jnp.concatenate([x_prev, mel_t, a1], axis=-1)
        else:
            x = jnp.concatenate([x_prev, mel_t], axis=-1)
        x = self.I(x)
        h1, o1 = self.rnn1(h1, x)
        x = x + o1
        rnn2_in = jnp.concatenate([x, a2], axis=-1) if self.use_aux_net else x
        h2, o2 = self.rnn2(h2, rnn2_in)
        x = x + o2
        if self.use_aux_net:
            x = nn.relu(self.fc1(jnp.concatenate([x, a3], axis=-1)))
            x = nn.relu(self.fc2(jnp.concatenate([x, a4], axis=-1)))
        else:
            x = nn.relu(self.fc1(x))
            x = nn.relu(self.fc2(x))
        return h1, h2, self.fc3(x)


class WavernnNet(nn.Module):
    args: tuple

    @property
    def a(self):
        return dict(self.args)

    def setup(self):
        a = self.a
        mode = a["mode"]
        if isinstance(mode, int) or (isinstance(mode, str) and mode.isdigit()):
            self.n_classes = 2 ** int(mode)
        elif mode == "mold":
            self.n_classes = 30
        elif mode == "gauss":
            self.n_classes = 2
        else:
            raise ValueError(f" [!] Unknown WaveRNN mode {mode}")
        self.aux_dims = a["res_out_dims"] // 4
        self.upsample = UpsampleNetwork(
            feat_dims=a["feat_dims"],
            upsample_scales=tuple(a["upsample_factors"]),
            compute_dims=a["compute_dims"],
            res_out_dims=a["res_out_dims"],
            num_res_blocks=a["num_res_blocks"],
            pad=a["pad"],
            use_aux_net=a["use_aux_net"],
            norm_type=a.get("norm_type", None) or "batch",
        )
        self.cell = WavernnCell(
            rnn_dims=a["rnn_dims"],
            fc_dims=a["fc_dims"],
            n_classes=self.n_classes,
            aux_dims=self.aux_dims,
            use_aux_net=a["use_aux_net"],
        )

    def __call__(self, x, mels, train: bool = False):
        """Teacher-forced: x `[B, T]` previous samples, mels `[B, T_mel, C]`
        → logits `[B, T, n_classes]`."""
        B = x.shape[0]
        mels_up, aux = self.upsample(mels, train)
        T = mels_up.shape[1]
        x = x[:, :T]
        h1 = jnp.zeros((B, self.a["rnn_dims"]))
        h2 = jnp.zeros((B, self.a["rnn_dims"]))

        def step(cell, carry, inp):
            h1, h2 = carry
            x_t, mel_t, aux_t = inp
            h1, h2, out = cell(h1, h2, x_t[:, None], mel_t, aux_t)
            return (h1, h2), out

        scan = nn.scan(
            step, variable_broadcast="params", split_rngs={"params": False}, in_axes=1, out_axes=1
        )
        aux_in = aux if aux is not None else jnp.zeros((B, T, 4))
        _, outs = scan(self.cell, (h1, h2), (x[:, :T], mels_up, aux_in))
        return outs

    def generate(self, mels, rng):
        """Free-running sampling, `[B, T_mel, C]` → `[B, T]` float samples."""
        a = self.a
        B = mels.shape[0]
        mels_up, aux = self.upsample(mels)
        T = mels_up.shape[1]
        h1 = jnp.zeros((B, a["rnn_dims"]))
        h2 = jnp.zeros((B, a["rnn_dims"]))
        x0 = jnp.zeros((B, 1))
        mode = a["mode"]

        def step(cell, carry, inp):
            h1, h2, x_prev, key = carry
            mel_t, aux_t = inp
            h1, h2, logits = cell(h1, h2, x_prev, mel_t, aux_t)
            key, sub = jax.random.split(key)
            if mode == "mold":
                sample = sample_from_discretized_mix_logistic(logits[:, None, :], sub)[:, 0]
            elif mode == "gauss":
                sample = sample_from_gaussian(logits[:, None, :], sub)[:, 0]
            else:
                cat = jax.random.categorical(sub, logits)
                n_classes = logits.shape[-1]
                sample = 2.0 * cat.astype(jnp.float32) / (n_classes - 1.0) - 1.0
            return (h1, h2, sample[:, None], key), sample

        scan = nn.scan(
            step, variable_broadcast="params", split_rngs={"params": False}, in_axes=1, out_axes=1
        )
        aux_in = aux if aux is not None else jnp.zeros((B, T, 4))
        _, samples = scan(self.cell, (h1, h2, x0, rng), (mels_up, aux_in))
        return samples


class Wavernn:
    """Orchestrator: losses + folded batched inference."""

    def __init__(self, config):
        self.config = config
        args = config.model_args or {}
        if isinstance(args, dict):
            args = WavernnArgs.from_dict(args)
        self.args = args
        self.net = WavernnNet(args=tuple(sorted(args.to_dict().items(), key=lambda kv: str(kv[0]))))
        self.params = None
        self.model_state = {}

    def init_params(self, rng):
        a = self.args
        hop = int(np.prod(a.upsample_factors))
        Tm = 2 * a.pad + 4
        mels = jnp.zeros((2, Tm, a.feat_dims))
        x = jnp.zeros((2, 4 * hop))
        variables = self.net.init(rng, x, mels)
        self.params = variables["params"]
        self.model_state = {k: v for k, v in variables.items() if k != "params"}
        return self.params

    def loss_fn(self, params, batch, rng, optimizer_idx: int = 0, model_state=None):
        x = batch["waveform_coarse"]  # [B, T] prev samples
        y = batch["waveform_target"]  # [B, T] target
        mels = batch["mel_input"]
        logits, new_state = self.net.apply(
            {"params": params, **(model_state or {})}, x, mels, train=True, mutable=["batch_stats"]
        )
        if not jax.tree_util.tree_leaves(new_state):
            new_state = model_state or {}
        mode = self.args.mode
        T = min(logits.shape[1], y.shape[1])
        if mode == "mold":
            loss = discretized_mix_logistic_loss(logits[:, :T], y[:, :T, None])
        elif mode == "gauss":
            loss = gaussian_loss(logits[:, :T], y[:, :T, None])
        else:
            n_classes = 2 ** int(mode)
            labels = jnp.clip(((y[:, :T] + 1.0) / 2.0 * (n_classes - 1)).astype(jnp.int32), 0, n_classes - 1)
            logp = jax.nn.log_softmax(logits[:, :T], axis=-1)
            loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, :, None], axis=-1))
        if model_state is None:
            return loss, {"loss": loss}
        return loss, ({"loss": loss}, new_state)

    # ---- folded inference (ref fold_with_overlap:423 / xfade_and_unfold) ----
    @staticmethod
    def fold_with_overlap(x: np.ndarray, target: int, overlap: int) -> np.ndarray:
        _, total_len, features = x.shape
        num_folds = (total_len - overlap) // (target + overlap)
        extended_len = num_folds * (overlap + target) + overlap
        remaining = total_len - extended_len
        if remaining != 0:
            num_folds += 1
            padding = target + 2 * overlap - remaining
            x = np.pad(x, [(0, 0), (0, padding), (0, 0)], mode="constant")
        folded = np.zeros((num_folds, target + 2 * overlap, features), dtype=np.float32)
        for i in range(num_folds):
            start = i * (target + overlap)
            folded[i] = x[0, start : start + target + 2 * overlap]
        return folded

    @staticmethod
    def xfade_and_unfold(y: np.ndarray, target: int, overlap: int) -> np.ndarray:
        num_folds, length = y.shape
        target = length - 2 * overlap
        total_len = num_folds * (target + overlap) + overlap
        silence_len = overlap // 2
        fade_len = overlap - silence_len
        silence = np.zeros(silence_len, dtype=np.float64)
        t = np.linspace(-1, 1, fade_len, dtype=np.float64)
        fade_in = np.sqrt(0.5 * (1 + t))
        fade_out = np.sqrt(0.5 * (1 - t))
        fade_in = np.concatenate([silence, fade_in])
        fade_out = np.concatenate([fade_out, silence])
        y = y.astype(np.float64).copy()
        y[:, :overlap] *= fade_in
        y[:, -overlap:] *= fade_out
        unfolded = np.zeros(total_len, dtype=np.float64)
        for i in range(num_folds):
            start = i * (target + overlap)
            unfolded[start : start + length] += y[i]
        return unfolded.astype(np.float32)

    def inference(
        self,
        mels: np.ndarray,
        batched: bool = True,
        target: int = 11000,
        overlap: int = 550,
        use_pallas: bool = False,
        seed: int = 0,
    ):
        from tpu_tts.audio.numpy_transforms import mulaw_decode

        a = self.args
        mels = np.asarray(mels, dtype=np.float32)
        if mels.ndim == 2:
            mels = mels[None]
        hop = int(np.prod(a.upsample_factors))
        if batched:
            t_frames = max(target // hop, 1)
            o_frames = max(overlap // hop, 1)
            mels_p = np.pad(mels, [(0, 0), (a.pad, a.pad), (0, 0)], mode="edge")
            folded = self.fold_with_overlap(mels_p, t_frames, o_frames)
            # re-add resnet pad context around each fold
            gen_in = np.pad(folded, [(0, 0), (a.pad, a.pad), (0, 0)], mode="edge")
        else:
            gen_in = np.pad(mels, [(0, 0), (2 * a.pad, 2 * a.pad), (0, 0)], mode="edge")
        if use_pallas and str(a.mode).isdigit() and a.use_aux_net:
            # fused Pallas AR kernel: upsample net runs as one parallel jit,
            # then the whole sample loop runs inside a single pallas_call
            if getattr(self, "_pallas_sampler", None) is None:
                from tpu_tts.ops.wavernn_pallas import PallasWavernnSampler

                self._pallas_sampler = PallasWavernnSampler.from_flax_params(self.params, a)
                self._pallas_sampler.interpret = jax.default_backend() != "tpu"
                self._pallas_upsample = jax.jit(
                    lambda p, st, m: self.net.apply({"params": p, **st}, m, method=lambda net, mm: net.upsample(mm))
                )
            mels_up, aux = self._pallas_upsample(self.params, self.model_state or {}, jnp.asarray(gen_in))
            samples = np.asarray(self._pallas_sampler(mels_up, aux, seed=seed))
        else:
            samples = np.asarray(
                jax.jit(lambda p, st, m, r: self.net.apply({"params": p, **st}, m, r, method=WavernnNet.generate))(
                    self.params, self.model_state or {}, jnp.asarray(gen_in), jax.random.PRNGKey(seed)
                )
            )
        if a.mulaw and str(a.mode).isdigit():
            samples = mulaw_decode(wav=samples, mulaw_qc=int(a.mode))
        if batched:
            wav = self.xfade_and_unfold(samples, t_frames * hop, o_frames * hop)
            wav = wav[: mels.shape[1] * hop]
        else:
            wav = samples[0][: mels.shape[1] * hop]
        return wav

    def get_data_loader(self, config, assets, is_eval, samples, verbose, num_gpus, rank=0):
        """ref wavernn.py:622 get_data_loader → WaveRNNDataset."""
        from tpu_tts.audio.processor import AudioProcessor
        from tpu_tts.vocoder.datasets.wavernn_dataset import WaveRNNDataLoader, WaveRNNDataset

        ap = getattr(self, "ap", None) or AudioProcessor.init_from_config(config)
        dataset = WaveRNNDataset(
            ap=ap,
            items=samples,
            seq_len=config.seq_len,
            hop_len=ap.hop_length,
            pad=self.args.pad,
            mode=self.args.mode,
            mulaw=self.args.mulaw,
            is_training=not is_eval,
            seed=getattr(config, "training_seed", 0),
        )
        return WaveRNNDataLoader(
            dataset,
            batch_size=config.eval_batch_size if is_eval else config.batch_size,
            shuffle=not is_eval,
            drop_last=not is_eval,
            seed=getattr(config, "training_seed", 0),
            num_shards=num_gpus,
            shard_id=rank,
            num_workers=getattr(config, "num_eval_loader_workers" if is_eval else "num_loader_workers", 0),
        )

    def convert_torch_state_dict(self, state_dict):
        """Reference `Wavernn` torch weights → our flax tree (parity-tested
        in tests/test_torch_parity_wavernn.py). Switches the net to the
        `frozen_batch` norm variant (running stats folded into params)."""
        from tpu_tts.vocoder.models.vocoder_convert import convert_wavernn_state_dict

        if self.args.norm_type != "frozen_batch":
            self.args.norm_type = "frozen_batch"
            self.net = WavernnNet(
                args=tuple(sorted(self.args.to_dict().items(), key=lambda kv: str(kv[0])))
            )
            self._pallas_sampler = None
        return convert_wavernn_state_dict(state_dict)

    # ---- trainer contract (driven by tpu_tts.train.Trainer) ----
    def num_optimizers(self):
        return 1

    def get_optimizer(self):
        from tpu_tts.train.optimizers import get_optimizer

        return get_optimizer(
            self.config.optimizer, self.config.optimizer_params or {}, self.config.lr, self.config
        )

    def get_scheduler(self):
        from tpu_tts.train.optimizers import get_scheduler

        return get_scheduler(
            getattr(self.config, "lr_scheduler", None),
            getattr(self.config, "lr_scheduler_params", None) or {},
            self.config.lr,
        )

    def load_checkpoint(self, config, checkpoint_path, eval=True, strict=True, cache=False):
        from tpu_tts.models.base_tts import BaseTTSModel

        return BaseTTSModel.load_checkpoint(self, config, checkpoint_path, eval=eval, strict=strict, cache=cache)

    def load_torch_checkpoint(self, checkpoint_path):
        from tpu_tts.models.base_tts import BaseTTSModel

        return BaseTTSModel.load_torch_checkpoint(self, checkpoint_path)

    @staticmethod
    def init_from_config(config, samples=None):
        return Wavernn(config)
