"""WaveGrad diffusion vocoder (flax).

Mirror of /root/reference/TTS/vocoder/models/wavegrad.py (UBlock/DBlock/FiLM
from layers/wavegrad.py; noise schedule :147-177; iterative inference :127).
The denoising loop is a `lax.fori_loop` over the noise schedule — fully
on-device.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.config.base import Coqpit
from tpu_tts.layers.common import Conv1d


@dataclass
class WavegradArgs(Coqpit):
    in_channels: int = 80
    out_channels: int = 1
    use_weight_norm: bool = False
    y_conv_channels: int = 32
    x_conv_channels: int = 768
    dblock_out_channels: List[int] = field(default_factory=lambda: [128, 128, 256, 512])
    ublock_out_channels: List[int] = field(default_factory=lambda: [512, 512, 256, 128, 128])
    upsample_factors: List[int] = field(default_factory=lambda: [4, 4, 4, 2, 2])
    upsample_dilations: List[List[int]] = field(
        default_factory=lambda: [[1, 2, 1, 2], [1, 2, 1, 2], [1, 2, 4, 8], [1, 2, 4, 8], [1, 2, 4, 8]]
    )


def positional_encoding_wavegrad(x, noise_level):
    """Noise-level + time positional conditioning (ref layers/wavegrad.py:15):
    `x + noise_level + pe/5000` with the classic sin/cos table over time."""
    B, T, C = x.shape
    div = jnp.power(10000.0, jnp.arange(0, C, 2, dtype=jnp.float32) / C)  # [C/2]
    pos = jnp.arange(T, dtype=jnp.float32)[:, None]
    pe = jnp.stack([jnp.sin(pos / div), jnp.cos(pos / div)], axis=-1).reshape(T, -1)[:, :C]
    return x + noise_level[:, None, None] + pe[None] / 5000.0


class FiLM(nn.Module):
    """shift/scale conditioning (ref layers/wavegrad.py:40): input conv keeps
    the input width; the reference's single `output_conv` (2·out channels,
    chunked) is stored as separate shift/scale convs — the converter splits
    the torch tensor rows."""

    out_channels: int

    @nn.compact
    def __call__(self, x, noise_scale):
        cin = x.shape[-1]
        h = Conv1d(cin, 3, name="input_conv")(x)
        h = jax.nn.leaky_relu(h, 0.2)
        h = positional_encoding_wavegrad(h, noise_scale)
        shift = Conv1d(self.out_channels, 3, name="shift_conv")(h)
        scale = Conv1d(self.out_channels, 3, name="scale_conv")(h)
        return shift, scale


def _film_shift_scale(x, shift, scale):
    return scale * x + shift


class DBlock(nn.Module):
    out_channels: int
    factor: int

    @nn.compact
    def __call__(self, x):
        res = Conv1d(self.out_channels, 1, name="res_conv")(x[:, :: self.factor])
        h = x[:, :: self.factor]
        for i, d in enumerate((1, 2, 4)):
            h = jax.nn.leaky_relu(h, 0.2)
            h = Conv1d(self.out_channels, 3, dilation=d, name=f"conv_{i}")(h)
        return h + res


class UBlock(nn.Module):
    out_channels: int
    factor: int
    dilations: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, shift, scale):
        up = jnp.repeat(x, self.factor, axis=1)
        res = Conv1d(self.out_channels, 1, name="res_conv")(up)
        h = jax.nn.leaky_relu(up, 0.2)
        h = Conv1d(self.out_channels, 3, dilation=self.dilations[0], name="conv_0")(h)
        h = _film_shift_scale(h, shift, scale)
        h = jax.nn.leaky_relu(h, 0.2)
        h = Conv1d(self.out_channels, 3, dilation=self.dilations[1], name="conv_1")(h)
        h = h + res
        res2 = h
        h = _film_shift_scale(h, shift, scale)
        h = jax.nn.leaky_relu(h, 0.2)
        h = Conv1d(self.out_channels, 3, dilation=self.dilations[2], name="conv_2")(h)
        h = _film_shift_scale(h, shift, scale)
        h = jax.nn.leaky_relu(h, 0.2)
        h = Conv1d(self.out_channels, 3, dilation=self.dilations[3], name="conv_3")(h)
        return h + res2


class WavegradNet(nn.Module):
    args: tuple

    @property
    def a(self):
        return dict(self.args)

    @nn.compact
    def __call__(self, y_noisy, spectrogram, noise_scale):
        """y_noisy `[B, T, 1]`, spectrogram `[B, T_mel, C]`, noise_scale `[B]`
        → predicted noise `[B, T, 1]`."""
        a = self.a
        dblock_out = list(a["dblock_out_channels"])
        ublock_out = list(a["ublock_out_channels"])
        factors = list(a["upsample_factors"])
        dilations = [tuple(d) for d in a["upsample_dilations"]]

        # downsample path over the noisy audio; FiLM out-channels follow the
        # reversed ublock widths (ref wavegrad.py:84-88)
        film_out = list(reversed(ublock_out))
        x = Conv1d(a["y_conv_channels"], 5, name="y_conv")(y_noisy)
        shift_and_scale = [FiLM(film_out[0], name="film_0")(x, noise_scale)]
        d_factors = list(reversed(factors[1:]))  # 4 dblocks
        h = x
        for i, (oc, df) in enumerate(zip(dblock_out, d_factors)):
            h = DBlock(oc, df, name=f"dblock_{i}")(h)
            shift_and_scale.append(FiLM(film_out[i + 1], name=f"film_{i+1}")(h, noise_scale))

        # upsample path over the mel
        z = Conv1d(a["x_conv_channels"], 3, name="x_conv")(spectrogram)
        for i, (oc, uf, ud) in enumerate(zip(ublock_out, factors, dilations)):
            shift, scale = shift_and_scale[len(ublock_out) - 1 - i]
            z = UBlock(oc, uf, ud, name=f"ublock_{i}")(z, shift, scale)
        return Conv1d(a["out_channels"], 3, name="out_conv")(z)


class Wavegrad:
    """Orchestrator: noise schedule + diffusion train/inference loops."""

    def __init__(self, config):
        self.config = config
        args = config.model_args if "model_args" in config and config.model_args else WavegradArgs()
        if isinstance(args, dict):
            args = WavegradArgs.from_dict(args)
        self.args = args
        self.net = WavegradNet(args=tuple(sorted(args.to_dict().items(), key=lambda kv: str(kv[0]))))
        self.params = None
        self.compute_noise_level(
            np.linspace(
                config.train_noise_schedule["min_val"],
                config.train_noise_schedule["max_val"],
                config.train_noise_schedule["num_steps"],
            )
            if "train_noise_schedule" in config and config.train_noise_schedule
            else np.linspace(1e-6, 1e-2, 1000)
        )

    def compute_noise_level(self, beta: np.ndarray):
        """(ref wavegrad.py:160)."""
        self.num_steps = len(beta)
        alpha = 1 - beta
        alpha_hat = np.cumprod(alpha)
        self.beta = jnp.asarray(beta, dtype=jnp.float32)
        self.alpha = jnp.asarray(alpha, dtype=jnp.float32)
        self.alpha_hat = jnp.asarray(alpha_hat, dtype=jnp.float32)
        self.noise_level = jnp.asarray(alpha_hat**0.5, dtype=jnp.float32)
        self.c1 = 1 / self.alpha**0.5
        self.c2 = (1 - self.alpha) / (1 - self.alpha_hat) ** 0.5
        self.sigma = jnp.asarray(
            ((1.0 - alpha_hat[:-1]) / (1.0 - alpha_hat[1:]) * beta[1:]) ** 0.5, dtype=jnp.float32
        )

    def init_params(self, rng):
        B, Tm = 2, 8
        hop = int(np.prod(self.args.upsample_factors))
        y = jnp.zeros((B, Tm * hop, 1))
        c = jnp.zeros((B, Tm, self.args.in_channels))
        self.params = self.net.init(rng, y, c, jnp.ones((B,)))["params"]
        return self.params

    def compute_y_n(self, rng, y_0):
        """Sample noisy audio at a random schedule point (ref :147)."""
        B = y_0.shape[0]
        r1, r2, r3 = jax.random.split(rng, 3)
        s = jax.random.randint(r1, (B,), 0, self.num_steps - 1)
        l_a, l_b = self.noise_level[s], self.noise_level[s + 1]
        noise_scale = l_a + jax.random.uniform(r2, (B,)) * (l_b - l_a)
        noise = jax.random.normal(r3, y_0.shape)
        noisy = noise_scale[:, None, None] * y_0 + (1.0 - noise_scale[:, None, None] ** 2) ** 0.5 * noise
        return noise, noisy, noise_scale

    def loss_fn(self, params, batch, rng, optimizer_idx: int = 0):
        """L1 between true and predicted noise."""
        y = batch["waveform"]
        mel = batch["mel_input"]
        noise, y_noisy, noise_scale = self.compute_y_n(rng, y)
        noise_hat = self.net.apply({"params": params}, y_noisy, mel, noise_scale)
        loss = jnp.mean(jnp.abs(noise.astype(jnp.float32) - noise_hat.astype(jnp.float32)))
        return loss, {"loss": loss}

    def inference(self, mel, rng=None, y_n=None):
        """Iterative denoising from the stored schedule (ref :127)."""
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        hop = int(np.prod(self.args.upsample_factors))
        B, Tm, _ = mel.shape
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if y_n is None:
            y_n = jax.random.normal(rng, (B, Tm * hop, 1))
        sqrt_alpha_hat = self.noise_level

        def body(i, y):
            n = self.num_steps - 1 - i
            eps = self.net.apply({"params": self.params}, y, mel, jnp.full((B,), sqrt_alpha_hat[n]))
            y = self.c1[n] * (y - self.c2[n] * eps)
            z = jax.random.normal(jax.random.fold_in(rng, i), y.shape)
            y = jnp.where(n > 0, y + self.sigma[jnp.maximum(n - 1, 0)] * z, y)
            return jnp.clip(y, -1.0, 1.0)

        y = jax.lax.fori_loop(0, self.num_steps, body, y_n)
        return np.asarray(y)

    def get_data_loader(self, config, assets, is_eval, samples, verbose, num_gpus, rank=0):
        """ref wavegrad.py:318 get_data_loader → WaveGradDataset."""
        from tpu_tts.audio.processor import AudioProcessor
        from tpu_tts.vocoder.datasets.wavegrad_dataset import WaveGradDataLoader, WaveGradDataset

        ap = getattr(self, "ap", None) or AudioProcessor.init_from_config(config)
        dataset = WaveGradDataset(
            ap=ap,
            items=samples,
            seq_len=config.seq_len,
            hop_len=ap.hop_length,
            pad_short=config.pad_short,
            conv_pad=config.conv_pad,
            is_training=not is_eval,
            use_noise_augment=config.use_noise_augment and not is_eval,
            use_cache=config.use_cache,
            seed=getattr(config, "training_seed", 0),
        )
        return WaveGradDataLoader(
            dataset,
            batch_size=config.eval_batch_size if is_eval else config.batch_size,
            shuffle=not is_eval,
            drop_last=not is_eval,
            seed=getattr(config, "training_seed", 0),
            num_shards=num_gpus,
            shard_id=rank,
            num_workers=getattr(config, "num_eval_loader_workers" if is_eval else "num_loader_workers", 0),
        )

    # ------------------------------------------------------- torch ingest
    def convert_torch_state_dict(self, state_dict):
        from tpu_tts.vocoder.models.vocoder_convert import convert_wavegrad_state_dict

        return convert_wavegrad_state_dict(state_dict)

    def load_checkpoint(self, config, checkpoint_path, eval=True, strict=True, cache=False):
        """Orbax dir or reference torch `.pth` (same contract as
        BaseTTSModel.load_checkpoint)."""
        from tpu_tts.models.base_tts import BaseTTSModel

        return BaseTTSModel.load_checkpoint(self, config, checkpoint_path, eval=eval, strict=strict, cache=cache)

    def load_torch_checkpoint(self, checkpoint_path):
        from tpu_tts.models.base_tts import BaseTTSModel

        return BaseTTSModel.load_torch_checkpoint(self, checkpoint_path)

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

    @staticmethod
    def init_from_config(config, samples=None):
        return Wavegrad(config)
