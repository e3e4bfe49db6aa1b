"""Neural-HMM TTS (and the OverFlow base): probabilistic HMM decoder with
autoregressive emission, trained by exact NLL via the scaled forward
algorithm.

TPU-native re-design of /root/reference/TTS/tts/models/neuralhmm_tts.py (385)
+ layers/overflow/neural_hmm.py (NeuralHMM:14, forward algorithm :119-156,
TransitionModel:483, EmissionModel:519). The per-frame forward recursion is a
`lax.scan` carrying (log-alpha over text states, AR memory LSTM state);
sampling inference is a second scan with stochastic state advancement.
"""

import os
from dataclasses import dataclass, field
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.config.base import Coqpit
from tpu_tts.layers.tacotron import Prenet, Tacotron2Encoder
from tpu_tts.models.base_tts import BaseTTSModel
from tpu_tts.ops.helpers import sequence_mask

LOG_EPS = -1e4


def _load_statistics(path: str) -> Dict:
    """Load mel statistics; supports the reference's torch .pt files
    (e.g. recipes/ljspeech/overflow/lj_parameters.pt) and json."""
    if path.endswith(".pt") or path.endswith(".pth"):
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        return {k: float(v) for k, v in raw.items()}
    import json

    with open(path) as f:
        return json.load(f)


def _save_statistics(path: str, stats: Dict) -> None:
    if path.endswith(".pt") or path.endswith(".pth"):
        import torch

        torch.save({k: float(v) for k, v in stats.items()}, path)
        return
    import json

    with open(path, "w") as f:
        json.dump(stats, f)


@dataclass
class NeuralhmmTTSArgs(Coqpit):
    num_chars: Optional[int] = None
    out_channels: int = 80
    encoder_dim: int = 512
    state_per_phone: int = 2
    prenet_dims: tuple = (256, 256)
    memory_rnn_dim: int = 1024
    outputnet_size: tuple = (1024,)
    flat_start_params: dict = field(default_factory=lambda: {"mean": 0.0, "std": 1.0, "transition_p": 0.14})
    std_floor: float = 0.001
    use_grad_checkpointing: bool = True
    deterministic_transition: bool = True
    duration_threshold: float = 0.43
    max_sampling_time: int = 1000


class NeuralHMMDecoder(nn.Module):
    """AR memory + per-state emission/transition nets + forward algorithm."""

    frame_channels: int
    encoder_dim: int
    prenet_dims: tuple
    memory_rnn_dim: int
    outputnet_size: tuple
    std_floor: float = 0.001

    def setup(self):
        self.prenet = Prenet(self.prenet_dims, dropout_at_inference=False)
        self.memory_rnn = nn.OptimizedLSTMCell(self.memory_rnn_dim)
        layers = []
        for d in self.outputnet_size:
            layers.append(nn.Dense(d))
        self.hidden_layers = layers
        self.out_layer = nn.Dense(2 * self.frame_channels + 1)

    def _outputs(self, h_memory, states):
        """h_memory `[B, H]`, states `[B, T_en, E]` →
        (mean `[B,T_en,C]`, std `[B,T_en,C]`, transition logit `[B,T_en]`)."""
        h = jnp.concatenate(
            [jnp.broadcast_to(h_memory[:, None, :], states.shape[:2] + (h_memory.shape[-1],)), states], axis=-1
        )
        for layer in self.hidden_layers:
            h = nn.relu(layer(h))
        out = self.out_layer(h)
        C = self.frame_channels
        mean = out[..., :C]
        std = jax.nn.softplus(out[..., C : 2 * C]) + self.std_floor
        trans = out[..., 2 * C]
        return mean, std, trans

    @staticmethod
    def _emission_logp(y_t, mean, std):
        """N(y_t | mean_j, std_j) summed over channels → `[B, T_en]`."""
        var = std**2
        logp = -0.5 * (jnp.log(2 * np.pi * var) + (y_t[:, None, :] - mean) ** 2 / var)
        return jnp.sum(logp, axis=-1)

    def __call__(self, states, state_mask, mels, mel_lengths, train: bool = True):
        """Forward NLL. states `[B, T_en, E]`, mels `[B, T_de, C]` → scalar
        per-sample log-likelihood `[B]` plus per-frame log-alphas."""
        B, T_en, _ = states.shape
        T_de = mels.shape[1]
        go = jnp.zeros((B, self.frame_channels))
        mem_carry = self.memory_rnn.initialize_carry(jax.random.PRNGKey(0), (B, 1))
        log_alpha0 = jnp.full((B, T_en), LOG_EPS)
        log_alpha0 = log_alpha0.at[:, 0].set(0.0)
        frames_in = jnp.concatenate([go[:, None], mels[:, :-1]], axis=1)  # AR inputs

        def step(cell, carry, inp):
            mem_carry, log_alpha, first = carry
            y_prev, y_t, t = inp
            mem_carry, h_mem = cell.memory_rnn(mem_carry, cell.prenet(y_prev, train=train))
            mean, std, trans = cell._outputs(h_mem, states)
            log_p = jax.nn.log_sigmoid(trans)
            log_1mp = jax.nn.log_sigmoid(-trans)
            emit = cell._emission_logp(y_t, mean, std)
            emit = jnp.where(state_mask, emit, LOG_EPS)
            stay = log_alpha + jnp.where(state_mask, log_1mp, LOG_EPS)
            adv = (
                jnp.concatenate([jnp.full((B, 1), LOG_EPS), log_alpha[:, :-1] + log_p[:, :-1]], axis=1)
            )
            new_alpha = jnp.logaddexp(stay, adv) + emit
            # normalize (scaled forward) for stability
            norm = jax.nn.logsumexp(new_alpha, axis=1, keepdims=True)
            new_alpha = new_alpha - norm
            valid = (t < mel_lengths)[:, None]
            log_alpha = jnp.where(valid, new_alpha, log_alpha)
            ll_inc = jnp.where(valid[:, 0], norm[:, 0], 0.0)
            return (mem_carry, log_alpha, False), (ll_inc, log_alpha)

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=((1, 1, 0),),
            out_axes=(1, 1),
        )
        ts = jnp.arange(T_de)
        (mem_carry, log_alpha_T, _), (ll_incs, alphas) = scan(
            self, (mem_carry, log_alpha0, True), (frames_in, mels, ts)
        )
        # final: mass in the last valid state
        last_state = jnp.sum(state_mask, axis=1).astype(jnp.int32) - 1
        final_logp = jnp.take_along_axis(log_alpha_T, last_state[:, None], axis=1)[:, 0]
        log_likelihood = jnp.sum(ll_incs, axis=1) + final_logp
        return log_likelihood, alphas

    def sample(self, states, state_mask, max_steps: int, rng, sampling_temp: float = 0.0,
               duration_threshold: float = 0.43):
        """Deterministic-threshold (or sampled) generation scan."""
        B, T_en, _ = states.shape
        go = jnp.zeros((B, self.frame_channels))
        mem_carry = self.memory_rnn.initialize_carry(jax.random.PRNGKey(0), (B, 1))
        last_state = jnp.sum(state_mask, axis=1).astype(jnp.int32) - 1

        def step(cell, carry, key):
            mem_carry, state_idx, prev_frame, done = carry
            mem_carry, h_mem = cell.memory_rnn(mem_carry, cell.prenet(prev_frame, train=False))
            mean, std, trans = cell._outputs(h_mem, states)
            sel = jax.nn.one_hot(state_idx, T_en)
            mu = jnp.einsum("bt,btc->bc", sel, mean)
            sd = jnp.einsum("bt,btc->bc", sel, std)
            p = jnp.einsum("bt,bt->b", sel, jax.nn.sigmoid(trans))
            noise = jax.random.normal(key, mu.shape) * sampling_temp
            frame = mu + noise * sd
            advance = p > duration_threshold
            new_idx = jnp.minimum(state_idx + advance.astype(jnp.int32), T_en - 1)
            new_done = done | (advance & (state_idx >= last_state))
            valid = (~done).astype(frame.dtype)[:, None]
            return (mem_carry, new_idx, frame, new_done), (frame * valid, state_idx, valid[:, 0])

        keys = jax.random.split(rng, max_steps)
        scan = nn.scan(
            step, variable_broadcast="params", split_rngs={"params": False, "dropout": True},
            in_axes=0, out_axes=1,
        )
        init = (mem_carry, jnp.zeros((B,), dtype=jnp.int32), go, jnp.zeros((B,), dtype=bool))
        _, (frames, state_trace, valid) = scan(self, init, keys)
        lengths = jnp.sum(valid, axis=1).astype(jnp.int32)
        return frames, state_trace, lengths


class NeuralhmmTTSNet(nn.Module):
    args: tuple

    @property
    def a(self):
        return dict(self.args)

    def setup(self):
        a = self.a
        self.emb = nn.Embed(a["num_chars"], a["encoder_dim"])
        self.encoder = Tacotron2Encoder(a["encoder_dim"])
        self.state_expand = nn.Dense(a["encoder_dim"])
        self.hmm = NeuralHMMDecoder(
            frame_channels=a["out_channels"],
            encoder_dim=a["encoder_dim"],
            prenet_dims=tuple(a["prenet_dims"]),
            memory_rnn_dim=a["memory_rnn_dim"],
            outputnet_size=tuple(a["outputnet_size"]),
            std_floor=a["std_floor"],
        )

    def _states(self, text, text_lengths, train):
        """Encode text then duplicate each phone into `state_per_phone` states."""
        a = self.a
        x_mask = sequence_mask(text_lengths, text.shape[1]).astype(jnp.float32)[:, :, None]
        enc = self.encoder(self.emb(text), x_mask, train=train)
        spp = a["state_per_phone"]
        if spp > 1:
            enc = jnp.repeat(enc, spp, axis=1)
        states = self.state_expand(enc)
        state_mask = jnp.repeat(x_mask[:, :, 0], spp, axis=1) > 0 if spp > 1 else x_mask[:, :, 0] > 0
        return states, state_mask

    def __call__(self, text, text_lengths, mels, mel_lengths, train: bool = True) -> Dict:
        states, state_mask = self._states(text, text_lengths, train)
        ll, alphas = self.hmm(states, state_mask, mels, mel_lengths, train=train)
        nll = -jnp.mean(ll / mel_lengths.astype(jnp.float32))
        return {"log_likelihood": ll, "nll": nll, "alignments": alphas}

    def inference(self, text, text_lengths, max_steps: int, sampling_temp: float = 0.0,
                  duration_threshold: float = 0.43, rng=None) -> Dict:
        states, state_mask = self._states(text, text_lengths, False)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        frames, trace, lengths = self.hmm.sample(
            states, state_mask, max_steps, rng, sampling_temp, duration_threshold
        )
        return {"model_outputs": frames, "states": trace, "y_lengths": lengths}


class NeuralhmmTTS(BaseTTSModel):
    def __init__(self, config, ap=None, tokenizer=None, speaker_manager=None):
        super().__init__(config, ap, tokenizer, speaker_manager)
        args = config.model_args
        if isinstance(args, dict):
            args = NeuralhmmTTSArgs.from_dict(args)
        if tokenizer is not None and tokenizer.characters is not None:
            args.num_chars = tokenizer.characters.num_chars
        if args.num_chars is None:
            args.num_chars = 130
        self.args = args
        self.net = NeuralhmmTTSNet(args=tuple(sorted(args.to_dict().items(), key=lambda kv: str(kv[0]))))
        self._infer_cache = {}
        # dataset normalization statistics (ref tts/models/neuralhmm_tts.py:98:
        # `mean`/`std` buffers; mels are z-normalized before the HMM)
        self.mel_mean = 0.0
        self.mel_std = 1.0

    # ------------------------------------------------- dataset statistics
    def update_mean_std(self, statistics: Dict):
        self.mel_mean = float(statistics["mean"])
        self.mel_std = float(statistics["std"])

    def on_init_start(self, trainer):
        """Compute-or-load the flat-start statistics before param init
        (ref tts/models/neuralhmm_tts.py:263 `on_init_start`). Sets the
        flat-start output bias to N(0, 1) with the dataset transition prob and
        stores mean/std for batch normalization."""
        super().on_init_start(trainer)
        path = getattr(trainer.config, "mel_statistics_parameter_path", None)
        if not path:
            return
        force = getattr(trainer.config, "force_generate_statistics", False)
        if os.path.isfile(path) and not force:
            stats = _load_statistics(path)
            print(f" | > Loaded mel statistics from {path}: {stats}", flush=True)
        else:
            print(f" | > Computing mel statistics over the training set → {path}", flush=True)
            loader = self.get_data_loader(
                trainer.config, trainer.assets, is_eval=False,
                samples=trainer.train_samples, verbose=False, num_gpus=1,
            )
            stats = self._compute_statistics(loader, len(trainer.train_samples))
            _save_statistics(path, stats)
            print(f" | > Saved mel statistics to {path}: {stats}", flush=True)
        self.update_mean_std(stats)
        # flat-start over *normalized* mels at the dataset transition prob
        # (ref common_layers.py:264 `update_flat_start_transition`)
        self.args.flat_start_params = {
            "mean": 0.0, "std": 1.0, "transition_p": float(stats["init_transition_prob"]),
        }
        net_args = tuple(sorted(self.args.to_dict().items(), key=lambda kv: str(kv[0])))
        self.net = type(self.net)(args=net_args)
        self._infer_cache = {}
        if self.params is not None:  # re-init so the new flat start takes effect
            self.params = None

    def _compute_statistics(self, loader, num_samples: int) -> Dict:
        """Streaming mean/std over masked mel frames + init transition prob
        (ref common_layers.py:224 `get_data_parameters_for_flat_start`)."""
        C = self.args.out_channels
        total_state_len = total_mel_len = 0
        mel_sum = mel_sq_sum = 0.0
        for batch in loader:
            tl = np.asarray(batch["text_lengths"])
            ml = np.asarray(batch["mel_lengths"])
            mel = np.asarray(batch["mel_input"], dtype=np.float64)
            mask = (np.arange(mel.shape[1])[None, :] < ml[:, None])[..., None]
            total_state_len += int(tl.sum())
            total_mel_len += int(ml.sum())
            mel_sum += float((mel * mask).sum())
            mel_sq_sum += float(((mel**2) * mask).sum())
        mean = mel_sum / (total_mel_len * C)
        std = float(np.sqrt(mel_sq_sum / (total_mel_len * C) - mean**2))
        avg_duration_per_state = (total_mel_len / num_samples) / (total_state_len / num_samples)
        init_transition_prob = self.args.state_per_phone / avg_duration_per_state
        return {"mean": mean, "std": std, "init_transition_prob": init_transition_prob}

    def init_params(self, rng):
        a = self.args
        B, T_en, T_de = 2, 6, 10
        variables = self.net.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            jnp.zeros((B, T_en), dtype=jnp.int32),
            jnp.full((B,), T_en, dtype=jnp.int32),
            jnp.zeros((B, T_de, a.out_channels)),
            jnp.full((B,), T_de, dtype=jnp.int32),
        )
        self.params = variables["params"]
        return self.params

    def loss_fn(self, params, batch: Dict, rng, optimizer_idx: int = 0):
        # z-normalize mels with the dataset statistics (ref
        # tts/models/neuralhmm_tts.py:105 `preprocess_batch`/`normalize`)
        mel = (batch["mel_input"] - self.mel_mean) / self.mel_std
        out = self.net.apply(
            {"params": params},
            batch["text_input"],
            batch["text_lengths"],
            mel,
            batch["mel_lengths"],
            train=True,
            rngs={"dropout": rng},
        )
        return out["nll"], {"loss": out["nll"]}

    def inference(self, x: np.ndarray, aux_input=None, max_steps: int = 512) -> Dict:
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[None]
        xl = jnp.full((x.shape[0],), x.shape[1], dtype=jnp.int32)
        key = (x.shape, max_steps)
        if key not in self._infer_cache:
            self._infer_cache[key] = jax.jit(
                lambda p, xi, xli, r: self.net.apply(
                    {"params": p}, xi, xli, max_steps, rng=r, method=NeuralhmmTTSNet.inference,
                    rngs={"dropout": jax.random.PRNGKey(0)},
                )
            )
        out = self._infer_cache[key](self.params, x, xl, jax.random.PRNGKey(0))
        # back to dataset scale (ref neuralhmm_tts.py:117 `inverse_normalize`)
        out["model_outputs"] = out["model_outputs"] * self.mel_std + self.mel_mean
        return out

    @staticmethod
    def init_from_config(config, samples=None):
        from tpu_tts.audio import AudioProcessor
        from tpu_tts.managers import SpeakerManager
        from tpu_tts.text.tokenizer import TTSTokenizer

        ap = AudioProcessor.init_from_config(config, verbose=False)
        tokenizer, new_config = TTSTokenizer.init_from_config(config)
        speaker_manager = SpeakerManager.init_from_config(new_config, samples)
        return NeuralhmmTTS(new_config, ap, tokenizer, speaker_manager)
