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
from tpu_tts.layers.common import Conv1d
from tpu_tts.layers.tacotron import Prenet, _apply_norm
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


# reference configs are FLAT (no model_args): map their field names onto ours
# (ref tts/configs/neuralhmm_tts_config.py:100-130, overflow_config.py:100-150)
_REF_FLAT_TO_ARGS = {
    "num_chars": "num_chars",
    "out_channels": "out_channels",
    "encoder_in_out_features": "encoder_dim",
    "state_per_phone": "state_per_phone",
    "memory_rnn_dim": "memory_rnn_dim",
    "outputnet_size": "outputnet_size",
    "flat_start_params": "flat_start_params",
    "std_floor": "std_floor",
    "use_grad_checkpointing": "use_grad_checkpointing",
    "deterministic_transition": "deterministic_transition",
    "duration_threshold": "duration_threshold",
    "max_sampling_time": "max_sampling_time",
    "sampling_temp": "sampling_temp",
    "prenet_dropout_at_inference": "prenet_dropout_at_inference",
    # overflow glow-decoder fields share names with our args
    "hidden_channels_dec": "hidden_channels_dec",
    "kernel_size_dec": "kernel_size_dec",
    "dilation_rate": "dilation_rate",
    "num_flow_blocks_dec": "num_flow_blocks_dec",
    "num_block_layers": "num_block_layers",
    "dropout_p_dec": "dropout_p_dec",
    "num_splits": "num_splits",
    "num_squeeze": "num_squeeze",
    "sigmoid_scale": "sigmoid_scale",
}


def merge_flat_config_into_args(args, config):
    """If `config` carries the reference's flat HMM fields (it does when built
    from a reference config.json or from our mirrored config classes), copy
    them into `args`. Called only when `model_args` was left at its defaults,
    so the flat fields are the single source of truth."""
    for src, dst in _REF_FLAT_TO_ARGS.items():
        if hasattr(config, src) and getattr(config, src) is not None and hasattr(args, dst):
            setattr(args, dst, getattr(config, src))
    pd = getattr(config, "prenet_dim", None)
    pn = getattr(config, "prenet_n_layers", None)
    if pd and pn:
        args.prenet_dims = tuple([int(pd)] * int(pn))
    return args


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
    sampling_temp: float = 0.0
    prenet_dropout_at_inference: bool = False
    norm_type: str = "batch"  # "frozen_batch" for converted reference checkpoints


class NeuralHMMEncoder(nn.Module):
    """Tacotron2-style conv stack + BiLSTM whose width folds `state_per_phone`
    (ref layers/overflow/common_layers.py:12 `Encoder`): the per-direction
    hidden size is `(C//2)·spp`, and the `[B, T, C·spp]` output is reshaped to
    `[B, T·spp, C]` so each phone contributes `spp` distinct HMM states."""

    output_dim: int = 512
    state_per_phone: int = 2
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, x, x_mask, x_lengths, train: bool = False):
        for i in range(3):
            x = Conv1d(self.output_dim, 5, name=f"conv_{i}")(x * x_mask)
            x = _apply_norm(self.norm_type, self.output_dim, f"norm_{i}", x, train)
            x = nn.Dropout(0.5, deterministic=not train)(nn.relu(x))
        half = (self.output_dim // 2) * self.state_per_phone
        x = x * x_mask
        fwd = nn.RNN(nn.OptimizedLSTMCell(half), name="lstm_fwd")(x, seq_lengths=x_lengths)
        bwd = nn.RNN(nn.OptimizedLSTMCell(half), reverse=True, keep_order=True, name="lstm_bwd")(
            x, seq_lengths=x_lengths
        )
        o = jnp.concatenate([fwd, bwd], axis=-1) * x_mask
        B, T, _ = o.shape
        return o.reshape(B, T * self.state_per_phone, self.output_dim)


class NeuralHMMDecoder(nn.Module):
    """AR memory + per-state emission/transition nets + forward algorithm."""

    frame_channels: int
    encoder_dim: int
    prenet_dims: tuple
    memory_rnn_dim: int
    outputnet_size: tuple
    std_floor: float = 0.001
    prenet_dropout_at_inference: bool = False

    def setup(self):
        self.prenet = Prenet(self.prenet_dims, dropout_at_inference=self.prenet_dropout_at_inference)
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
        # ref common_layers.py:203 `_floor_std`: clamp(softplus(x), min=floor)
        std = jnp.maximum(jax.nn.softplus(out[..., C : 2 * C]), self.std_floor)
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
            mem_carry, log_alpha, last_trans = carry
            y_prev, y_t, t = inp
            mem_carry, h_mem = cell.memory_rnn(mem_carry, cell.prenet(y_prev, train=train))
            mean, std, trans = cell._outputs(h_mem, states)
            log_p = jax.nn.log_sigmoid(trans)
            log_1mp = jax.nn.log_sigmoid(-trans)
            # ref neural_hmm.py:548 EmissionModel: per-state logp × state mask
            emit = cell._emission_logp(y_t, mean, std) * state_mask
            stay = log_alpha + jnp.where(state_mask, log_1mp, LOG_EPS)
            adv = (
                jnp.concatenate([jnp.full((B, 1), LOG_EPS), log_alpha[:, :-1] + log_p[:, :-1]], axis=1)
            )
            from_prev = jnp.where(state_mask, jnp.logaddexp(stay, adv), LOG_EPS)
            # t == 0: alpha = state priors + emission, no transition
            # (ref neural_hmm.py:134-139)
            new_alpha = jnp.where(t == 0, log_alpha + emit, from_prev + emit)
            # normalize (scaled forward) for stability
            norm = jax.nn.logsumexp(new_alpha, axis=1, keepdims=True)
            new_alpha = new_alpha - norm
            valid = (t < mel_lengths)[:, None]
            log_alpha = jnp.where(valid, new_alpha, log_alpha)
            last_trans = jnp.where(valid, trans, last_trans)
            ll_inc = jnp.where(valid[:, 0], norm[:, 0], 0.0)
            return (mem_carry, log_alpha, last_trans), (ll_inc, log_alpha)

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=((1, 1, 0),),
            out_axes=(1, 1),
        )
        ts = jnp.arange(T_de)
        (mem_carry, log_alpha_T, last_trans), (ll_incs, alphas) = scan(
            self, (mem_carry, log_alpha0, jnp.zeros((B, T_en))), (frames_in, mels, ts)
        )
        # absorption: mass in the last valid state × its exit probability
        # (ref neural_hmm.py:264 get_absorption_state_scaling_factor)
        last_state = jnp.sum(state_mask, axis=1).astype(jnp.int32) - 1
        final_logp = jnp.take_along_axis(log_alpha_T, last_state[:, None], axis=1)[:, 0]
        exit_logp = jax.nn.log_sigmoid(
            jnp.take_along_axis(last_trans, last_state[:, None], axis=1)[:, 0]
        )
        log_likelihood = jnp.sum(ll_incs, axis=1) + final_logp + exit_logp
        return log_likelihood, alphas

    def sample(self, states, state_mask, max_steps: int, rng, sampling_temp: float = 0.0,
               duration_threshold: float = 0.43, deterministic_transition: bool = True):
        """Generation scan (ref neural_hmm.py:386 `sample`, batched).

        Deterministic transitions advance when the running product of staying
        probabilities (the duration quantile) drops below
        `duration_threshold`; stochastic transitions draw
        Bernoulli(transition_p). The outputnet runs only on the gathered
        current state (the reference's per-sample loop does the same) instead
        of all `T_en` states."""
        B, T_en, _ = states.shape
        go = jnp.zeros((B, self.frame_channels))
        mem_carry = self.memory_rnn.initialize_carry(jax.random.PRNGKey(0), (B, 1))
        n_states = jnp.sum(state_mask, axis=1).astype(jnp.int32)

        def step(cell, carry, key):
            mem_carry, state_idx, prev_frame, quantile, done = carry
            mem_carry, h_mem = cell.memory_rnn(mem_carry, cell.prenet(prev_frame, train=False))
            z_t = jnp.take_along_axis(states, state_idx[:, None, None], axis=1)  # [B,1,C]
            mean, std, trans = cell._outputs(h_mem, z_t)
            mu, sd, p = mean[:, 0], std[:, 0], jax.nn.sigmoid(trans[:, 0])
            k_noise, k_switch = jax.random.split(key)
            noise = jax.random.normal(k_noise, mu.shape) * sampling_temp
            frame = mu + noise * sd
            if deterministic_transition:
                quantile = quantile * (1.0 - p)
                advance = quantile < duration_threshold
            else:
                advance = jax.random.uniform(k_switch, p.shape) < p
            quantile = jnp.where(advance, 1.0, quantile)
            new_idx = jnp.minimum(state_idx + advance.astype(jnp.int32), T_en - 1)
            new_done = done | (advance & (state_idx + 1 >= n_states))
            valid = (~done).astype(frame.dtype)[:, None]
            return (mem_carry, new_idx, frame, quantile, new_done), (
                frame * valid, state_idx, valid[:, 0],
            )

        keys = jax.random.split(rng, max_steps)
        scan = nn.scan(
            step, variable_broadcast="params", split_rngs={"params": False, "dropout": True},
            in_axes=0, out_axes=1,
        )
        init = (
            mem_carry, jnp.zeros((B,), dtype=jnp.int32), go,
            jnp.ones((B,)), jnp.zeros((B,), dtype=bool),
        )
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
        self.encoder = NeuralHMMEncoder(
            a["encoder_dim"], a["state_per_phone"], norm_type=a.get("norm_type", None) or "batch",
        )
        self.hmm = NeuralHMMDecoder(
            frame_channels=a["out_channels"],
            encoder_dim=a["encoder_dim"],
            prenet_dims=tuple(a["prenet_dims"]),
            memory_rnn_dim=a["memory_rnn_dim"],
            outputnet_size=tuple(a["outputnet_size"]),
            std_floor=a["std_floor"],
            prenet_dropout_at_inference=a.get("prenet_dropout_at_inference", False),
        )

    def _states(self, text, text_lengths, train):
        """Encode text into `T_text · state_per_phone` HMM states."""
        a = self.a
        x_mask = sequence_mask(text_lengths, text.shape[1]).astype(jnp.float32)[:, :, None]
        states = self.encoder(self.emb(text), x_mask, text_lengths, train=train)
        spp = a["state_per_phone"]
        # valid states form a contiguous prefix of length `text_len · spp`
        state_mask = sequence_mask(text_lengths * spp, states.shape[1])
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
            states, state_mask, max_steps, rng, sampling_temp, duration_threshold,
            deterministic_transition=self.a.get("deterministic_transition", True),
        )
        return {"model_outputs": frames, "states": trace, "y_lengths": lengths}


class NeuralhmmTTS(BaseTTSModel):
    def __init__(self, config, ap=None, tokenizer=None, speaker_manager=None):
        super().__init__(config, ap, tokenizer, speaker_manager)
        args = config.model_args
        if isinstance(args, dict):
            args = NeuralhmmTTSArgs.from_dict(args)
        if args.to_dict() == NeuralhmmTTSArgs().to_dict():
            args = merge_flat_config_into_args(args, config)
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

    # ------------------------------------------------------- torch ingest
    def convert_torch_state_dict(self, state_dict):
        """Reference `NeuralhmmTTS`/`Overflow` torch weights → our flax tree
        (parity-tested in tests/test_torch_parity_hmm.py). Requires
        `model_args.norm_type == "frozen_batch"`. Also picks up the dataset
        mel `mean`/`std` buffers the reference stores on the model."""
        from tpu_tts.models.hmm_convert import (
            convert_neuralhmm_torch_state_dict,
            extract_mel_statistics,
        )

        stats = extract_mel_statistics(state_dict)
        if "mean" in stats and "std" in stats:
            self.update_mean_std(stats)
        if self.args.norm_type != "frozen_batch":  # reference encoder uses BN
            self.args.norm_type = "frozen_batch"
            self.net = type(self.net)(
                args=tuple(sorted(self.args.to_dict().items(), key=lambda kv: str(kv[0])))
            )
            self._infer_cache = {}
        return convert_neuralhmm_torch_state_dict(state_dict)

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
        self.model_state = {k: v for k, v in variables.items() if k != "params"}
        return self.params

    def loss_fn(self, params, batch: Dict, rng, optimizer_idx: int = 0, model_state=None):
        # z-normalize mels with the dataset statistics (ref
        # tts/models/neuralhmm_tts.py:105 `preprocess_batch`/`normalize`)
        mel = (batch["mel_input"] - self.mel_mean) / self.mel_std
        out, new_state = self.net.apply(
            {"params": params, **(model_state or {})},
            batch["text_input"],
            batch["text_lengths"],
            mel,
            batch["mel_lengths"],
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        if not jax.tree_util.tree_leaves(new_state):
            new_state = model_state or {}
        if model_state is None:
            return out["nll"], {"loss": out["nll"]}
        return out["nll"], ({"loss": out["nll"]}, new_state)

    def inference(self, x: np.ndarray, aux_input=None, max_steps: Optional[int] = None) -> Dict:
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[None]
        a = self.args
        max_steps = int(max_steps if max_steps is not None else min(a.max_sampling_time, 512))
        xl = jnp.full((x.shape[0],), x.shape[1], dtype=jnp.int32)
        key = (x.shape, max_steps, a.sampling_temp, a.duration_threshold)
        if key not in self._infer_cache:
            self._infer_cache[key] = jax.jit(
                lambda p, st, xi, xli, r: self.net.apply(
                    {"params": p, **st}, xi, xli, max_steps,
                    sampling_temp=a.sampling_temp, duration_threshold=a.duration_threshold,
                    rng=r, method=NeuralhmmTTSNet.inference,
                    rngs={"dropout": jax.random.PRNGKey(0)},
                )
            )
        out = self._infer_cache[key](self.params, self.model_state or {}, x, xl, jax.random.PRNGKey(0))
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
