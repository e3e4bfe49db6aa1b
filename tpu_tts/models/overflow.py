"""OverFlow: Neural-HMM TTS with a normalizing-flow decoder on top.

TPU-native re-design of /root/reference/TTS/tts/models/overflow.py (401): the
mel is passed through an invertible Glow stack; the HMM models the flow's
latent, and the exact likelihood adds the flow log-determinant. Inference
samples from the HMM then inverts the flow.
"""

from dataclasses import dataclass, field
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.config.base import Coqpit
from tpu_tts.layers.glow import GlowDecoder
from tpu_tts.models.base_tts import BaseTTSModel
from tpu_tts.models.neuralhmm_tts import NeuralhmmTTS, NeuralhmmTTSArgs, NeuralhmmTTSNet
from tpu_tts.ops.helpers import sequence_mask


@dataclass
class OverflowArgs(NeuralhmmTTSArgs):
    hidden_channels_dec: int = 150
    kernel_size_dec: int = 5
    dilation_rate: int = 1
    num_flow_blocks_dec: int = 12
    num_block_layers: int = 4
    dropout_p_dec: float = 0.05
    num_splits: int = 4
    num_squeeze: int = 2
    sigmoid_scale: bool = False


class OverflowNet(NeuralhmmTTSNet):
    def setup(self):
        super().setup()
        a = self.a
        self.flow_decoder = GlowDecoder(
            in_channels=a["out_channels"],
            hidden_channels=a["hidden_channels_dec"],
            kernel_size=a["kernel_size_dec"],
            dilation_rate=a["dilation_rate"],
            num_flow_blocks=a["num_flow_blocks_dec"],
            num_coupling_layers=a["num_block_layers"],
            dropout_p=a["dropout_p_dec"],
            num_splits=a["num_splits"],
            num_squeeze=a["num_squeeze"],
            sigmoid_scale=a["sigmoid_scale"],
        )

    def __call__(self, text, text_lengths, mels, mel_lengths, train: bool = True) -> Dict:
        a = self.a
        sq = a["num_squeeze"]
        T = (mels.shape[1] // sq) * sq
        mels = mels[:, :T]
        mel_lengths = (mel_lengths // sq) * sq
        y_mask = sequence_mask(mel_lengths, T).astype(jnp.float32)[:, :, None]
        z, logdet = self.flow_decoder(mels, y_mask, reverse=False, train=train)
        states, state_mask = self._states(text, text_lengths, train)
        ll, alphas = self.hmm(states, state_mask, z, mel_lengths, train=train)
        total_ll = ll + logdet
        nll = -jnp.mean(total_ll / mel_lengths.astype(jnp.float32))
        return {"log_likelihood": total_ll, "nll": nll, "alignments": alphas, "z": z}

    def inference(self, text, text_lengths, max_steps: int, sampling_temp: float = 0.334,
                  duration_threshold: float = 0.55, rng=None) -> Dict:
        states, state_mask = self._states(text, text_lengths, False)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        z, trace, lengths = self.hmm.sample(
            states, state_mask, max_steps, rng, sampling_temp, duration_threshold,
            deterministic_transition=self.a.get("deterministic_transition", True),
        )
        sq = self.a["num_squeeze"]
        T = (z.shape[1] // sq) * sq
        y_mask = sequence_mask(jnp.minimum(lengths, T), T).astype(jnp.float32)[:, :, None]
        mels, _ = self.flow_decoder(z[:, :T], y_mask, reverse=True)
        return {"model_outputs": mels, "states": trace, "y_lengths": jnp.minimum(lengths, T)}


class Overflow(NeuralhmmTTS):
    def __init__(self, config, ap=None, tokenizer=None, speaker_manager=None):
        BaseTTSModel.__init__(self, config, ap, tokenizer, speaker_manager)
        args = config.model_args
        if isinstance(args, dict):
            args = OverflowArgs.from_dict(args)
        if args.to_dict() == OverflowArgs().to_dict():
            from tpu_tts.models.neuralhmm_tts import merge_flat_config_into_args

            args = merge_flat_config_into_args(args, config)
        if tokenizer is not None and tokenizer.characters is not None:
            args.num_chars = tokenizer.characters.num_chars
        if args.num_chars is None:
            args.num_chars = 130
        self.args = args
        self.net = OverflowNet(args=tuple(sorted(args.to_dict().items(), key=lambda kv: str(kv[0]))))
        self._infer_cache = {}
        self.mel_mean = 0.0
        self.mel_std = 1.0

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
                    rng=r, method=OverflowNet.inference,
                    rngs={"dropout": jax.random.PRNGKey(0)},
                )
            )
        out = self._infer_cache[key](self.params, self.model_state or {}, x, xl, jax.random.PRNGKey(0))
        # back to dataset scale (ref models/overflow.py inverse_normalize)
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
        return Overflow(new_config, ap, tokenizer, speaker_manager)
