"""FreeVC: text-free voice conversion via content bottleneck + flow + GAN.

TPU-native re-design of /root/reference/TTS/vc/models/freevc.py:298 +
modules/freevc/*: a self-supervised content encoder (the reference vendors
WavLM, wavlm/wavlm.py:719) feeds a WN bottleneck encoder; a residual-coupling
flow maps the posterior to a speaker-independent prior; a HiFi-GAN generator
reconstructs waveforms conditioned on a mel-derived speaker embedding.

Two content encoders: the exact reference WavLM (tpu_tts/vc/modules/wavlm.py,
parity-tested; selected automatically when a checkpoint embeds `wavlm.*`
weights, as the released freevc24 does) and a compact WavLM-shaped stack for
training from scratch (`content_encoder_type="compact"`).
"""

from dataclasses import dataclass, field
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.config.base import Coqpit
from tpu_tts.layers.vits import ResidualCouplingBlocks, VitsPosteriorEncoder
from tpu_tts.models.base_tts import BaseTTSModel
from tpu_tts.ops.helpers import rand_segments, sequence_mask
from tpu_tts.vocoder.models.hifigan_generator import HifiganGenerator


@dataclass
class FreeVCArgs(Coqpit):
    spec_channels: int = 641
    inter_channels: int = 192
    hidden_channels: int = 192
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    n_flows: int = 4
    resblock: str = "1"
    resblock_kernel_sizes: list = field(default_factory=lambda: [3, 7, 11])
    resblock_dilation_sizes: list = field(default_factory=lambda: [[1, 3, 5], [1, 3, 5], [1, 3, 5]])
    upsample_rates: list = field(default_factory=lambda: [10, 8, 2, 2])
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: list = field(default_factory=lambda: [16, 16, 4, 4])
    segment_size: int = 8960
    gin_channels: int = 256
    ssl_dim: int = 1024
    use_spk: bool = False
    num_spks: int = 0
    content_encoder_type: str = "compact"  # "wavlm" = exact reference WavLM-Large
    wavlm_config: Optional[dict] = None  # overrides for vc.modules.wavlm.WavLMConfig
    content_encoder_layers: int = 4
    content_encoder_heads: int = 8


class ContentEncoder(nn.Module):
    """WavLM-shaped content encoder: strided conv frontend (~320× down) +
    transformer stack → frame features `[B, T_50Hz, ssl_dim]`."""

    dim: int = 1024
    layers: int = 4
    heads: int = 8

    @nn.compact
    def __call__(self, wav, train: bool = False):
        # wav: [B, T, 1] @16 kHz → conv downsample ×320 → ~50 Hz frames
        h = wav
        for i, (ch, k, s) in enumerate(
            [(64, 10, 5), (128, 3, 2), (256, 3, 2), (512, 3, 2), (512, 3, 2), (512, 2, 2), (512, 2, 2)]
        ):
            h = nn.Conv(ch, (k,), strides=(s,), padding="VALID", name=f"conv_{i}")(h)
            h = jax.nn.gelu(nn.LayerNorm(name=f"norm_{i}")(h), approximate=True)
        h = nn.Dense(self.dim, name="proj")(h)
        for i in range(self.layers):
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.dim, deterministic=True, name=f"attn_{i}"
            )(nn.LayerNorm(name=f"ln1_{i}")(h), nn.LayerNorm(name=f"ln1b_{i}")(h))
            h = h + a
            m = nn.Dense(4 * self.dim, name=f"fc1_{i}")(nn.LayerNorm(name=f"ln2_{i}")(h))
            h = h + nn.Dense(self.dim, name=f"fc2_{i}")(jax.nn.gelu(m, approximate=True))
        return nn.LayerNorm(name="ln_out")(h)


class WavLMContentEncoder(nn.Module):
    """Exact reference content encoder: the vendored WavLM
    (vc/modules/freevc/wavlm) re-implemented in `tpu_tts.vc.modules.wavlm`;
    weights ingest from the `wavlm.*` keys embedded in the freevc24
    checkpoint. Same call signature as `ContentEncoder`."""

    config_overrides: tuple = ()

    @nn.compact
    def __call__(self, wav, train: bool = False):
        from tpu_tts.vc.modules.wavlm import WavLM, WavLMConfig

        cfg = WavLMConfig(**dict(self.config_overrides))
        return WavLM(cfg, name="wavlm")(wav[:, :, 0])


class MelSpeakerEncoder(nn.Module):
    """Reference-style mel speaker encoder: 3-layer LSTM → linear → relu →
    L2-norm (ref freevc.py:256 SpeakerEncoder; hidden/embedding sizes track
    gin_channels per freevc.py:368)."""

    dim: int = 256
    hidden: int = 256
    num_layers: int = 3

    @nn.compact
    def __call__(self, mel):
        h = mel
        for _ in range(self.num_layers):
            h = nn.RNN(nn.OptimizedLSTMCell(self.hidden))(h)
        d = nn.relu(nn.Dense(self.dim, name="proj")(h[:, -1]))
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


class FreeVCNet(nn.Module):
    args: tuple

    @property
    def a(self):
        return dict(self.args)

    def setup(self):
        a = self.a
        if a.get("content_encoder_type", "compact") == "wavlm":
            overrides = a.get("wavlm_config") or {}
            self.content_encoder = WavLMContentEncoder(
                config_overrides=tuple(sorted(overrides.items()))
            )
        else:
            self.content_encoder = ContentEncoder(
                dim=a["ssl_dim"], layers=a["content_encoder_layers"], heads=a["content_encoder_heads"]
            )
        self.enc_p = VitsPosteriorEncoder(  # bottleneck over SSL features
            in_channels=a["ssl_dim"],
            out_channels=a["inter_channels"],
            hidden_channels=a["hidden_channels"],
            kernel_size=a["kernel_size"],
            dilation_rate=a["dilation_rate"],
            num_layers=a["n_layers"],
        )
        self.enc_spec = VitsPosteriorEncoder(  # posterior over linear spec
            in_channels=a["spec_channels"],
            out_channels=a["inter_channels"],
            hidden_channels=a["hidden_channels"],
            kernel_size=a["kernel_size"],
            dilation_rate=a["dilation_rate"],
            num_layers=a["n_layers"],
            cond_channels=a["gin_channels"],
        )
        self.flow = ResidualCouplingBlocks(
            channels=a["inter_channels"],
            hidden_channels=a["hidden_channels"],
            kernel_size=a["kernel_size"],
            dilation_rate=a["dilation_rate"],
            num_layers=4,
            num_flows=a["n_flows"],
            cond_channels=a["gin_channels"],
        )
        self.dec = HifiganGenerator(
            in_channels=a["inter_channels"],
            out_channels=1,
            resblock_type=str(a["resblock"]),
            resblock_kernel_sizes=tuple(a["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(tuple(d) for d in a["resblock_dilation_sizes"]),
            upsample_factors=tuple(a["upsample_rates"]),
            upsample_kernel_sizes=tuple(a["upsample_kernel_sizes"]),
            upsample_initial_channel=a["upsample_initial_channel"],
            cond_channels=a["gin_channels"],
        )
        self.speaker_encoder = MelSpeakerEncoder(a["gin_channels"], hidden=a["gin_channels"])

    def __call__(self, ssl_feats, feat_lengths, spec, spec_lengths, mel_ref, train: bool = True) -> Dict:
        g = self.speaker_encoder(mel_ref)[:, None, :]
        _, m_p, logs_p, _ = self.enc_p(ssl_feats, feat_lengths, train=train)
        z, m_q, logs_q, y_mask = self.enc_spec(spec, spec_lengths, g=g, train=train)
        z_p = self.flow(z, y_mask, g=g, train=train)
        z_slice, slice_ids = rand_segments(
            self.make_rng("segments"), jnp.swapaxes(z, 1, 2), spec_lengths,
            segment_size=32, let_short_samples=True, pad_short=True,
        )
        o = self.dec(jnp.swapaxes(z_slice, 1, 2), g=g)
        return {
            "model_outputs": o,
            "z_p": z_p,
            "m_p": m_p,
            "logs_p": logs_p,
            "m_q": m_q,
            "logs_q": logs_q,
            "y_mask": y_mask,
            "slice_ids": slice_ids,
            "g": g,
        }

    def init_all(self, ssl_feats, feat_lengths, spec, spec_lengths, mel_ref, wav_src):
        """Init-only entry touching every submodule incl. the content encoder."""
        out = self(ssl_feats, feat_lengths, spec, spec_lengths, mel_ref)
        self.content_encoder(wav_src)
        return out

    def voice_conversion(self, wav_src, mel_tgt):
        """Source wav (16 kHz) + target-speaker mel → converted waveform."""
        feats = self.content_encoder(wav_src)
        B, T, _ = feats.shape
        lengths = jnp.full((B,), T, dtype=jnp.int32)
        g_tgt = self.speaker_encoder(mel_tgt)[:, None, :]
        z_p, m_p, logs_p, mask = self.enc_p(feats, lengths)
        z = self.flow(m_p, mask, g=g_tgt, reverse=True)
        return self.dec(z * mask, g=g_tgt)


class Freevc(BaseTTSModel):
    def __init__(self, config, ap=None):
        super().__init__(config, ap=ap)
        args = config.model_args
        if isinstance(args, dict):
            args = FreeVCArgs.from_dict(args)
        self.args = args
        self.net = FreeVCNet(args=tuple(sorted(args.to_dict().items(), key=lambda kv: str(kv[0]))))

    # ------------------------------------------------------- torch ingest
    def convert_torch_state_dict(self, state_dict):
        """Reference `FreeVC` torch weights → our flax tree (parity-tested in
        tests/test_torch_parity_freevc.py). When the checkpoint embeds WavLM
        weights (`wavlm.*`, present in the released freevc24 per the strict
        load at freevc.py:557), the net switches to the exact WavLM content
        encoder and ingests them; otherwise the compact stand-in keeps its
        fresh init (merge-filled)."""
        from tpu_tts.vc.models.freevc_convert import convert_freevc_torch_state_dict

        params = convert_freevc_torch_state_dict(state_dict)
        if any(str(k).startswith("wavlm.") for k in state_dict):
            from tpu_tts.vc.modules.wavlm import convert_wavlm_torch_state_dict

            if self.args.content_encoder_type != "wavlm":
                self.args.content_encoder_type = "wavlm"
                self.net = FreeVCNet(
                    args=tuple(sorted(self.args.to_dict().items(), key=lambda kv: str(kv[0])))
                )
                self.params = None
            params["content_encoder"] = {
                "wavlm": convert_wavlm_torch_state_dict(state_dict, prefix="wavlm.")
            }
        if self.params is None:
            self.init_params(jax.random.PRNGKey(0))

        def fill(template, got):
            for k, v in template.items():
                if isinstance(v, dict):
                    fill(v, got.setdefault(k, {}))
                elif k not in got:
                    got[k] = np.asarray(v)

        fill(self.params, params)
        return params

    def init_params(self, rng):
        a = self.args
        B = 1
        ssl = jnp.zeros((B, 10, a.ssl_dim))
        spec = jnp.zeros((B, 12, a.spec_channels))
        mel = jnp.zeros((B, 20, 80))
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        variables = self.net.init(
            {"params": r1, "posterior": r2, "segments": r3, "dropout": r4},
            ssl, jnp.array([10]), spec, jnp.array([12]), mel, jnp.zeros((B, 3200, 1)),
            method=FreeVCNet.init_all,
        )
        self.params = variables["params"]
        return self.params

    def voice_conversion(self, source_wav, target_wav) -> np.ndarray:
        """File paths or arrays → converted waveform (ref api surface)."""
        from tpu_tts.audio.numpy_transforms import load_wav, resample_wav
        from tpu_tts.audio import jax_transforms as jt

        src = source_wav if isinstance(source_wav, np.ndarray) else load_wav(filename=source_wav, sample_rate=16000, resample=True)
        tgt = target_wav if isinstance(target_wav, np.ndarray) else load_wav(filename=target_wav, sample_rate=16000, resample=True)
        mel_tgt = jt.wav_to_mel(
            jnp.asarray(tgt, dtype=jnp.float32)[None], fft_size=1024, num_mels=80,
            sample_rate=16000, hop_length=256, win_length=1024, fmin=0, fmax=None, center=False,
        )
        mel_tgt = jnp.swapaxes(mel_tgt, 1, 2)
        out = self.net.apply(
            {"params": self.params},
            jnp.asarray(src, dtype=jnp.float32)[None, :, None],
            mel_tgt,
            method=FreeVCNet.voice_conversion,
            rngs={"posterior": jax.random.PRNGKey(0)},
        )
        return np.asarray(out)[0, :, 0]

    @staticmethod
    def init_from_config(config, samples=None):
        from tpu_tts.audio import AudioProcessor

        ap = AudioProcessor.init_from_config(config, verbose=False)
        return Freevc(config, ap=ap)
