"""Speaker (d-vector) encoders: LSTM and SE-ResNet with attentive pooling.

Mirror of /root/reference/TTS/encoder/models/{base_encoder.py (BaseEncoder
with torch-spec frontend + sliding-window `compute_embedding`:68), lstm.py
(LSTMSpeakerEncoder:34), resnet.py (ResNetSpeakerEncoder:59)}.
Input features are on-device log-mels (matmul-STFT).
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.audio.jax_transforms import wav_to_mel


class LSTMSpeakerEncoder(nn.Module):
    """3-layer LSTM over mels → projection → L2-norm embedding (ref lstm.py:34)."""

    input_dim: int = 80
    proj_dim: int = 256
    lstm_dim: int = 768
    num_lstm_layers: int = 3

    @nn.compact
    def __call__(self, x, l2_norm: bool = True, train: bool = False):
        """x: `[B, T, C_mel]` → `[B, proj_dim]` (`train` accepted for a
        uniform encoder interface; the LSTM encoder has no train-time state)."""
        # instance norm over time per mel channel (ref lstm.py:93)
        x = (x - jnp.mean(x, axis=1, keepdims=True)) * jax.lax.rsqrt(
            jnp.var(x, axis=1, keepdims=True) + 1e-5
        )
        for i in range(self.num_lstm_layers):
            x = nn.RNN(nn.OptimizedLSTMCell(self.lstm_dim), name=f"lstm_{i}")(x)
            x = nn.Dense(self.proj_dim, name=f"proj_{i}")(x)
        d = x[:, -1]  # last frame
        if l2_norm:
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        return d


class SELayer(nn.Module):
    channels: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.relu(nn.Dense(max(self.channels // self.reduction, 1))(s))
        s = jax.nn.sigmoid(nn.Dense(self.channels)(s))
        return x * s[:, None, None, :]


class _Norm2d(nn.Module):
    """"batch" = true BatchNorm (fresh training, ref resnet.py BatchNorm2d
    defaults), "frozen_batch" = running-stat affine (torch ingest), "layer"
    = stateless LayerNorm (back-compat)."""

    features: int
    norm_type: str = "layer"
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm_type == "batch":
            from tpu_tts.layers.common import TorchBatchNorm

            return TorchBatchNorm(self.features, eps=self.eps)(x, train)
        if self.norm_type != "frozen_batch":
            return nn.LayerNorm()(x)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class SEBasicBlock(nn.Module):
    """conv→relu→bn → conv→bn→SE → +residual → relu (ref resnet.py:30 —
    note the reference's relu-before-bn1 order, kept for parity)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv1")(x)
        y = nn.relu(y)
        y = _Norm2d(self.planes, self.norm_type, name="bn1")(y, train)
        y = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(y)
        y = _Norm2d(self.planes, self.norm_type, name="bn2")(y, train)
        y = SELayer(self.planes)(y)
        if self.downsample or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, name="ds_conv")(x)
            residual = _Norm2d(self.planes, self.norm_type, name="ds_norm")(residual, train)
        return nn.relu(y + residual)


class ResNetSpeakerEncoder(nn.Module):
    """SE-ResNet34-style encoder with attentive statistics pooling
    (ref resnet.py:59). `norm_type='layer'` trains statelessly;
    `'frozen_batch'` reproduces reference checkpoints exactly."""

    input_dim: int = 64
    proj_dim: int = 512
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    num_filters: Tuple[int, ...] = (32, 64, 128, 256)
    encoder_type: str = "ASP"  # ASP (attentive stats) or SAP (attentive mean)
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, x, l2_norm: bool = True, train: bool = False):
        """x: `[B, T, C_mel]` → `[B, proj_dim]`."""
        # instance norm over time per mel channel (ref resnet.py:171)
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        # treat as image [B, T, C_mel, 1]
        h = x[..., None]
        h = nn.Conv(self.num_filters[0], (3, 3), padding=((1, 1), (1, 1)), name="conv1")(h)
        h = _Norm2d(self.num_filters[0], self.norm_type, name="bn1")(nn.relu(h), train)
        for li, (n_blocks, planes) in enumerate(zip(self.layers, self.num_filters)):
            stride = 1 if li == 0 else 2
            for bi in range(n_blocks):
                blk_stride = stride if bi == 0 else 1
                h = SEBasicBlock(
                    planes, stride=blk_stride,
                    downsample=bi == 0 and (blk_stride != 1 or h.shape[-1] != planes),
                    norm_type=self.norm_type, name=f"layer{li}_{bi}",
                )(h, train=train)
        # h: [B, T', F', C] -> flatten freq into channels: [B, T', F'*C]
        B, T2, F2, C = h.shape
        h = h.reshape(B, T2, F2 * C)
        # attentive pooling (ref attention: conv1x1-relu-bn-conv1x1-softmax)
        w = nn.Conv(128, (1,), name="attn_conv1")(h)
        w = nn.relu(w)
        if self.norm_type == "layer":
            w = nn.LayerNorm(name="attn_bn")(w)
        else:
            w = _Norm2d(128, self.norm_type, name="attn_bn")(w, train)
        w = nn.Conv(F2 * C, (1,), name="attn_conv2")(w)
        w = jax.nn.softmax(w, axis=1)
        mu = jnp.sum(h * w, axis=1)
        if self.encoder_type == "ASP":
            sg = jnp.sqrt(jnp.clip(jnp.sum((h**2) * w, axis=1) - mu**2, 1e-5))
            stat = jnp.concatenate([mu, sg], axis=-1)
        else:
            stat = mu
        d = nn.Dense(self.proj_dim, name="fc")(stat)
        if l2_norm:
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        return d


class SpeakerEncoderModel:
    """Host orchestrator with on-device featurization + sliding-window
    embedding (ref base_encoder.py:68)."""

    def __init__(self, config):
        self.config = config
        p = config.model_params or {}
        model_name = p.get("model_name", "lstm")
        self.audio = config.audio
        if model_name == "lstm":
            self.net = LSTMSpeakerEncoder(
                input_dim=p.get("input_dim", 80),
                proj_dim=p.get("proj_dim", 256),
                lstm_dim=p.get("lstm_dim", 768),
                num_lstm_layers=p.get("num_lstm_layers", 3),
            )
        elif model_name == "resnet":
            # true BatchNorm by default for fresh training (ref resnet.py
            # BatchNorm2d); ingest switches to "frozen_batch"
            self.net = ResNetSpeakerEncoder(
                input_dim=p.get("input_dim", 64),
                proj_dim=p.get("proj_dim", 512),
                norm_type=p.get("norm_type", None) or "batch",
            )
        else:
            raise ValueError(f" [!] Unknown encoder model {model_name}")
        self.params = None
        self.model_state = {}
        self._jit_embed = None

    def features_from_wav(self, wav: jnp.ndarray) -> jnp.ndarray:
        a = self.audio
        mel = wav_to_mel(
            wav,
            fft_size=a["fft_size"],
            num_mels=a["num_mels"],
            sample_rate=a["sample_rate"],
            hop_length=a["hop_length"],
            win_length=a["win_length"],
            fmin=a.get("mel_fmin", 0.0),
            fmax=a.get("mel_fmax", None),
            center=True,
        )
        return jnp.swapaxes(mel, -1, -2)  # [B, T, C]

    def init_params(self, rng):
        x = jnp.zeros((2, 40, self.config.model_params.get("input_dim", 80)))
        variables = self.net.init(rng, x)
        self.params = variables["params"]
        self.model_state = {k: v for k, v in variables.items() if k != "params"}
        return self.params

    def embed(self, params, feats: jnp.ndarray, model_state=None) -> jnp.ndarray:
        return self.net.apply({"params": params, **(model_state or self.model_state or {})}, feats)

    def embed_train(self, params, feats: jnp.ndarray, model_state):
        """Training-mode embedding; returns (embeddings, new batch stats)."""
        out, new_state = self.net.apply(
            {"params": params, **(model_state or {})}, feats, train=True, mutable=["batch_stats"]
        )
        import jax as _jax

        if not _jax.tree_util.tree_leaves(new_state):
            new_state = model_state or {}
        return out, new_state

    def compute_embedding(self, wav: np.ndarray, num_frames: int = 250, num_eval: int = 10) -> np.ndarray:
        """Sliding windows over the utterance, mean of window embeddings."""
        feats = np.asarray(self.features_from_wav(jnp.asarray(wav, dtype=jnp.float32)[None]))[0]
        T = feats.shape[0]
        if T <= num_frames:
            windows = feats[None]
        else:
            offsets = np.linspace(0, T - num_frames, num=num_eval).astype(int)
            windows = np.stack([feats[o : o + num_frames] for o in offsets])
        if self._jit_embed is None:
            import jax as _jax

            self._jit_embed = _jax.jit(lambda p, st, f: self.net.apply({"params": p, **st}, f))
        embs = np.asarray(self._jit_embed(self.params, self.model_state or {}, jnp.asarray(windows)))
        return embs.mean(0)

    def load_checkpoint(self, config, checkpoint_path, eval=True, **kwargs):
        if str(checkpoint_path).endswith((".pth", ".pth.tar", ".pt")):
            return self.load_torch_checkpoint(checkpoint_path)
        from tpu_tts.train.checkpoint import load_checkpoint

        state = load_checkpoint(checkpoint_path)
        self.params = state["model"]
        if "model_state" in state:
            self.model_state = state["model_state"]
        return state

    def load_torch_checkpoint(self, checkpoint_path):
        """Reference encoder `.pth` (model_se.pth etc.) → our params
        (parity-tested in tests/test_torch_parity_encoder.py)."""
        from tpu_tts.encoder.encoder_convert import (
            convert_lstm_encoder_state_dict,
            convert_resnet_encoder_state_dict,
        )
        from tpu_tts.train.torch_convert import load_torch_checkpoint

        ckpt = load_torch_checkpoint(checkpoint_path)
        sd = ckpt.get("torch_state_dict") or {
            k: v for k, v in ckpt.items() if hasattr(v, "shape")
        }
        if isinstance(self.net, LSTMSpeakerEncoder):
            params = convert_lstm_encoder_state_dict(sd)
        else:
            if self.net.norm_type != "frozen_batch":
                self.net = self.net.clone(norm_type="frozen_batch")
                self._jit_embed = None
            params = convert_resnet_encoder_state_dict(
                sd, input_dim=self.net.input_dim, num_filters=tuple(self.net.num_filters)
            )
        if not params:
            raise ValueError(
                f"no matching weights in {checkpoint_path} for "
                f"{type(self.net).__name__} ({len(sd)} source tensors) — "
                "wrong encoder model_name for this checkpoint?"
            )
        self.params = params
        return ckpt


def setup_encoder_model(config) -> SpeakerEncoderModel:
    return SpeakerEncoderModel(config)
