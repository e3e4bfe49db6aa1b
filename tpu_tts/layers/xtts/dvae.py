"""Discrete VAE over mel spectrograms — the audio tokenizer that produces the
XTTS GPT's training codes.

Exact-parity rebuild of /root/reference/TTS/tts/layers/xtts/dvae.py:201
`DiscreteVAE` in the XTTS configuration (positional_dims=1, num_tokens=8192,
codebook_dim=512, hidden_dim=512, num_layers=2, num_resnet_blocks=3,
channels=80, kernel_size=3, use_transposed_convs=False), so the released
`dvae.pth` ingests directly (converter below; parity-tested in
tests/test_torch_parity_xtts.py). Channels-last `[B, T, C]`; the two
stride-2 encoder stages give the 4× mel → code downsample (256-sample hop →
1024-sample code stride, gpt_trainer.py code_stride_len)."""

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _StridedConv(nn.Module):
    """torch Conv1d(k, stride=2, padding=(k-1)//2) on `[B, T, C]`:
    out length floor((T-1)/2)+1."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        p = (self.kernel_size - 1) // 2
        return nn.Conv(
            self.features, (self.kernel_size,), strides=(2,),
            padding=[(p, p)], name="conv",
        )(x)


class _UpsampledConv(nn.Module):
    """ref dvae.py:186 `UpsampledConv`: nearest 2× upsample then conv
    (the use_transposed_convs=False decoder path)."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        up = jnp.repeat(x, 2, axis=1)
        p = (self.kernel_size - 1) // 2
        return nn.Conv(self.features, (self.kernel_size,), padding=[(p, p)], name="conv")(up)


class _ResBlock(nn.Module):
    """ref dvae.py:171 `ResBlock`: conv3-relu-conv3-relu-conv1 + residual."""

    channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(self.channels, (3,), padding=[(1, 1)], name="c0")(x))
        h = nn.relu(nn.Conv(self.channels, (3,), padding=[(1, 1)], name="c2")(h))
        h = nn.Conv(self.channels, (1,), name="c4")(h)
        return h + x


class DiscreteVAE(nn.Module):
    """XTTS-configuration DVAE. `embed` matches the torch `Quantize` buffer
    layout `[codebook_dim, num_tokens]`."""

    num_tokens: int = 8192
    codebook_dim: int = 512
    hidden_dim: int = 512
    num_layers: int = 2
    num_resnet_blocks: int = 3
    channels: int = 80
    kernel_size: int = 3

    @property
    def code_stride(self) -> int:
        return 2 ** self.num_layers  # mel frames per code

    def setup(self):
        enc_chans = [self.hidden_dim * 2 ** i for i in range(self.num_layers)]
        dec_chans = list(reversed(enc_chans))
        inner = dec_chans[0]
        self.enc_convs = [
            _StridedConv(c, self.kernel_size, name=f"enc_conv_{i}")
            for i, c in enumerate(enc_chans)
        ]
        self.enc_res = [
            _ResBlock(inner, name=f"enc_res_{i}") for i in range(self.num_resnet_blocks)
        ]
        self.enc_out = nn.Dense(self.codebook_dim, name="enc_out")  # 1×1 conv
        self.dec_in = nn.Dense(inner, name="dec_in")  # 1×1 conv codebook→inner
        self.dec_res = [
            _ResBlock(inner, name=f"dec_res_{i}") for i in range(self.num_resnet_blocks)
        ]
        # torch dec_chans = [inner, *reversed(enc_chans)]: upsample stage i
        # maps → reversed(enc_chans)[i] (inner→…→hidden_dim)
        self.dec_ups = [
            _UpsampledConv(c, self.kernel_size, name=f"dec_up_{i}")
            for i, c in enumerate(dec_chans)
        ]
        self.dec_out = nn.Dense(self.channels, name="dec_out")
        self.embed = self.param(
            "embed",
            nn.initializers.normal(1.0),
            (self.codebook_dim, self.num_tokens),
        )

    # ------------------------------------------------------------- encoder
    def encode_latents(self, mel):
        """mel `[B, T, C]` → pre-quantization latents `[B, T/4, codebook_dim]`."""
        h = mel
        for c in self.enc_convs:
            h = nn.relu(c(h))
        for r in self.enc_res:
            h = r(h)
        return self.enc_out(h)

    def get_codebook_indices(self, mel):
        """Nearest-codebook assignment (ref dvae.py:325 get_codebook_indices
        → Quantize.forward distance argmax)."""
        z = self.encode_latents(mel)  # [B, Tc, D]
        # dist = |z|² - 2 z·E + |E|²  (argmin == argmax of -dist)
        ze = jnp.einsum("btd,dn->btn", z, self.embed, preferred_element_type=jnp.float32)
        dist = (
            jnp.sum(z.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
            - 2 * ze
            + jnp.sum(self.embed.astype(jnp.float32) ** 2, axis=0)[None, None]
        )
        return jnp.argmin(dist, axis=-1).astype(jnp.int32)

    # ------------------------------------------------------------- decoder
    def decode(self, codes):
        """codes `[B, Tc]` → mel `[B, Tc*4, C]` (ref dvae.py:333 decode)."""
        h = jnp.take(self.embed.T, codes, axis=0)  # embed_code
        h = self.dec_in(h)
        for r in self.dec_res:
            h = r(h)
        for u in self.dec_ups:
            h = nn.relu(u(h))
        return self.dec_out(h)

    def __call__(self, mel):
        """Eval-mode autoencode (quantized roundtrip): returns
        (recon mel, codes). Training the DVAE itself is out of scope — the
        framework fine-tunes the GPT against a released DVAE."""
        codes = self.get_codebook_indices(mel)
        return self.decode(codes), codes


def convert_dvae_torch_state_dict(state_dict) -> Dict:
    """Released `dvae.pth` torch state dict → our flax tree."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    if "model" in state_dict and not hasattr(state_dict.get("model"), "shape"):
        sd = {k: np.asarray(v) for k, v in state_dict["model"].items()}

    def conv_k(v):  # [out, in, k] → [k, in, out]
        return np.transpose(v, (2, 1, 0))

    def dense_k(v):  # 1×1 conv [out, in, 1] → [in, out]
        return np.transpose(v[:, :, 0], (1, 0))

    import re

    out: Dict = {"embed": sd["codebook.embed"]}
    n_layers = len([k for k in sd if re.fullmatch(r"encoder\.\d+\.0\.weight", k)])
    n_res = len({k.split(".")[1] for k in sd if ".net.0.weight" in k and k.startswith("encoder")})

    def put(path, leaf):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    for i in range(n_layers):  # strided conv stages: encoder.{i}.0
        put(f"enc_conv_{i}/conv/kernel", conv_k(sd[f"encoder.{i}.0.weight"]))
        put(f"enc_conv_{i}/conv/bias", sd[f"encoder.{i}.0.bias"])
    for j in range(n_res):  # resblocks: encoder.{n_layers + j}.net.{0,2,4}
        base = f"encoder.{n_layers + j}.net"
        put(f"enc_res_{j}/c0/kernel", conv_k(sd[f"{base}.0.weight"]))
        put(f"enc_res_{j}/c0/bias", sd[f"{base}.0.bias"])
        put(f"enc_res_{j}/c2/kernel", conv_k(sd[f"{base}.2.weight"]))
        put(f"enc_res_{j}/c2/bias", sd[f"{base}.2.bias"])
        put(f"enc_res_{j}/c4/kernel", conv_k(sd[f"{base}.4.weight"]))
        put(f"enc_res_{j}/c4/bias", sd[f"{base}.4.bias"])
    last = n_layers + n_res
    put("enc_out/kernel", dense_k(sd[f"encoder.{last}.weight"]))
    put("enc_out/bias", sd[f"encoder.{last}.bias"])

    # decoder Sequential: [conv1x1, RB×n_res, UpsampledConv-Seq×n_layers, conv1x1]
    put("dec_in/kernel", dense_k(sd["decoder.0.weight"]))
    put("dec_in/bias", sd["decoder.0.bias"])
    for j in range(n_res):
        base = f"decoder.{1 + j}.net"
        put(f"dec_res_{j}/c0/kernel", conv_k(sd[f"{base}.0.weight"]))
        put(f"dec_res_{j}/c0/bias", sd[f"{base}.0.bias"])
        put(f"dec_res_{j}/c2/kernel", conv_k(sd[f"{base}.2.weight"]))
        put(f"dec_res_{j}/c2/bias", sd[f"{base}.2.bias"])
        put(f"dec_res_{j}/c4/kernel", conv_k(sd[f"{base}.4.weight"]))
        put(f"dec_res_{j}/c4/bias", sd[f"{base}.4.bias"])
    for i in range(n_layers):
        base = f"decoder.{1 + n_res + i}.0.conv"
        put(f"dec_up_{i}/conv/kernel", conv_k(sd[f"{base}.weight"]))
        put(f"dec_up_{i}/conv/bias", sd[f"{base}.bias"])
    last_dec = 1 + n_res + n_layers
    put("dec_out/kernel", dense_k(sd[f"decoder.{last_dec}.weight"]))
    put("dec_out/bias", sd[f"decoder.{last_dec}.bias"])
    return out
