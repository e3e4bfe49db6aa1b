"""Discrete VAE over mel spectrograms (mel → code indices), the tokenizer of
the XTTS GPT (mirror of /root/reference/TTS/tts/layers/xtts/dvae.py)."""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class DiscreteVAE(nn.Module):
    num_tokens: int = 1024
    codebook_dim: int = 512
    hidden_channels: int = 512
    num_resnet_blocks: int = 3
    in_channels: int = 80
    stride: int = 4  # temporal downsampling (2 conv stride-2 stages)

    def setup(self):
        self.codebook = nn.Embed(self.num_tokens, self.codebook_dim)
        self.enc_convs = [
            nn.Conv(self.hidden_channels, (4,), strides=(2,), padding="SAME"),
            nn.Conv(self.hidden_channels, (4,), strides=(2,), padding="SAME"),
        ]
        self.enc_res = [nn.Conv(self.hidden_channels, (3,), padding="SAME") for _ in range(self.num_resnet_blocks)]
        self.to_codes = nn.Conv(self.num_tokens, (1,))
        self.dec_in = nn.Conv(self.hidden_channels, (1,))
        self.dec_res = [nn.Conv(self.hidden_channels, (3,), padding="SAME") for _ in range(self.num_resnet_blocks)]
        self.dec_out = nn.Dense(self.in_channels * self.stride)

    def encode(self, mel):
        """mel `[B, T, C]` → logits `[B, T/stride, num_tokens]`."""
        h = mel
        for c in self.enc_convs:
            h = nn.relu(c(h))
        for r in self.enc_res:
            h = h + nn.relu(r(h))
        return self.to_codes(h)

    def get_codebook_indices(self, mel):
        return jnp.argmax(self.encode(mel), axis=-1)

    def decode(self, codes):
        """codes `[B, T_c]` → mel `[B, T_c*stride, C]`."""
        h = self.codebook(codes)
        h = nn.relu(self.dec_in(h))
        for r in self.dec_res:
            h = h + nn.relu(r(h))
        out = self.dec_out(h)  # [B, T_c, C*stride]
        B, Tc, _ = out.shape
        return out.reshape(B, Tc * self.stride, self.in_channels)

    def __call__(self, mel, temperature: float = 1.0):
        """Gumbel-softmax straight-through training pass. Returns
        (recon, soft-code KL, code logits)."""
        logits = self.encode(mel)
        g = -jnp.log(-jnp.log(jax.random.uniform(self.make_rng("gumbel"), logits.shape, minval=1e-9, maxval=1 - 1e-9)))
        soft = jax.nn.softmax((logits + g) / temperature, axis=-1)
        hard = jax.nn.one_hot(jnp.argmax(soft, axis=-1), self.num_tokens)
        codes_onehot = hard + soft - jax.lax.stop_gradient(soft)  # straight-through
        h = codes_onehot @ self.codebook.embedding
        h = nn.relu(self.dec_in(h))
        for r in self.dec_res:
            h = h + nn.relu(r(h))
        out = self.dec_out(h)
        B, Tc, _ = out.shape
        recon = out.reshape(B, Tc * self.stride, self.in_channels)
        logp = jax.nn.log_softmax(logits, axis=-1)
        kl = jnp.mean(jnp.sum(jnp.exp(logp) * (logp - (-jnp.log(self.num_tokens))), axis=-1))
        return recon, kl, logits
