"""Global Style Tokens + Capacitron prosody VAE (flax).

Mirrors of /root/reference/TTS/tts/layers/tacotron/{gst_layers.py:149,
capacitron_layers.py:205}: a reference-mel encoder + multi-head attention
over learned style tokens (GST), and a Gaussian prosody VAE with text/speaker
summaries (Capacitron).
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ReferenceEncoder(nn.Module):
    """6 × strided 3×3 2D convs over the reference mel + RNN over the
    flattened [channels · freq] rows (ref gst_layers.py:26 with GRU and
    padding 1; capacitron_layers.py:78 with LSTM, padding 2, and per-layer
    length masking). `out_dim` is the RNN hidden size; the reference GST
    passes `gst_embedding_dim // 2`."""

    out_dim: int = 128
    rnn_type: str = "gru"  # "gru" (GST) or "lstm" (Capacitron)
    pad: int = 1  # GST: 1; Capacitron: 2
    masked: bool = False  # Capacitron masks conv outputs by valid length
    norm_type: str = "layer"

    def _norm(self, features, name, x, train):
        from tpu_tts.layers.tacotron import _apply_norm

        # ref gst_layers.py:45 / capacitron_layers.py:98: BatchNorm2d defaults
        return _apply_norm(self.norm_type, features, name, x, train)

    @nn.compact
    def __call__(self, mel, mel_lengths=None, train: bool = False):
        # mel: [B, T, M] -> image [B, T, M, 1]
        h = mel[..., None]
        B, T, M = mel.shape
        valid = mel_lengths.astype(jnp.float32) if mel_lengths is not None else None
        p = self.pad
        for i, ch in enumerate((32, 32, 64, 64, 128, 128)):
            h = nn.Conv(ch, (3, 3), strides=(2, 2),
                        padding=((p, p), (p, p)), name=f"conv_{i}")(h)
            h = nn.relu(self._norm(ch, f"norm_{i}", h, train))
            if self.masked and valid is not None:
                # ref capacitron_layers.py:128: valid = ceil(valid/2) + 1
                valid = jnp.ceil(valid / 2.0) + 1.0
                vi = jnp.minimum(valid.astype(jnp.int32), h.shape[1])
                mask = (jnp.arange(h.shape[1])[None, :] < vi[:, None]).astype(h.dtype)
                h = h * mask[:, :, None, None]
        # [B, T', M', C] -> [B, T', C·M'] matching the reference's
        # channel-major flatten (transpose(1,2) then view)
        B_, T2, F2, C2 = h.shape
        h = jnp.transpose(h, (0, 1, 3, 2)).reshape(B_, T2, C2 * F2)
        cell = (nn.GRUCell(self.out_dim, name="rnn_cell") if self.rnn_type == "gru"
                else nn.OptimizedLSTMCell(self.out_dim, name="rnn_cell"))
        out = nn.RNN(cell, name="rnn")(h)
        if self.masked and valid is not None:
            idx = jnp.clip(vi - 1, 0, out.shape[1] - 1)
            return jnp.take_along_axis(out, idx[:, None, None], axis=1)[:, 0]
        return out[:, -1]  # final RNN state


class MultiHeadStyleAttention(nn.Module):
    """GST multi-head attention (ref gst_layers.py:111): bias-free q/k/v
    projections, scores scaled by sqrt(key_dim)."""

    num_units: int
    num_heads: int
    key_dim: int

    @nn.compact
    def __call__(self, query, key):
        q = nn.Dense(self.num_units, use_bias=False, name="W_query")(query)
        k = nn.Dense(self.num_units, use_bias=False, name="W_key")(key)
        v = nn.Dense(self.num_units, use_bias=False, name="W_value")(key)
        H, D = self.num_heads, self.num_units // self.num_heads
        B, Tq, _ = q.shape
        Tk = k.shape[1]
        att = jnp.einsum(
            "bqhd,bkhd->bhqk", q.reshape(B, Tq, H, D), k.reshape(B, Tk, H, D)
        ) / (self.key_dim**0.5)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v.reshape(B, Tk, H, D))
        return out.reshape(B, Tq, self.num_units)


class StyleTokenLayer(nn.Module):
    """Multi-head attention over learned style tokens (ref gst_layers.py:82).
    Tokens live in `key_dim = gst_dim // num_heads`; the query is the
    `gst_dim // 2`-wide reference encoding."""

    num_style_tokens: int = 10
    gst_embedding_dim: int = 256
    num_heads: int = 4

    @nn.compact
    def __call__(self, query, token_weights: Optional[jnp.ndarray] = None):
        """query `[B, E]` (ref-encoder output) → style embedding `[B, gst_dim]`."""
        B = query.shape[0]
        key_dim = self.gst_embedding_dim // self.num_heads
        tokens = self.param(
            "style_tokens", nn.initializers.normal(0.5), (self.num_style_tokens, key_dim)
        )
        attention = MultiHeadStyleAttention(
            self.gst_embedding_dim, self.num_heads, key_dim, name="attention"
        )
        keys = jnp.broadcast_to(jnp.tanh(tokens)[None], (B, self.num_style_tokens, key_dim))
        if token_weights is not None:
            # per-token weighting (ref base_tacotron.py:232 dict style input);
            # with a single key the softmax is 1, so each token contributes
            # its W_value projection scaled by its weight
            out = jnp.zeros((B, self.gst_embedding_dim), dtype=query.dtype)
            for kth in range(self.num_style_tokens):
                tok = attention(jnp.zeros((B, 1, query.shape[-1]), query.dtype), keys[:, kth : kth + 1])
                out = out + tok[:, 0] * token_weights[:, kth : kth + 1]
            return out
        return attention(query[:, None], keys)[:, 0]


class GST(nn.Module):
    """Reference encoder + style token layer (ref gst_layers.py:6)."""

    num_mel: int = 80
    num_heads: int = 4
    num_style_tokens: int = 10
    gst_embedding_dim: int = 256
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, style_mel=None, token_weights=None, speaker_embedding=None, train: bool = False):
        stl = StyleTokenLayer(self.num_style_tokens, self.gst_embedding_dim, self.num_heads,
                              name="style_token_layer")
        if style_mel is not None:
            query = ReferenceEncoder(
                self.gst_embedding_dim // 2, norm_type=self.norm_type, name="encoder"
            )(style_mel, train=train)
            if speaker_embedding is not None:
                query = jnp.concatenate([query, speaker_embedding], axis=-1)
            return stl(query)
        return stl(jnp.zeros((1, self.gst_embedding_dim // 2)), token_weights=token_weights)


class CapacitronVAE(nn.Module):
    """Prosody VAE with capacity constraint (ref capacitron_layers.py:7).
    `logvar` is the log of the reference's softplus-parameterised diagonal
    covariance, so `z = mu + exp(logvar/2)·eps` reproduces `MVN.rsample`."""

    num_mel: int = 80
    capacitron_VAE_embedding_dim: int = 128
    text_summary_embedding_dim: Optional[int] = 128
    speaker_embedding_dim: Optional[int] = None
    reference_encoder_out_dim: int = 128
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, reference_mel=None, text_summary=None, speaker_embedding=None,
                 rng=None, reference_mel_lengths=None, text_lengths=None, train: bool = False):
        """Returns (VAE embedding `[B, E]`, posterior mean, posterior log-var)."""
        if reference_mel_lengths is None and reference_mel is not None:
            reference_mel_lengths = jnp.full((reference_mel.shape[0],), reference_mel.shape[1])
        enc = ReferenceEncoder(
            self.reference_encoder_out_dim, rnn_type="lstm", pad=2, masked=True,
            norm_type=self.norm_type, name="encoder",
        )(reference_mel, reference_mel_lengths, train=train)
        feats = [enc]
        if text_summary is not None and self.text_summary_embedding_dim:
            ts = nn.RNN(
                nn.OptimizedLSTMCell(self.text_summary_embedding_dim, name="text_summary_cell"), name="text_summary_net"
            )(text_summary)
            if text_lengths is not None:
                idx = jnp.clip(text_lengths.astype(jnp.int32) - 1, 0, ts.shape[1] - 1)
                feats.append(jnp.take_along_axis(ts, idx[:, None, None], axis=1)[:, 0])
            else:
                feats.append(ts[:, -1])
        if speaker_embedding is not None:
            feats.append(speaker_embedding)
        h = jnp.concatenate(feats, axis=-1)
        # ref PostEncoderMLP (capacitron_layers.py:187): Linear→tanh→Linear(2h)
        h = jnp.tanh(nn.Dense(self.capacitron_VAE_embedding_dim, name="net_0")(h))
        stats = nn.Dense(2 * self.capacitron_VAE_embedding_dim, name="net_2")(h)
        mu = stats[..., : self.capacitron_VAE_embedding_dim]
        sigma = jax.nn.softplus(stats[..., self.capacitron_VAE_embedding_dim :])
        logvar = jnp.log(sigma + 1e-12)  # sigma is the diagonal covariance
        # Lagrange multiplier for the KL capacity constraint, init so
        # softplus(beta_raw) == 1 (ref capacitron_layers.py:31)
        beta_raw = self.param("beta", lambda k: jnp.asarray([float(np.log(np.e - 1.0))], dtype=jnp.float32))
        if rng is None:
            rng = self.make_rng("capacitron")
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        return z, mu, logvar, beta_raw


def capacitron_kl_loss(mu, logvar, capacity: float, beta: jnp.ndarray):
    """|KL - capacity| Lagrangian term (ref capacitron optimizer scheme)."""
    kl = -0.5 * jnp.mean(jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=-1))
    return beta * (kl - capacity), kl


def capacitron_loss_terms(outputs, cap_cfg: dict):
    """Shared Lagrangian loss terms for Tacotron-family models
    (ref losses.py:394-440). Returns (loss_term, logs): the value added to the
    primary loss plus a grad-only beta term (see Tacotron2.loss_fn)."""
    cap = float(cap_cfg.get("capacitron_capacity", 150))
    alpha = float(cap_cfg.get("capacitron_VAE_loss_alpha", 0.25))
    beta = jax.nn.softplus(outputs["capacitron_beta_raw"].astype(jnp.float32))[0]
    _, kl = capacitron_kl_loss(outputs["capacitron_mu"], outputs["capacitron_logvar"], cap, 1.0)
    kl_capacity = kl - cap
    T_D = outputs["decoder_outputs"].shape[1] * outputs["decoder_outputs"].shape[2]
    l_cap = jax.lax.stop_gradient(beta) * kl_capacity / T_D * alpha
    beta_loss = -beta * jax.lax.stop_gradient(kl_capacity)
    term = l_cap + (beta_loss - jax.lax.stop_gradient(beta_loss))
    logs = {
        "capacitron_vae_loss": l_cap,
        "capacitron_vae_beta_loss": beta_loss,
        "capacitron_kl": kl,
        "capacitron_beta": beta,
    }
    return term, logs


def capacitron_dual_optimizer(config, primary_fallback):
    """optax.multi_transform: `capacitron_vae_layer.beta` → SGD, rest → primary
    (ref utils/capacitron_optimizer.py:6)."""
    import optax

    from tpu_tts.train.optimizers import get_optimizer

    params_cfg = config.optimizer_params or {}
    names = [k for k in params_cfg if isinstance(params_cfg.get(k), dict)]
    if len(names) >= 2:
        primary = get_optimizer(names[0], dict(params_cfg[names[0]]), config.lr, config)
        secondary = dict(params_cfg[names[1]])
    else:
        primary = primary_fallback()
        secondary = {"lr": 1e-5, "momentum": 0.9}
    # Capacitron recipes set grad_clip=0 and rely on capacitron_grad_clip
    # (ref tts/models/tacotron2.py:377): apply it around the primary transform.
    cap_clip = float(getattr(getattr(config, "capacitron_vae", None), "capacitron_grad_clip", 0.0) or 0.0)
    base_clip = config.grad_clip
    if isinstance(base_clip, (list, tuple)):
        base_clip = max(base_clip)
    if cap_clip > 0 and not (base_clip and base_clip > 0):
        primary = optax.chain(optax.clip_by_global_norm(cap_clip), primary)
    sgd = optax.sgd(secondary.get("lr", 1e-5), momentum=secondary.get("momentum", 0.0) or None)

    def label_fn(params):
        def label(path, _):
            keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            return "beta" if ("capacitron_vae_layer" in keys and keys[-1] == "beta") else "primary"

        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform({"primary": primary, "beta": sgd}, label_fn)
