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
    """6 × strided 2D convs over the reference mel + GRU (ref gst_layers.py:57)."""

    embedding_dim: int = 128

    @nn.compact
    def __call__(self, mel):
        # mel: [B, T, C] -> image [B, T, C, 1]
        h = mel[..., None]
        for i, ch in enumerate((32, 32, 64, 64, 128, 128)):
            h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME", name=f"conv_{i}")(h)
            h = nn.relu(nn.LayerNorm(name=f"norm_{i}")(h))
        B, T2, F2, C2 = h.shape
        h = h.reshape(B, T2, F2 * C2)
        out = nn.RNN(nn.GRUCell(self.embedding_dim), name="gru")(h)
        return out[:, -1]  # [B, E]


class StyleTokenLayer(nn.Module):
    """Multi-head attention over learned style tokens (ref gst_layers.py:97)."""

    num_style_tokens: int = 10
    gst_embedding_dim: int = 256
    num_heads: int = 4

    @nn.compact
    def __call__(self, query, token_weights: Optional[jnp.ndarray] = None):
        """query `[B, E]` (ref-encoder output) → style embedding `[B, gst_dim]`."""
        B = query.shape[0]
        tokens = self.param(
            "style_tokens",
            nn.initializers.normal(0.5),
            (self.num_style_tokens, self.gst_embedding_dim // self.num_heads),
        )
        keys = jnp.tanh(tokens)[None]  # [1, K, D]
        keys = jnp.broadcast_to(keys, (B,) + keys.shape[1:])
        if token_weights is not None:
            # direct token weighting (gst_style_input_weights)
            vals = nn.Dense(self.gst_embedding_dim, name="value_proj")(keys)
            return jnp.einsum("bk,bkd->bd", token_weights, vals)
        q = nn.Dense(self.gst_embedding_dim, name="query_proj")(query)[:, None]
        k = nn.Dense(self.gst_embedding_dim, name="key_proj")(keys)
        v = nn.Dense(self.gst_embedding_dim, name="value_proj")(keys)
        H = self.num_heads
        D = self.gst_embedding_dim // H
        qh = q.reshape(B, 1, H, D)
        kh = k.reshape(B, -1, H, D)
        vh = v.reshape(B, -1, H, D)
        att = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(D)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, vh).reshape(B, self.gst_embedding_dim)
        return out


class GST(nn.Module):
    """Reference encoder + style token layer (ref gst_layers.py:7)."""

    num_mel: int = 80
    num_heads: int = 4
    num_style_tokens: int = 10
    gst_embedding_dim: int = 256

    @nn.compact
    def __call__(self, style_mel=None, token_weights=None):
        stl = StyleTokenLayer(self.num_style_tokens, self.gst_embedding_dim, self.num_heads, name="style_token_layer")
        if style_mel is not None:
            query = ReferenceEncoder(128, name="ref_encoder")(style_mel)
            return stl(query)
        return stl(jnp.zeros((1, 128)), token_weights=token_weights)


class CapacitronVAE(nn.Module):
    """Prosody VAE with capacity constraint (ref capacitron_layers.py:12)."""

    num_mel: int = 80
    capacitron_VAE_embedding_dim: int = 128
    text_summary_embedding_dim: Optional[int] = 128
    speaker_embedding_dim: Optional[int] = None

    @nn.compact
    def __call__(self, reference_mel=None, text_summary=None, speaker_embedding=None, rng=None):
        """Returns (VAE embedding `[B, E]`, posterior mean, posterior log-var)."""
        enc = ReferenceEncoder(128, name="ref_encoder")(reference_mel)
        feats = [enc]
        if text_summary is not None and self.text_summary_embedding_dim:
            ts = nn.RNN(nn.OptimizedLSTMCell(self.text_summary_embedding_dim), name="text_summary_rnn")(text_summary)
            feats.append(ts[:, -1])
        if speaker_embedding is not None:
            feats.append(speaker_embedding)
        h = jnp.concatenate(feats, axis=-1)
        stats = nn.Dense(2 * self.capacitron_VAE_embedding_dim, name="post_proj")(h)
        mu, logvar = jnp.split(stats, 2, axis=-1)
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
