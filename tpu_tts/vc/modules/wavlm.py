"""WavLM content encoder — exact flax re-implementation of the reference's
vendored fairseq WavLM (/root/reference/TTS/vc/modules/freevc/wavlm/wavlm.py:218
`WavLM`, :363 `ConvFeatureExtractionModel`, :481 `TransformerEncoder`, :593
`TransformerSentenceEncoderLayer`; modules.py:283 `MultiheadAttention` with
T5-style bucketed relative position bias :387-:422 and WavLM's gated
("gru_rel_pos") per-layer rescaling of that bias :493-:506).

FreeVC consumes eval-mode last-layer features (`wavlm.extract_features(y)[0]`,
freevc.py:481-489), so this is inference-only: dropout/masking paths are
omitted. Channels-last `[B, T, C]`; the released `WavLM-Large.pt` weights
(embedded inside the freevc24 checkpoint as `wavlm.*`) ingest through
`convert_wavlm_torch_state_dict` — parity-tested against the vendored torch
modules in tests/test_torch_parity_wavlm.py.
"""

import math
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# WavLM-Large defaults (the cfg stored in the released WavLM-Large.pt)
_LARGE_CONV_LAYERS = ((512, 10, 5),) + ((512, 3, 2),) * 4 + ((512, 2, 2),) * 2


@dataclass(frozen=True)
class WavLMConfig:
    """Subset of the fairseq WavLMConfig (wavlm.py:156) that affects the
    eval-mode forward. Defaults = WavLM-Large."""

    extractor_mode: str = "layer_norm"  # "default": group-norm on conv 0 only
    encoder_layers: int = 24
    encoder_embed_dim: int = 1024
    encoder_ffn_embed_dim: int = 4096
    encoder_attention_heads: int = 16
    layer_norm_first: bool = True
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = _LARGE_CONV_LAYERS
    conv_bias: bool = True
    conv_pos: int = 128
    conv_pos_groups: int = 16
    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    gru_rel_pos: bool = True

    @staticmethod
    def from_fairseq_cfg(cfg: Dict) -> "WavLMConfig":
        """Build from the `cfg` dict stored in a fairseq WavLM checkpoint."""
        layers = cfg.get("conv_feature_layers")
        if isinstance(layers, str):
            layers = tuple(tuple(t) for t in eval(layers))  # fairseq stores a python literal
        kw = {f: cfg[f] for f in WavLMConfig.__dataclass_fields__ if f in cfg}
        if layers is not None:
            kw["conv_feature_layers"] = layers
        return WavLMConfig(**kw)


def _ln_fp32(x, scale, bias, eps=1e-5):
    """torch Fp32LayerNorm semantics: normalize in fp32, cast back."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


class _LayerNorm(nn.Module):
    """Affine layer norm with fp32 compute (torch LayerNorm default eps)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return _ln_fp32(x, scale, bias, self.eps)


class _FeatureExtractor(nn.Module):
    """ConvFeatureExtractionModel (wavlm.py:363, conv_type "default"):
    VALID-padded strided conv1d stack with per-block fp32 layer norm
    ("layer_norm" mode) or a single fp32 group norm on block 0 ("default"),
    exact-erf GELU."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, wav):  # [B, T_samples] → [B, T_frames, C_last]
        x = wav[:, :, None]
        for i, (dim, k, s) in enumerate(self.cfg.conv_feature_layers):
            x = nn.Conv(
                dim, (k,), strides=(s,), padding="VALID",
                use_bias=self.cfg.conv_bias, name=f"conv_{i}",
            )(x)
            if self.cfg.extractor_mode == "layer_norm":
                x = _LayerNorm(dim, name=f"ln_{i}")(x)
            elif i == 0:
                # Fp32GroupNorm(dim, dim): per-channel normalization over time
                xf = x.astype(jnp.float32)
                mu = xf.mean(axis=1, keepdims=True)
                var = ((xf - mu) ** 2).mean(axis=1, keepdims=True)
                xf = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
                scale = self.param("gn_scale", nn.initializers.ones, (dim,))
                bias = self.param("gn_bias", nn.initializers.zeros, (dim,))
                x = (xf * scale + bias).astype(x.dtype)
            x = jax.nn.gelu(x, approximate=False)
        return x


def _relative_position_buckets(T: int, num_buckets: int, max_distance: int) -> jnp.ndarray:
    """Bidirectional T5 bucketing (modules.py:387 `_relative_positions_bucket`)."""
    ctx = jnp.arange(T)[:, None]
    mem = jnp.arange(T)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(jnp.int32) * nb
    rel = jnp.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return buckets + jnp.where(is_small, rel, large)


class _SelfAttention(nn.Module):
    """MultiheadAttention (modules.py:283) eval fast path: separate q/k/v
    projections, optional shared relative position bias (computed by the
    first layer, reused by the rest), per-layer gated rescaling of the bias
    when `gru_rel_pos` (modules.py:493-506)."""

    cfg: WavLMConfig
    has_relative_attention_bias: bool = False

    @nn.compact
    def __call__(self, x, pos_bias=None, key_padding_mask=None):
        c = self.cfg
        B, T, C = x.shape
        H = c.encoder_attention_heads
        D = C // H
        if self.has_relative_attention_bias and pos_bias is None:
            rel_embed = self.param(
                "rel_attn_embed", nn.initializers.normal(0.02), (c.num_buckets, H)
            )
            buckets = _relative_position_buckets(T, c.num_buckets, c.max_distance)
            pos_bias = jnp.transpose(rel_embed[buckets], (2, 0, 1))  # [H, T, T]

        q = nn.Dense(C, name="q_proj")(x).reshape(B, T, H, D)
        k = nn.Dense(C, name="k_proj")(x).reshape(B, T, H, D)
        v = nn.Dense(C, name="v_proj")(x).reshape(B, T, H, D)

        mask = None
        if pos_bias is not None:
            mask = pos_bias[None].astype(jnp.float32)  # [1, H, T, T]
            if c.gru_rel_pos:
                grep_a = self.param("grep_a", nn.initializers.ones, (1, H, 1, 1))
                qh = jnp.transpose(q, (0, 2, 1, 3))  # [B, H, T, D]
                gates = jax.nn.sigmoid(
                    nn.Dense(8, name="grep_linear")(qh).reshape(B, H, T, 2, 4).sum(-1)
                )
                gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]  # [B, H, T, 1]
                gate = gate_a * (gate_b * grep_a - 1.0) + 2.0  # [B, H, T, 1]
                mask = gate.astype(jnp.float32) * mask

        scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) / math.sqrt(D)
        if mask is not None:
            scores = scores + mask
        if key_padding_mask is not None:  # True = pad (ref semantics)
            scores = jnp.where(key_padding_mask[:, None, None, :], -1e9, scores)
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, C)
        return nn.Dense(C, name="out_proj")(out), pos_bias


class _EncoderLayer(nn.Module):
    """TransformerSentenceEncoderLayer (wavlm.py:593), gelu activation,
    pre- or post-norm per `layer_norm_first`."""

    cfg: WavLMConfig
    has_relative_attention_bias: bool = False

    @nn.compact
    def __call__(self, x, pos_bias=None, key_padding_mask=None):
        c = self.cfg
        attn = _SelfAttention(c, self.has_relative_attention_bias, name="attn")
        ln1 = _LayerNorm(c.encoder_embed_dim, name="ln1")
        ln2 = _LayerNorm(c.encoder_embed_dim, name="ln2")
        fc1 = nn.Dense(c.encoder_ffn_embed_dim, name="fc1")
        fc2 = nn.Dense(c.encoder_embed_dim, name="fc2")
        if c.layer_norm_first:
            a, pos_bias = attn(ln1(x), pos_bias, key_padding_mask)
            x = x + a
            x = x + fc2(jax.nn.gelu(fc1(ln2(x)), approximate=False))
        else:
            a, pos_bias = attn(x, pos_bias, key_padding_mask)
            x = ln1(x + a)
            x = ln2(x + fc2(jax.nn.gelu(fc1(x), approximate=False)))
        return x, pos_bias


class _Encoder(nn.Module):
    """TransformerEncoder (wavlm.py:481): grouped weight-norm-folded conv
    positional embedding (SamePad trims one step for even kernels) + layers."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        c = self.cfg
        if key_padding_mask is not None:
            x = jnp.where(key_padding_mask[..., None], 0, x)
        pc = nn.Conv(
            c.encoder_embed_dim, (c.conv_pos,), padding=[(c.conv_pos // 2, c.conv_pos // 2)],
            feature_group_count=c.conv_pos_groups, name="pos_conv",
        )(x)
        if c.conv_pos % 2 == 0:
            pc = pc[:, :-1]
        x = x + jax.nn.gelu(pc, approximate=False)
        if not c.layer_norm_first:
            x = _LayerNorm(c.encoder_embed_dim, name="ln")(x)
        pos_bias = None
        for i in range(c.encoder_layers):
            x, pos_bias = _EncoderLayer(
                c,
                has_relative_attention_bias=(c.relative_position_embedding and i == 0),
                name=f"layers_{i}",
            )(x, pos_bias, key_padding_mask)
        if c.layer_norm_first:
            x = _LayerNorm(c.encoder_embed_dim, name="ln")(x)
        return x


class WavLM(nn.Module):
    """Eval-mode `WavLM.extract_features(source)[0]` (wavlm.py:313-361)."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, wav, key_padding_mask=None):  # wav [B, T_samples]
        c = self.cfg
        embed = c.conv_feature_layers[-1][0]
        feats = _FeatureExtractor(c, name="feature_extractor")(wav)
        feats = _LayerNorm(embed, name="pre_ln")(feats)
        if key_padding_mask is not None:
            # forward_padding_mask (wavlm.py:300): frame is pad iff ANY of its
            # sample window is pad
            T = feats.shape[1]
            spf = key_padding_mask.shape[1] // T
            key_padding_mask = key_padding_mask[:, : T * spf].reshape(
                key_padding_mask.shape[0], T, spf
            ).any(-1)
        if embed != c.encoder_embed_dim:
            feats = nn.Dense(c.encoder_embed_dim, name="post_extract_proj")(feats)
        return _Encoder(c, name="encoder")(feats, key_padding_mask)


# ------------------------------------------------------------- torch ingest
def _t(w):
    return np.asarray(w).T


def _conv_k(w):  # torch [out, in/groups, k] → flax [k, in/groups, out]
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def convert_wavlm_torch_state_dict(sd: Dict, prefix: str = "") -> Dict:
    """Vendored-torch WavLM `state_dict()` → this module's param tree.
    `prefix` strips e.g. "wavlm." when the weights are embedded inside a
    FreeVC checkpoint."""
    sd = {k[len(prefix):]: np.asarray(v) for k, v in sd.items() if k.startswith(prefix)}
    out: Dict = {}

    def setp(path, val):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(val)

    n_conv = len([k for k in sd if k.startswith("feature_extractor.conv_layers") and k.endswith(".0.weight")])
    for i in range(n_conv):
        setp(f"feature_extractor/conv_{i}/kernel", _conv_k(sd[f"feature_extractor.conv_layers.{i}.0.weight"]))
        if f"feature_extractor.conv_layers.{i}.0.bias" in sd:
            setp(f"feature_extractor/conv_{i}/bias", sd[f"feature_extractor.conv_layers.{i}.0.bias"])
        if f"feature_extractor.conv_layers.{i}.2.1.weight" in sd:  # layer_norm mode
            setp(f"feature_extractor/ln_{i}/scale", sd[f"feature_extractor.conv_layers.{i}.2.1.weight"])
            setp(f"feature_extractor/ln_{i}/bias", sd[f"feature_extractor.conv_layers.{i}.2.1.bias"])
        elif f"feature_extractor.conv_layers.{i}.2.weight" in sd:  # default mode group norm
            setp("feature_extractor/gn_scale", sd[f"feature_extractor.conv_layers.{i}.2.weight"])
            setp("feature_extractor/gn_bias", sd[f"feature_extractor.conv_layers.{i}.2.bias"])

    setp("pre_ln/scale", sd["layer_norm.weight"])
    setp("pre_ln/bias", sd["layer_norm.bias"])
    if "post_extract_proj.weight" in sd:
        setp("post_extract_proj/kernel", _t(sd["post_extract_proj.weight"]))
        setp("post_extract_proj/bias", sd["post_extract_proj.bias"])

    # pos_conv: fold weight norm (dim=2 → g over [1, 1, K]); old fairseq
    # (weight_g/weight_v) and new parametrizations naming both occur
    if "encoder.pos_conv.0.weight_g" in sd:
        g, v = sd["encoder.pos_conv.0.weight_g"], sd["encoder.pos_conv.0.weight_v"]
    else:
        g = sd["encoder.pos_conv.0.parametrizations.weight.original0"]
        v = sd["encoder.pos_conv.0.parametrizations.weight.original1"]
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True) + 0.0)
    setp("encoder/pos_conv/kernel", _conv_k(v / norm * g))
    setp("encoder/pos_conv/bias", sd["encoder.pos_conv.0.bias"])

    n_layers = len([k for k in sd if k.startswith("encoder.layers.") and k.endswith(".fc1.weight")])
    for i in range(n_layers):
        p = f"encoder.layers.{i}"
        q = f"encoder/layers_{i}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            setp(f"{q}/attn/{name}/kernel", _t(sd[f"{p}.self_attn.{name}.weight"]))
            setp(f"{q}/attn/{name}/bias", sd[f"{p}.self_attn.{name}.bias"])
        if f"{p}.self_attn.relative_attention_bias.weight" in sd:
            setp(f"{q}/attn/rel_attn_embed", sd[f"{p}.self_attn.relative_attention_bias.weight"])
        if f"{p}.self_attn.grep_linear.weight" in sd:
            setp(f"{q}/attn/grep_linear/kernel", _t(sd[f"{p}.self_attn.grep_linear.weight"]))
            setp(f"{q}/attn/grep_linear/bias", sd[f"{p}.self_attn.grep_linear.bias"])
            setp(f"{q}/attn/grep_a", sd[f"{p}.self_attn.grep_a"])
        setp(f"{q}/ln1/scale", sd[f"{p}.self_attn_layer_norm.weight"])
        setp(f"{q}/ln1/bias", sd[f"{p}.self_attn_layer_norm.bias"])
        setp(f"{q}/fc1/kernel", _t(sd[f"{p}.fc1.weight"]))
        setp(f"{q}/fc1/bias", sd[f"{p}.fc1.bias"])
        setp(f"{q}/fc2/kernel", _t(sd[f"{p}.fc2.weight"]))
        setp(f"{q}/fc2/bias", sd[f"{p}.fc2.bias"])
        setp(f"{q}/ln2/scale", sd[f"{p}.final_layer_norm.weight"])
        setp(f"{q}/ln2/bias", sd[f"{p}.final_layer_norm.bias"])

    setp("encoder/ln/scale", sd["encoder.layer_norm.weight"])
    setp("encoder/ln/bias", sd["encoder.layer_norm.bias"])
    return out
