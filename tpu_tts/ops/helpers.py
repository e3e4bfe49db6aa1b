"""Core JAX sequence ops used across models.

Functional equivalents of /root/reference/TTS/tts/utils/helpers.py
(`sequence_mask`:42, `segment`:60, `rand_segments`:86, `generate_path`:154,
`average_over_durations`:124), designed for jit: static shapes, gather-free
windowing via `lax.dynamic_slice` under vmap.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sequence_mask(sequence_length: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """`[B] → [B, max_len]` boolean mask. `max_len` must be static under jit."""
    seq_range = jnp.arange(max_len, dtype=sequence_length.dtype)
    return seq_range[None, :] < sequence_length[:, None]


def segment(x: jnp.ndarray, segment_indices: jnp.ndarray, segment_size: int, pad_short: bool = False) -> jnp.ndarray:
    """Slice a fixed-size window per batch item: `[B, C, T] → [B, C, segment_size]`."""
    if pad_short and x.shape[-1] < segment_size:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, segment_size - x.shape[-1])))

    def one(x_i, idx):
        return jax.lax.dynamic_slice_in_dim(x_i, idx, segment_size, axis=-1)

    return jax.vmap(one)(x, segment_indices)


def rand_segments(
    rng: jax.Array,
    x: jnp.ndarray,
    x_lengths: Optional[jnp.ndarray] = None,
    segment_size: int = 4,
    let_short_samples: bool = False,
    pad_short: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random fixed-size windows per sample — VITS's decoder-memory trick
    (ref helpers.py:86). Returns (segments `[B, C, segment_size]`, indices `[B]`)."""
    B, _, T = x.shape
    if pad_short and T < segment_size:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, segment_size - T)))
        T = segment_size
    if x_lengths is None:
        x_lengths = jnp.full((B,), T)
    len_diff = x_lengths - segment_size
    if let_short_samples or pad_short:
        x_lengths = jnp.maximum(x_lengths, segment_size)
        len_diff = x_lengths - segment_size
    u = jax.random.uniform(rng, (B,))
    segment_indices = (u * (len_diff + 1)).astype(jnp.int32)
    return segment(x, segment_indices, segment_size, pad_short=pad_short), segment_indices


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Durations → hard monotonic attention map (ref helpers.py:154).

    Shapes: duration `[B, T_en]`, mask `[B, T_en, T_de]` → path `[B, T_en, T_de]`.
    """
    _, _, t_y = mask.shape
    cum_duration = jnp.cumsum(duration, axis=1)  # [B, T_en]
    seq = jnp.arange(t_y)
    path = (seq[None, None, :] < cum_duration[:, :, None]).astype(mask.dtype)
    path = path - jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return path * mask


def average_over_durations(values: jnp.ndarray, durs: jnp.ndarray) -> jnp.ndarray:
    """Mean of frame-level values over each phoneme's duration span
    (ref helpers.py:124). values `[B, C, T_de]`, durs `[B, T_en]` → `[B, C, T_en]`."""
    durs_cums_ends = jnp.cumsum(durs, axis=1).astype(jnp.int32)  # [B, T_en]
    durs_cums_starts = jnp.pad(durs_cums_ends[:, :-1], ((0, 0), (1, 0)))
    values_nonzero_cums = jnp.pad(jnp.cumsum(values != 0.0, axis=2), ((0, 0), (0, 0), (1, 0)))
    values_cums = jnp.pad(jnp.cumsum(values, axis=2), ((0, 0), (0, 0), (1, 0)))

    dcs = durs_cums_starts[:, None, :]  # [B, 1, T_en]
    dce = durs_cums_ends[:, None, :]

    values_sums = jnp.take_along_axis(values_cums, dce, axis=2) - jnp.take_along_axis(values_cums, dcs, axis=2)
    values_nelems = jnp.take_along_axis(values_nonzero_cums, dce, axis=2) - jnp.take_along_axis(
        values_nonzero_cums, dcs, axis=2
    )
    return jnp.where(values_nelems == 0.0, 0.0, values_sums / values_nelems)


def convert_pad_shape(pad_shape):
    return [item for sublist in pad_shape[::-1] for item in sublist]


def expand_encoder_outputs(en, dr, x_mask, y_mask):
    """Expand encoder frames by predicted durations via `generate_path`."""
    attn_mask = x_mask[:, :, None] * y_mask[:, None, :]
    attn = generate_path(dr, attn_mask.astype(en.dtype))  # [B, T_en, T_de]
    o_en_ex = jnp.matmul(attn.transpose(0, 2, 1), en.transpose(0, 2, 1)).transpose(0, 2, 1)
    return o_en_ex, attn


def beta_binomial_prior_distribution(phoneme_count: int, mel_count: int, scaling_factor: float = 1.0) -> np.ndarray:
    """Host-side beta-binomial alignment prior (ref helpers.py:243)."""
    from scipy.stats import betabinom

    P, M = phoneme_count, mel_count
    x = np.arange(0, P)
    mel_text_probs = []
    for i in range(1, M + 1):
        a, b = scaling_factor * i, scaling_factor * (M + 1 - i)
        mel_text_probs.append(betabinom(P, a, b).pmf(x))
    return np.array(mel_text_probs)


def compute_attn_prior(x_len: int, y_len: int, scaling_factor: float = 1.0) -> np.ndarray:
    """[y_len, x_len] attention prior for aligner training."""
    return beta_binomial_prior_distribution(x_len, y_len, scaling_factor)
