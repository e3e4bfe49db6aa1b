"""Time-sharded HiFi-GAN inference across a device mesh axis.

BASELINE.json north star: "the vocoder sharded across chips when its
upsampling stack exceeds one chip's HBM". The decoder's activations scale as
T·hop·C (e.g. B=128 × 768 frames × hop 256 ≈ 25M samples/stage at C=32..256
— the thing that OOMs first when batching up); the weights are tiny. So the
natural sharding is TIME: split the mel/z frames across the mesh axis, halo-
exchange the receptive field via `ppermute` over ICI, run the full generator
locally on each padded shard, and crop the halo from the waveform.

Cost model: the halo is ~15 input frames per side (receptive field of the
MRF stacks pulled back through the upsampling), so at 96+ frames per shard
the redundant compute is <30% and the exchange is one small bidirectional
ppermute — the activations never materialize globally.

Parity-tested against the unsharded generator on a virtual 8-device CPU mesh
(tests/test_sharded_decoder.py).
"""

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_tts.ops.hifigan_pallas import _block_halo


def decoder_input_halo(
    upsample_factors: Sequence[int],
    upsample_kernel_sizes: Sequence[int],
    resblock_kernel_sizes: Sequence[int],
    resblock_dilation_sizes: Sequence[Sequence[int]],
    conv_pre_kernel: int = 7,
    conv_post_kernel: int = 7,
) -> int:
    """Input-frame halo that covers the generator's full receptive field:
    pull the per-stage MRF halo + transposed-conv support back through each
    upsampling stride (conservative ceil at every stage)."""
    mrf_halo = max(_block_halo(k, d) for k, d in zip(resblock_kernel_sizes, resblock_dilation_sizes))
    h = conv_post_kernel // 2
    for s, k in zip(reversed(upsample_factors), reversed(upsample_kernel_sizes)):
        h = math.ceil((h + mrf_halo + k) / s)
    return h + conv_pre_kernel // 2


def hifigan_apply_sharded(
    gen_params,
    z: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    g: jnp.ndarray = None,
    *,
    resblock_kernel_sizes=(3, 7, 11),
    resblock_dilation_sizes=((1, 3, 5),) * 3,
    upsample_factors=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    apply_fn=None,
    batch_axis: str = None,
) -> jnp.ndarray:
    """Run a HiFi-GAN-style generator with `z` `[B, T, C]` time-sharded over
    `mesh[axis]`. Returns the waveform `[B, T·hop, 1]`, still sharded on the
    same axis. `apply_fn(params, z, g) -> wav` is the local generator forward
    (defaults to `hifigan_apply_pallas`'s XLA fallback math, which mirrors
    `HifiganGenerator.__call__`). `batch_axis` optionally shards the batch dim
    over another mesh axis (2D data x model serving)."""
    from jax.experimental.shard_map import shard_map

    if apply_fn is None:
        from tpu_tts.ops.hifigan_pallas import hifigan_apply_pallas

        apply_fn = partial(
            hifigan_apply_pallas,
            resblock_kernel_sizes=resblock_kernel_sizes,
            resblock_dilation_sizes=resblock_dilation_sizes,
            upsample_factors=upsample_factors,
            max_pallas_channels=0,  # XLA math everywhere (sharding-agnostic)
        )

    n = mesh.shape[axis]
    B, T, C = z.shape
    assert T % n == 0, f"T={T} must divide the '{axis}' axis size {n}"
    L = T // n
    hop = int(np.prod(upsample_factors))
    if n == 1:
        return apply_fn(gen_params, z, g)
    halo = decoder_input_halo(
        upsample_factors, upsample_kernel_sizes, resblock_kernel_sizes, resblock_dilation_sizes
    )
    assert L >= 2 * halo, (
        f"shard length {L} < 2x receptive-field halo ({2 * halo}): "
        f"use fewer shards or longer sequences"
    )

    def local(params, z_sh, g_arr):
        # z_sh: [B, L, C] local shard. Every shard evaluates a (L+2·halo)
        # window; interior shards center it, edge shards shift it INWARD so the
        # true sequence edge is handled by the generator's own SAME padding
        # (an explicit zero halo would differ: deeper layers see conv(0)+bias,
        # not zeros, in halo regions).
        idx = jax.lax.axis_index(axis)
        from_prev = jax.lax.ppermute(z_sh[:, -2 * halo :], axis, [(i, (i + 1) % n) for i in range(n)])
        from_next = jax.lax.ppermute(z_sh[:, : 2 * halo], axis, [(i, (i - 1) % n) for i in range(n)])
        win_int = jnp.concatenate([from_prev[:, halo:], z_sh, from_next[:, :halo]], axis=1)
        win_first = jnp.concatenate([z_sh, from_next], axis=1)
        win_last = jnp.concatenate([from_prev, z_sh], axis=1)
        win = jnp.where(idx == 0, win_first, jnp.where(idx == n - 1, win_last, win_int))
        wav = apply_fn(params, win, None if g_arr.ndim == 0 else g_arr)
        start = jnp.where(idx == 0, 0, jnp.where(idx == n - 1, 2 * halo, halo)) * hop
        return jax.lax.dynamic_slice_in_dim(wav, start, L * hop, axis=1)

    g_in = g if g is not None else jnp.zeros((), z.dtype)
    g_spec = P() if (g is None or g.ndim == 0) else P(batch_axis)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(batch_axis, axis, None), g_spec),
        out_specs=P(batch_axis, axis, None),
    )(gen_params, z, g_in)


def hifigan_apply_chunked(
    gen_params,
    z: jnp.ndarray,
    n_chunks: int,
    g: jnp.ndarray = None,
    *,
    resblock_kernel_sizes=(3, 7, 11),
    resblock_dilation_sizes=((1, 3, 5),) * 3,
    upsample_factors=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    apply_fn=None,
) -> jnp.ndarray:
    """Single-device counterpart of `hifigan_apply_sharded`: decode `z`
    `[B, T, C]` in `n_chunks` sequential halo-overlapped time chunks via
    `lax.map`, so the decoder's activation liveness is ~T/n_chunks instead of
    T. Same window/crop geometry as the sharded path (edge chunks shift the
    receptive-field window inward so the generator's own SAME padding handles
    the true sequence edges); redundant compute is 2·halo/(T/n) per interior
    chunk. Trades peak HBM for a small FLOP overhead — the lever that lifts
    the single-chip batch ceiling (B=256 VITS decode OOMs unchunked)."""
    if apply_fn is None:
        from tpu_tts.ops.hifigan_pallas import hifigan_apply_pallas

        apply_fn = partial(
            hifigan_apply_pallas,
            resblock_kernel_sizes=resblock_kernel_sizes,
            resblock_dilation_sizes=resblock_dilation_sizes,
            upsample_factors=upsample_factors,
            max_pallas_channels=0,
        )
    B, T, C = z.shape
    n = int(n_chunks)
    if n <= 1:
        return apply_fn(gen_params, z, g)
    assert T % n == 0, f"T={T} must divide n_chunks={n}"
    L = T // n
    hop = int(np.prod(upsample_factors))
    halo = decoder_input_halo(
        upsample_factors, upsample_kernel_sizes, resblock_kernel_sizes, resblock_dilation_sizes
    )
    assert L >= 2 * halo, f"chunk length {L} < 2x receptive-field halo ({2 * halo}): use fewer chunks"

    # static window starts (shifted inward at the edges) + per-chunk crop start
    win_len = L + 2 * halo
    starts = [min(max(i * L - halo, 0), T - win_len) for i in range(n)]
    crops = np.array([(i * L - s) * hop for i, s in enumerate(starts)], dtype=np.int32)
    windows = jnp.stack([jax.lax.dynamic_slice_in_dim(z, s, win_len, axis=1) for s in starts])

    def one(args):
        win, crop = args
        wav = apply_fn(gen_params, win, g)
        return jax.lax.dynamic_slice_in_dim(wav, crop, L * hop, axis=1)

    wavs = jax.lax.map(one, (windows, jnp.asarray(crops)))  # [n, B, L*hop, 1]
    return jnp.transpose(wavs, (1, 0, 2, 3)).reshape(B, T * hop, 1)
