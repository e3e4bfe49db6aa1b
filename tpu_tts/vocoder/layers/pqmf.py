"""Pseudo-QMF filterbank for multi-band vocoders.

Mirror of /root/reference/TTS/vocoder/layers/pqmf.py:9 (near-perfect-
reconstruction cosine-modulated filterbank, kaiser prototype). Analysis and
synthesis are strided 1D convolutions — plain XLA convs on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.signal import firwin, kaiser_beta  # noqa: F401 (beta given directly)


class PQMF:
    def __init__(self, N: int = 4, taps: int = 62, cutoff: float = 0.15, beta: float = 9.0):
        self.N = N
        self.taps = taps
        self.cutoff = cutoff
        self.beta = beta

        QMF = firwin(taps + 1, cutoff, window=("kaiser", beta))
        H = np.zeros((N, len(QMF)))
        G = np.zeros((N, len(QMF)))
        for k in range(N):
            constant_factor = (2 * k + 1) * (np.pi / (2 * N)) * (np.arange(taps + 1) - (taps - 1) / 2)
            phase = (-1) ** k * np.pi / 4
            H[k] = 2 * QMF * np.cos(constant_factor + phase)
            G[k] = 2 * QMF * np.cos(constant_factor - phase)
        # analysis kernel: [width, in=1, out=N]; synthesis: [width, in=N, out=1]
        self.H = jnp.asarray(H.T[:, None, :], dtype=jnp.float32)  # [taps+1, 1, N]
        self.G = jnp.asarray(G.T[:, :, None], dtype=jnp.float32)  # [taps+1, N, 1]
        self.pad = taps // 2

    def analysis(self, x: jnp.ndarray) -> jnp.ndarray:
        """`[B, T, 1] → [B, T//N, N]` subband decomposition."""
        x = jnp.pad(x, ((0, 0), (self.pad, self.pad), (0, 0)))
        return jax.lax.conv_general_dilated(
            x, self.H, window_strides=(self.N,), padding=[(0, 0)], dimension_numbers=("NHC", "HIO", "NHC")
        )

    def synthesis(self, x: jnp.ndarray) -> jnp.ndarray:
        """`[B, T//N, N] → [B, T, 1]` subband recomposition (zero-stuff ×N then
        filter)."""
        B, T, N = x.shape
        # zero-stuffing upsample: [B, T, N] -> [B, T*N, N]
        up = jnp.zeros((B, T * N, N), dtype=x.dtype)
        up = up.at[:, ::N, :].set(x * N)
        up = jnp.pad(up, ((0, 0), (self.pad, self.pad), (0, 0)))
        return jax.lax.conv_general_dilated(
            up, self.G, window_strides=(1,), padding=[(0, 0)], dimension_numbers=("NHC", "HIO", "NHC")
        )
