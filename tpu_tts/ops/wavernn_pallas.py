"""Fused Pallas TPU kernel for WaveRNN autoregressive sampling.

The sample-rate-serial GRU loop is the classic TPU-hostile workload: as a
`lax.scan` every step is a separate tiny HLO dispatch. This kernel runs the
ENTIRE sampling loop inside one `pallas_call`:

- all recurrent weights live in VMEM for the whole decode (no HBM re-reads);
- the mel/aux conditioning contributions are precomputed OUTSIDE the kernel
  as big parallel MXU matmuls and streamed through VMEM blocks by the grid
  (double-buffered by the pipeline);
- per-step work is 6 small matmuls on the MXU plus VPU gates;
- sampling uses the on-core PRNG (`pltpu.prng_random_bits`) with a
  Gumbel-argmax draw — no host round trips anywhere.

Grid iterations on TPU run sequentially on one core, so the GRU state carried
in VMEM scratch persists across time-chunks (standard Pallas carry pattern).

Exact math matches `tpu_tts.vocoder.models.wavernn.WavernnCell` with flax
`nn.GRUCell` gate conventions; `PallasWavernnSampler.from_flax_params`
repacks a trained model's params. Categorical ('bits') mode.
"""

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    greedy: bool,
    hw_prng: bool,
    # streams (blocked over time by the grid)
    pre1_ref,  # [B, TC, R]    I-layer contribution of (mel, a1) + b_I
    pre2_ref,  # [B, TC, 3R]   rnn2 ih contribution of a2 (+ gru2 input bias)
    pre3_ref,  # [B, TC, F]    fc1 contribution of a3 + b_fc1
    pre4_ref,  # [B, TC, F]    fc2 contribution of a4 + b_fc2
    # weights (whole, VMEM-resident)
    w_s_ref,       # [1, R]     I-layer row for the previous sample
    w1_i_ref,      # [R, 3R]
    w1_h_ref,      # [R, 2R]
    w1_hn_ref,     # [R, R]
    b1_ref,        # [1, 3R]    gru1 input biases (ir,iz,in)
    b1_hn_ref,     # [1, R]
    w2_ix_ref,     # [R, 3R]
    w2_h_ref,      # [R, 2R]
    w2_hn_ref,     # [R, R]
    b2_hn_ref,     # [1, R]
    fc1_x_ref,     # [R, F]
    fc2_x_ref,     # [F, F]
    fc3_ref,       # [F, C]
    b3_ref,        # [1, C]
    seed_ref,      # [1, 1] int32 (SMEM)
    # outputs
    out_ref,       # [B, TC] float samples in [-1, 1]
    # scratch (persists across grid steps)
    h1_ref,        # [B, R]
    h2_ref,        # [B, R]
    samp_ref,      # [B, 1] previous sample
):
    B, R = h1_ref.shape
    C = b3_ref.shape[1]
    TC = pre1_ref.shape[1]
    chunk_id = pl.program_id(0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h1_ref[:] = jnp.zeros_like(h1_ref)
        h2_ref[:] = jnp.zeros_like(h2_ref)
        samp_ref[:] = jnp.zeros_like(samp_ref)
        if hw_prng and not greedy:
            pltpu.prng_seed(seed_ref[0, 0])

    def gru(h, xi, w_h, w_hn, b_hn):
        hrz = jnp.dot(h, w_h, preferred_element_type=jnp.float32)  # [B, 2R]
        r = jax.nn.sigmoid(xi[:, :R] + hrz[:, :R])
        z = jax.nn.sigmoid(xi[:, R : 2 * R] + hrz[:, R:])
        hn = jnp.dot(h, w_hn, preferred_element_type=jnp.float32) + b_hn
        n = jnp.tanh(xi[:, 2 * R :] + r * hn)
        return (1.0 - z) * n + z * h

    def step(t, acc):
        sample = samp_ref[:]  # [B, 1]
        pre1_t = pre1_ref[:, pl.ds(t, 1), :][:, 0, :]
        pre2_t = pre2_ref[:, pl.ds(t, 1), :][:, 0, :]
        pre3_t = pre3_ref[:, pl.ds(t, 1), :][:, 0, :]
        pre4_t = pre4_ref[:, pl.ds(t, 1), :][:, 0, :]
        x = jnp.dot(sample, w_s_ref[:], preferred_element_type=jnp.float32) + pre1_t
        # GRU 1
        xi1 = jnp.dot(x, w1_i_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
        h1 = gru(h1_ref[:], xi1, w1_h_ref[:], w1_hn_ref[:], b1_hn_ref[:])
        h1_ref[:] = h1
        x = x + h1
        # GRU 2 (aux a2 contribution streamed in pre2)
        xi2 = jnp.dot(x, w2_ix_ref[:], preferred_element_type=jnp.float32) + pre2_t
        h2 = gru(h2_ref[:], xi2, w2_h_ref[:], w2_hn_ref[:], b2_hn_ref[:])
        h2_ref[:] = h2
        x = x + h2
        # FC head
        x = jnp.maximum(jnp.dot(x, fc1_x_ref[:], preferred_element_type=jnp.float32) + pre3_t, 0.0)
        x = jnp.maximum(jnp.dot(x, fc2_x_ref[:], preferred_element_type=jnp.float32) + pre4_t, 0.0)
        logits = jnp.dot(x, fc3_ref[:], preferred_element_type=jnp.float32) + b3_ref[:]
        if greedy:
            idx = jnp.argmax(logits, axis=-1)  # [B]
        else:
            if hw_prng:
                # on-core PRNG (TPU)
                rbits = pltpu.bitcast(pltpu.prng_random_bits(logits.shape), jnp.uint32)
            else:
                # portable integer-hash fallback (interpret mode)
                lane = jax.lax.broadcasted_iota(jnp.uint32, logits.shape, 1)
                row = jax.lax.broadcasted_iota(jnp.uint32, logits.shape, 0)
                h = (
                    seed_ref[0, 0].astype(jnp.uint32)
                    + chunk_id.astype(jnp.uint32) * jnp.uint32(65521)
                    + t.astype(jnp.uint32) * jnp.uint32(2654435761)
                    + lane * jnp.uint32(40503)
                    + row * jnp.uint32(69069)
                )
                h ^= h >> 16
                h *= jnp.uint32(2246822519)
                h ^= h >> 13
                h *= jnp.uint32(3266489917)
                rbits = h ^ (h >> 16)
            u = pltpu.bitcast((rbits >> 9) | jnp.uint32(0x3F800000), jnp.float32) - 1.0
            g = -jnp.log(-jnp.log(u + 1e-12) + 1e-12)
            idx = jnp.argmax(logits + g, axis=-1)  # [B]
        sample_new = (2.0 * idx.astype(jnp.float32) / (C - 1.0) - 1.0)[:, None]
        samp_ref[:] = sample_new
        # Mosaic can't store to a dynamic lane column; accumulate the chunk in
        # a loop-carried vector with a masked update and store once at the end.
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, TC), 1)
        return jnp.where(lane == t, sample_new, acc)

    out_ref[:] = jax.lax.fori_loop(0, TC, step, jnp.zeros((B, TC), jnp.float32))


class PallasWavernnSampler:
    """Host wrapper: precompute conditioning streams, launch the fused kernel."""

    def __init__(self, weights: Dict[str, np.ndarray], bits: int, time_chunk: int = 256, interpret: bool = False, greedy: bool = False):
        self.w = {k: jnp.asarray(v, dtype=jnp.float32) for k, v in weights.items()}
        self.bits = bits
        self.n_classes = 2**bits
        self.time_chunk = time_chunk
        self.interpret = interpret
        self.greedy = greedy
        self._jitted = None

    @staticmethod
    def from_flax_params(params: Dict, args) -> "PallasWavernnSampler":
        """Repack a trained `WavernnNet` param tree ('bits' mode)."""
        p = params
        cell = p["cell"]
        aux = args.res_out_dims // 4

        def gru_pack(g):
            w_i = np.concatenate([g["ir"]["kernel"], g["iz"]["kernel"], g["in"]["kernel"]], axis=1)
            b_i = np.concatenate([g["ir"]["bias"], g["iz"]["bias"], g["in"]["bias"]])
            w_h = np.concatenate([g["hr"]["kernel"], g["hz"]["kernel"]], axis=1)
            return w_i, b_i, w_h, np.asarray(g["hn"]["kernel"]), np.asarray(g["hn"]["bias"])

        I_k = np.asarray(cell["I"]["kernel"])  # [(1+mel+aux), R]
        I_b = np.asarray(cell["I"]["bias"])
        w1_i_full, b1, w1_h, w1_hn, b1_hn = gru_pack(cell["rnn1"])
        w2_i_full, b2, w2_h, w2_hn, b2_hn = gru_pack(cell["rnn2"])
        R = w1_hn.shape[0]
        fc1_k = np.asarray(cell["fc1"]["kernel"])  # [(R+aux), F]
        fc1_b = np.asarray(cell["fc1"]["bias"])
        fc2_k = np.asarray(cell["fc2"]["kernel"])  # [(F+aux), F]
        fc2_b = np.asarray(cell["fc2"]["bias"])
        fc3_k = np.asarray(cell["fc3"]["kernel"])
        fc3_b = np.asarray(cell["fc3"]["bias"])

        weights = {
            "w_s": I_k[:1],                      # [1, R]
            "I_mel_a1": I_k[1:],                 # [(mel+aux), R]
            "I_b": I_b,
            "w1_i": w1_i_full,                   # gru1 input is x: [R, 3R]
            "b1": b1[None, :],
            "w1_h": w1_h,
            "w1_hn": w1_hn,
            "b1_hn": b1_hn[None, :],
            "w2_ix": w2_i_full[:R],              # x rows
            "w2_ia": w2_i_full[R:],              # a2 rows (precomputed stream)
            "b2": b2,
            "w2_h": w2_h,
            "w2_hn": w2_hn,
            "b2_hn": b2_hn[None, :],
            "fc1_x": fc1_k[:R],
            "fc1_a": fc1_k[R:],
            "fc1_b": fc1_b,
            "fc2_x": fc2_k[: fc2_k.shape[1]],    # [F, F] (x rows)
            "fc2_a": fc2_k[fc2_k.shape[1] :],    # aux rows
            "fc2_b": fc2_b,
            "fc3": fc3_k,
            "b3": fc3_b[None, :],
        }
        return PallasWavernnSampler(weights, int(args.mode))

    def __call__(self, mels_up: jnp.ndarray, aux: jnp.ndarray, seed: int = 0) -> np.ndarray:
        """mels_up `[B, T, C_mel]`, aux `[B, T, 4*aux]` → samples `[B, T]`.

        The precompute matmuls + the pallas_call compile as ONE jitted
        program (a fresh trace per op would mean one dispatch round trip
        each — fatal over a remote-compile TPU link)."""
        if self._jitted is None:
            self._jitted = jax.jit(self._run)
        return self._jitted(self.w, mels_up, aux, jnp.array([[seed]], dtype=jnp.int32))

    def _run(self, w, mels_up, aux, seed_arr):
        B, T, _ = mels_up.shape
        aux_dim = aux.shape[-1] // 4
        a1, a2, a3, a4 = jnp.split(aux, 4, axis=-1)
        # ---- parallel precompute (big MXU matmuls, outside the serial loop)
        pre1 = jnp.concatenate([mels_up, a1], axis=-1) @ w["I_mel_a1"] + w["I_b"]
        pre2 = a2 @ w["w2_ia"] + w["b2"]
        pre3 = a3 @ w["fc1_a"] + w["fc1_b"]
        pre4 = a4 @ w["fc2_a"] + w["fc2_b"]

        TC = min(self.time_chunk, T)
        pad = (-T) % TC
        if pad:
            cfg = [(0, 0), (0, pad), (0, 0)]
            pre1, pre2, pre3, pre4 = (jnp.pad(x, cfg) for x in (pre1, pre2, pre3, pre4))
        T_pad = T + pad
        grid = (T_pad // TC,)

        R = w["w1_hn"].shape[0]
        F = w["fc2_x"].shape[0]
        C = self.n_classes

        def stream_spec(feat):
            return pl.BlockSpec((B, TC, feat), lambda i: (0, i, 0), memory_space=pltpu.VMEM)

        def whole(x):
            return pl.BlockSpec(x.shape, lambda i: tuple(0 for _ in x.shape), memory_space=pltpu.VMEM)

        weight_args = [
            w["w_s"], w["w1_i"], w["w1_h"], w["w1_hn"], w["b1"], w["b1_hn"],
            w["w2_ix"], w["w2_h"], w["w2_hn"], w["b2_hn"],
            w["fc1_x"], w["fc2_x"], w["fc3"], w["b3"],
        ]
        out = pl.pallas_call(
            functools.partial(_kernel, self.greedy, not self.interpret),
            grid=grid,
            in_specs=[
                stream_spec(R), stream_spec(3 * R), stream_spec(F), stream_spec(F),
                *[whole(x) for x in weight_args],
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((B, TC), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, T_pad), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((B, R), jnp.float32),
                pltpu.VMEM((B, R), jnp.float32),
                pltpu.VMEM((B, 1), jnp.float32),
            ],
            compiler_params=None
            if self.interpret
            # streamed conditioning blocks + resident weights exceed the
            # default 16MB scoped-vmem budget; v5e has 128MB VMEM
            else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )(pre1, pre2, pre3, pre4, *weight_args, seed_arr)
        return out[:, :T]
