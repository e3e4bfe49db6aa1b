"""Tortoise diffusion mel decoder (flax) + spaced Gaussian diffusion sampler,
weight-compatible with /root/reference/TTS/tts/layers/tortoise/
diffusion_decoder.py:141 `DiffusionTts` and semantics-compatible with
diffusion.py:176 `GaussianDiffusion`/:1096 `SpacedDiffusion` (linear beta
schedule, epsilon prediction, learned_range variance, conditioning-free
guidance with ramped k, p/ddim samplers).

TPU notes: the per-step model call is jitted once and scanned over the
(static) spaced timestep list; all schedule constants are computed in numpy
float64 at build time and baked in as fp32 device constants.
"""

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.layers.tortoise_arch import (
    AttentionBlock,
    Conv1dSame,
    DiffResBlock,
    DiffusionLayer,
    group_norm,
    timestep_embedding,
    tortoise_groups,
)


class DiffusionTts(nn.Module):
    """diffusion_decoder.py:141. Channels-last; `x` is the noisy mel
    `[B, T, in_channels]`, output `[B, T, out_channels]` (mean|var)."""

    model_channels: int = 1024
    num_layers: int = 10
    in_channels: int = 100
    in_latent_channels: int = 1024
    in_tokens: int = 8193
    out_channels: int = 200
    num_heads: int = 16

    def setup(self):
        mc = self.model_channels
        self.inp_block = Conv1dSame(mc, 3, padding=1, name="inp_block")
        self.time_embed_1 = nn.Dense(mc, name="time_embed_1")
        self.time_embed_2 = nn.Dense(mc, name="time_embed_2")
        self.code_embedding = nn.Embed(self.in_tokens, mc, name="code_embedding")
        self.code_converter = [
            AttentionBlock(mc, self.num_heads, relative_pos_embeddings=True, name=f"code_converter_{i}")
            for i in range(3)
        ]
        self.code_norm_scale = self.param("code_norm_scale", nn.initializers.ones, (mc,))
        self.code_norm_bias = self.param("code_norm_bias", nn.initializers.zeros, (mc,))
        self.latent_conditioner_conv = Conv1dSame(mc, 3, padding=1, name="latent_conditioner_conv")
        self.latent_conditioner_attn = [
            AttentionBlock(mc, self.num_heads, relative_pos_embeddings=True,
                           name=f"latent_conditioner_{i}")
            for i in range(4)
        ]
        self.contextual_embedder_conv1 = Conv1dSame(mc, 3, stride=2, padding=1,
                                                    name="contextual_embedder_conv1")
        self.contextual_embedder_conv2 = Conv1dSame(mc * 2, 3, stride=2, padding=1,
                                                    name="contextual_embedder_conv2")
        self.contextual_embedder_attn = [
            AttentionBlock(mc * 2, self.num_heads, relative_pos_embeddings=True,
                           name=f"contextual_embedder_{i}")
            for i in range(5)
        ]
        self.unconditioned_embedding = self.param(
            "unconditioned_embedding", nn.initializers.normal(1.0), (1, 1, mc)
        )
        self.conditioning_timestep_integrator = [
            DiffusionLayer(mc, self.num_heads, name=f"cond_timestep_{i}") for i in range(3)
        ]
        self.integrating_conv = Conv1dSame(mc, 1, padding=0, name="integrating_conv")
        self.mel_head = Conv1dSame(self.in_channels, 3, padding=1, name="mel_head")
        self.layers = tuple(
            [DiffusionLayer(mc, self.num_heads, name=f"layer_{i}") for i in range(self.num_layers)]
            + [
                DiffResBlock(mc, mc, mc, use_scale_shift_norm=True, name=f"layer_{self.num_layers + i}")
                for i in range(3)
            ]
        )
        self.out_norm = nn.GroupNorm(num_groups=tortoise_groups(mc), epsilon=1e-5, name="out_norm")
        self.out_conv = Conv1dSame(self.out_channels, 3, padding=1, name="out_conv")

    # ----------------------------------------------------------- conditioning
    def get_conditioning(self, conditioning_input):
        """mel clips `[B, n, T, in_channels]` (or `[B, T, C]`) → `[B, 2*mc]`
        (diffusion_decoder.py:271: per-clip embedder outputs concatenated
        along time then meaned)."""
        if conditioning_input.ndim == 3:
            conditioning_input = conditioning_input[:, None]
        outs = []
        for j in range(conditioning_input.shape[1]):
            h = self.contextual_embedder_conv1(conditioning_input[:, j])
            h = self.contextual_embedder_conv2(h)
            for blk in self.contextual_embedder_attn:
                h = blk(h)
            outs.append(h)
        return jnp.concatenate(outs, axis=1).mean(axis=1)

    def _code_norm(self, x, cond_scale, cond_shift):
        x = group_norm(x, tortoise_groups(self.model_channels))
        x = x * self.code_norm_scale + self.code_norm_bias
        return x * (1 + cond_scale[:, None]) + cond_shift[:, None]

    def timestep_independent(self, aligned_conditioning, conditioning_latent,
                             expected_seq_len: int, is_latent: bool = True):
        """diffusion_decoder.py:282 (eval path, no unconditioned dropout).
        aligned_conditioning: AR latents `[B, S, in_latent_channels]` when
        `is_latent`, else mel-code ids `[B, S]`."""
        cond_scale, cond_shift = jnp.split(conditioning_latent, 2, axis=1)
        if is_latent:
            code_emb = self.latent_conditioner_conv(aligned_conditioning)
            for blk in self.latent_conditioner_attn:
                code_emb = blk(code_emb)
        else:
            code_emb = self.code_embedding(aligned_conditioning)
            for blk in self.code_converter:
                code_emb = blk(code_emb)
        code_emb = self._code_norm(code_emb, cond_scale, cond_shift)
        # F.interpolate(mode="nearest") over time
        S = code_emb.shape[1]
        idx = (jnp.arange(expected_seq_len) * S // expected_seq_len).astype(jnp.int32)
        return jnp.take(code_emb, idx, axis=1)

    def __call__(self, x, timesteps, precomputed_aligned_embeddings=None,
                 conditioning_free: bool = False):
        """diffusion_decoder.py:322 eval path; x `[B, T, in_channels]`."""
        if conditioning_free:
            code_emb = jnp.broadcast_to(
                self.unconditioned_embedding, (x.shape[0], x.shape[1], self.model_channels)
            )
        else:
            code_emb = precomputed_aligned_embeddings
        time_emb = self.time_embed_2(
            jax.nn.silu(self.time_embed_1(timestep_embedding(timesteps, self.model_channels)))
        )
        for blk in self.conditioning_timestep_integrator:
            code_emb = blk(code_emb, time_emb)
        h = self.inp_block(x)
        h = self.integrating_conv(jnp.concatenate([h, code_emb], axis=-1))
        for lyr in self.layers:
            h = lyr(h, time_emb)
        return self.out_conv(jax.nn.silu(self.out_norm(h)))


# ---------------------------------------------------------------- scheduler
def get_named_beta_schedule(schedule_name: str, num_diffusion_timesteps: int) -> np.ndarray:
    """diffusion.py:97."""
    if schedule_name == "linear":
        scale = 1000 / num_diffusion_timesteps
        return np.linspace(scale * 0.0001, scale * 0.02, num_diffusion_timesteps, dtype=np.float64)
    if schedule_name == "cosine":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = []
        for i in range(num_diffusion_timesteps):
            t1 = i / num_diffusion_timesteps
            t2 = (i + 1) / num_diffusion_timesteps
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), 0.999))
        return np.array(betas)
    raise NotImplementedError(schedule_name)


def space_timesteps(num_timesteps: int, section_counts) -> list:
    """diffusion.py:1146 (list form), returned sorted ascending."""
    if isinstance(section_counts, int):
        section_counts = [section_counts]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken = []
        for _ in range(section_count):
            taken.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken
        start_idx += size
    return sorted(set(all_steps))


class SpacedDiffusion:
    """Sampler over a spaced subsequence of a trained diffusion process
    (diffusion.py:176,1096): epsilon mean, learned_range variance,
    conditioning-free guidance with per-step ramped k (:359-365), "p"
    (:546 p_sample) and "ddim" (:678, eta=0) samplers.

    `model_fn(x, t_trained, conditioning_free) -> [B, T, 2*C]` is provided by
    the caller (a jitted DiffusionTts apply)."""

    def __init__(self, trained_steps: int = 4000, desired_steps: int = 200,
                 cond_free: bool = True, cond_free_k: float = 1.0, sampler: str = "ddim",
                 correcting_x0_fn: str = None):
        self.sampler = sampler
        self.conditioning_free = cond_free
        self.cond_free_k = cond_free_k
        # x0-prediction corrector (dpm_solver.py:478 correcting_x0_fn
        # "dynamic_thresholding", Imagen eq. across dpm_solver.py:508-517)
        self.correcting_x0_fn = correcting_x0_fn
        self.dynamic_thresholding_ratio = 0.995
        self.thresholding_max_val = 1.0
        self.trained_steps = trained_steps
        base_betas = get_named_beta_schedule("linear", trained_steps)
        base_ac = np.cumprod(1.0 - base_betas)
        self.timestep_map = space_timesteps(trained_steps, desired_steps)
        last = 1.0
        betas = []
        for i in self.timestep_map:
            betas.append(1 - base_ac[i] / last)
            last = base_ac[i]
        betas = np.array(betas, dtype=np.float64)
        self.num_timesteps = len(betas)
        alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(alphas)
        self.alphas_cumprod_prev = np.append(1.0, self.alphas_cumprod[:-1])
        self.betas = betas
        self.sqrt_recip_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod)
        self.sqrt_recipm1_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod - 1)
        self.posterior_variance = betas * (1.0 - self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        self.posterior_log_variance_clipped = np.log(
            np.append(self.posterior_variance[1], self.posterior_variance[1:])
        )
        self.posterior_mean_coef1 = betas * np.sqrt(self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        self.posterior_mean_coef2 = (
            (1.0 - self.alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - self.alphas_cumprod)
        )

    def _p_mean_variance(self, model_fn, x, t: int):
        t_trained = self.timestep_map[t]
        ts = jnp.full((x.shape[0],), t_trained, dtype=jnp.int32)
        out = model_fn(x, ts, False)
        C = x.shape[-1]
        eps, var_values = out[..., :C], out[..., C:]
        if self.conditioning_free:
            out_free = model_fn(x, ts, True)
            eps_free = out_free[..., :C]
            # ramped (:360-362): SpacedDiffusion._scale_timesteps is identity,
            # so the ramp runs over the SPACED index / spaced count
            cfk = self.cond_free_k * (1 - t / self.num_timesteps)
            eps = (1 + cfk) * eps - cfk * eps_free
        min_log = self.posterior_log_variance_clipped[t]
        max_log = math.log(self.betas[t])
        frac = (var_values + 1) / 2
        model_log_variance = frac * max_log + (1 - frac) * min_log
        pred_xstart = jnp.clip(
            self.sqrt_recip_alphas_cumprod[t] * x - self.sqrt_recipm1_alphas_cumprod[t] * eps,
            -1, 1,
        )
        mean = self.posterior_mean_coef1[t] * pred_xstart + self.posterior_mean_coef2[t] * x
        return mean, model_log_variance, pred_xstart

    # ------------------------------------------------------------- dpm++Nm
    def _dpm_pp_multistep(self, model_fn, noise, order: int):
        """DPM-Solver++(order M) over the continuous linear VP schedule, as
        the reference wires order 2 (diffusion.py:451 `k_diffusion_sample_loop`:
        NoiseScheduleVP('linear', 0.025, 5.0), classifier-free guidance with
        UN-ramped k, model timesteps = t*1000, time-uniform from 1.0 → 1e-3,
        multistep with lower-order warmup + lower-order final when steps < 10).
        Orders 1/3 follow the generic library the reference vendors but never
        calls with those orders (dpm_solver.py:874 first, :956 third)."""
        beta0, beta1 = 0.1 / 4, 20.0 / 4
        steps = self.num_timesteps
        s = self.cond_free_k

        def log_alpha(t):
            return -0.25 * t**2 * (beta1 - beta0) - 0.5 * t * beta0

        def alpha(t):
            return math.exp(log_alpha(t))

        def sigma(t):
            return math.sqrt(1.0 - math.exp(2.0 * log_alpha(t)))

        def lam(t):
            return log_alpha(t) - 0.5 * math.log(1.0 - math.exp(2.0 * log_alpha(t)))

        C = noise.shape[-1]

        def data_pred(x, t):
            ts = jnp.full((x.shape[0],), t * 1000.0, dtype=jnp.float32)
            eps_c = model_fn(x, ts, False)[..., :C]
            if self.conditioning_free:
                eps_u = model_fn(x, ts, True)[..., :C]
                eps = eps_u + s * (eps_c - eps_u)
            else:
                eps = eps_c
            return self._correct_x0((x - sigma(t) * eps) / alpha(t))

        timesteps = np.linspace(1.0, 1.0 / 1000.0, steps + 1)
        x = noise
        t_prev = [timesteps[0]]
        m_prev = [data_pred(x, timesteps[0])]

        def first_update(x, s_t, t, model_s):
            h = lam(t) - lam(s_t)
            return sigma(t) / sigma(s_t) * x - alpha(t) * math.expm1(-h) * model_s

        def second_update(x, m_prev, t_prev, t):
            m1, m0 = m_prev[-2], m_prev[-1]
            t1, t0 = t_prev[-2], t_prev[-1]
            h0 = lam(t0) - lam(t1)
            h = lam(t) - lam(t0)
            r0 = h0 / h
            d1 = (1.0 / r0) * (m0 - m1)
            phi = math.expm1(-h)
            return sigma(t) / sigma(t0) * x - alpha(t) * phi * m0 - 0.5 * alpha(t) * phi * d1

        def third_update(x, m_prev, t_prev, t):
            # dpm_solver.py:983-1000 (dpmsolver++ branch)
            m2, m1, m0 = m_prev[-3], m_prev[-2], m_prev[-1]
            t2, t1, t0 = t_prev[-3], t_prev[-2], t_prev[-1]
            h1 = lam(t1) - lam(t2)
            h0 = lam(t0) - lam(t1)
            h = lam(t) - lam(t0)
            r0, r1 = h0 / h, h1 / h
            d1_0 = (1.0 / r0) * (m0 - m1)
            d1_1 = (1.0 / r1) * (m1 - m2)
            d1 = d1_0 + (r0 / (r0 + r1)) * (d1_0 - d1_1)
            d2 = (1.0 / (r0 + r1)) * (d1_0 - d1_1)
            phi1 = math.expm1(-h)
            phi2 = phi1 / h + 1.0
            phi3 = phi2 / h - 0.5
            return (
                sigma(t) / sigma(t0) * x
                - alpha(t) * phi1 * m0
                + alpha(t) * phi2 * d1
                - alpha(t) * phi3 * d2
            )

        def update(x, m_prev, t_prev, t, step_order):
            if step_order == 1:
                return first_update(x, t_prev[-1], t, m_prev[-1])
            if step_order == 2:
                return second_update(x, m_prev, t_prev, t)
            return third_update(x, m_prev, t_prev, t)

        # warmup: orders 1..order-1 (dpm_solver.py sample() init loop)
        for init_order in range(1, order):
            t = timesteps[init_order]
            x = update(x, m_prev, t_prev, t, init_order)
            t_prev.append(t)
            m_prev.append(data_pred(x, t))
        for step in range(order, steps + 1):
            t = timesteps[step]
            step_order = min(order, steps + 1 - step) if steps < 10 else order
            x = update(x, m_prev, t_prev, t, step_order)
            t_prev = (t_prev + [t])[-order:]
            if step < steps:
                m_prev = (m_prev + [data_pred(x, t)])[-order:]
        return x

    def _correct_x0(self, x0):
        """Dynamic thresholding on the data prediction (dpm_solver.py:508:
        per-sample p-quantile of |x0|, floored at thresholding_max_val, then
        clip + rescale)."""
        if self.correcting_x0_fn != "dynamic_thresholding":
            return x0
        p = self.dynamic_thresholding_ratio
        B = x0.shape[0]
        s_q = jnp.quantile(jnp.abs(x0).reshape(B, -1), p, axis=1)
        s_q = jnp.maximum(s_q, self.thresholding_max_val)[:, None, None]
        return jnp.clip(x0, -s_q, s_q) / s_q

    # ------------------------------------------------------------- dpm++Ns
    def _dpm_pp_singlestep(self, model_fn, noise, order: int):
        """Singlestep DPM-Solver++ (dpm_solver.py:657 second / :722 third,
        solver_type "dpmsolver"; outer schedule from
        get_orders_and_timesteps_for_singlestep_solver :806, time-uniform).
        The reference vendors these but the zoo path only calls multistep
        order 2 — kept for library parity."""
        beta0, beta1 = 0.1 / 4, 20.0 / 4
        steps = self.num_timesteps
        s_k = self.cond_free_k

        def log_alpha(t):
            return -0.25 * t**2 * (beta1 - beta0) - 0.5 * t * beta0

        def alpha(t):
            return math.exp(log_alpha(t))

        def sigma(t):
            return math.sqrt(1.0 - math.exp(2.0 * log_alpha(t)))

        def lam(t):
            return log_alpha(t) - 0.5 * math.log(1.0 - math.exp(2.0 * log_alpha(t)))

        def inv_lam(l):
            # NoiseScheduleVP.inverse_lambda, 'linear' branch (dpm_solver.py:172)
            tmp = 2.0 * (beta1 - beta0) * np.logaddexp(-2.0 * l, 0.0)
            delta = beta0**2 + tmp
            return float(tmp / (math.sqrt(delta) + beta0) / (beta1 - beta0))

        C = noise.shape[-1]

        def data_pred(x, t):
            ts = jnp.full((x.shape[0],), t * 1000.0, dtype=jnp.float32)
            eps_c = model_fn(x, ts, False)[..., :C]
            if self.conditioning_free:
                eps_u = model_fn(x, ts, True)[..., :C]
                eps = eps_u + s_k * (eps_c - eps_u)
            else:
                eps = eps_c
            return self._correct_x0((x - sigma(t) * eps) / alpha(t))

        def second_update(x, s_t, t, r1):
            h = lam(t) - lam(s_t)
            s1 = inv_lam(lam(s_t) + r1 * h)
            m_s = data_pred(x, s_t)
            x_s1 = sigma(s1) / sigma(s_t) * x - alpha(s1) * math.expm1(-r1 * h) * m_s
            m_s1 = data_pred(x_s1, s1)
            phi1 = math.expm1(-h)
            return (
                sigma(t) / sigma(s_t) * x
                - alpha(t) * phi1 * m_s
                - (0.5 / r1) * alpha(t) * phi1 * (m_s1 - m_s)
            )

        def third_update(x, s_t, t, r1, r2):
            h = lam(t) - lam(s_t)
            s1 = inv_lam(lam(s_t) + r1 * h)
            s2 = inv_lam(lam(s_t) + r2 * h)
            m_s = data_pred(x, s_t)
            x_s1 = sigma(s1) / sigma(s_t) * x - alpha(s1) * math.expm1(-r1 * h) * m_s
            m_s1 = data_pred(x_s1, s1)
            phi12 = math.expm1(-r2 * h)
            phi22 = phi12 / (r2 * h) + 1.0
            x_s2 = (
                sigma(s2) / sigma(s_t) * x
                - alpha(s2) * phi12 * m_s
                + (r2 / r1) * alpha(s2) * phi22 * (m_s1 - m_s)
            )
            m_s2 = data_pred(x_s2, s2)
            phi1 = math.expm1(-h)
            phi2 = phi1 / h + 1.0
            return (
                sigma(t) / sigma(s_t) * x
                - alpha(t) * phi1 * m_s
                + (1.0 / r2) * alpha(t) * phi2 * (m_s2 - m_s)
            )

        def first_update(x, s_t, t):
            h = lam(t) - lam(s_t)
            return sigma(t) / sigma(s_t) * x - alpha(t) * math.expm1(-h) * data_pred(x, s_t)

        # outer schedule: group `steps` model evals into singlestep solves —
        # the outer times sit on the FINE time-uniform grid at the cumulative
        # order positions (dpm_solver.py:806,1450-1480), and r1/r2 come from
        # time-uniform inner points, not fixed fractions
        if order == 3:
            K = steps // 3 + 1
            if steps % 3 == 0:
                orders = [3] * (K - 2) + [2, 1]
            elif steps % 3 == 1:
                orders = [3] * (K - 1) + [1]
            else:
                orders = [3] * (K - 1) + [2]
        elif order == 2:
            K = steps // 2 if steps % 2 == 0 else steps // 2 + 1
            orders = [2] * K if steps % 2 == 0 else [2] * (K - 1) + [1]
        else:
            K = steps
            orders = [1] * steps
        fine = np.linspace(1.0, 1.0 / 1000.0, steps + 1)
        t_outer = fine[np.cumsum([0] + orders)]
        x = noise
        for i, o in enumerate(orders):
            s_t, t = float(t_outer[i]), float(t_outer[i + 1])
            inner = np.linspace(s_t, t, o + 1)
            h = lam(t) - lam(s_t)
            if o == 1:
                x = first_update(x, s_t, t)
            elif o == 2:
                x = second_update(x, s_t, t, r1=(lam(inner[1]) - lam(s_t)) / h)
            else:
                x = third_update(
                    x, s_t, t,
                    r1=(lam(inner[1]) - lam(s_t)) / h,
                    r2=(lam(inner[2]) - lam(s_t)) / h,
                )
        return x

    def sample_loop(self, model_fn, noise, rng):
        """noise `[B, T, C]` → sample, scanning t = T-1 … 0."""
        if self.sampler in ("dpm++1m", "dpm++2m", "dpm++3m"):
            if not self.conditioning_free:
                raise RuntimeError("cond_free must be true")  # ref :537
            return self._dpm_pp_multistep(model_fn, noise, int(self.sampler[5]))
        if self.sampler in ("dpm++1s", "dpm++2s", "dpm++3s"):
            if not self.conditioning_free:
                raise RuntimeError("cond_free must be true")  # ref :537
            return self._dpm_pp_singlestep(model_fn, noise, int(self.sampler[5]))
        x = noise
        for t in range(self.num_timesteps - 1, -1, -1):
            rng, sub = jax.random.split(rng)
            mean, log_var, pred_xstart = self._p_mean_variance(model_fn, x, t)
            if self.sampler == "p":
                z = jax.random.normal(sub, x.shape)
                nonzero = 1.0 if t != 0 else 0.0
                x = mean + nonzero * jnp.exp(0.5 * log_var) * z
            elif self.sampler == "ddim":  # eta = 0 (diffusion.py:678)
                eps = (
                    self.sqrt_recip_alphas_cumprod[t] * x - pred_xstart
                ) / self.sqrt_recipm1_alphas_cumprod[t]
                ab_prev = self.alphas_cumprod_prev[t]
                x = pred_xstart * math.sqrt(ab_prev) + math.sqrt(1 - ab_prev) * eps
            else:
                raise NotImplementedError(self.sampler)
        return x


TACOTRON_MEL_MAX = 2.3143386840820312
TACOTRON_MEL_MIN = -11.512925148010254


def denormalize_tacotron_mel(norm_mel):
    """audio_utils.py:79."""
    return ((norm_mel + 1) / 2) * (TACOTRON_MEL_MAX - TACOTRON_MEL_MIN) + TACOTRON_MEL_MIN


def normalize_tacotron_mel(mel):
    """audio_utils.py:83."""
    return 2 * ((mel - TACOTRON_MEL_MIN) / (TACOTRON_MEL_MAX - TACOTRON_MEL_MIN)) - 1
