"""bf16 mixed-precision training path (VERDICT r1 next-round #3).

The reference trains VITS with `mixed_precision=True` (torch autocast guards
at ref vits.py:1273,1284; recipes/ljspeech/vits_tts/train_vits.py:38). The
JAX design: fp32 master params, bf16 compute dtype threaded through the
FLOPs-heavy modules (HiFi-GAN decoder + discriminators) via the flax `dtype`
convention — weight-norm division runs fp32, kernels/inputs are cast per op,
losses always reduce in fp32 (CLAUDE.md invariant)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tests.test_vits import _batch, _tiny_config
from tpu_tts.models.vits import Vits


@pytest.fixture(scope="module")
def mp_model():
    cfg = _tiny_config()
    cfg.mixed_precision = True
    model = Vits(cfg)
    model.init_params(jax.random.PRNGKey(0))
    return model


def test_mixed_precision_params_stay_fp32(mp_model):
    dtypes = {str(x.dtype) for x in jax.tree_util.tree_leaves(mp_model.params)}
    assert "bfloat16" not in dtypes, "master params must stay fp32"


def test_mixed_precision_decoder_runs_bf16(mp_model):
    """The decoder conv stack must actually compute in bf16: its resblock
    outputs are bf16 (the final conv_post is fp32 by design)."""
    from tpu_tts.models.vits import VitsNet

    z = jnp.zeros((2, 8, 32), dtype=jnp.float32)
    out, feats = mp_model.net.apply(
        {"params": mp_model.params["generator"]},
        z,
        method=lambda net, z: (net.waveform_decoder(z), None),
    )
    assert out.dtype == jnp.float32  # waveform surfaced in fp32
    # inspect an intermediate: run the first upsample conv path via capture
    inter = mp_model.net.apply(
        {"params": mp_model.params["generator"]},
        z,
        method=lambda net, z: net.waveform_decoder.__call__(z),
        capture_intermediates=True,
    )
    flat = jax.tree_util.tree_leaves(inter[1]["intermediates"])
    assert any(getattr(x, "dtype", None) == jnp.bfloat16 for x in flat), (
        "no bf16 intermediates found — decoder not computing in bf16"
    )


def test_mixed_precision_losses_fp32_and_finite(mp_model):
    batch = _batch()
    for idx in (0, 1):
        loss, logs = mp_model.loss_fn(mp_model.params, batch, jax.random.PRNGKey(1), optimizer_idx=idx)
        assert loss.dtype == jnp.float32
        assert np.isfinite(float(loss)), f"opt {idx}: {logs}"


def test_mixed_precision_converges():
    """N GAN steps on one batch: loss finite every step, generator mel loss
    decreases, params move and stay fp32 (the reference's convergence-
    microtest pattern, ref test_vits.py:401-431)."""
    cfg = _tiny_config()
    cfg.mixed_precision = True
    model = Vits(cfg)
    params0 = model.init_params(jax.random.PRNGKey(0))
    batch = _batch()
    opts = model.get_optimizer()
    opt_states = [opts[i].init(model.param_partition(params0, i)) for i in range(2)]

    def make_step(idx):
        def step(params, opt_state, key):
            sub = model.param_partition(params, idx)

            def loss_sub(s):
                merged = model.param_merge(params, s, idx)
                return model.loss_fn(merged, batch, key, optimizer_idx=idx)

            (loss, logs), grads = jax.value_and_grad(loss_sub, has_aux=True)(sub)
            updates, opt_state = opts[idx].update(grads, opt_state, sub)
            sub = optax.apply_updates(sub, updates)
            return model.param_merge(params, sub, idx), opt_state, loss, logs

        return jax.jit(step)

    steps = [make_step(0), make_step(1)]
    params = params0
    first_mel, last_mel = None, None
    for i in range(6):
        for idx in (0, 1):
            params, opt_states[idx], loss, logs = steps[idx](
                params, opt_states[idx], jax.random.PRNGKey(100 + i)
            )
            assert np.isfinite(float(loss)), f"step {i} opt {idx}"
            if idx == 1:
                mel = float(logs["loss_mel"])
                first_mel = mel if first_mel is None else first_mel
                last_mel = mel
    assert last_mel < first_mel, (first_mel, last_mel)
    dtypes = {str(x.dtype) for x in jax.tree_util.tree_leaves(params)}
    assert "bfloat16" not in dtypes
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a - b, dtype=np.float32)).max()) > 0, params0, params
    )
    n_moved = sum(bool(v) for v in jax.tree_util.tree_leaves(moved))
    n_total = len(jax.tree_util.tree_leaves(moved))
    assert n_moved > 0.9 * n_total, f"only {n_moved}/{n_total} params updated"
