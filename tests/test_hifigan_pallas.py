"""Fused Pallas MRF kernel vs. flax ResBlock1 stack (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_tts.ops.hifigan_pallas import extract_stage_weights, fold_wn, mrf_stack_pallas
from tpu_tts.vocoder.models.hifigan_generator import ResBlock1


def _reference_mrf(x, rb_params, kernel_sizes, dilations):
    outs = []
    for j, (k, d) in enumerate(zip(kernel_sizes, dilations)):
        rb = ResBlock1(x.shape[-1], k, tuple(d))
        outs.append(rb.apply({"params": rb_params[j]}, x))
    return sum(outs) / len(outs)


def _make(C, kernel_sizes, dilations, B=2, T=512, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, C)) * 0.5, dtype=jnp.float32)
    rb_params = []
    for j, (k, d) in enumerate(zip(kernel_sizes, dilations)):
        rb = ResBlock1(C, k, tuple(d))
        rb_params.append(rb.init(jax.random.PRNGKey(j), x)["params"])
    # wrap into generator-style tree for extract_stage_weights
    gen_params = {f"resblocks_{j}": p for j, p in enumerate(rb_params)}
    weights = extract_stage_weights(gen_params, stage=0, num_kernels=len(kernel_sizes))
    return x, rb_params, weights


@pytest.mark.parametrize("C", [32, 64])
def test_mrf_pallas_matches_flax(C):
    ks = (3, 7, 11)
    dils = ((1, 3, 5),) * 3
    x, rb_params, weights = _make(C, ks, dils, B=2, T=512)
    ref = _reference_mrf(x, rb_params, ks, dils)
    got = mrf_stack_pallas(x, weights, ks, dils, t_tile=256, interpret=True)
    assert got.shape == ref.shape
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 2e-4, err


def test_mrf_pallas_tile_boundaries_exact():
    """Multiple tiles must agree with a single-tile run (halo correctness)."""
    ks = (3, 11)
    dils = ((1, 3), (1, 3, 5))
    x, rb_params, weights = _make(32, ks, dils, B=1, T=1024, seed=1)
    one = mrf_stack_pallas(x, weights, ks, dils, t_tile=1024, interpret=True)
    many = mrf_stack_pallas(x, weights, ks, dils, t_tile=128, interpret=True)
    err = float(jnp.max(jnp.abs(one - many)))
    assert err < 1e-5, err
    ref = _reference_mrf(x, rb_params, ks, dils)
    assert float(jnp.max(jnp.abs(one - ref))) < 2e-4


def test_full_generator_pallas_path_matches_flax():
    from tpu_tts.ops.hifigan_pallas import hifigan_apply_pallas
    from tpu_tts.vocoder.models.hifigan_generator import HifiganGenerator

    gen = HifiganGenerator(
        in_channels=16,
        out_channels=1,
        resblock_type="1",
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=64,
        upsample_factors=(8, 2),
        cond_channels=8,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 16)), dtype=jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 1, 8)), dtype=jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), x, g)["params"]
    ref = gen.apply({"params": params}, x, g)
    got = hifigan_apply_pallas(
        params, x, g,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        upsample_factors=(8, 2),
        t_tile=256,
        interpret=True,
    )
    assert got.shape == ref.shape
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 2e-4, err


def test_vits_inference_pallas_decoder_matches(monkeypatch):
    """End-to-end: Vits.inference with the fused decoder matches the flax
    decoder path (CPU interpret mode)."""
    monkeypatch.setenv("TPU_TTS_PALLAS_INTERPRET", "1")
    from tpu_tts.configs.vits_config import VitsConfig
    from tpu_tts.models.vits import Vits

    cfg = VitsConfig()
    ma = cfg.model_args
    ma.num_chars = 32
    ma.hidden_channels = 48
    ma.hidden_channels_ffn_text_encoder = 64
    ma.num_heads_text_encoder = 2
    ma.num_layers_text_encoder = 1
    ma.num_layers_posterior_encoder = 2
    ma.num_layers_flow = 2
    ma.upsample_initial_channel_decoder = 64
    ma.resblock_kernel_sizes_decoder = [3, 7]
    ma.resblock_dilation_sizes_decoder = [[1, 3], [1, 3]]
    ma.upsample_rates_decoder = [8, 8, 2, 2]
    ma.upsample_kernel_sizes_decoder = [16, 16, 4, 4]
    model = Vits(cfg)
    model.init_params(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).integers(1, 30, (1, 12))
    ref = model.inference(x, aux_input={"use_pallas_decoder": False})
    got = model.inference(x, aux_input={"use_pallas_decoder": True})
    a = np.asarray(ref["model_outputs"])
    b = np.asarray(got["model_outputs"])
    assert a.shape == b.shape
    assert float(np.max(np.abs(a - b))) < 2e-4


def test_delightful_inference_pallas_decoder_matches(monkeypatch):
    monkeypatch.setenv("TPU_TTS_PALLAS_INTERPRET", "1")
    from tests.test_delightful_tts import _model, _tiny_config

    cfg = _tiny_config()
    model = _model(cfg)
    model.init_params(jax.random.PRNGKey(0))
    ids = np.asarray(model.tokenizer.text_to_ids("hello"), dtype=np.int32)
    ref = model.inference(ids, aux_input={"use_pallas_decoder": False})
    got = model.inference(ids, aux_input={"use_pallas_decoder": True})
    a, b = np.asarray(ref["model_outputs"]), np.asarray(got["model_outputs"])
    assert a.shape == b.shape
    assert float(np.max(np.abs(a - b))) < 2e-4
