"""Numerical parity: reference torch VITS → converted flax params.

Instantiates the actual reference model (read-only tree, imported via
`ref_torch_loader` stubs), converts its random-init state dict with
`convert_vits_torch_state_dict`, and checks deterministic submodules produce
the same outputs through our flax modules."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.ref_torch_loader import load_reference, ref_import  # noqa: E402
from tpu_tts.models.vits_convert import convert_vits_torch_state_dict  # noqa: E402

pytestmark = pytest.mark.skipif(load_reference() is None, reason="reference import failed")


TINY = dict(
    num_chars=30, spec_segment_size=8, hidden_channels=32,
    hidden_channels_ffn_text_encoder=64, num_heads_text_encoder=2,
    num_layers_text_encoder=2, kernel_size_text_encoder=3,
    num_layers_posterior_encoder=2, num_layers_flow=2,
    resblock_type_decoder="2", resblock_kernel_sizes_decoder=[3, 5],
    resblock_dilation_sizes_decoder=[[1, 2], [2, 6]],
    upsample_rates_decoder=[8, 8, 4], upsample_initial_channel_decoder=64,
    upsample_kernel_sizes_decoder=[16, 16, 8], out_channels=513,
)


@pytest.fixture(scope="module")
def pair():
    """(reference torch model, my flax model, converted params)"""
    vm = ref_import("TTS.tts.models.vits")
    if vm is None:
        pytest.skip("reference torch VITS not importable")
    import torch

    torch.manual_seed(0)
    ref_model = vm.Vits(vm.VitsArgs(**TINY))
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = convert_vits_torch_state_dict(sd)

    from tpu_tts.configs.vits_config import VitsArgs, VitsConfig
    from tpu_tts.models.vits import Vits

    mine = Vits(VitsConfig(model_args=VitsArgs(**TINY)))
    mine.init_params(jax.random.PRNGKey(0))
    return ref_model, mine, params


def _paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_paths(v, p))
        else:
            out[p] = tuple(v.shape)
    return out


def test_converted_tree_matches_structure(pair):
    _, mine, params = pair
    want = _paths(jax.tree.map(np.asarray, mine.params))
    got = _paths(params)
    missing = {k: v for k, v in want.items() if k not in got}
    extra = {k: v for k, v in got.items() if k not in want}
    mismatched = {k: (want[k], got[k]) for k in want if k in got and want[k] != got[k]}
    assert not missing, f"missing from conversion: {sorted(missing)[:10]}"
    assert not extra, f"unexpected converted keys: {sorted(extra)[:10]}"
    assert not mismatched, f"shape mismatches: {list(mismatched.items())[:10]}"


def test_waveform_decoder_parity(pair):
    import torch

    ref_model, mine, params = pair
    rng = np.random.default_rng(0)
    z = rng.standard_normal((2, 32, 20)).astype(np.float32)  # torch [B, C, T]
    with torch.no_grad():
        ref_wav = ref_model.waveform_decoder(torch.from_numpy(z)).numpy()  # [B, 1, T*hop]
    my_wav = mine.net.apply(
        {"params": params["generator"]},
        jnp.asarray(np.transpose(z, (0, 2, 1))),
        method=lambda net, x: net.waveform_decoder(x),
    )
    my_wav = np.transpose(np.asarray(my_wav), (0, 2, 1))  # → [B, 1, T*hop]
    assert my_wav.shape == ref_wav.shape
    np.testing.assert_allclose(my_wav, ref_wav, atol=2e-4, rtol=1e-3)


def test_text_encoder_parity(pair):
    import torch

    ref_model, mine, params = pair
    rng = np.random.default_rng(1)
    x = rng.integers(0, 30, size=(2, 7)).astype(np.int64)
    lens = np.array([7, 5], dtype=np.int64)
    with torch.no_grad():
        ref_h, ref_m, ref_logs, ref_mask = ref_model.text_encoder(
            torch.from_numpy(x), torch.from_numpy(lens)
        )
    my_h, my_m, my_logs, my_mask = mine.net.apply(
        {"params": params["generator"]},
        jnp.asarray(x.astype(np.int32)),
        jnp.asarray(lens.astype(np.int32)),
        method=lambda net, xi, xl: net.text_encoder(xi, xl),
    )
    mask = np.asarray(my_mask)  # [B, T, 1]
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_m), (0, 2, 1)) * np.transpose(mask, (0, 2, 1)),
        ref_m.numpy() * ref_mask.numpy(),
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_logs), (0, 2, 1)) * np.transpose(mask, (0, 2, 1)),
        ref_logs.numpy() * ref_mask.numpy(),
        atol=2e-4, rtol=1e-3,
    )


def test_flow_parity(pair):
    import torch

    ref_model, mine, params = pair
    rng = np.random.default_rng(2)
    z = rng.standard_normal((2, 32, 12)).astype(np.float32)
    mask = np.ones((2, 1, 12), dtype=np.float32)
    with torch.no_grad():
        ref_zp = ref_model.flow(torch.from_numpy(z), torch.from_numpy(mask)).numpy()
    my_zp = mine.net.apply(
        {"params": params["generator"]},
        jnp.asarray(np.transpose(z, (0, 2, 1))),
        jnp.asarray(np.transpose(mask, (0, 2, 1))),
        method=lambda net, zi, m: net.flow(zi, m),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_zp), (0, 2, 1)), ref_zp, atol=2e-4, rtol=1e-3
    )


def test_posterior_encoder_parity(pair):
    import torch

    ref_model, mine, params = pair
    rng = np.random.default_rng(3)
    spec = rng.standard_normal((2, 513, 11)).astype(np.float32)
    lens = np.array([11, 8], dtype=np.int64)
    with torch.no_grad():
        _, ref_m, ref_logs, ref_mask = ref_model.posterior_encoder(
            torch.from_numpy(spec), torch.from_numpy(lens)
        )
    _, my_m, my_logs, my_mask = mine.net.apply(
        {"params": params["generator"]},
        jnp.asarray(np.transpose(spec, (0, 2, 1))),
        jnp.asarray(lens.astype(np.int32)),
        method=lambda net, s, sl: net.posterior_encoder(s, sl),
        rngs={"posterior": jax.random.PRNGKey(0)},
    )
    mask_t = np.transpose(np.asarray(my_mask), (0, 2, 1))
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_m), (0, 2, 1)) * mask_t,
        ref_m.numpy() * ref_mask.numpy(), atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_logs), (0, 2, 1)) * mask_t,
        ref_logs.numpy() * ref_mask.numpy(), atol=2e-4, rtol=1e-3,
    )
