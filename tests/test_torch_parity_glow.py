"""Numerical parity: reference torch Glow-TTS → converted flax params.

Same harness as test_torch_parity_vits.py. The glow decoder is fully
deterministic (flows), so end-to-end inference parity is checkable given the
same latent noise — here we check encoder outputs and a decoder
forward/inverse pass on matched inputs."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.ref_torch_loader import load_reference, ref_import  # noqa: E402

pytestmark = pytest.mark.skipif(load_reference() is None, reason="reference import failed")

TINY = dict(
    num_chars=30, hidden_channels_enc=32, hidden_channels_dec=32,
    hidden_channels_dp=16, out_channels=40, num_flow_blocks_dec=2,
    num_block_layers=1,
    encoder_params={
        "kernel_size": 3, "dropout_p": 0.1, "num_layers": 1, "num_heads": 2,
        "hidden_channels_ffn": 32, "rel_attn_window_size": 4,
    },
)


@pytest.fixture(scope="module")
def pair():
    gm = ref_import("TTS.tts.models.glow_tts")
    cfgmod = ref_import("TTS.tts.configs.glow_tts_config")
    if gm is None or cfgmod is None:
        pytest.skip("reference torch GlowTTS not importable")
    import torch

    torch.manual_seed(0)
    ref_model = gm.GlowTTS(cfgmod.GlowTTSConfig(**TINY))
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    from tpu_tts.configs.glow_tts_config import GlowTTSConfig
    from tpu_tts.models.glow_tts import GlowTTS

    mine = GlowTTS(GlowTTSConfig(**TINY))
    params = mine.convert_torch_state_dict(sd)
    return ref_model, mine, params


def test_converted_tree_structure(pair):
    _, mine, params = pair

    def paths(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            out.update(paths(v, p)) if isinstance(v, dict) else out.setdefault(p, tuple(v.shape))
        return out

    want = paths(jax.tree.map(np.asarray, mine.params))
    got = paths(params)
    assert set(want) == set(got), (
        f"missing={sorted(set(want)-set(got))[:8]} extra={sorted(set(got)-set(want))[:8]}"
    )
    bad = {k: (want[k], got[k]) for k in want if want[k] != got[k]}
    assert not bad, f"shape mismatches: {list(bad.items())[:8]}"


def test_encoder_parity(pair):
    import torch

    ref_model, mine, params = pair
    rng = np.random.default_rng(0)
    x = rng.integers(0, 30, size=(2, 9)).astype(np.int64)
    lens = np.array([9, 6], dtype=np.int64)
    with torch.no_grad():
        ref_o = ref_model.encoder(torch.from_numpy(x), torch.from_numpy(lens))
    ref_m, ref_logw, ref_mask = ref_o[0], ref_o[2], ref_o[3]
    my_m, my_logs, my_logw, my_mask = mine.net.apply(
        {"params": params},
        jnp.asarray(x.astype(np.int32)),
        jnp.asarray(lens.astype(np.int32)),
        method=lambda net, xi, xl: net.encoder(xi, xl),
    )
    mask_t = np.transpose(np.asarray(my_mask), (0, 2, 1))
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_m), (0, 2, 1)) * mask_t,
        ref_m.numpy() * ref_mask.numpy(), atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_logw), (0, 2, 1)) * mask_t,
        ref_logw.numpy() * ref_mask.numpy(), atol=2e-4, rtol=1e-3,
    )


def test_decoder_parity(pair):
    import torch

    ref_model, mine, params = pair
    rng = np.random.default_rng(1)
    y = rng.standard_normal((2, 40, 12)).astype(np.float32)
    mask = np.ones((2, 1, 12), dtype=np.float32)
    with torch.no_grad():
        ref_z, _ = ref_model.decoder(torch.from_numpy(y), torch.from_numpy(mask), reverse=False)
    my_z, _ = mine.net.apply(
        {"params": params},
        jnp.asarray(np.transpose(y, (0, 2, 1))),
        jnp.asarray(np.transpose(mask, (0, 2, 1))),
        method=lambda net, yi, m: net.decoder(yi, m, reverse=False),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_z), (0, 2, 1)), ref_z.numpy(), atol=2e-4, rtol=1e-3
    )
    # inverse direction too (inference path)
    with torch.no_grad():
        ref_y, _ = ref_model.decoder(ref_z, torch.from_numpy(mask), reverse=True)
    my_y, _ = mine.net.apply(
        {"params": params},
        my_z,
        jnp.asarray(np.transpose(mask, (0, 2, 1))),
        method=lambda net, zi, m: net.decoder(zi, m, reverse=True),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_y), (0, 2, 1)), ref_y.numpy(), atol=2e-4, rtol=1e-3
    )


ENC_VARIANTS = {
    "gated_conv": {"kernel_size": 5, "dropout_p": 0.1, "num_layers": 3},
    "residual_conv_bn": {
        "kernel_size": 4, "dilations": [1, 2, 4, 1], "num_conv_blocks": 2,
        "num_res_blocks": 4,
    },
    "time_depth_separable": {"kernel_size": 5, "num_layers": 3},
}


@pytest.mark.parametrize("enc_type", sorted(ENC_VARIANTS))
def test_encoder_variant_parity(enc_type):
    """Converted reference weights reproduce the torch encoder for the
    gated_conv / residual_conv_bn / time_depth_separable types
    (ref glow_tts/encoder.py:106-131)."""
    gm = ref_import("TTS.tts.models.glow_tts")
    cfgmod = ref_import("TTS.tts.configs.glow_tts_config")
    if gm is None or cfgmod is None:
        pytest.skip("reference torch GlowTTS not importable")
    import torch

    kw = dict(TINY)
    kw["encoder_params"] = dict(ENC_VARIANTS[enc_type])
    kw["use_encoder_prenet"] = enc_type != "residual_conv_bn"  # ref Sequential
    torch.manual_seed(0)
    ref_model = gm.GlowTTS(cfgmod.GlowTTSConfig(encoder_type=enc_type, **kw))
    # give BN running stats non-trivial values so frozen_batch folding is
    # actually exercised
    with torch.no_grad():
        for m in ref_model.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.4)
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    from tpu_tts.configs.glow_tts_config import GlowTTSConfig
    from tpu_tts.models.glow_tts import GlowTTS

    mine = GlowTTS(GlowTTSConfig(encoder_type=enc_type, **kw))
    params = mine.convert_torch_state_dict(sd)
    rng = np.random.default_rng(0)
    # T must cover the largest valid-conv receptive field (dilation 4, k=4)
    x = rng.integers(0, 30, size=(2, 16)).astype(np.int64)
    lens = np.array([16, 16], dtype=np.int64)
    with torch.no_grad():
        ref_o = ref_model.encoder(torch.from_numpy(x), torch.from_numpy(lens))
    ref_m, ref_logw, ref_mask = ref_o[0], ref_o[2], ref_o[3]
    my_m, _, my_logw, my_mask = mine.net.apply(
        {"params": params},
        jnp.asarray(x.astype(np.int32)),
        jnp.asarray(lens.astype(np.int32)),
        method=lambda net, xi, xl: net.encoder(xi, xl),
    )
    mask_t = np.transpose(np.asarray(my_mask), (0, 2, 1))
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_m), (0, 2, 1)) * mask_t,
        ref_m.numpy() * ref_mask.numpy(), atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_logw), (0, 2, 1)) * mask_t,
        ref_logw.numpy() * ref_mask.numpy(), atol=2e-4, rtol=1e-3,
    )
