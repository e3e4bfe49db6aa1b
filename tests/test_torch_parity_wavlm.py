"""Numerical parity: vendored torch WavLM → our flax WavLM.

Instantiates the reference's vendored fairseq WavLM
(TTS/vc/modules/freevc/wavlm/wavlm.py) at a small config exercising every
eval-path feature (layer-norm extractor, conv positional embedding, bucketed
relative position bias, gru_rel_pos gating, layer_norm_first), converts its
random-init state dict, and compares `extract_features` outputs."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.ref_torch_loader import load_reference, ref_import  # noqa: E402
from tpu_tts.vc.modules.wavlm import WavLM, WavLMConfig, convert_wavlm_torch_state_dict  # noqa: E402

pytestmark = pytest.mark.skipif(load_reference() is None, reason="reference import failed")


def _torch_wavlm(**overrides):
    import torch

    wm = ref_import("TTS.vc.modules.freevc.wavlm.wavlm")
    cfg_dict = dict(
        extractor_mode="layer_norm",
        encoder_layers=2,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        layer_norm_first=True,
        conv_feature_layers="[(32,10,5)] + [(32,3,2)] * 2",
        conv_bias=True,
        conv_pos=16,
        conv_pos_groups=4,
        relative_position_embedding=True,
        num_buckets=32,
        max_distance=64,
        gru_rel_pos=True,
        encoder_layerdrop=0.0,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        dropout_input=0.0,
        dropout_features=0.0,
    )
    cfg_dict.update(overrides)
    torch.manual_seed(0)
    cfg = wm.WavLMConfig(cfg_dict)
    model = wm.WavLM(cfg)
    model.eval()
    return model, cfg_dict


def _flax_cfg(cfg_dict):
    fields = set(WavLMConfig.__dataclass_fields__)
    kw = {k: v for k, v in cfg_dict.items() if k in fields}
    kw["conv_feature_layers"] = tuple(tuple(t) for t in eval(cfg_dict["conv_feature_layers"]))
    return WavLMConfig(**kw)


@pytest.mark.parametrize(
    "overrides",
    [
        {},  # WavLM-Large shape: layer_norm extractor + pre-norm + gated rel pos
        {"layer_norm_first": False, "gru_rel_pos": False},  # base-style post-norm
        {"extractor_mode": "default", "conv_bias": False, "relative_position_embedding": False},
    ],
)
def test_wavlm_extract_features_parity(overrides):
    import torch

    tmodel, cfg_dict = _torch_wavlm(**overrides)
    wav = np.random.default_rng(0).standard_normal((2, 1600)).astype(np.float32) * 0.2
    with torch.no_grad():
        ref, _ = tmodel.extract_features(torch.from_numpy(wav))
    ref = ref.numpy()

    params = convert_wavlm_torch_state_dict(tmodel.state_dict())
    net = WavLM(_flax_cfg(cfg_dict))
    got = np.asarray(net.apply({"params": params}, jnp.asarray(wav)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_wavlm_padding_mask_parity():
    import torch

    tmodel, cfg_dict = _torch_wavlm()
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((2, 1600)).astype(np.float32) * 0.2
    pad = np.zeros((2, 1600), dtype=bool)
    pad[1, 1100:] = True
    wav[pad] = 0.0
    with torch.no_grad():
        ref, _ = tmodel.extract_features(
            torch.from_numpy(wav), padding_mask=torch.from_numpy(pad)
        )
    ref = ref.numpy()

    params = convert_wavlm_torch_state_dict(tmodel.state_dict())
    net = WavLM(_flax_cfg(cfg_dict))
    got = np.asarray(net.apply({"params": params}, jnp.asarray(wav), jnp.asarray(pad)))
    # compare only non-pad frames of item 1 plus all of item 0
    n_valid = int((~np.asarray(_frame_mask(net, pad, ref.shape[1]))[1]).sum())
    np.testing.assert_allclose(got[0], ref[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got[1, :n_valid], ref[1, :n_valid], atol=2e-4, rtol=1e-3)


def _frame_mask(net, pad, T):
    spf = pad.shape[1] // T
    return pad[:, : T * spf].reshape(pad.shape[0], T, spf).any(-1)
