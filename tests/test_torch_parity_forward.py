"""Numerical parity: reference torch ForwardTTS (FastPitch) → converted flax."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.ref_torch_loader import load_reference, ref_import  # noqa: E402

pytestmark = pytest.mark.skipif(load_reference() is None, reason="reference import failed")

ARGS = dict(
    num_chars=30, hidden_channels=32, out_channels=40,
    encoder_params={"hidden_channels_ffn": 64, "num_heads": 2, "num_layers": 1, "dropout_p": 0.1},
    decoder_params={"hidden_channels_ffn": 64, "num_heads": 2, "num_layers": 1, "dropout_p": 0.1},
    duration_predictor_hidden_channels=16, pitch_predictor_hidden_channels=16,
    energy_predictor_hidden_channels=16,
)


@pytest.fixture(scope="module")
def pair():
    fm = ref_import("TTS.tts.models.forward_tts")
    if fm is None:
        pytest.skip("reference forward_tts not importable")
    import torch

    torch.manual_seed(0)
    ref_model = fm.ForwardTTS(fm.ForwardTTSArgs(**ARGS))
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    from tpu_tts.configs.forward_tts_configs import FastPitchConfig
    from tpu_tts.models.forward_tts import ForwardTTS, ForwardTTSArgs

    mine = ForwardTTS(FastPitchConfig(model_args=ForwardTTSArgs(**ARGS)))
    params = mine.convert_torch_state_dict(sd)
    return ref_model, mine, params


def test_tree_structure(pair):
    _, mine, params = pair

    def paths(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            out.update(paths(v, p)) if isinstance(v, dict) else out.setdefault(p, tuple(np.shape(v)))
        return out

    want, got = paths(jax.tree.map(np.asarray, mine.params)), paths(params)
    assert set(want) == set(got), (
        f"missing={sorted(set(want)-set(got))[:8]} extra={sorted(set(got)-set(want))[:8]}"
    )
    bad = {k: (want[k], got[k]) for k in want if want[k] != got[k]}
    assert not bad, f"shape mismatches: {list(bad.items())[:8]}"


def test_encoder_parity(pair):
    import torch

    ref_model, mine, params = pair
    rng = np.random.default_rng(0)
    h = rng.standard_normal((2, 8, 32)).astype(np.float32)  # [B, T, C]
    mask = np.ones((2, 8, 1), dtype=np.float32)
    with torch.no_grad():
        ref_o = ref_model.encoder(
            torch.from_numpy(np.transpose(h, (0, 2, 1))),
            torch.from_numpy(np.transpose(mask, (0, 2, 1))),
        ).numpy()
    my_o = mine.net.apply(
        {"params": params}, jnp.asarray(h), jnp.asarray(mask),
        method=lambda net, hi, m: net.encoder(hi, m),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_o), (0, 2, 1)), ref_o, atol=5e-4, rtol=1e-3
    )


def test_decoder_and_proj_parity(pair):
    import torch

    ref_model, mine, params = pair
    rng = np.random.default_rng(1)
    o_ex = rng.standard_normal((2, 10, 32)).astype(np.float32)
    mask = np.ones((2, 10, 1), dtype=np.float32)
    with torch.no_grad():
        ref_o = ref_model.decoder(
            torch.from_numpy(np.transpose(o_ex, (0, 2, 1))),
            torch.from_numpy(np.transpose(mask, (0, 2, 1))),
        ).numpy()  # [B, out, T]
    my_o = mine.net.apply(
        {"params": params}, jnp.asarray(o_ex), jnp.asarray(mask),
        method=lambda net, oi, m: net.proj(net.decoder(oi, m)),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_o), (0, 2, 1)), ref_o, atol=5e-4, rtol=1e-3
    )


def test_pitch_predictor_parity(pair):
    import torch

    ref_model, mine, params = pair
    rng = np.random.default_rng(2)
    o_en = rng.standard_normal((2, 8, 32)).astype(np.float32)
    mask = np.ones((2, 8, 1), dtype=np.float32)
    with torch.no_grad():
        ref_p = ref_model.pitch_predictor(
            torch.from_numpy(np.transpose(o_en, (0, 2, 1))),
            torch.from_numpy(np.transpose(mask, (0, 2, 1))),
        ).numpy()
    my_p = mine.net.apply(
        {"params": params}, jnp.asarray(o_en), jnp.asarray(mask),
        method=lambda net, oi, m: net.pitch_predictor(oi, m),
    )
    my_p = np.asarray(my_p)
    if my_p.ndim == 3:
        my_p = np.transpose(my_p, (0, 2, 1))
    np.testing.assert_allclose(my_p.reshape(-1), ref_p.reshape(-1), atol=5e-4, rtol=1e-3)


SPEEDY_ARGS = dict(
    num_chars=30, hidden_channels=32, out_channels=20,
    encoder_type="residual_conv_bn",
    encoder_params={"kernel_size": 3, "dilations": [1, 2, 2, 1], "num_conv_blocks": 2, "num_res_blocks": 4},
    decoder_type="residual_conv_bn",
    decoder_params={"kernel_size": 3, "dilations": [1, 2, 4, 1], "num_conv_blocks": 2, "num_res_blocks": 4},
    use_pitch=False, use_aligner=False,
    duration_predictor_hidden_channels=16,
)


def test_speedy_speech_parity():
    """SpeedySpeech (residual_conv_bn coders, ref feed_forward/{encoder,
    decoder}.py) teacher-free inference parity after conversion."""
    fm = ref_import("TTS.tts.models.forward_tts")
    if fm is None:
        pytest.skip("reference forward_tts not importable")
    import torch

    torch.manual_seed(5)
    ref_model = fm.ForwardTTS(fm.ForwardTTSArgs(**SPEEDY_ARGS))
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    from tpu_tts.configs.forward_tts_configs import SpeedySpeechConfig
    from tpu_tts.models.forward_tts import ForwardTTS, ForwardTTSArgs

    mine = ForwardTTS(SpeedySpeechConfig(model_args=ForwardTTSArgs(**SPEEDY_ARGS)))
    params = mine.convert_torch_state_dict(sd)

    rng = np.random.default_rng(6)
    B, T_en = 2, 12
    text = rng.integers(1, 30, (B, T_en))
    text_len = np.array([T_en, T_en], dtype=np.int64)
    with torch.no_grad():
        ref_out = ref_model.inference(torch.from_numpy(text))
    ref_mel = ref_out["model_outputs"].numpy()

    mine.params = params
    out = mine.inference(np.asarray(text))
    my_mel = np.asarray(out["model_outputs"])
    n = min(my_mel.shape[1], ref_mel.shape[1])
    assert n > 4
    np.testing.assert_allclose(my_mel[:, :n], ref_mel[:, :n], atol=2e-3, rtol=1e-3)
