"""Numerical parity: reference torch Tacotron (v1, CBHG) → converted flax
params. Teacher-forced forward compares decoder (mel) and postnet (linear)
outputs; BN maps onto frozen_batch (eps=1e-3)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.ref_torch_loader import load_reference, ref_import  # noqa: E402

pytestmark = pytest.mark.skipif(load_reference() is None, reason="reference import failed")


@pytest.fixture(scope="module")
def pair():
    tm = ref_import("TTS.tts.models.tacotron")
    cm = ref_import("TTS.tts.configs.tacotron_config")
    if tm is None or cm is None:
        pytest.skip("reference tacotron not importable")
    import torch

    torch.manual_seed(0)
    cfg = cm.TacotronConfig(
        num_chars=30, r=2, out_channels=65, decoder_output_dim=20, memory_size=-1
    )
    ref_model = tm.Tacotron(cfg)
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    from tpu_tts.configs.tacotron2_config import TacotronConfig
    from tpu_tts.models.tacotron import Tacotron

    mine = Tacotron(
        TacotronConfig(num_chars=30, r=2, out_channels=65, decoder_output_dim=20)
    )
    params = mine.convert_torch_state_dict(sd)
    return ref_model, mine, params


def test_teacher_forced_parity(pair):
    import torch

    ref_model, mine, params = pair
    rng = np.random.default_rng(0)
    B, T_en, T_de, C = 2, 7, 8, 20
    text = rng.integers(1, 30, (B, T_en))
    mel = rng.standard_normal((B, T_de, C)).astype(np.float32) * 0.5
    text_len = np.array([T_en, T_en], dtype=np.int64)
    mel_len = np.array([T_de, T_de], dtype=np.int64)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(text), torch.from_numpy(text_len),
            torch.from_numpy(mel), torch.from_numpy(mel_len),
        )
    out = mine.net.apply(
        {"params": params},
        jnp.asarray(text), jnp.asarray(text_len), jnp.asarray(mel), jnp.asarray(mel_len),
        train=False,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(out["decoder_outputs"]), ref_out["decoder_outputs"].numpy(),
        atol=3e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["model_outputs"]), ref_out["model_outputs"].numpy(),
        atol=3e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["stop_tokens"]), ref_out["stop_tokens"].numpy(), atol=3e-4, rtol=1e-3
    )
