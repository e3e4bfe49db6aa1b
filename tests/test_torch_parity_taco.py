"""Numerical parity: reference torch Tacotron2 → converted flax params.

The reference's BatchNorm maps onto our FrozenBatchNorm (running-stat
affine). The reference prenet applies dropout unconditionally (the classic
Tacotron always-on-dropout quirk) — for deterministic comparison the decoder
test patches torch dropout to identity and runs our side with train=False."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.ref_torch_loader import load_reference, ref_import  # noqa: E402

pytestmark = pytest.mark.skipif(load_reference() is None, reason="reference import failed")


@pytest.fixture(scope="module")
def pair():
    tm = ref_import("TTS.tts.models.tacotron2")
    cm = ref_import("TTS.tts.configs.tacotron2_config")
    if tm is None or cm is None:
        pytest.skip("reference tacotron2 not importable")
    import torch

    torch.manual_seed(0)
    ref_model = tm.Tacotron2(cm.Tacotron2Config(num_chars=30, r=2))
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    from tpu_tts.configs.tacotron2_config import Tacotron2Config
    from tpu_tts.models.tacotron2 import Tacotron2

    mine = Tacotron2(Tacotron2Config(num_chars=30, r=2))
    params = mine.convert_torch_state_dict(sd)
    return ref_model, mine, params


def test_encoder_parity(pair):
    import torch

    ref_model, mine, params = pair
    rng = np.random.default_rng(0)
    x = rng.integers(0, 30, size=(2, 7)).astype(np.int64)
    lens = np.array([7, 7], dtype=np.int64)
    with torch.no_grad():
        emb = ref_model.embedding(torch.from_numpy(x)).transpose(1, 2)
        ref_o = ref_model.encoder.inference(emb).numpy()  # [B, T, C]
    my_o = mine.net.apply(
        {"params": params},
        jnp.asarray(x.astype(np.int32)),
        jnp.asarray(lens.astype(np.int32)),
        None, False,
        method=lambda net, xi, xl, sid, tr: net._encode(xi, xl, sid, tr)[0],
    )
    np.testing.assert_allclose(np.asarray(my_o), ref_o, atol=1e-3, rtol=1e-2)


def test_postnet_parity(pair):
    import torch

    ref_model, mine, params = pair
    mel = np.random.default_rng(1).standard_normal((2, 80, 12)).astype(np.float32)
    with torch.no_grad():
        ref_o = ref_model.postnet(torch.from_numpy(mel)).numpy()
    my_o = mine.net.apply(
        {"params": params},
        jnp.asarray(np.transpose(mel, (0, 2, 1))),
        method=lambda net, m: net.postnet(m, train=False),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_o), (0, 2, 1)), ref_o, atol=1e-3, rtol=1e-2
    )


def test_teacher_forced_decoder_parity(pair):
    import torch
    import torch.nn.functional as F

    ref_model, mine, params = pair
    rng = np.random.default_rng(2)
    B, T_en, T_de = 1, 6, 8  # T_de multiple of r=2
    enc = rng.standard_normal((B, T_en, 512)).astype(np.float32)
    mel = rng.standard_normal((B, 80, T_de)).astype(np.float32)
    mask = torch.ones(B, T_en, dtype=torch.bool)  # reference mask: True = keep

    orig_dropout = F.dropout
    F.dropout = lambda x, *a, **k: x  # kill the always-on prenet dropout
    try:
        with torch.no_grad():
            ref_frames, ref_attn, ref_stops = ref_model.decoder(
                torch.from_numpy(enc),
                torch.from_numpy(np.ascontiguousarray(np.transpose(mel, (0, 2, 1)))),  # [B, T, C]
                mask,
            )
    finally:
        F.dropout = orig_dropout
    ref_frames = ref_frames.numpy()  # [B, mel, T]

    key_mask = jnp.ones((B, T_en), dtype=bool)
    my_frames, my_stops, my_attn = mine.net.apply(
        {"params": params},
        jnp.asarray(enc), jnp.asarray(np.transpose(mel, (0, 2, 1))), key_mask,
        method=lambda net, e, m, km: net.decoder(e, m, km, train=False),
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_frames), (0, 2, 1)), ref_frames, atol=2e-3, rtol=1e-2
    )
