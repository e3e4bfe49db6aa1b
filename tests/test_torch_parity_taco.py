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


def test_gst_tacotron2_parity():
    """GST-conditioned Tacotron2: teacher-forced forward is deterministic and
    must match after conversion (ref gst_layers.py + base_tacotron compute_gst)."""
    tm = ref_import("TTS.tts.models.tacotron2")
    cm = ref_import("TTS.tts.configs.tacotron2_config")
    sm = ref_import("TTS.tts.configs.shared_configs")
    if tm is None or cm is None or sm is None:
        pytest.skip("reference tacotron2/gst not importable")
    import torch

    torch.manual_seed(1)
    gst_cfg = sm.GSTConfig(gst_embedding_dim=32, gst_num_heads=2, gst_num_style_tokens=4)
    ref_model = tm.Tacotron2(cm.Tacotron2Config(num_chars=30, r=2, use_gst=True, gst=gst_cfg))
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    from tpu_tts.configs.shared_configs import GSTConfig
    from tpu_tts.configs.tacotron2_config import Tacotron2Config
    from tpu_tts.models.tacotron2 import Tacotron2

    mine = Tacotron2(Tacotron2Config(
        num_chars=30, r=2, use_gst=True,
        gst=GSTConfig(gst_embedding_dim=32, gst_num_heads=2, gst_num_style_tokens=4),
    ))
    params = mine.convert_torch_state_dict(sd)

    rng = np.random.default_rng(3)
    B, T_en, T_de, C = 2, 6, 96, 80
    text = rng.integers(1, 30, (B, T_en))
    mel = rng.standard_normal((B, T_de, C)).astype(np.float32) * 0.3
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
        train=False, rngs={"dropout": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(out["decoder_outputs"]), ref_out["decoder_outputs"].numpy(),
        atol=2e-3, rtol=1e-3,
    )


def test_capacitron_tacotron2_parity():
    """Capacitron Tacotron2: the posterior parameters (mu, diagonal covariance)
    must match after conversion (sampling itself is stochastic)."""
    tm = ref_import("TTS.tts.models.tacotron2")
    cm = ref_import("TTS.tts.configs.tacotron2_config")
    sm = ref_import("TTS.tts.configs.shared_configs")
    if tm is None or cm is None or sm is None:
        pytest.skip("reference tacotron2/capacitron not importable")
    import torch

    torch.manual_seed(2)
    cap_cfg = sm.CapacitronVAEConfig(
        capacitron_VAE_embedding_dim=16, capacitron_use_text_summary_embeddings=True,
        capacitron_text_summary_embedding_dim=12,
    )
    ref_model = tm.Tacotron2(cm.Tacotron2Config(
        num_chars=30, r=2, use_capacitron_vae=True, capacitron_vae=cap_cfg
    ))
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    from tpu_tts.configs.shared_configs import CapacitronVAEConfig
    from tpu_tts.configs.tacotron2_config import Tacotron2Config
    from tpu_tts.models.tacotron2 import Tacotron2

    mine = Tacotron2(Tacotron2Config(
        num_chars=30, r=2, use_capacitron_vae=True,
        capacitron_vae=CapacitronVAEConfig(
            capacitron_VAE_embedding_dim=16, capacitron_use_text_summary_embeddings=True,
            capacitron_text_summary_embedding_dim=12,
        ),
    ))
    params = mine.convert_torch_state_dict(sd)

    rng = np.random.default_rng(4)
    B, T_en, T_de, C = 2, 6, 96, 80
    text = rng.integers(1, 30, (B, T_en))
    mel = rng.standard_normal((B, T_de, C)).astype(np.float32) * 0.3
    text_len = np.array([T_en, T_en], dtype=np.int64)
    mel_len = np.array([T_de, T_de - 10], dtype=np.int64)
    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(text), torch.from_numpy(text_len),
            torch.from_numpy(mel), torch.from_numpy(mel_len),
        )
    posterior = ref_out["capacitron_vae_outputs"][0]
    ref_mu = posterior.mean.numpy()
    ref_sigma = np.diagonal(posterior.covariance_matrix.numpy(), axis1=-2, axis2=-1)

    out = mine.net.apply(
        {"params": params},
        jnp.asarray(text), jnp.asarray(text_len), jnp.asarray(mel), jnp.asarray(mel_len),
        train=False,
        rngs={"dropout": jax.random.PRNGKey(0), "capacitron": jax.random.PRNGKey(1)},
    )
    np.testing.assert_allclose(np.asarray(out["capacitron_mu"]), ref_mu, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.exp(np.asarray(out["capacitron_logvar"])), ref_sigma, atol=2e-4, rtol=1e-3
    )
