"""Numerical parity: reference torch XTTS (v2 perceiver variant) → converted
flax params. Checks conditioning latents, teacher-forced GPT mel logits, and
the HiFi decoder waveform against the actual reference modules."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.ref_torch_loader import load_reference, ref_import  # noqa: E402

pytestmark = pytest.mark.skipif(load_reference() is None, reason="reference import failed")

ARGS = dict(
    gpt_layers=2, gpt_n_model_channels=64, gpt_n_heads=2,
    gpt_number_text_tokens=100, gpt_num_audio_tokens=66,
    gpt_max_audio_tokens=100, gpt_max_text_tokens=60,
    decoder_input_dim=64, d_vector_dim=32, gpt_use_perceiver_resampler=True,
)


@pytest.fixture(scope="module")
def pair():
    xm = ref_import("TTS.tts.models.xtts")
    cfgmod = ref_import("TTS.tts.configs.xtts_config")
    if xm is None or cfgmod is None:
        pytest.skip("reference xtts not importable")
    import torch

    torch.manual_seed(0)
    ref_model = xm.Xtts(cfgmod.XttsConfig(model_args=xm.XttsArgs(**ARGS)))
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    from tpu_tts.configs.xtts_config import XttsArgs, XttsConfig
    from tpu_tts.models.xtts import Xtts

    mine = Xtts(XttsConfig(model_args=XttsArgs(
        gpt_layers=2, gpt_n_model_channels=64, gpt_n_heads=2,
        gpt_number_text_tokens=100, gpt_num_audio_tokens=66,
        gpt_max_audio_tokens=100, gpt_max_text_tokens=60,
        decoder_input_dim=64, d_vector_dim=32,
    )))
    params = mine.convert_torch_state_dict(sd)
    return ref_model, mine, params


def test_conditioning_latents_parity(pair):
    import torch

    ref_model, mine, params = pair
    mel = np.random.default_rng(0).standard_normal((1, 80, 24)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_lat = ref_model.gpt.get_style_emb(torch.from_numpy(mel)).numpy()  # [B, D, 32]
    from tpu_tts.models.xtts import XttsNet

    my_lat, _ = mine.net.apply(
        {"params": params}, jnp.asarray(np.transpose(mel, (0, 2, 1))),
        method=XttsNet.compute_conditioning,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(my_lat), (0, 2, 1)), ref_lat, atol=3e-4, rtol=1e-3
    )


def test_gpt_block_logits_parity(pair):
    """Teacher-forced logits through the GPT stack on fixed embeddings."""
    import torch

    ref_model, mine, params = pair
    rng = np.random.default_rng(1)
    B, T, D = 1, 10, 64
    h = rng.standard_normal((B, T, D)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_out = ref_model.gpt.gpt(inputs_embeds=torch.from_numpy(h)).last_hidden_state
        ref_out = ref_model.gpt.final_norm(ref_out).numpy()

    def run(net, x):
        for blk in net.gpt.blocks:
            x, _ = blk(x)
        return net.gpt.final_norm(net.gpt.ln_f(x))

    my_out = mine.net.apply({"params": params}, jnp.asarray(h), method=run)
    np.testing.assert_allclose(np.asarray(my_out), ref_out, atol=3e-4, rtol=1e-3)


def test_hifi_decoder_parity(pair):
    """Full HifiDecoder.forward parity — includes the x4 latent-rate linear
    interpolation and the 22050→24000 feature resample (hifigan_decoder.py:
    688-699) ahead of the waveform decoder."""
    import torch

    ref_model, mine, params = pair
    rng = np.random.default_rng(2)
    lat = rng.standard_normal((1, 12, 64)).astype(np.float32) * 0.3  # [B, T, C]
    g = rng.standard_normal((1, 32, 1)).astype(np.float32)
    with torch.no_grad():
        ref_wav = ref_model.hifigan_decoder(
            torch.from_numpy(lat), g=torch.from_numpy(g)
        ).numpy()  # ref takes latents [B, T, C] and transposes internally
    from tpu_tts.models.xtts import XttsNet

    my_wav = mine.net.apply(
        {"params": params}, jnp.asarray(lat), jnp.asarray(g[:, :, 0]),
        method=XttsNet.decode_latents,
    )
    my_wav = np.transpose(np.asarray(my_wav), (0, 2, 1))
    assert my_wav.shape == ref_wav.shape
    np.testing.assert_allclose(my_wav, ref_wav, atol=3e-4, rtol=1e-3)
