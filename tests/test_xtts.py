import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_tts.configs.xtts_config import XttsConfig
from tpu_tts.models.xtts import Xtts, XttsArgs


@pytest.fixture(scope="module")
def xtts_model():
    cfg = XttsConfig()
    cfg.model_args = XttsArgs(
        gpt_layers=2,
        gpt_n_heads=2,
        gpt_n_model_channels=32,
        gpt_number_text_tokens=50,
        gpt_num_audio_tokens=34,
        gpt_start_audio_token=32,
        gpt_stop_audio_token=33,
        num_cond_latents=4,
        d_vector_dim=16,
        decoder_input_dim=32,
        decoder_upsample_rates=(4, 4),
        kv_cache_len=128,
    )
    m = Xtts(cfg)
    m.init_params(jax.random.PRNGKey(0))
    return m


def test_xtts_finetune_loss(xtts_model):
    rng = np.random.default_rng(0)
    batch = {
        "cond_mel": jnp.asarray(rng.standard_normal((2, 16, 80)), dtype=jnp.float32),
        "text_tokens": jnp.asarray(rng.integers(0, 50, (2, 10)), dtype=jnp.int32),
        "audio_codes": jnp.asarray(rng.integers(0, 32, (2, 14)), dtype=jnp.int32),
    }
    loss, logs = xtts_model.loss_fn(xtts_model.params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert {"loss_text_ce", "loss_mel_ce"} <= set(logs)


def test_xtts_conditioning_and_inference(xtts_model):
    wav = np.random.default_rng(0).standard_normal(22050).astype(np.float32) * 0.3
    cond, spk = xtts_model.get_conditioning_latents(wav)
    assert np.asarray(cond).shape == (1, 4, 32)
    assert np.asarray(spk).shape == (1, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(spk)), 1.0, atol=1e-4)

    ids = np.arange(1, 9, dtype=np.int32)[None]
    out = xtts_model.inference(
        text_tokens=jnp.asarray(ids), gpt_cond_latent=cond, speaker_embedding=spk, max_new_tokens=24
    )
    assert out["wav"].ndim == 1
    assert np.isfinite(out["wav"]).all()
    assert out["gpt_codes"].shape == (1, 24)


def test_xtts_streaming(xtts_model):
    wav = np.random.default_rng(1).standard_normal(11025).astype(np.float32) * 0.3
    cond, spk = xtts_model.get_conditioning_latents(wav)

    # streaming path needs a BPE; inject token ids directly via monkeypatching encode
    xtts_model.bpe.encode = lambda text, lang: list(range(1, 7))
    chunks = list(
        xtts_model.inference_stream(
            "dummy", "en", gpt_cond_latent=cond, speaker_embedding=spk,
            stream_chunk_size=8, overlap_latents=2, max_new_tokens=24,
        )
    )
    assert len(chunks) >= 1
    total = np.concatenate(chunks)
    assert np.isfinite(total).all()
    hop = 16
    # total streamed samples ≈ valid tokens * hop
    assert len(total) % hop == 0
