import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_tts.vocoder.configs.wavegrad_config import WavernnConfig
from tpu_tts.vocoder.models.wavernn import Wavernn, WavernnArgs


def _model(mode="mold"):
    cfg = WavernnConfig()
    cfg.model_args = WavernnArgs(
        rnn_dims=16, fc_dims=16, compute_dims=8, res_out_dims=8, num_res_blocks=2,
        upsample_factors=[4, 4], mode=mode, pad=2,
    )
    m = Wavernn(cfg)
    m.init_params(jax.random.PRNGKey(0))
    return m


@pytest.mark.parametrize("mode", ["mold", "gauss", "9"])
def test_wavernn_loss(mode):
    m = _model(mode)
    hop = 16
    Tm, pad = 10, 2
    rng = np.random.default_rng(0)
    T = (Tm - 2 * pad) * hop
    batch = {
        "mel_input": jnp.asarray(rng.standard_normal((2, Tm, 80)), dtype=jnp.float32),
        "waveform_coarse": jnp.asarray(rng.uniform(-1, 1, (2, T)), dtype=jnp.float32),
        "waveform_target": jnp.asarray(rng.uniform(-1, 1, (2, T)), dtype=jnp.float32),
    }
    loss, _ = m.loss_fn(m.params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_wavernn_batched_inference():
    m = _model("mold")
    mel = np.random.default_rng(0).standard_normal((40, 80)).astype(np.float32)
    wav = m.inference(mel, batched=True, target=160, overlap=64)
    assert wav.ndim == 1
    assert len(wav) == 40 * 16
    assert np.isfinite(wav).all()


def test_wavernn_unbatched_inference():
    m = _model("gauss")
    mel = np.random.default_rng(0).standard_normal((12, 80)).astype(np.float32)
    wav = m.inference(mel, batched=False)
    assert len(wav) == 12 * 16
    assert np.isfinite(wav).all()
