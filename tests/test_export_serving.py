"""StableHLO serving export (role of the reference's ONNX export,
ref tts/models/vits.py:1806): export, reload WITHOUT the model class, compare
against direct inference."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.utils.export import export_serving_fn, load_serving_fn


def test_export_roundtrip_simple_fn(tmp_path):
    def fn(a, b):
        return jnp.tanh(a @ b), jnp.sum(a)

    a = jnp.ones((4, 8), jnp.float32)
    b = jnp.arange(8 * 3, dtype=jnp.float32).reshape(8, 3) / 10
    path = export_serving_fn(fn, (a, b), str(tmp_path / "f.xla.zip"), {"k": 1})
    call, meta = load_serving_fn(path)
    assert meta["k"] == 1 and meta["platforms"]
    got = call(a, b)
    want = fn(a, b)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), rtol=1e-6)


def test_vits_export_serving_matches_direct(tmp_path):
    from tpu_tts.configs.vits_config import VitsConfig
    from tpu_tts.models.vits import Vits, VitsNet

    cfg = VitsConfig()
    a = cfg.model_args
    a.num_chars = 40
    a.hidden_channels = 32
    a.hidden_channels_ffn_text_encoder = 64
    a.num_layers_text_encoder = 2
    a.num_heads_text_encoder = 2
    a.num_layers_flow = 2
    a.upsample_initial_channel_decoder = 32
    model = Vits(cfg)
    model.init_params(jax.random.PRNGKey(0))

    path = model.export_serving(str(tmp_path / "vits.xla.zip"), batch_size=2, text_len=16, y_max=64)
    call, meta = load_serving_fn(path)
    assert meta["model"] == "vits" and meta["y_max"] == 64

    text = jnp.asarray(np.random.default_rng(0).integers(1, 39, (2, 16)), dtype=jnp.int32)
    tl = jnp.full((2,), 16, dtype=jnp.int32)
    wav, ylen = call(text, tl, jnp.asarray(3, jnp.int32))
    assert np.isfinite(np.asarray(wav)).all()

    # direct single-pass inference with the same rng derivation
    rng = jax.random.fold_in(jax.random.PRNGKey(0), jnp.asarray(3, jnp.int32))
    out = model.net.apply(
        {"params": model.params["generator"]}, text, tl, 64,
        method=VitsNet.inference, rngs={"noise": rng, "sdp": jax.random.fold_in(rng, 1)},
    )
    np.testing.assert_allclose(np.asarray(wav), np.asarray(out["model_outputs"]), atol=1e-5)
