"""XTTS GPT fine-tuning pipeline: framing/masking semantics, the DVAE-coded
loss path, frozen-decoder optimizer, and the fixed-shape dataset
(ref TTS/tts/layers/xtts/trainer/{gpt_trainer.py,dataset.py})."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpu_tts.configs.xtts_config import XttsArgs, XttsConfig
from tpu_tts.models.xtts import Xtts

TINY = dict(
    gpt_layers=2, gpt_n_model_channels=64, gpt_n_heads=2,
    gpt_number_text_tokens=50, gpt_num_audio_tokens=34,
    gpt_start_audio_token=32, gpt_stop_audio_token=33,
    gpt_start_text_token=48, gpt_stop_text_token=0,
    gpt_max_audio_tokens=40, gpt_max_text_tokens=20,
    decoder_input_dim=64, d_vector_dim=32,
    max_wav_length=8192, max_text_length=12,
    min_conditioning_length=2048, max_conditioning_length=4096,
)


def _model():
    model = Xtts(XttsConfig(model_args=XttsArgs(**TINY)))
    model.init_params(jax.random.PRNGKey(0))
    model.load_dvae()  # random-init DVAE (no released checkpoint in tests)
    return model


def _batch(B=2, seed=0):
    rng = np.random.default_rng(seed)
    a = TINY
    return {
        "text_tokens": rng.integers(1, 40, (B, a["max_text_length"])).astype(np.int32),
        "text_lengths": np.array([a["max_text_length"], 7], dtype=np.int32),
        "wav": (rng.standard_normal((B, a["max_wav_length"])) * 0.1).astype(np.float32),
        "wav_lengths": np.array([a["max_wav_length"], 5000], dtype=np.int32),
        "cond_wav": (rng.standard_normal((B, a["max_conditioning_length"])) * 0.1).astype(np.float32),
        "cond_lengths": np.array([a["max_conditioning_length"], 3000], dtype=np.int32),
    }


def test_xtts_finetune_loss_finite():
    model = _model()
    loss, logs = model.loss_fn(model.params, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert float(logs["loss_mel_ce"]) > 0 and float(logs["loss_text_ce"]) > 0


def test_xtts_finetune_padding_invariance():
    """Tokens/audio past the true lengths must not change the loss — the
    reference reaches the same invariance via targets=-1 + attention masks
    (gpt.py:481-535)."""
    model = _model()
    b1 = _batch()
    b2 = _batch()
    # scribble over padding of the short sample (idx 1)
    b2["text_tokens"][1, 7:] = 3
    b2["wav"][1, 5000:] = 0.5
    l1, _ = model.loss_fn(model.params, b1, jax.random.PRNGKey(1))
    l2, _ = model.loss_fn(model.params, b2, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)


def test_xtts_finetune_step_updates_only_gpt_stack():
    """One optimizer step must update the GPT/conditioning subtrees and leave
    the waveform decoder + speaker path frozen (ref gpt_trainer.py:401)."""
    model = _model()
    model.config.lr = 1e-3
    opt = model.get_optimizer()
    params = model.params
    state = opt.init(params)
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}

    @jax.jit
    def step(p, s):
        (loss, _), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(
            p, batch, jax.random.PRNGKey(1)
        )
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    new_params, state, loss = step(params, state)
    assert np.isfinite(float(loss))

    def max_delta(tree_a, tree_b):
        leaves = jax.tree_util.tree_leaves(
            jax.tree.map(lambda a, b: jnp.max(jnp.abs(a - b)), tree_a, tree_b)
        )
        return max(float(l) for l in leaves) if leaves else 0.0

    assert max_delta(params["gpt"], new_params["gpt"]) > 0
    assert max_delta(params["conditioning_perceiver"], new_params["conditioning_perceiver"]) > 0
    assert max_delta(params["hifigan_decoder"], new_params["hifigan_decoder"]) == 0


def test_xtts_finetune_loss_decreases():
    model = _model()
    model.config.lr = 5e-3
    opt = model.get_optimizer()
    params = model.params
    state = opt.init(params)
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}

    @jax.jit
    def step(p, s):
        (loss, _), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(
            p, batch, jax.random.PRNGKey(1)
        )
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for _ in range(5):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


class _CharTokenizer:
    def encode(self, text, lang):
        return [1 + (ord(c) % 38) for c in text][:200]


def test_xtts_dataset_fixed_shapes(tmp_path):
    import scipy.io.wavfile

    from tpu_tts.layers.xtts.dataset import XttsDataLoader, XttsDataset

    rng = np.random.default_rng(0)
    samples = []
    for i in range(5):
        path = tmp_path / f"s{i}.wav"
        n = int(rng.integers(4000, 12000))
        scipy.io.wavfile.write(
            str(path), 22050, (rng.standard_normal(n) * 4000).astype(np.int16)
        )
        samples.append({"text": f"sample number {i}", "audio_file": str(path), "language": "en"})
    ds = XttsDataset(
        samples, _CharTokenizer(), 22050,
        max_text_length=12, max_wav_length=8192,
        min_conditioning_length=2048, max_conditioning_length=4096,
    )
    loader = XttsDataLoader(ds, batch_size=2, shuffle=True)
    shapes = set()
    for batch in loader:
        shapes.add((batch["text_tokens"].shape, batch["wav"].shape, batch["cond_wav"].shape))
        assert batch["wav_lengths"].max() <= 8192
        assert batch["text_lengths"].max() <= 12
        assert (batch["cond_lengths"] >= 1).all()
    assert len(shapes) == 1, "every batch must share one static shape"
