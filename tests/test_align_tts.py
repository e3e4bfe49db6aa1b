"""AlignTTS unit tests (mirror of reference tests/tts_tests2/test_align_tts_train.py
scope plus model-level shape/grad checks; ref model at
/root/reference/TTS/tts/models/align_tts.py, loss at losses.py:564)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.configs import AlignTTSConfig
from tpu_tts.models.align_tts import AlignTTS, mdn_forward_loss


def _small_cfg(**kw):
    cfg = AlignTTSConfig()
    cfg.model_args.num_chars = 32
    cfg.model_args.hidden_channels = 32
    cfg.model_args.hidden_channels_dp = 16
    cfg.model_args.encoder_params = {"hidden_channels_ffn": 32, "num_heads": 2, "num_layers": 1, "dropout_p": 0.1}
    cfg.model_args.decoder_params = {"hidden_channels_ffn": 32, "num_heads": 2, "num_layers": 1, "dropout_p": 0.1}
    for k, v in kw.items():
        setattr(cfg.model_args, k, v)
    return cfg


def _batch(B=2, T_en=9, T_de=24, step=0):
    rng = np.random.default_rng(0)
    return {
        "text_input": jnp.asarray(rng.integers(1, 32, (B, T_en)), dtype=jnp.int32),
        "text_lengths": jnp.array([T_en, T_en - 3], dtype=jnp.int32),
        "mel_input": jnp.asarray(rng.standard_normal((B, T_de, 80)), dtype=jnp.float32),
        "mel_lengths": jnp.array([T_de, T_de - 5], dtype=jnp.int32),
        "global_step": jnp.asarray(step),
    }


def test_align_tts_loss_all_phases():
    """Phase index counts boundaries strictly below the step (ref
    align_tts.py:417 `i < global_step`) and gates loss terms exactly as
    AlignTTSLoss.forward (losses.py:591-618): 0=mdn, 1=spec+ssim,
    2=mdn+spec+ssim, 3=dur only, >=4 all."""
    model = AlignTTS(_small_cfg())
    model.phase_start_steps = [0, 10, 20, 30, 40]
    params = model.init_params(jax.random.PRNGKey(0))
    active = {
        0: ("mdn",),
        1: ("spec", "ssim"),
        2: ("mdn", "spec", "ssim"),
        3: ("dur",),
        4: ("mdn", "spec", "ssim", "dur"),
        5: ("mdn", "spec", "ssim", "dur"),
    }
    for step, expected_phase in [(0, 0), (5, 1), (15, 2), (25, 3), (35, 4), (50, 5)]:
        loss, logs = model.loss_fn(params, _batch(step=step), jax.random.PRNGKey(1))
        assert int(logs["phase"]) == expected_phase, step
        assert np.isfinite(float(loss))
        terms = {"mdn": logs["loss_mdn"], "spec": logs["loss_spec"],
                 "ssim": logs["loss_ssim"], "dur": logs["loss_dur"]}
        expected = sum(float(terms[t]) for t in active[expected_phase])
        assert abs(float(loss) - expected) < 1e-5, (step, expected_phase)


def test_align_tts_no_phase_schedule():
    """phase_start_steps=None trains without phases — every loss active
    (ref align_tts.py:427 phase=None → AlignTTSLoss else-branch)."""
    model = AlignTTS(_small_cfg())
    assert model.phase_start_steps is None
    params = model.init_params(jax.random.PRNGKey(0))
    loss, logs = model.loss_fn(params, _batch(step=0), jax.random.PRNGKey(1))
    expected = sum(float(logs[k]) for k in ("loss_mdn", "loss_spec", "loss_ssim", "loss_dur"))
    assert abs(float(loss) - expected) < 1e-5


def test_align_tts_grads_and_param_update():
    model = AlignTTS(_small_cfg())
    model.phase_start_steps = [0, 0, 0, 0, 10**9]  # joint phase: all losses on
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(step=5)
    grads = jax.grad(lambda p: model.loss_fn(p, batch, jax.random.PRNGKey(1))[0])(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in flat)
    # encoder, decoder, MDN, and duration predictor must all receive gradient
    for key in ["encoder", "decoder", "mdn_out", "duration_predictor"]:
        sub = jax.tree_util.tree_leaves(grads[key])
        assert any(float(jnp.sum(jnp.abs(g))) > 0 for g in sub), key


def test_align_tts_inference_shapes():
    model = AlignTTS(_small_cfg())
    model.init_params(jax.random.PRNGKey(0))
    x = np.random.default_rng(1).integers(1, 32, (1, 13))
    out = model.inference(x)
    assert out["model_outputs"].ndim == 3
    assert out["model_outputs"].shape[-1] == 80
    assert out["alignments"].shape[0] == 1
    assert int(out["y_lengths"][0]) >= 1


def test_align_tts_speaker_embedding():
    cfg = _small_cfg(use_speaker_embedding=True, num_speakers=3)
    model = AlignTTS(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch()
    batch["speaker_ids"] = jnp.array([0, 2], dtype=jnp.int32)
    loss, _ = model.loss_fn(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_mdn_forward_loss_monotonic_lattice():
    # A perfectly aligned diagonal should score much better than uniform noise.
    B, T_en, T_de = 1, 4, 8
    good = np.full((B, T_en, T_de), -20.0)
    for t in range(T_de):
        good[0, min(t // 2, T_en - 1), t] = 0.0
    bad = np.full((B, T_en, T_de), -20.0)
    tl = jnp.array([T_en], dtype=jnp.int32)
    ml = jnp.array([T_de], dtype=jnp.int32)
    l_good = float(mdn_forward_loss(jnp.asarray(good), tl, ml))
    l_bad = float(mdn_forward_loss(jnp.asarray(bad), tl, ml))
    assert l_good < l_bad


def test_mdn_forward_loss_padding_invariant():
    """The lattice terminal must be read at (text_lens-1, mel_lens-1); padded
    mel columns (masked to -1e4 as in AlignTTSNet.__call__) must not change the
    NLL (ref MDNLoss gathers log_alpha[b, text_len-1, mel_len-1])."""
    rng = np.random.default_rng(0)
    B, T_en, T_de = 2, 5, 12
    logp = rng.standard_normal((B, T_en, T_de)).astype(np.float32)
    tl = jnp.array([T_en, T_en - 2], dtype=jnp.int32)
    ml = jnp.array([T_de, T_de - 4], dtype=jnp.int32)
    # mask padded (text, mel) cells exactly as the model does
    tmask = (np.arange(T_en)[None, :, None] < np.asarray(tl)[:, None, None])
    mmask = (np.arange(T_de)[None, None, :] < np.asarray(ml)[:, None, None])
    mask = (tmask & mmask).astype(np.float32)
    logp_masked = logp * mask + (1 - mask) * -1e4
    base = float(mdn_forward_loss(jnp.asarray(logp_masked), tl, ml))
    # grow the bucket: extra all-padding mel columns must be a no-op
    pad = np.full((B, T_en, 7), -1e4, dtype=np.float32)
    wider = np.concatenate([logp_masked, pad], axis=2)
    padded = float(mdn_forward_loss(jnp.asarray(wider), tl, ml))
    assert abs(base - padded) < 1e-3, (base, padded)
    assert abs(base) < 1e3, "padded frames leaked ~1e4 terms into the NLL"


def test_align_tts_setup_model_registry():
    from tpu_tts.models import setup_model

    cfg = _small_cfg()
    cfg.model_args.num_chars = None  # let tokenizer set it
    model = setup_model(cfg)
    assert isinstance(model, AlignTTS)
