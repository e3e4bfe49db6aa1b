"""Tests for measures / visual / profiling utils (ref TTS/tts/utils/{measures,visual}.py)."""

import numpy as np

from tpu_tts.utils.measures import alignment_diagonal_score
from tpu_tts.utils.visual import plot_alignment, plot_avg_feature, plot_pitch, plot_spectrogram


def test_alignment_diagonal_score_perfect():
    # perfectly diagonal one-hot alignment -> score 1.0
    T = 8
    a = np.eye(T)[None]  # [1, T_de, T_en]
    assert alignment_diagonal_score(a) == 1.0
    assert alignment_diagonal_score(a, binary=True) == 1.0


def test_alignment_diagonal_score_uniform():
    T = 10
    a = np.full((2, T, T), 1.0 / T)
    assert abs(alignment_diagonal_score(a) - 1.0 / T) < 1e-6


def test_plot_functions_return_figures():
    align = np.random.rand(12, 7)
    spec = np.random.rand(20, 13)
    pitch = np.random.rand(20)
    for fig in (
        plot_alignment(align, title="t"),
        plot_spectrogram(spec),
        plot_pitch(pitch, spec),
        plot_avg_feature(pitch, title="pitch"),
    ):
        assert fig is not None


def test_step_profiler_inactive_without_logdir():
    from tpu_tts.utils.profiling import StepProfiler

    p = StepProfiler(None)
    p.maybe_start(10)
    assert not p._active
    p.maybe_stop(15)
    p.close()


def test_hubconf_importable():
    import hubconf

    assert callable(hubconf.tts)
    assert "jax" in hubconf.dependencies


def test_stepwise_gradual_lr_schedule():
    """StepwiseGradualLR (Capacitron recipes): piecewise-constant lr by step."""
    from tpu_tts.train.optimizers import get_scheduler

    sched = get_scheduler(
        "StepwiseGradualLR",
        {"gradual_learning_rates": [[0, 1e-3], [100, 5e-4], [200, 1e-4]]},
        1e-3,
    )
    import pytest

    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(99)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(5e-4)
    assert float(sched(250)) == pytest.approx(1e-4)


def test_capacitron_optimizer_recipe_config_builds():
    """The reference Capacitron recipe's optimizer block must build: primary
    RAdam from optimizer_params['RAdam'], beta leaf → SGD, capacitron_grad_clip
    applied when grad_clip is 0."""
    import jax
    import jax.numpy as jnp

    from tpu_tts.configs.tacotron2_config import Tacotron2Config
    from tpu_tts.configs.shared_configs import CapacitronVAEConfig
    from tpu_tts.layers.gst import capacitron_dual_optimizer

    cfg = Tacotron2Config(
        use_capacitron_vae=True,
        capacitron_vae=CapacitronVAEConfig(),
        optimizer="CapacitronOptimizer",
        optimizer_params={
            "RAdam": {"betas": [0.9, 0.998], "weight_decay": 1e-6},
            "SGD": {"lr": 1e-5, "momentum": 0.9},
        },
        grad_clip=0.0,
        lr=1e-3,
    )
    tx = capacitron_dual_optimizer(cfg, lambda: (_ for _ in ()).throw(AssertionError))
    params = {
        "capacitron_vae_layer": {"beta": jnp.zeros(()), "w": jnp.ones((2,))},
        "encoder": {"kernel": jnp.ones((2, 2))},
    }
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    flat = jax.tree_util.tree_leaves(updates)
    assert all(jnp.isfinite(u).all() for u in flat)


# --------------------------------------------------------- balancer weights
def _balancer_items(n=50, seed=0):
    rng = np.random.RandomState(seed)
    speakers = ["spk_a", "spk_b", "spk_c"]
    langs = ["en", "fr"]
    return [
        {
            "speaker_name": speakers[rng.randint(0, 3) if i % 7 else 0],
            "language": langs[rng.randint(0, 2)],
            "audio_length": float(rng.uniform(1.0, 12.0)),
            "text": "x" * rng.randint(5, 40),
        }
        for i in range(n)
    ]


def test_balancer_weights_parity_with_reference():
    """Weights must match ref speakers.py:213 / languages.py:115 / data.py:58."""
    import pytest

    from tests.ref_torch_loader import load_reference, ref_import
    from tpu_tts.managers import (
        get_language_balancer_weights,
        get_length_balancer_weights,
        get_speaker_balancer_weights,
    )

    if load_reference() is None:
        pytest.skip("reference import failed")
    ref_spk = ref_import("TTS.tts.utils.speakers").get_speaker_balancer_weights
    ref_lang = ref_import("TTS.tts.utils.languages").get_language_balancer_weights
    ref_len = ref_import("TTS.tts.utils.data").get_length_balancer_weights

    items = _balancer_items()
    np.testing.assert_allclose(
        get_speaker_balancer_weights(items), ref_spk(items).numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        get_language_balancer_weights(items), ref_lang(items).numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        get_length_balancer_weights(items), ref_len(items).numpy(), rtol=1e-6
    )


def test_balancer_weights_favor_rare_classes():
    from tpu_tts.managers import get_speaker_balancer_weights

    items = [{"speaker_name": "common"}] * 9 + [{"speaker_name": "rare"}]
    w = get_speaker_balancer_weights(items)
    assert w[-1] > w[0] * 5  # rare speaker upweighted ~9x
