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
