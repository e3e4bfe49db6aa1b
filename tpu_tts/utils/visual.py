"""Training visualizations: alignment / spectrogram / pitch / stop-token
figures for the logger (mirror of /root/reference/TTS/tts/utils/visual.py).

All plotting is host-side matplotlib on fetched numpy arrays — nothing here
touches the device."""

from typing import Optional

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_alignment(alignment: np.ndarray, fig_size=(16, 10), title: Optional[str] = None, output_fig=False):
    """alignment `[T_de, T_en]` (or transposed) → matplotlib figure
    (ref visual.py:11)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=fig_size)
    im = ax.imshow(
        np.asarray(alignment).T, aspect="auto", origin="lower", interpolation="none"
    )
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("Decoder timestep")
    ax.set_ylabel("Encoder timestep")
    if title is not None:
        ax.set_title(title)
    fig.tight_layout()
    if not output_fig:
        plt.close(fig)
    return fig


def plot_spectrogram(spectrogram: np.ndarray, ap=None, fig_size=(16, 10), output_fig=False):
    """spectrogram `[T, C]` → figure; denormalized through `ap` when given
    (ref visual.py:32)."""
    plt = _mpl()
    spec = np.asarray(spectrogram)
    if ap is not None:
        spec = ap.denormalize(spec.T).T
    fig = plt.figure(figsize=fig_size)
    plt.imshow(spec.T, aspect="auto", origin="lower", interpolation="none")
    plt.colorbar()
    plt.tight_layout()
    if not output_fig:
        plt.close(fig)
    return fig


def plot_pitch(pitch: np.ndarray, spectrogram: np.ndarray, ap=None, fig_size=(30, 10), output_fig=False):
    """F0 contour over the spectrogram (ref visual.py:49)."""
    plt = _mpl()
    spec = np.asarray(spectrogram)
    if ap is not None:
        spec = ap.denormalize(spec.T).T
    fig, ax = plt.subplots(figsize=fig_size)
    ax.imshow(spec.T, aspect="auto", origin="lower", interpolation="none")
    ax.set_xlabel("time")
    ax.set_ylabel("spec_freq")
    ax2 = ax.twinx()
    ax2.plot(np.asarray(pitch).reshape(-1), linewidth=5.0, color="red")
    ax2.set_ylabel("F0")
    fig.tight_layout()
    if not output_fig:
        plt.close(fig)
    return fig


def plot_avg_feature(feature: np.ndarray, fig_size=(30, 10), output_fig=False, title=None):
    """Per-token averaged feature track (pitch/energy) (ref visual.py:96)."""
    plt = _mpl()
    fig = plt.figure(figsize=fig_size)
    plt.plot(np.asarray(feature).reshape(-1), linewidth=2.0)
    if title:
        plt.title(title)
    plt.tight_layout()
    if not output_fig:
        plt.close(fig)
    return fig
