"""Matplotlib figure helpers for TensorBoard logging.

(reference: utils/plot.py:11-64 — spectrogram/f0/duration figures used by
validation plotting.) Figures are created on the Agg backend so they work in
headless training jobs; callers pass them to ScalarLogger's TB writer via
``add_figure`` or save to disk.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def spec_to_figure(spec: np.ndarray, vmin: float = None, vmax: float = None,
                   title: str = ""):
    """Mel/linear spectrogram (T, bins) -> matplotlib figure."""
    plt = _plt()
    spec = np.asarray(spec)
    fig = plt.figure(figsize=(12, 6))
    plt.pcolor(spec.T, vmin=vmin, vmax=vmax)
    plt.colorbar()
    if title:
        plt.title(title)
    plt.tight_layout()
    return fig


def f0_to_figure(f0_gt: np.ndarray, f0_pred: np.ndarray = None):
    """Ground-truth (and optionally predicted) f0 contours."""
    plt = _plt()
    fig = plt.figure()
    plt.plot(np.asarray(f0_gt), color="r", label="gt")
    if f0_pred is not None:
        plt.plot(np.asarray(f0_pred), color="b", label="pred")
    plt.legend()
    plt.tight_layout()
    return fig


def wav_to_figure(wav: np.ndarray, sample_rate: int = 22050):
    plt = _plt()
    fig = plt.figure(figsize=(12, 3))
    t = np.arange(len(wav)) / sample_rate
    plt.plot(t, np.asarray(wav), linewidth=0.4)
    plt.xlabel("seconds")
    plt.tight_layout()
    return fig


def save_figure(fig, path: str) -> None:
    fig.savefig(path)
    import matplotlib.pyplot as plt
    plt.close(fig)
