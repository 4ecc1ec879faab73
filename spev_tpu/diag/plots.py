"""Mel-spectrogram PNG artifacts (the reference's main debugging tool,
``spev_real_metrics.py:464-472,646-649,692-698``)."""

from __future__ import annotations

import numpy as np


def save_mel_plot(mel: np.ndarray, path: str, title: str = "Mel Spectrogram") -> None:
    """mel (n_mels, T) → PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(10, 4))
    plt.imshow(np.asarray(mel), aspect="auto", origin="lower", interpolation="none")
    plt.colorbar()
    plt.title(title)
    plt.xlabel("Time")
    plt.ylabel("Mel Frequency")
    plt.tight_layout()
    plt.savefig(path)
    plt.close()


def save_comparison_plot(mel_gt: np.ndarray, mel_pred: np.ndarray, path: str) -> None:
    """Target-vs-predicted pair (per-epoch validation artifact)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 1, figsize=(10, 6))
    axes[0].imshow(np.asarray(mel_gt), aspect="auto", origin="lower", interpolation="none")
    axes[0].set_title("Target")
    axes[1].imshow(np.asarray(mel_pred), aspect="auto", origin="lower", interpolation="none")
    axes[1].set_title("Predicted")
    plt.tight_layout()
    plt.savefig(path)
    plt.close()
