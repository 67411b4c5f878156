"""Plot utilities (matplotlib-gated; parity with reference
kvae/utils/utils_plots.py and kvae/train/utils.py:132-162)."""
from __future__ import annotations

from pathlib import Path

import numpy as np


def movie_to_frame(images: np.ndarray) -> np.ndarray:
    """Collapse a [T,H,W] (or [T,C,H,W]) sequence into one trajectory-overlay
    frame via per-pixel max (reference utils_plots.py:4-11)."""
    arr = np.asarray(images)
    if arr.ndim == 4:
        arr = arr[:, 0]
    return arr.max(axis=0)


def plot_sequence_grid(x: np.ndarray, x_recon: np.ndarray, max_cols: int = 10):
    """Original vs reconstruction strip + trajectory overlays
    (reference utils_plots.py:13-49). Returns a matplotlib figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(x)
    x_recon = np.asarray(x_recon)
    t = min(x.shape[0], max_cols)
    fig, axes = plt.subplots(3, t, figsize=(1.2 * t, 3.8))
    for i in range(t):
        axes[0, i].imshow(x[i].squeeze(), cmap="gray")
        axes[1, i].imshow(x_recon[i].squeeze(), cmap="gray")
        for row in (0, 1):
            axes[row, i].axis("off")
    axes[2, 0].imshow(movie_to_frame(x), cmap="gray")
    axes[2, 0].set_title("traj (orig)", fontsize=7)
    axes[2, 1].imshow(movie_to_frame(x_recon), cmap="gray")
    axes[2, 1].set_title("traj (recon)", fontsize=7)
    for i in range(t):
        axes[2, i].axis("off")
    fig.tight_layout()
    return fig


def plot_state_probabilities(state_probs):
    """Regime-probability heatmap over time (reference
    kvae/train/utils.py:132-162). Returns a matplotlib figure or None."""
    if state_probs is None:
        return None
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    arr = np.asarray(state_probs)
    if arr.ndim == 3:
        arr = arr[0]
    if arr.ndim == 1:
        arr = arr[None]
    fig, ax = plt.subplots(figsize=(4, 3))
    im = ax.imshow(
        arr.T, aspect="auto", origin="lower", interpolation="nearest",
        vmin=0.0, vmax=1.0, cmap="magma",
    )
    ax.set_xlabel("Time step")
    ax.set_ylabel("State")
    ax.set_title("Switch state")
    cbar = fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
    cbar.set_label("probability")
    fig.tight_layout()
    return fig


def save_frames(x: np.ndarray, filename: str, fps: int = 10) -> str:
    """Save a [T,H,W(,C)] sequence as video (reference kvae/train/testing.py:
    39-74 semantics: normalize to uint8, pad H/W to multiples of 16).
    Requires imageio; gated. Falls back to GIF (PIL backend, always present)
    when no mp4 encoder is installed. Returns the path actually written."""
    import imageio

    arr = np.asarray(x)
    if arr.ndim == 5:
        arr = arr[0]
    if arr.ndim == 4 and arr.shape[1] in (1, 3):  # [T,C,H,W] -> [T,H,W,C]
        arr = np.transpose(arr, (0, 2, 3, 1))
    if arr.ndim == 3:
        arr = arr[..., None]
    mn, mx = arr.min(), arr.max()
    arr = (arr - mn) / (mx - mn) if mx > mn else np.zeros_like(arr)
    arr = (arr * 255).astype(np.uint8)
    h, w = arr.shape[1:3]
    pad_h, pad_w = (-h) % 16, (-w) % 16
    if pad_h or pad_w:
        arr = np.pad(arr, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    try:
        imageio.mimwrite(filename, arr, fps=fps)
    except (ValueError, ImportError):
        # no mp4 encoder (ffmpeg/pyav) in this environment — GIF via PIL
        filename = str(Path(filename).with_suffix(".gif"))
        if arr.shape[-1] == 1:  # PIL needs [T,H,W] or [T,H,W,3]
            arr = arr[..., 0]
        imageio.mimwrite(filename, arr, duration=1000 / fps, loop=0)
    return filename
