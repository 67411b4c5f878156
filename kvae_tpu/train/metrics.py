"""Metrics / logging / observability.

Parity with reference kvae/train/logging_utils.py (console+file logging,
TensorBoard scalars/images/videos/figures with the same tag names:
train/loss, train|val/elbo_kf, elbo_vae_total, active_units, learning_rate,
train/tau, val_imputation/*), with a TPU-native difference: metrics are
accumulated ON DEVICE as lazy scalars and fetched once per epoch — no
per-batch `.item()` host syncs (the reference syncs every batch,
train.py:60-62).

Sinks: always JSONL (runs/<ts>/metrics.jsonl, machine-readable); TensorBoard
when importable.
"""
from __future__ import annotations

import datetime
import json
import logging
import sys
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np


def setup_logging(log_file: Optional[str] = None) -> logging.Logger:
    """Console + file logging (reference logging_utils.py:13-41)."""
    logger = logging.getLogger("kvae_tpu")
    logger.setLevel(logging.INFO)
    logger.propagate = False
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s", "%H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def create_runs_dir(logdir: str) -> Path:
    ts = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    path = Path(logdir) / ts
    path.mkdir(parents=True, exist_ok=True)
    return path


class MeanAccumulator:
    """Accumulates per-step device scalars lazily; one host sync per epoch."""

    def __init__(self):
        self._sums: Dict[str, jax.Array] = {}
        self._count = 0

    def update(self, metrics: Dict[str, jax.Array]):
        for k, v in metrics.items():
            self._sums[k] = self._sums.get(k, 0.0) + v
        self._count += 1

    def result(self) -> Dict[str, float]:
        denom = max(self._count, 1)
        return {k: float(v) / denom for k, v in self._sums.items()}


class MetricsWriter:
    def __init__(self, runs_dir: Path, use_tensorboard: bool = True):
        self.runs_dir = Path(runs_dir)
        self.jsonl_path = self.runs_dir / "metrics.jsonl"
        self._jsonl = open(self.jsonl_path, "a")
        self.tb = None
        self._video_ok = False
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(log_dir=str(self.runs_dir))
            except Exception:
                self.tb = None
            try:
                import moviepy  # noqa: F401  (TB add_video dependency)

                self._video_ok = True
            except Exception:
                self._video_ok = False

    def log_scalars(self, metrics: Dict[str, float], split: str, epoch: int):
        rec = {"epoch": epoch, "split": split, **metrics}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(f"{split}/{k}", v, epoch)

    def log_scalar(self, tag: str, value: float, epoch: int):
        self._jsonl.write(json.dumps({"epoch": epoch, tag: value}) + "\n")
        self._jsonl.flush()
        if self.tb is not None:
            self.tb.add_scalar(tag, value, epoch)

    def log_image(self, x, name: str, epoch: int):
        """x: [T,C,H,W] or [C,H,W] array -> tiled grayscale image strip."""
        if self.tb is None:
            return
        arr = np.asarray(x)
        if arr.ndim == 4:  # [T,C,H,W] -> horizontal strip
            arr = np.concatenate(list(arr), axis=-1)
        arr = np.clip(arr, 0.0, 1.0)
        self.tb.add_image(name, arr, epoch)

    def log_video(self, x, name: str, epoch: int, fps: int = 10):
        """x: [T,C,H,W] in [0,1] -> TB video (grayscale tiled to RGB,
        reference logging_utils.py:158)."""
        if self.tb is None or not self._video_ok:
            return
        arr = np.asarray(x)
        if arr.shape[1] == 1:
            arr = np.repeat(arr, 3, axis=1)
        vid = np.clip(arr, 0.0, 1.0)[None]  # [1,T,C,H,W]
        try:
            self.tb.add_video(name, vid, epoch, fps=fps)
        except Exception:
            pass  # moviepy may be absent; videos are best-effort

    def log_state_probs(self, probs, name: str, epoch: int):
        """Regime-probability heatmap (reference utils.py:132-162) as an image
        (no matplotlib dependency on the hot path)."""
        if self.tb is None or probs is None:
            return
        arr = np.asarray(probs)
        if arr.ndim == 3:
            arr = arr[0]  # first sequence
        img = np.clip(arr.T, 0.0, 1.0)[None]  # [1,K,T]
        self.tb.add_image(name, img, epoch)

    def close(self):
        self._jsonl.close()
        if self.tb is not None:
            self.tb.close()
