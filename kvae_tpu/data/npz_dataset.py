"""NPZ video dataset — numpy-only, torch-free.

Capability parity with reference kvae/dataloader/pymunk_dataset.py:22-225:
accepts the same serialization layouts —
  (N,T,C,H,W) | (N,T,H,W) | flat frames (F,C,H,W) or (F,H,W) with sliding
  windows — plus the `state` key aligned to (N,T,D), optional per-frame
  min-max normalization, and in-memory loading. Items come out as
  float32 (N,T,C,H,W) arrays; batching lives in loader.py.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np


class NPZVideoDataset:
    def __init__(
        self,
        npz_path: str | Path | None = None,
        arrays: Optional[Dict[str, np.ndarray]] = None,
        image_key: str = "images",
        state_key: Optional[str] = "state",
        seq_len: int = 20,
        stride: int = 1,
        normalize: bool = False,
    ):
        if arrays is None:
            path = Path(npz_path)
            if not path.exists():
                raise FileNotFoundError(f"NPZ file not found: {path}")
            with np.load(path, allow_pickle=True) as npz:
                arrays = {k: npz[k].copy() for k in npz.files}
        self.raw = arrays
        self.image_key = image_key
        self.state_key = state_key
        self.seq_len = int(seq_len)
        self.stride = int(stride)
        self.normalize = bool(normalize)
        self._prepare()

    # -- shape normalization heuristics (reference pymunk_dataset.py:82-191) --
    def _prepare(self):
        if self.image_key not in self.raw:
            raise KeyError(
                f"no array named '{self.image_key}' in this NPZ archive "
                f"(it contains: {sorted(self.raw)})"
            )
        # Keep device (jax) arrays as-is: on-device-generated datasets flow
        # through shape normalization, the split gather (materialize) and the
        # DeviceDataLoader without ever leaving HBM — a forced np.asarray here
        # would round-trip gigabytes through the host (slow on tunneled TPUs).
        imgs = self.raw[self.image_key]
        if not hasattr(imgs, "ndim"):
            imgs = np.asarray(imgs)

        if imgs.ndim == 5:
            seq = imgs
        elif imgs.ndim == 4:
            n, d1, d2, d3 = imgs.shape
            if d2 >= 8 and d3 >= 8:
                # (N,T,H,W) -> add channel
                seq = imgs[:, :, None, :, :]
            elif d1 in (1, 3):
                seq = self._windows(imgs)
            else:
                seq = self._windows(imgs[:, None, :, :])
        elif imgs.ndim == 3:
            seq = self._windows(imgs[:, None, :, :])
        else:
            raise ValueError(
                f"cannot interpret a rank-{imgs.ndim} image array "
                f"{imgs.shape} as video sequences (want 3, 4, or 5 dims)"
            )

        if seq.ndim > 5:
            n, t = seq.shape[:2]
            h, w = seq.shape[-2:]
            seq = seq.reshape(n, t, -1, h, w)
        self.seq_data = seq
        self.N, self.T, self.C, self.H, self.W = seq.shape

        self.state_data = None
        if self.state_key is not None and self.state_key in self.raw:
            states = self.raw[self.state_key]
            if not hasattr(states, "ndim"):
                states = np.asarray(states)
            if states.ndim != 3:
                raise ValueError(f"Expected state (N,T,D), got {states.shape}")
            if states.shape[:2] != (self.N, self.T):
                raise ValueError(
                    f"State shape {states.shape} does not match images "
                    f"{(self.N, self.T)}"
                )
            self.state_data = states.astype(np.float32)

    def _windows(self, frames: np.ndarray) -> np.ndarray:
        """Sliding windows over flat frames (F,C,H,W) -> (N,T,C,H,W)."""
        f = frames.shape[0]
        if f < self.seq_len:
            raise ValueError(f"Not enough frames ({f}) for seq_len={self.seq_len}")
        starts = range(0, f - self.seq_len + 1, self.stride)
        return np.stack([frames[s : s + self.seq_len] for s in starts], axis=0)

    def __len__(self) -> int:
        return self.N

    def materialize(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        """Gather sequences -> float32 batch dict (vectorized, no per-item loop)."""
        seq = self.seq_data[indices].astype(np.float32)
        if self.normalize:
            mn = seq.min(axis=(3, 4), keepdims=True)
            seq = seq - mn
            mx = seq.max(axis=(3, 4), keepdims=True)
            seq = seq / np.where(mx == 0, 1.0, mx)
        out = {"images": seq}
        if self.state_data is not None:
            out["state"] = self.state_data[indices]
        return out

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        item = self.materialize(np.asarray([idx]))
        return {k: v[0] for k, v in item.items()}

    @classmethod
    def from_npz(cls, npz_path, **kwargs) -> "NPZVideoDataset":
        return cls(npz_path=npz_path, **kwargs)
