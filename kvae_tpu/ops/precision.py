"""Precision-pinned einsum for LGSSM numerics.

On TPU, float32 `jnp.einsum` contractions lower to the MXU at DEFAULT
precision — bfloat16 passes. For the Kalman recursions (tiny n<=8 matrices,
covariance PSD-ness at stake) that costs ~1e-2 per-step error that compounds
through T steps (measured: 2.3 absolute error vs a float64 oracle at T=8,
while exact-f32 math gives 6e-5). These contractions are a negligible share
of total FLOPs, so all LGSSM math uses HIGHEST precision unconditionally.
The conv/MLP compute path keeps its own dtype policy (config.compute_dtype).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
