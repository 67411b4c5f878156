"""Rocket (constant-velocity + thrust) trajectory simulator.

The reference validates its Kalman core on a simulated rocket: altitude
measured noisily, accelerometer-derived control input, engine cutoff mid
flight (reference kvae/kalman/test_optim.py:8-50 `simulate_rocket_batch`,
kvae/kalman/test_filter.py). This is the same physical setup written as one
vectorized numpy pass over the batch (no per-sequence Python loop): each
sequence draws its own thrust magnitude, burn time and initial state, then
the whole batch integrates the piecewise-constant-acceleration dynamics in
a single [B,T] sweep.

Used by examples/system_id.py (the ELBO system-identification demo) and the
sysid tests.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

GRAVITY = -9.81


def simulate_rocket_batch(
    batch: int,
    T: int,
    dt: float = 0.1,
    std_dyn: float = 0.5,
    std_meas: float = 4.0,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Simulate `batch` rocket ascents.

    Each rocket burns with thrust ~ U(15, 25) m/s^2 for U(3, 7) s, then cuts
    off; gravity always applies. State x = [altitude, vertical velocity],
    initial state ~ N(0, 2^2) per component.

    Returns:
        y: [B,T,1] float32 — noisy altitude measurements (std `std_meas`).
        u: [B,T,1] float32 — noisy specific-force control input: the
           accelerometer reading (true acceleration − g, noise std `std_dyn`)
           plus g, i.e. a noisy version of the true acceleration — exactly
           the input a KF with B = [dt²/2, dt]ᵀ expects.
        x: [B,T,2] float32 — true [altitude, velocity] (evaluation only).
    """
    rng = np.random.default_rng(seed)
    t = np.arange(T) * dt  # [T]

    thrust = rng.uniform(15.0, 25.0, size=(batch, 1))  # [B,1]
    burn = rng.uniform(3.0, 7.0, size=(batch, 1))      # [B,1]
    # piecewise-constant true acceleration per (b, t): thrust while burning
    a_true = np.where(t[None, :] < burn, thrust, 0.0) + GRAVITY  # [B,T]

    x = np.zeros((batch, T, 2))
    x[:, 0, 0] = rng.normal(0.0, 2.0, size=batch)
    x[:, 0, 1] = rng.normal(0.0, 2.0, size=batch)
    # exact discrete integration of piecewise-constant acceleration:
    # v_t = v_0 + dt * cumsum(a), p_t = p_0 + dt * cumsum(v) + dt^2/2 * a
    v = x[:, 0, 1:2] + dt * np.cumsum(a_true[:, :-1], axis=1)  # v_1..v_{T-1}
    vel = np.concatenate([x[:, 0, 1:2], v], axis=1)            # [B,T]
    pos_inc = vel[:, :-1] * dt + 0.5 * a_true[:, :-1] * dt * dt
    pos = x[:, 0, 0:1] + np.concatenate(
        [np.zeros((batch, 1)), np.cumsum(pos_inc, axis=1)], axis=1
    )
    x[:, :, 0] = pos
    x[:, :, 1] = vel

    # accelerometer specific force (true accel − g) with sensor noise, then
    # +g restores a noisy estimate of the true acceleration (the reference
    # derives it from finite-differenced velocity; with exact integration the
    # finite difference IS a_true on every step, test_optim.py:37-40)
    a_meas = a_true + rng.normal(0.0, std_dyn, size=(batch, T))
    u = a_meas  # (− g) + g

    y = x[:, :, 0] + rng.normal(0.0, std_meas, size=(batch, T))
    return (
        y[:, :, None].astype(np.float32),
        u[:, :, None].astype(np.float32),
        x.astype(np.float32),
    )


def rocket_true_matrices(dt: float = 0.1):
    """Ground-truth discrete dynamics: A = [[1, dt], [0, 1]],
    B = [dt²/2, dt]ᵀ, C = [1, 0] (reference test_optim.py:80-83)."""
    A = np.array([[1.0, dt], [0.0, 1.0]], dtype=np.float32)
    B = np.array([[0.5 * dt * dt], [dt]], dtype=np.float32)
    C = np.array([[1.0, 0.0]], dtype=np.float32)
    return A, B, C
