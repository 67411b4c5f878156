"""Observation-mask generators (1 = observed, 0 = missing).

Parity with reference kvae/train/imputation.py:4-34 (planning/random/
dispatcher), written as jax functions so masks can be built on-device inside
a jitted eval step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_impute_planning(
    batch_size: int, T: int, t_init_mask: int = 4, t_steps_mask: int = 12,
    dtype=jnp.float32,
) -> jax.Array:
    """Observe the first t_init_mask frames, hide the next t_steps_mask,
    observe the rest."""
    t_end = min(t_init_mask + t_steps_mask, T)
    ts = jnp.arange(T)
    row = jnp.where((ts >= t_init_mask) & (ts < t_end), 0.0, 1.0).astype(dtype)
    return jnp.broadcast_to(row, (batch_size, T))


def mask_impute_random(
    key: jax.Array, batch_size: int, T: int, t_init_mask: int = 4,
    drop_prob: float = 0.5, dtype=jnp.float32,
) -> jax.Array:
    """Observe the first t_init_mask frames, then drop later frames i.i.d.
    with probability drop_prob."""
    keep = jax.random.bernoulli(
        key, 1.0 - drop_prob, shape=(batch_size, T)
    ).astype(dtype)
    ts = jnp.arange(T)
    return jnp.where(ts[None, :] < t_init_mask, 1.0, keep).astype(dtype)


def make_training_mask(
    key: jax.Array, batch_size: int, T: int, t_init_mask: int = 4,
    drop_prob: float = 0.0, strategy: str = "random", t_steps_mask: int = 12,
    dtype=jnp.float32,
) -> jax.Array:
    strategy = strategy.lower()
    if strategy == "block":
        return mask_impute_planning(batch_size, T, t_init_mask, t_steps_mask, dtype)
    if drop_prob <= 0:
        return jnp.ones((batch_size, T), dtype=dtype)
    return mask_impute_random(key, batch_size, T, t_init_mask, drop_prob, dtype)
