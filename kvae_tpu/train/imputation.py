"""Imputation evaluation — the north-star metric path.

Parity with reference kvae/train/imputation.py:39-276 (its `impute_batch` is
defined three times there; the last definition wins and is what we mirror):
planning mask -> model.impute -> MSE over missing pixels for smoothed /
filtered / VAE reconstructions, plus the max-pairwise-frame-MSE baseline at
the fixed index pairs (i in {0,3,6}, j in {9,12,15}).

TPU-native: the whole per-batch computation (forward + 3 decodes + MSEs +
baseline) is one jitted function; epoch aggregation is lazy device scalars.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from kvae_tpu.config import KVAEConfig
from kvae_tpu.data.masks import mask_impute_planning
from kvae_tpu.models.kvae import KVAE
from kvae_tpu.train.metrics import MeanAccumulator
from kvae_tpu.train.state import TrainState


def make_impute_step(model: KVAE, cfg: KVAEConfig):
    @jax.jit
    def impute_step(state: TrainState, x: jax.Array, mask: jax.Array, key: jax.Array):
        k_sample, k_gumbel = jax.random.split(key)
        out = model.apply(
            {"params": state.params}, x, mask,
            rngs={"sample": k_sample, "gumbel": k_gumbel},
            method=KVAE.impute,
        )
        unobs = (mask < 0.5).astype(x.dtype)  # [B,T]
        unobs_px = unobs[:, :, None, None, None]
        n_px = jnp.clip(jnp.sum(unobs) * (x.shape[2] * x.shape[3] * x.shape[4]), min=1.0)

        def mse_on_unobs(x_hat):
            return jnp.sum(((x - x_hat) ** 2) * unobs_px) / n_px

        # baseline: max pairwise MSE between unobserved frames at fixed
        # offsets (reference imputation.py:243-259 uses absolute indices
        # {0,3,6}x{9,12,15}, tuned for its T=20 / observe-first-4 mask —
        # with a longer observed prefix, e.g. the T=100 config's
        # t_init_mask=8, every such pair contains an observed frame and the
        # baseline silently reads 0). Here the pair indices are anchored to
        # the FIRST MASKED FRAME (same offsets), so the comparator follows
        # the mask instead of assuming the reference's shape.
        T = x.shape[1]
        unobs_any = (mask[0] < 0.5)
        t0 = jnp.argmax(unobs_any)  # first masked frame (mask shared over B)
        baseline = jnp.asarray(0.0, x.dtype)
        for di in (0, 3, 6):
            for dj in (9, 12, 15):
                i = jnp.clip(t0 + di, 0, T - 1)
                j = jnp.clip(t0 + dj, 0, T - 1)
                m_i = jnp.take(mask, i, axis=1)
                m_j = jnp.take(mask, j, axis=1)
                pair = ((m_i < 0.5) & (m_j < 0.5)).astype(x.dtype)
                w = pair[:, None, None, None]
                n = jnp.clip(
                    jnp.sum(pair) * x.shape[2] * x.shape[3] * x.shape[4], min=1.0
                )
                x_i = jnp.take(x, i, axis=1)
                x_j = jnp.take(x, j, axis=1)
                dist = jnp.sum(((x_i - x_j) ** 2) * w) / n
                baseline = jnp.maximum(baseline, jnp.where(jnp.sum(pair) > 0, dist, 0.0))

        metrics = {
            "mse_smooth": mse_on_unobs(out["x_imputed"]),
            "mse_filt": mse_on_unobs(out["x_filtered"]),
            "mse_recon": mse_on_unobs(out["x_recon"]),
            "baseline": baseline,
        }
        return metrics, out

    return impute_step


def impute_epoch(
    impute_step,
    state: TrainState,
    loader,
    key: jax.Array,
    t_init_mask: int = 4,
    t_steps_mask: int = 12,
) -> Optional[Dict]:
    """Average imputation metrics over a loader; keeps the first batch's
    outputs for visualization (reference imputation.py:121-149)."""
    acc = MeanAccumulator()
    sample = None
    for i, batch in enumerate(loader):
        x = batch["images"]
        mask = mask_impute_planning(x.shape[0], x.shape[1], t_init_mask, t_steps_mask)
        key, k = jax.random.split(key)
        metrics, out = impute_step(state, x, mask, k)
        acc.update(metrics)
        if sample is None:
            sample = {
                "x_real": x,
                "x_recon": out["x_recon"],
                "x_imputed": out["x_imputed"],
                "x_filtered": out["x_filtered"],
                "state_probs": out["state_probs"],
            }
    result = acc.result()
    if not result:
        return None
    result["sample"] = sample
    return result
