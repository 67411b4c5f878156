"""Notebook-parity evaluation metrics.

The reference's quantitative evaluation lives in its notebooks, not its
package (SURVEY.md §6):
  - fraction-of-incorrect-pixels (FoIP) under binarization
    (notebooks/kvae_metrics.ipynb)
  - FoIP / MSE vs dropout-rate sweeps 0.2..1.0 comparing smoothed / filtered /
    VAE reconstructions (notebooks/kvae_skvae_comparison_metrics.ipynb)
Here they are first-class, jitted library functions.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from kvae_tpu.config import KVAEConfig
from kvae_tpu.data.masks import mask_impute_random
from kvae_tpu.models.kvae import KVAE
from kvae_tpu.train.metrics import MeanAccumulator
from kvae_tpu.train.state import TrainState


def fraction_incorrect_pixels(
    x: jax.Array, x_hat: jax.Array, mask_frames: jax.Array, threshold: float = 0.5
) -> jax.Array:
    """FoIP over the given frames: binarize both at `threshold`, count
    disagreeing pixels / total pixels (kvae_metrics.ipynb metric)."""
    xb = (x > threshold).astype(jnp.float32)
    hb = (x_hat > threshold).astype(jnp.float32)
    wrong = jnp.abs(xb - hb)
    w = mask_frames[:, :, None, None, None]
    denom = jnp.clip(jnp.sum(w) * x.shape[2] * x.shape[3] * x.shape[4], min=1.0)
    return jnp.sum(wrong * w) / denom


def make_foip_step(model: KVAE, cfg: KVAEConfig):
    """Jitted: impute under a mask, return FoIP + MSE on the HIDDEN frames for
    smoothed / filtered / VAE reconstructions."""

    @jax.jit
    def step(state: TrainState, x: jax.Array, mask: jax.Array, key: jax.Array):
        ks, kg = jax.random.split(key)
        out = model.apply(
            {"params": state.params}, x, mask,
            rngs={"sample": ks, "gumbel": kg}, method=KVAE.impute,
        )
        unobs = (mask < 0.5).astype(x.dtype)
        denom = jnp.clip(
            jnp.sum(unobs) * x.shape[2] * x.shape[3] * x.shape[4], min=1.0
        )

        def mse(x_hat):
            w = unobs[:, :, None, None, None]
            return jnp.sum(((x - x_hat) ** 2) * w) / denom

        return {
            "foip_smooth": fraction_incorrect_pixels(x, out["x_imputed"], unobs),
            "foip_filt": fraction_incorrect_pixels(x, out["x_filtered"], unobs),
            "foip_recon": fraction_incorrect_pixels(x, out["x_recon"], unobs),
            "mse_smooth": mse(out["x_imputed"]),
            "mse_filt": mse(out["x_filtered"]),
            "mse_recon": mse(out["x_recon"]),
        }

    return step


def dropout_sweep(
    model: KVAE,
    cfg: KVAEConfig,
    state: TrainState,
    loader,
    key: jax.Array,
    dropout_rates: Sequence[float] = (0.2, 0.4, 0.6, 0.8, 1.0),
    t_init_mask: int = 4,
    max_batches: int | None = None,
) -> List[Dict[str, float]]:
    """FoIP/MSE vs dropout-rate curves (kvae_skvae_comparison_metrics.ipynb):
    observe the first `t_init_mask` frames, then drop later frames i.i.d. at
    each rate. Returns one averaged metrics dict per rate."""
    foip_step = make_foip_step(model, cfg)
    results = []
    for rate in dropout_rates:
        acc = MeanAccumulator()
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            x = batch["images"]
            key, k_mask, k_step = jax.random.split(key, 3)
            mask = mask_impute_random(
                k_mask, x.shape[0], x.shape[1], t_init_mask, drop_prob=rate
            )
            acc.update(foip_step(state, x, mask, k_step))
        res = acc.result()
        res["dropout_rate"] = rate
        results.append(res)
    return results
