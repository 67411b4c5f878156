"""Dynamics-quality diagnostics.

Parity with reference kvae/train/testing.py:101-177
(`kalman_prediction_test`): one-step-ahead latent prediction
a_pred = C_{t+1} (A_t z_t + B_t u_{t+1}) from smoothed states vs the encoder
latents, against the persistence baseline a_naive = a_t. Jitted; runs fully
on device.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from kvae_tpu.ops.precision import einsum

from kvae_tpu.models.kvae import KVAE
from kvae_tpu.train.state import TrainState


def make_prediction_test_step(model: KVAE):
    @jax.jit
    def step(state: TrainState, x: jax.Array, key: jax.Array):
        k_sample, k_gumbel = jax.random.split(key)
        out = model.apply(
            {"params": state.params}, x, train=False,
            rngs={"sample": k_sample, "gumbel": k_gumbel},
        )
        a = out["a_samples"]
        z = out["mus_smooth"]
        u = out["u"]
        A, B, C = out["A"], out["B"], out["C"]

        z_pred = (
            einsum("btij,btj->bti", A[:, :-1], z[:, :-1])
            + einsum("btij,btj->bti", B[:, :-1], u[:, 1:])
        )
        a_pred = einsum("btpn,btn->btp", C[:, 1:], z_pred)
        a_true = a[:, 1:]
        mse_kf = jnp.mean((a_pred - a_true) ** 2)
        mse_naive = jnp.mean((a[:, :-1] - a_true) ** 2)
        return mse_kf, mse_naive

    return step


def reconstruct_and_save(
    model: KVAE, state: TrainState, loader, out_dir, key: jax.Array, prefix: str = "vae"
):
    """Decode the first validation batch and write true/recon mp4s
    (reference kvae/train/testing.py:77-97). Requires imageio; best-effort."""
    from pathlib import Path

    from kvae_tpu.utils.plots import save_frames

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    batch = next(iter(loader))
    x = batch["images"]
    k_sample, k_gumbel = jax.random.split(key)
    outputs = model.apply(
        {"params": state.params}, x, train=False,
        rngs={"sample": k_sample, "gumbel": k_gumbel},
    )
    import numpy as np

    save_frames(np.asarray(x[0]), str(out / f"{prefix}_true.mp4"))
    save_frames(np.asarray(outputs["x_recon"][0]), str(out / f"{prefix}_recon.mp4"))


def kalman_prediction_test(
    pred_step, state: TrainState, loader, key: jax.Array, max_batches: int = 5
) -> Tuple[float, float]:
    total_kf, total_naive, n = 0.0, 0.0, 0
    for i, batch in enumerate(loader):
        if i >= max_batches:
            break
        key, k = jax.random.split(key)
        mse_kf, mse_naive = pred_step(state, batch["images"], k)
        total_kf += mse_kf
        total_naive += mse_naive
        n += 1
    denom = max(n, 1)
    return float(total_kf) / denom, float(total_naive) / denom
