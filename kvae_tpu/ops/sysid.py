"""LGSSM system identification by ELBO gradient ascent.

The reference demonstrates fitting the dynamics matrices (A, B, C) of a
linear-Gaussian state-space model directly, without the VAE, by maximizing
the Kalman smoother's ELBO with Adam over a batch of observed trajectories
(reference kvae/kalman/test_optim.py:107-128 — a manual matplotlib script).
This module provides that capability as a library function, TPU-style: the
ENTIRE optimization (every epoch's smoother forward, ELBO, gradient and Adam
update) compiles into one XLA program via `lax.scan` over epochs — zero host
round trips between steps.

Identifiability note: (A, B, C) are only determined up to a similarity
transform z -> S z, so recovery checks belong in measurement space
(y_hat = C mu_smooth vs truth), not parameter space.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from kvae_tpu.ops.lgssm import (
    LGSSMParams,
    SequenceDynamics,
    lgssm_elbo,
    lgssm_smooth,
)


class FittedDynamics(NamedTuple):
    """Time-invariant dynamics estimate."""

    A: jax.Array  # [n,n]
    B: jax.Array  # [n,m]
    C: jax.Array  # [p,n]


def broadcast_dynamics(
    theta: FittedDynamics, batch: int, T: int, Q: jax.Array
) -> SequenceDynamics:
    """Tile time-invariant (A,B,C) + fixed Q to the [B,T,...] sequence form."""
    bt = lambda x: jnp.broadcast_to(x, (batch, T) + x.shape)
    return SequenceDynamics(A=bt(theta.A), B=bt(theta.B), C=bt(theta.C), Q=bt(Q))


def default_init(key: jax.Array, n: int, m: int, p: int) -> FittedDynamics:
    """A = I + 0.1 N(0,1), B/C = 0.1 N(0,1) (reference test_optim.py:86-92
    perturbs its initial guesses the same way)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return FittedDynamics(
        A=jnp.eye(n) + 0.1 * jax.random.normal(k1, (n, n)),
        B=0.1 * jax.random.normal(k2, (n, m)),
        C=0.1 * jax.random.normal(k3, (p, n)),
    )


def fit_lgssm(
    key: jax.Array,
    y: jax.Array,  # [B,T,p] observations
    u: jax.Array,  # [B,T,m] control inputs
    params: LGSSMParams,
    init: FittedDynamics,
    epochs: int = 100,
    lr: float = 1e-2,
    mask: Optional[jax.Array] = None,
    epochs_per_dispatch: Optional[int] = None,
) -> Tuple[FittedDynamics, jax.Array]:
    """Fit time-invariant (A, B, C) by full-batch Adam on the negative ELBO.

    One jitted program: `lax.scan` over `epochs` Adam steps, each running the
    masked filter + RTS smoother + single-sample ELBO and its gradient on the
    whole batch (reference loop: test_optim.py:113-128, one host iteration
    per epoch there).

    `epochs_per_dispatch` caps how many epochs run in a single device
    dispatch: very long single-program executions (several minutes) can trip
    execution watchdogs on remote/tunneled TPU backends, so large fits split
    into ceil(epochs / epochs_per_dispatch) invocations of one compiled
    program (plus at most one shorter remainder program). Default: all epochs
    in one program.

    Returns:
        (fitted dynamics, losses [epochs] — the per-epoch −ELBO curve).
    """
    batch, T, _ = y.shape
    tx = optax.adam(lr)

    def loss_fn(theta: FittedDynamics, sample_key: jax.Array) -> jax.Array:
        dyn = broadcast_dynamics(theta, batch, T, params.Q)
        sr = lgssm_smooth(y, u, mask, params, dynamics=dyn)
        return -lgssm_elbo(sample_key, sr, y, u, params, mask=mask)

    @partial(jax.jit, static_argnames=("n_epochs",))
    def run(theta: FittedDynamics, opt_state, key: jax.Array, start, n_epochs: int):
        def body(carry, i):
            theta, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(theta, jax.random.fold_in(key, i))
            updates, opt_state = tx.update(grads, opt_state, theta)
            theta = optax.apply_updates(theta, updates)
            return (theta, opt_state), loss

        (theta, opt_state), losses = jax.lax.scan(
            body, (theta, opt_state), start + jnp.arange(n_epochs, dtype=jnp.int32)
        )
        return theta, opt_state, losses

    chunk = epochs if epochs_per_dispatch is None else min(epochs_per_dispatch, epochs)
    theta, opt_state = init, tx.init(init)
    losses = []
    done = 0
    while done < epochs:
        n = min(chunk, epochs - done)
        theta, opt_state, chunk_losses = run(
            theta, opt_state, key, jnp.int32(done), n
        )
        losses.append(chunk_losses)
        done += n
    return theta, jnp.concatenate(losses) if len(losses) > 1 else losses[0]
