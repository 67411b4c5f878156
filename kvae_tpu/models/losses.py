"""VAE losses, beta schedule, active-unit diagnostics.

Reference parity:
  - log_gaussian / log_likelihood / vae_loss <- reference kvae/vae/losses.py:6-112
    Bernoulli path: -BCEwithLogits summed per frame; Gaussian path:
    elementwise diagonal log-density. ELBO = scale_reconstruction * recon +
    beta * (log p(a) - log q(a|x)), each normalized by the observed-frame
    count clamped >= 1.
  - LinearScheduler (beta annealing)         <- losses.py:114-135
  - count_active_units                       <- losses.py:137-149
Deviations (documented SURVEY.md §7 quirks): the reference's broken
`kvae.vae.config` import (losses.py:4) and its dead second vae_loss are not
reproduced.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from kvae_tpu.config import KVAEConfig
from kvae_tpu.ops.gaussian import log_gaussian


def _bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Elementwise binary cross-entropy on logits
    (torch F.binary_cross_entropy_with_logits semantics)."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def vae_loss(
    x: jax.Array,           # [B,T,C,H,W]
    x_mu: jax.Array,        # [B,T,C,H,W] logits (bernoulli) or means (gaussian)
    x_var: jax.Array,       # scalar pixel variance (gaussian path)
    a: jax.Array,           # [B,T,a_dim] sampled latents
    a_mu: jax.Array,
    a_var: jax.Array,
    scale_reconstruction: float = 0.3,
    beta: jax.Array | float = 1.0,
    mask: Optional[jax.Array] = None,
    out_distr: str = "gaussian",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (vae_elbo, recon_term, regularization_term) — reference
    losses.py:63-112."""
    b, t = x.shape[:2]
    if mask is None:
        mask = jnp.ones((b, t), dtype=x.dtype)
    mask = mask.astype(x.dtype)
    denom = jnp.clip(jnp.sum(mask), min=1.0)

    if out_distr.lower() == "bernoulli":
        log_px_frame = -jnp.sum(_bce_with_logits(x_mu, x), axis=(2, 3, 4))
    else:
        log_px_frame = jnp.sum(log_gaussian(x, x_mu, x_var), axis=(2, 3, 4))
    log_px = jnp.sum(log_px_frame * mask)

    log_q_frame = jnp.sum(log_gaussian(a, a_mu, a_var), axis=-1)
    log_qa = jnp.sum(log_q_frame * mask)

    # prior p(a) = N(0, 1)
    log_p_frame = jnp.sum(log_gaussian(a, jnp.zeros_like(a), jnp.ones_like(a)), axis=-1)
    log_pa = jnp.sum(log_p_frame * mask)

    recon_term = log_px / denom
    regularization_term = (log_pa - log_qa) / denom
    elbo = scale_reconstruction * recon_term + beta * regularization_term
    return elbo, recon_term, regularization_term


def get_beta(config: KVAEConfig, epoch: jax.Array | int) -> jax.Array:
    """Linear beta-annealing schedule (reference losses.py:114-135), written
    branchlessly so `epoch` can be a traced scalar."""
    if not config.scheduled_beta:
        return jnp.asarray(1.0, jnp.float32)
    start_e, end_e = config.start_epoch, config.end_epoch
    span = max(end_e - start_e, 1)
    progress = jnp.clip((jnp.asarray(epoch, jnp.float32) - start_e) / span, 0.0, 1.0)
    return config.start_val + progress * (config.end_val - config.start_val)


def get_tau(config: KVAEConfig, epoch: jax.Array | int, tau_decay_start: int) -> jax.Array:
    """Gumbel temperature schedule. The reference decays multiplicatively
    once per epoch after pretrain+warmup (kvae/train/train.py:244,270-274):
    tau_e = max(tau_min, tau_init * rate^floor((e - start)/steps + 1)) for
    e >= start. Closed form here so it is pure in the epoch counter."""
    if config.dynamics_model.lower() != "switching":
        return jnp.asarray(config.tau_init, jnp.float32)
    e = jnp.asarray(epoch, jnp.float32)
    steps = jnp.floor(
        jnp.clip(e - tau_decay_start, min=0.0) / max(config.tau_decay_steps, 1) + 1.0
    )
    steps = jnp.where(e >= tau_decay_start, steps, 0.0)
    tau = config.tau_init * jnp.power(config.tau_decay_rate, steps)
    return jnp.maximum(tau, config.tau_min)


def count_active_units(mu: jax.Array, threshold: float = 1e-2) -> Tuple[jax.Array, jax.Array]:
    """Active latent units: variance of the posterior means across the batch
    exceeds `threshold` (reference losses.py:137-149)."""
    if mu.ndim == 3:
        mu = mu.reshape(-1, mu.shape[-1])
    variances = jnp.var(mu, axis=0, ddof=1)
    active = jnp.sum((variances > threshold).astype(jnp.int32))
    return active, variances
