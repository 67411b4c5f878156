"""Gaussian primitives: log-densities, branchless safe Cholesky, MVN sampling.

Reference parity:
  - log_gaussian            <- reference kvae/vae/losses.py:6-18
  - safe_cholesky           <- reference kvae/kalman/kalman_filter.py:282-302
    The reference retries torch.linalg.cholesky in a Python try/except with
    jitter escalating x10 (1e-6..1e-2, 5 tries) and a clamped-diagonal
    fallback. Data-dependent Python control flow cannot live under jit, so we
    compute the Cholesky at every jitter level in one batched shot (the
    matrices are tiny, n<=8) and select, per matrix, the first finite result —
    strictly tighter than the reference, which escalates the whole batch when
    any single matrix fails.
  - MVN log-prob matches torch.distributions.MultivariateNormal semantics
    (used at kalman_filter.py:349,367,373,380) via the scale_tril form.

Everything is float32: the LGSSM matrices are n<=8 wide, so MXU precision
tricks buy nothing here and covariance PSD-ness is the binding constraint.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from kvae_tpu.ops.precision import einsum

_LOG_2PI = math.log(2.0 * math.pi)


def symmetrize(mat: jax.Array) -> jax.Array:
    """0.5 * (M + M^T) over the trailing two dims."""
    return 0.5 * (mat + jnp.swapaxes(mat, -1, -2))


def log_gaussian(x: jax.Array, mean: jax.Array, var: jax.Array) -> jax.Array:
    """Elementwise diagonal-Gaussian log-density log N(x; mean, var)."""
    return -0.5 * _LOG_2PI - 0.5 * jnp.log(var) - jnp.square(x - mean) / (2.0 * var)


_UNROLL_LIMIT = 16  # same rationale as linalg.solve_small


def _cholesky_unrolled(sigma: jax.Array) -> jax.Array:
    """Cholesky-Banachiewicz unrolled over the static n (n <= 16): pure
    vectorized VPU ops instead of XLA's loop-lowered `cholesky`, which
    dominates the ELBO cost for the LGSSM's tiny (n<=8) batched matrices.
    No clamping — an indefinite input yields NaN entries exactly like
    `jnp.linalg.cholesky` (safe_cholesky's finite-pick depends on that)."""
    n = sigma.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        s = sigma[..., i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(s)
        inv = 1.0 / L[i][i]
        for j in range(i + 1, n):
            v = sigma[..., j, i]
            for k in range(i):
                v = v - L[j][k] * L[i][k]
            L[j][i] = v * inv
    zero = jnp.zeros_like(sigma[..., 0, 0])
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def cholesky_small(sigma: jax.Array) -> jax.Array:
    """Batched Cholesky, unrolled for small n (TPU-fast), XLA otherwise."""
    if sigma.shape[-1] <= _UNROLL_LIMIT:
        return _cholesky_unrolled(sigma)
    return jnp.linalg.cholesky(sigma)


def _tri_solve_unrolled(L: jax.Array, b: jax.Array) -> jax.Array:
    """Forward substitution L x = b unrolled over static n; L [..., n, n]
    lower-triangular, b [..., n]."""
    n = b.shape[-1]
    x = [None] * n
    for i in range(n):
        v = b[..., i]
        for k in range(i):
            v = v - L[..., i, k] * x[k]
        x[i] = v / L[..., i, i]
    return jnp.stack(x, axis=-1)


def safe_cholesky(
    sigma: jax.Array,
    jitter_init: float = 1e-6,
    max_tries: int = 5,
    diag_clamp: float = 1e-6,
) -> jax.Array:
    """Branchless jitter-escalating Cholesky.

    Computes chol(sigma + jitter*I) for jitter in {j0, 10*j0, ..., 10^(k-1)*j0}
    in one batched call and picks, per matrix, the smallest jitter whose factor
    is finite. Falls back to sqrt(clamp(diag)) if all fail.

    Args:
        sigma: [..., n, n] symmetric-ish PSD candidates.
    Returns:
        [..., n, n] lower-triangular factors.
    """
    sigma = symmetrize(sigma)
    n = sigma.shape[-1]
    eye = jnp.eye(n, dtype=sigma.dtype)
    jitters = jitter_init * (10.0 ** jnp.arange(max_tries, dtype=sigma.dtype))
    # The jitter-level SELECTION runs on a stop_gradient copy: factoring all
    # k levels in one batched op is fine forward, but its VJP would run the
    # Cholesky backward k times (the unpicked candidates get zero cotangents
    # yet still sit inside the batched op — XLA cannot DCE them). Pick
    # without gradient, then refactor ONCE differentiably at the picked
    # jitter: identical values AND identical gradients, 1/k of the backward.
    sigma_ng = jax.lax.stop_gradient(sigma)
    candidates = sigma_ng[None] + jitters.reshape((max_tries,) + (1,) * sigma.ndim) * eye
    factors = cholesky_small(candidates)
    ok = jnp.all(jnp.isfinite(factors), axis=(-1, -2))  # [k, ...]
    # index of first finite factor; max_tries if none
    first_ok = jnp.argmax(ok, axis=0)
    any_ok = jnp.any(ok, axis=0)
    jitter_picked = jnp.take(jitters, first_ok)  # [...]
    picked = cholesky_small(sigma + jitter_picked[..., None, None] * eye)
    # Fallback: clamped-diagonal sqrt (reference kalman_filter.py:298-302)
    diag = jnp.diagonal(sigma, axis1=-2, axis2=-1)
    fallback = jnp.zeros_like(sigma) + jnp.sqrt(jnp.clip(diag, min=diag_clamp))[..., None] * eye
    return jnp.where(any_ok[..., None, None], picked, fallback)


def mvn_logpdf_chol(x: jax.Array, mean: jax.Array, scale_tril: jax.Array) -> jax.Array:
    """log N(x; mean, L L^T) with L lower-triangular.

    Args:
        x, mean: [..., n]
        scale_tril: [..., n, n]
    Returns:
        [...] log-densities.
    """
    n = x.shape[-1]
    diff = x - mean
    if n <= _UNROLL_LIMIT:
        sol = _tri_solve_unrolled(scale_tril, diff)
    else:
        diff_c = diff[..., None]
        # triangular_solve requires identical batch dims (no broadcasting)
        batch_shape = jnp.broadcast_shapes(diff_c.shape[:-2], scale_tril.shape[:-2])
        diff_c = jnp.broadcast_to(diff_c, batch_shape + diff_c.shape[-2:])
        scale_tril = jnp.broadcast_to(
            scale_tril, batch_shape + scale_tril.shape[-2:]
        )
        sol = jax.scipy.linalg.solve_triangular(scale_tril, diff_c, lower=True)[..., 0]
    maha = jnp.sum(jnp.square(sol), axis=-1)
    logdet = jnp.sum(jnp.log(jnp.diagonal(scale_tril, axis1=-2, axis2=-1)), axis=-1)
    return -0.5 * (n * _LOG_2PI + maha) - logdet


def mvn_logpdf(x: jax.Array, mean: jax.Array, cov: jax.Array) -> jax.Array:
    """log N(x; mean, cov) via (safe) Cholesky of cov."""
    return mvn_logpdf_chol(x, mean, safe_cholesky(cov))


def mvn_sample_chol(key: jax.Array, mean: jax.Array, scale_tril: jax.Array) -> jax.Array:
    """Reparameterized sample mean + L @ eps (torch .rsample() equivalent,
    reference kalman_filter.py:351)."""
    eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    return mean + einsum("...ij,...j->...i", scale_tril, eps)
