"""Small-matrix batched solves tuned for TPU.

XLA's batched LU (`jnp.linalg.solve`) is fast for n<=4 but falls off a cliff
for n in (5..16) on TPU (measured: 29 ms vs 2 ms for 12,800 8x8 systems).
`solve_small` unrolls Gauss-Jordan elimination with branchless partial
pivoting over the static matrix dimension — pure vectorized VPU ops
(per-batch row blends, no gathers), differentiable, exact to ~1e-7 of LU.
Pivoting matters even on the mostly-PD systems the LGSSM produces: the
non-symmetric I + C J combine denominators of the associative-scan path can
hit a near-zero leading pivot, which TPU's flush-to-zero denormals turn into
an exact 0 (see solve_small's docstring).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_UNROLL_LIMIT = 16
_LU_FAST_LIMIT = 4  # XLA's batched LU is already optimal for n <= 4 on TPU


def solve_small(a: jax.Array, b: jax.Array) -> jax.Array:
    """Solve a @ x = b over trailing dims; a: [..., n, n], b: [..., n, k].

    Rows are carried as a Python list of slices (no dynamic-update-slice ops:
    DUS chains inside `associative_scan` + autodiff made XLA compile time
    explode). Partial pivoting is done branchlessly with per-batch row
    blends: the non-symmetric systems the associative-scan combine produces
    (I + C J) can hit a ~0 pivot without it — on TPU (flush-to-zero
    denormals) a denormal pivot becomes exactly 0 and one bad batch element
    NaN-poisons the whole program, and which element goes denormal depends
    on fusion-level rounding (observed: forward-only finite, forward+grad
    NaN at B=128 T=100 n=8)."""
    n = a.shape[-1]
    if n <= _LU_FAST_LIMIT or n > _UNROLL_LIMIT:
        return jnp.linalg.solve(a, b)
    m = jnp.concatenate([a, b], axis=-1)
    rows = [m[..., i, :] for i in range(n)]
    for i in range(n):
        # branchless partial pivot among rows i..n-1 on column i
        best_val = jnp.abs(rows[i][..., i])
        best_k = jnp.zeros_like(best_val, dtype=jnp.int32)
        for k in range(1, n - i):
            v = jnp.abs(rows[i + k][..., i])
            better = v > best_val
            best_val = jnp.where(better, v, best_val)
            best_k = jnp.where(better, k, best_k)
        if n - i > 1:
            old_i = rows[i]
            acc = jnp.zeros_like(rows[i])
            for k in range(n - i):
                sel = (best_k == k)[..., None]
                acc = acc + jnp.where(sel, rows[i + k], 0.0)
                if k > 0:
                    rows[i + k] = jnp.where(sel, old_i, rows[i + k])
            rows[i] = acc
        rows[i] = rows[i] / rows[i][..., i:i + 1]
        for j in range(n):
            if j != i:
                rows[j] = rows[j] - rows[j][..., i:i + 1] * rows[i]
    return jnp.stack(rows, axis=-2)[..., n:]


def solve_small_vec(a: jax.Array, b: jax.Array) -> jax.Array:
    """solve_small for a single rhs vector b: [..., n]."""
    return solve_small(a, b[..., None])[..., 0]
