"""Parallel-in-time Kalman filter / RTS smoother via `lax.associative_scan`.

O(log T) depth instead of the O(T) sequential scan — the TPU scaling story
for long sequences (SURVEY.md §5 long-context; cf. PAPERS.md
"Parallel-in-Time Kalman Smoothing"). Math follows the associative-operator
formulation of Bayesian filtering/smoothing (Särkkä & García-Fernández,
2020): each timestep contributes a five-tuple filtering element
(A, b, C, J, eta) / three-tuple smoothing element (E, g, L) with an
associative combination rule; prefix/suffix combination yields the filtered /
smoothed posteriors.

Masked (missing) frames contribute prediction-only elements — exactly the
K=0-gain semantics of the sequential path (reference
kvae/kalman/kalman_filter.py:92) — so `lgssm_smooth_assoc` is numerically
equivalent to `lgssm_smooth` (gated by tests/test_assoc.py).

Only whole-sequence dynamics are supported: the LSTM-alpha mode feeds the
filter's own output back into the dynamics net each step and is inherently
sequential. Differentiable end-to-end (usable in training).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from kvae_tpu.ops.precision import einsum
from kvae_tpu.ops.linalg import solve_small

from kvae_tpu.ops.gaussian import symmetrize
from kvae_tpu.ops.lgssm import (
    FilterResult,
    LGSSMParams,
    SequenceDynamics,
    SmoothResult,
)


class _FilterElem(NamedTuple):
    A: jax.Array    # [B,T,n,n]
    b: jax.Array    # [B,T,n]
    C: jax.Array    # [B,T,n,n]
    J: jax.Array    # [B,T,n,n]
    eta: jax.Array  # [B,T,n]


def _solve(mat, rhs):
    """solve over trailing dims, rhs [... ,n, k]."""
    return solve_small(mat, rhs)


def _generic_filter_elements(y, u, mask, params: LGSSMParams, dyn: SequenceDynamics):
    """Per-step filtering elements for interior steps (t >= 1). Valid for any
    contiguous chunk of the sequence — the sequence-parallel path
    (parallel/seqpar.py) builds these locally per time shard."""
    B, T, p = y.shape
    n = params.mu0.shape[0]
    dtype = y.dtype
    eye = jnp.eye(n, dtype=dtype)
    R = params.R.astype(dtype)

    F, Bm, H, Q = dyn.A, dyn.B, dyn.C, dyn.Q
    c = einsum("btij,btj->bti", Bm, u)  # control offset [B,T,n]
    m = mask[..., None]                      # [B,T,1]

    S = einsum("btpi,btij,btqj->btpq", H, Q, H) + R          # [B,T,p,p]
    S = symmetrize(S)
    QHt = einsum("btij,btpj->btip", Q, H)                    # [B,T,n,p]
    K = jnp.swapaxes(_solve(S, jnp.swapaxes(QHt, -1, -2)), -1, -2)  # [B,T,n,p]
    K = m[..., None] * K
    resid = y - einsum("btpi,bti->btp", H, c)                # y - H c
    I_KH = eye - einsum("btip,btpj->btij", K, H)
    A_e = einsum("btij,btjk->btik", I_KH, F)
    b_e = c + einsum("btip,btp->bti", K, resid)
    C_e = einsum("btij,btjk->btik", I_KH, Q)
    # eta = F^T H^T S^{-1} resid ; J = F^T H^T S^{-1} H F (masked -> 0)
    Sinv_r = _solve(S, resid[..., None])[..., 0]                 # [B,T,p]
    HtSinv_r = einsum("btpi,btp->bti", H, Sinv_r)
    eta_e = m * einsum("btji,btj->bti", F, HtSinv_r)
    Sinv_H = _solve(S, H)                                        # [B,T,p,n]
    HtSinvH = einsum("btpi,btpj->btij", H, Sinv_H)
    J_e = m[..., None] * einsum("btki,btkl,btlj->btij", F, HtSinvH, F)
    C_e = symmetrize(C_e)
    return _FilterElem(A_e, b_e, C_e, J_e, eta_e)


def _prior_first_element(y0, mask0, c0, F0, H0, Q0, params: LGSSMParams):
    """The global t=0 element, which absorbs the prior (m0, P0). Inputs are
    the t=0 slices: y0 [B,p], mask0 [B], c0 [B,n] (= B_0 u_0), F0/H0/Q0."""
    B, p = y0.shape
    n = params.mu0.shape[0]
    dtype = y0.dtype
    eye = jnp.eye(n, dtype=dtype)
    R = params.R.astype(dtype)

    m0 = jnp.broadcast_to(params.mu0.astype(dtype), (B, n))
    P0 = jnp.broadcast_to(params.sigma0.astype(dtype), (B, n, n))
    m1p = einsum("bij,bj->bi", F0, m0) + c0
    P1p = symmetrize(einsum("bij,bjk,blk->bil", F0, P0, F0) + Q0)
    S1 = symmetrize(einsum("bpi,bij,bqj->bpq", H0, P1p, H0) + R)
    PHt1 = einsum("bij,bpj->bip", P1p, H0)
    K1 = jnp.swapaxes(_solve(S1, jnp.swapaxes(PHt1, -1, -2)), -1, -2)
    K1 = mask0[:, None, None] * K1
    resid1 = y0 - einsum("bpi,bi->bp", H0, m1p)
    I_KH1 = eye - einsum("bip,bpj->bij", K1, H0)
    b1 = m1p + einsum("bip,bp->bi", K1, resid1)
    # Joseph form for the first covariance (parity with the sequential path)
    C1 = symmetrize(
        einsum("bij,bjk,blk->bil", I_KH1, P1p, I_KH1)
        + einsum("bip,pq,bjq->bij", K1, R, K1)
    )
    A1 = jnp.zeros((B, n, n), dtype)
    eta1 = jnp.zeros((B, n), dtype)
    J1 = jnp.zeros((B, n, n), dtype)
    return _FilterElem(A1, b1, C1, J1, eta1)


def _filter_elements(y, u, mask, params: LGSSMParams, dyn: SequenceDynamics):
    elems = _generic_filter_elements(y, u, mask, params, dyn)
    first = _prior_first_element(
        y[:, 0], mask[:, 0],
        einsum("bij,bj->bi", dyn.B[:, 0], u[:, 0]),
        dyn.A[:, 0], dyn.C[:, 0], dyn.Q[:, 0], params,
    )
    return _FilterElem(*(
        e.at[:, 0].set(f) for e, f in zip(elems, first)
    ))


def _filter_combine(ei: _FilterElem, ej: _FilterElem) -> _FilterElem:
    """Associative combination: ei spans an earlier interval than ej."""
    n = ei.A.shape[-1]
    eye = jnp.eye(n, dtype=ei.A.dtype)
    D = eye + einsum("...ij,...jk->...ik", ei.C, ej.J)       # I + C_i J_j
    Dinv_Ai = _solve(D, ei.A)
    Dinv_bCeta = _solve(
        D, (ei.b + einsum("...ij,...j->...i", ei.C, ej.eta))[..., None]
    )[..., 0]
    Dinv_Ci = _solve(D, ei.C)
    A = einsum("...ij,...jk->...ik", ej.A, Dinv_Ai)
    b = einsum("...ij,...j->...i", ej.A, Dinv_bCeta) + ej.b
    C = einsum("...ij,...jk,...lk->...il", ej.A, Dinv_Ci, ej.A) + ej.C

    E = eye + einsum("...ij,...jk->...ik", ej.J, ei.C)       # I + J_j C_i
    Einv_etaJb = _solve(
        E, (ej.eta - einsum("...ij,...j->...i", ej.J, ei.b))[..., None]
    )[..., 0]
    Einv_Jj = _solve(E, ej.J)
    eta = einsum("...ji,...j->...i", ei.A, Einv_etaJb) + ei.eta
    J = einsum("...ji,...jk,...kl->...il", ei.A, Einv_Jj, ei.A) + ei.J
    return _FilterElem(A, b, symmetrize(C), symmetrize(J), eta)


def lgssm_filter_assoc(
    y: jax.Array,
    u: jax.Array,
    mask: Optional[jax.Array],
    params: LGSSMParams,
    dynamics: SequenceDynamics,
) -> FilterResult:
    """Parallel-in-time masked Kalman filter. API/result-compatible with
    ops.lgssm.lgssm_filter (sequence-dynamics mode)."""
    B, T, _ = y.shape
    dtype = y.dtype
    if mask is None:
        mask = jnp.ones((B, T), dtype=dtype)
    mask = mask.astype(dtype)

    elems = _filter_elements(y, u, mask, params, dynamics)
    combined = jax.lax.associative_scan(_filter_combine, elems, axis=1)
    mu_filt = combined.b
    sigma_filt = symmetrize(combined.C)

    # predicted moments: mu_pred_t = F_t m_{t-1} + c_t (m_{-1} = prior)
    F, Bm, Q = dynamics.A, dynamics.B, dynamics.Q
    c = einsum("btij,btj->bti", Bm, u)
    m_prev = jnp.concatenate(
        [jnp.broadcast_to(params.mu0.astype(dtype), (B, 1, F.shape[-1])),
         mu_filt[:, :-1]], axis=1,
    )
    P_prev = jnp.concatenate(
        [jnp.broadcast_to(params.sigma0.astype(dtype), (B, 1) + params.sigma0.shape),
         sigma_filt[:, :-1]], axis=1,
    )
    mu_pred = einsum("btij,btj->bti", F, m_prev) + c
    sigma_pred = symmetrize(
        einsum("btij,btjk,btlk->btil", F, P_prev, F) + Q
    )
    return FilterResult(
        mu_filt=mu_filt, sigma_filt=sigma_filt,
        mu_pred=mu_pred, sigma_pred=sigma_pred,
        A=dynamics.A, B=dynamics.B, C=dynamics.C, Q=dynamics.Q, aux=None,
    )


class _SmoothElem(NamedTuple):
    E: jax.Array  # [B,T,n,n]
    g: jax.Array  # [B,T,n]
    L: jax.Array  # [B,T,n,n]


def _smooth_combine(ej: _SmoothElem, ei: _SmoothElem) -> _SmoothElem:
    """z_t = E_i z_{t+1} + g_i composed with the (t+1..T) element ej.
    With reverse=True, associative_scan feeds (later, earlier) — ei is the
    element closer to t, ej the combined suffix."""
    E = einsum("...ij,...jk->...ik", ei.E, ej.E)
    g = einsum("...ij,...j->...i", ei.E, ej.g) + ei.g
    L = einsum("...ij,...jk,...lk->...il", ei.E, ej.L, ei.E) + ei.L
    return _SmoothElem(E, g, symmetrize(L))


def lgssm_smooth_assoc(
    y: jax.Array,
    u: jax.Array,
    mask: Optional[jax.Array],
    params: LGSSMParams,
    dynamics: SequenceDynamics,
) -> SmoothResult:
    """Parallel-in-time filter + RTS smoother (both O(log T) depth)."""
    fr = lgssm_filter_assoc(y, u, mask, params, dynamics)
    B, T, n = fr.mu_filt.shape
    dtype = fr.mu_filt.dtype

    F_next = fr.A[:, 1:]                         # F_{t+1} for t = 0..T-2
    c_next = einsum("btij,btj->bti", fr.B[:, 1:], u[:, 1:])
    P = fr.sigma_filt[:, :-1]
    P_pred_next = fr.sigma_pred[:, 1:]           # F P F^T + Q at t+1

    PFt = einsum("btij,btkj->btik", P, F_next)       # P F^T
    # E_t = P F^T (P_pred)^{-1}  via solve on the transposed system
    E = jnp.swapaxes(
        _solve(jnp.swapaxes(P_pred_next, -1, -2), jnp.swapaxes(PFt, -1, -2)),
        -1, -2,
    )
    m = fr.mu_filt[:, :-1]
    g = m - einsum("btij,btj->bti", E, einsum("btij,btj->bti", F_next, m) + c_next)
    L = symmetrize(P - einsum("btij,btjk,btlk->btil", E, P_pred_next, E))

    # last element: identity on the filtered posterior at T-1
    E_T = jnp.zeros((B, 1, n, n), dtype)
    g_T = fr.mu_filt[:, -1:]
    L_T = fr.sigma_filt[:, -1:]
    elems = _SmoothElem(
        E=jnp.concatenate([E, E_T], axis=1),
        g=jnp.concatenate([g, g_T], axis=1),
        L=jnp.concatenate([L, L_T], axis=1),
    )
    combined = jax.lax.associative_scan(_smooth_combine, elems, axis=1, reverse=True)
    return SmoothResult(
        mu_smooth=combined.g, sigma_smooth=symmetrize(combined.L), filter_result=fr
    )
