"""Fused Pallas TPU kernel for the masked Kalman filter recursion.

Design (see /opt/skills/guides/pallas_guide.md):
  - The LGSSM matrices are tiny (n=4, p=2) — the MXU is useless here; the win
    is keeping the ENTIRE T-step recursion resident in VMEM and vectorizing
    over the batch on the VPU.
  - Layout: batch maps to (sublane, lane) = (8, 128) tiles; every scalar
    entry of mu/Sigma/A/... is one [8,128] register-resident tile covering
    1024 batch elements. All small-matrix algebra (predict, innovation,
    Cholesky solve for the gain, Joseph update) is Python-unrolled over the
    static n/p/m indices — pure VPU element-wise ops, zero layout churn.
  - Grid over batch tiles of 1024 (batch padded up; the pad lanes compute
    garbage that is sliced off on the way out).
  - The gain solve uses an unrolled Cholesky on the [p][p] tile matrix
    (closed-form-exact for any small p) instead of XLA's batched LU.
  - Gradients: `lgssm_filter_pallas` is a jax.custom_vjp whose forward is
    this kernel and whose backward is the VJP of the (numerically
    equivalent) `lax.scan` filter — inference/eval gets the fused kernel,
    training remains exactly as differentiable as the scan path.

Semantics parity: identical to ops/lgssm.lgssm_filter (sequence-dynamics
mode), i.e. to reference kvae/kalman/kalman_filter.py:31-201 — gated by
tests/test_pallas_kf.py against the scan implementation.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kvae_tpu.ops.lgssm import (
    FilterResult,
    LGSSMParams,
    SequenceDynamics,
    SmoothResult,
    lgssm_filter,
    lgssm_smooth_from_filter,
)

_SUBLANES = 8
_LANES = 128
_TILE_B = _SUBLANES * _LANES  # batch elements per grid cell


# ---------------------------------------------------------------------------
# tile-list linear algebra (operands are [8,128] arrays; indices unrolled)
# ---------------------------------------------------------------------------

def _chol_tiles(S, p):
    """Cholesky of a [p][p] tile matrix (lower)."""
    L = [[None] * p for _ in range(p)]
    for i in range(p):
        s = S[i][i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-20))
        for j in range(i + 1, p):
            v = S[j][i]
            for k in range(i):
                v = v - L[j][k] * L[i][k]
            L[j][i] = v / L[i][i]
    return L


def _chol_solve(L, b, p):
    """Solve (L L^T) x = b for a length-p tile vector b."""
    z = [None] * p
    for i in range(p):
        v = b[i]
        for k in range(i):
            v = v - L[i][k] * z[k]
        z[i] = v / L[i][i]
    x = [None] * p
    for i in reversed(range(p)):
        v = z[i]
        for k in range(i + 1, p):
            v = v - L[k][i] * x[k]
        x[i] = v / L[i][i]
    return x


def _ge_solve(M, bs, k):
    """Solve M x = b for each length-k tile rhs in `bs` via Gauss-Jordan with
    branchless partial pivoting. Unlike Cholesky this tolerates indefinite
    (but invertible) matrices — during training the learned per-regime Q is
    unconstrained and sigma_pred can drift indefinite (the scan path's LU
    copes; sqrt-based factorizations NaN).

    Pivoting mirrors ops/linalg.py `solve_small`: per-lane row blends over
    the [8,128] tiles. Without it a near-zero pivot in ONE batch lane goes
    denormal, TPU flushes it to exactly 0, and the NaN poisons the whole
    kernel output — observed on the scan path at B=128 T=100 n=8 before
    solve_small gained pivoting; these kernels train the same matrices.

    Returns a list of solutions, each a length-k tile list."""
    nrhs = len(bs)
    width = k + nrhs
    rows = [
        [M[i][j] for j in range(k)] + [bs[r][i] for r in range(nrhs)]
        for i in range(k)
    ]
    for i in range(k):
        if k - i > 1:
            # branchless partial pivot among rows i..k-1 on column i,
            # independently per tile lane
            best_val = jnp.abs(rows[i][i])
            best_r = jnp.zeros_like(best_val, dtype=jnp.int32)
            for r in range(1, k - i):
                v = jnp.abs(rows[i + r][i])
                better = v > best_val
                best_val = jnp.where(better, v, best_val)
                best_r = jnp.where(better, r, best_r)
            old_i = rows[i]
            acc = [jnp.zeros_like(old_i[c]) for c in range(width)]
            for r in range(k - i):
                sel = best_r == r
                for c in range(width):
                    acc[c] = acc[c] + jnp.where(sel, rows[i + r][c], 0.0)
                if r > 0:
                    rows[i + r] = [
                        jnp.where(sel, old_i[c], rows[i + r][c])
                        for c in range(width)
                    ]
            rows[i] = acc
        inv = 1.0 / rows[i][i]
        rows[i] = [v * inv for v in rows[i]]
        for j in range(k):
            if j != i:
                f = rows[j][i]
                rows[j] = [rows[j][c] - f * rows[i][c] for c in range(width)]
    return [[rows[i][k + r] for i in range(k)] for r in range(nrhs)]


def _ge_inv(M, k):
    """M^{-1} as a [k][k] tile matrix via Gauss-Jordan column solves."""
    one = jnp.ones_like(M[0][0])
    zero = jnp.zeros_like(M[0][0])
    eye_cols = [[one if i == j else zero for i in range(k)] for j in range(k)]
    cols = _ge_solve(M, eye_cols, k)
    # cols[j][i] = (M^{-1})[i][j]
    return [[cols[j][i] for j in range(k)] for i in range(k)]


def _filter_kernel(
    r_ref,                                               # SMEM
    mu0_ref, sig0_ref,                                   # VMEM tiles (batch-varying)
    y_ref, u_ref, mask_ref, a_ref, b_ref, c_ref, q_ref,  # VMEM in
    muf_ref, sigf_ref, mup_ref, sigp_ref,                # VMEM out
    *, T: int, n: int, m: int, p: int,
):
    mu = mu0_ref[...]       # [n,8,128]
    sigma = sig0_ref[...]   # [n,n,8,128]
    R = [[r_ref[i, j] for j in range(p)] for i in range(p)]

    def body(t, carry):
        mu, sigma = carry                      # [n,8,128], [n,n,8,128]
        A = a_ref[t]                           # [n,n,8,128]
        Bm = b_ref[t]                          # [n,m,8,128]
        C = c_ref[t]                           # [p,n,8,128]
        Q = q_ref[t]                           # [n,n,8,128]
        y = y_ref[t]                           # [p,8,128]
        u = u_ref[t]                           # [m,8,128]
        mk = mask_ref[t]                       # [8,128]

        # predict: mu_pred = A mu + B u ; sigma_pred = A sigma A^T + Q
        mu_pred = [
            sum(A[i, j] * mu[j] for j in range(n))
            + sum(Bm[i, j] * u[j] for j in range(m))
            for i in range(n)
        ]
        a_sig = [[sum(A[i, k] * sigma[k, j] for k in range(n)) for j in range(n)]
                 for i in range(n)]
        sigma_pred = [[
            sum(a_sig[i][k] * A[j, k] for k in range(n)) + Q[i, j]
            for j in range(n)] for i in range(n)]

        # innovation
        y_hat = [sum(C[q, i] * mu_pred[i] for i in range(n)) for q in range(p)]
        resid = [y[q] - y_hat[q] for q in range(p)]
        c_sig = [[sum(C[q, k] * sigma_pred[k][j] for k in range(n)) for j in range(n)]
                 for q in range(p)]
        S = [[sum(c_sig[q][k] * C[r, k] for k in range(n)) + R[q][r]
              for r in range(p)] for q in range(p)]
        S = [[0.5 * (S[q][r] + S[r][q]) for r in range(p)] for q in range(p)]

        # gain K = sigma_pred C^T S^{-1}, masked (GE solve: S may drift
        # indefinite through the learned Q during training)
        pct = [[sum(sigma_pred[i][k] * C[q, k] for k in range(n)) for q in range(p)]
               for i in range(n)]
        K = _ge_solve(S, pct, p)  # [n][p]
        K = [[mk * K[i][q] for q in range(p)] for i in range(n)]

        # update: Joseph form
        mu_new = [mu_pred[i] + sum(K[i][q] * resid[q] for q in range(p))
                  for i in range(n)]
        ikc = [[(1.0 if i == j else 0.0) - sum(K[i][q] * C[q, j] for q in range(p))
                for j in range(n)] for i in range(n)]
        t1 = [[sum(ikc[i][k] * sigma_pred[k][j] for k in range(n)) for j in range(n)]
              for i in range(n)]
        t2 = [[sum(t1[i][k] * ikc[j][k] for k in range(n)) for j in range(n)]
              for i in range(n)]
        krk = [[sum(K[i][q] * R[q][r] * K[j][r] for q in range(p) for r in range(p))
                for j in range(n)] for i in range(n)]
        sigma_new = [[0.5 * (t2[i][j] + krk[i][j] + t2[j][i] + krk[j][i])
                      for j in range(n)] for i in range(n)]

        mu_arr = jnp.stack(mu_new)
        sig_arr = jnp.stack([jnp.stack(row) for row in sigma_new])
        muf_ref[t] = mu_arr
        sigf_ref[t] = sig_arr
        mup_ref[t] = jnp.stack(mu_pred)
        sigp_ref[t] = jnp.stack([jnp.stack(row) for row in sigma_pred])
        return mu_arr, sig_arr

    jax.lax.fori_loop(0, T, body, (mu, sigma))


def _to_tiles(x: jax.Array, b_pad: int) -> jax.Array:
    """[B, T, ...dims] -> [T, ...dims, b_pad//128, 128] (batch -> tiles)."""
    b = x.shape[0]
    pad = [(0, b_pad - b)] + [(0, 0)] * (x.ndim - 1)
    x = jnp.pad(x, pad)
    # move batch to the back
    x = jnp.moveaxis(x, 0, -1)          # [T, ...dims, Bp]
    return x.reshape(x.shape[:-1] + (b_pad // _LANES, _LANES))


def _from_tiles(x: jax.Array, b: int) -> jax.Array:
    """[T, ...dims, Sp, 128] -> [B, T, ...dims]."""
    x = x.reshape(x.shape[:-2] + (-1,))
    x = jnp.moveaxis(x, -1, 0)
    return x[:b]


# VMEM budget for one batch tile's whole input+output working set; chunk the
# time axis so the kernel never exceeds it (the carry crosses chunks).
_VMEM_BUDGET_BYTES = 9 * 1024 * 1024


def _chunk_len(T: int, n: int, m: int, p: int) -> int:
    tiles_per_step = (
        p + m + 1 + n * n + n * m + p * n + n * n     # inputs
        + n + n * n + n + n * n                        # outputs
    )
    bytes_per_step = tiles_per_step * _SUBLANES * _LANES * 4
    return max(1, min(T, _VMEM_BUDGET_BYTES // bytes_per_step))


def _filter_pallas_chunk(y_t, u_t, mask_t, A_t, B_t, C_t, Q_t,
                         mu0_t, sig0_t, R, *, n_tiles, interpret):
    """One pallas_call over a [Tc, ..., Sp, 128] tile chunk with batch-varying
    initial state tiles."""
    Tc = y_t.shape[0]
    p = y_t.shape[1]
    m = u_t.shape[1]
    n = A_t.shape[1]
    sp = _SUBLANES
    spd = y_t.shape[-2]  # total sublane groups

    def vspec(*dims, t=True):
        block = ((Tc,) if t else ()) + dims + (sp, _LANES)
        zeros = (0,) * ((1 if t else 0) + len(dims))
        return pl.BlockSpec(
            block, lambda g, _z=zeros: _z + (g, 0), memory_space=pltpu.VMEM
        )

    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    out_shape = [
        jax.ShapeDtypeStruct((Tc, n, spd, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((Tc, n, n, spd, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((Tc, n, spd, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((Tc, n, n, spd, _LANES), jnp.float32),
    ]
    kernel = functools.partial(_filter_kernel, T=Tc, n=n, m=m, p=p)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            smem((p, p), lambda g: (0, 0)),
            vspec(n, t=False), vspec(n, n, t=False),
            vspec(p), vspec(m), vspec(), vspec(n, n), vspec(n, m),
            vspec(p, n), vspec(n, n),
        ],
        out_specs=[vspec(n), vspec(n, n), vspec(n), vspec(n, n)],
        out_shape=out_shape,
        interpret=interpret,
    )(R, mu0_t, sig0_t, y_t, u_t, mask_t, A_t, B_t, C_t, Q_t)


def _filter_pallas_raw(y, u, mask, A, B, C, Q, mu0, sigma0, R, *, interpret):
    batch, T, p = y.shape
    n = A.shape[-1]
    m = B.shape[-1]
    b_pad = -(-batch // _TILE_B) * _TILE_B
    n_tiles = b_pad // _TILE_B

    y_t = _to_tiles(y, b_pad)
    u_t = _to_tiles(u, b_pad)
    mask_t = _to_tiles(mask, b_pad)
    A_t = _to_tiles(A, b_pad)
    B_t = _to_tiles(B, b_pad)
    C_t = _to_tiles(C, b_pad)
    Q_t = _to_tiles(Q, b_pad)
    # batch-varying initial state -> tiles [n,Sp,128] / [n,n,Sp,128]
    mu0_t = _to_tiles(jnp.broadcast_to(mu0, (batch, n)), b_pad)
    sig0_t = _to_tiles(jnp.broadcast_to(sigma0, (batch, n, n)), b_pad)

    ct = _chunk_len(T, n, m, p)
    outs = []
    for start in range(0, T, ct):
        sl = slice(start, min(start + ct, T))
        muf, sigf, mup, sigp = _filter_pallas_chunk(
            y_t[sl], u_t[sl], mask_t[sl], A_t[sl], B_t[sl], C_t[sl], Q_t[sl],
            mu0_t, sig0_t, R, n_tiles=n_tiles, interpret=interpret,
        )
        outs.append((muf, sigf, mup, sigp))
        mu0_t, sig0_t = muf[-1], sigf[-1]  # carry into the next chunk

    muf, sigf, mup, sigp = (jnp.concatenate(parts, axis=0) for parts in zip(*outs))
    return (
        _from_tiles(muf, batch), _from_tiles(sigf, batch),
        _from_tiles(mup, batch), _from_tiles(sigp, batch),
    )


def _filter_scan_raw(y, u, mask, A, B, C, Q, mu0, sigma0, R):
    """Pure-array scan filter (for the custom-vjp backward)."""
    params = LGSSMParams(mu0=mu0, sigma0=sigma0, R=R, Q=Q[0, 0])
    fr = lgssm_filter(
        y, u, mask, params, dynamics=SequenceDynamics(A=A, B=B, C=C, Q=Q)
    )
    return fr.mu_filt, fr.sigma_filt, fr.mu_pred, fr.sigma_pred


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def _filter_pallas_core(y, u, mask, A, B, C, Q, mu0, sigma0, R, interpret):
    return _filter_pallas_raw(
        y, u, mask, A, B, C, Q, mu0, sigma0, R, interpret=interpret
    )


def _core_fwd(y, u, mask, A, B, C, Q, mu0, sigma0, R, interpret):
    out = _filter_pallas_raw(
        y, u, mask, A, B, C, Q, mu0, sigma0, R, interpret=interpret
    )
    return out, (y, u, mask, A, B, C, Q, mu0, sigma0, R)


def _core_bwd(interpret, residuals, cotangents):
    _, vjp = jax.vjp(_filter_scan_raw, *residuals)
    return vjp(cotangents)


_filter_pallas_core.defvjp(_core_fwd, _core_bwd)


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def lgssm_filter_pallas(
    y: jax.Array,
    u: jax.Array,
    mask: Optional[jax.Array],
    params: LGSSMParams,
    dynamics: SequenceDynamics,
    interpret: Optional[bool] = None,
) -> FilterResult:
    """Fused-VMEM masked Kalman filter; API-compatible with
    ops.lgssm.lgssm_filter (sequence-dynamics mode)."""
    batch, T, _ = y.shape
    if mask is None:
        mask = jnp.ones((batch, T), dtype=y.dtype)
    if interpret is None:
        interpret = _default_interpret()
    muf, sigf, mup, sigp = _filter_pallas_core(
        y.astype(jnp.float32), u.astype(jnp.float32), mask.astype(jnp.float32),
        dynamics.A, dynamics.B, dynamics.C, dynamics.Q,
        params.mu0, params.sigma0, params.R, interpret,
    )
    return FilterResult(
        mu_filt=muf, sigma_filt=sigf, mu_pred=mup, sigma_pred=sigp,
        A=dynamics.A, B=dynamics.B, C=dynamics.C, Q=dynamics.Q, aux=None,
    )


# ---------------------------------------------------------------------------
# RTS smoother kernel
# ---------------------------------------------------------------------------

def _rts_kernel(
    muf_ref, sigf_ref, mupn_ref, sigpn_ref, an_ref,  # VMEM in (next-step-shifted)
    cmu_ref, csig_ref,                                # VMEM in: carry (smoothed at chunk end)
    mus_ref, sigs_ref,                                # VMEM out
    *, T: int, n: int,
):
    """Reverse RTS recursion over a time chunk, tiles VMEM-resident. Mirrors
    ops/lgssm.lgssm_smooth_from_filter (reference kalman_filter.py:204-279).
    Index t here covers recursion steps only (the wrapper writes the T-1
    identity element); *_n refs are pre-shifted to hold the t+1 values."""

    def body(step, carry):
        mu_s, sig_s = carry                     # smoothed at t+1
        t = T - 1 - step
        A_next = an_ref[t]                      # [n,n,8,128]
        mu_f = muf_ref[t]
        sig_f = sigf_ref[t]
        mu_p = mupn_ref[t]
        sig_p = sigpn_ref[t]

        # PFt = sig_f A^T ; J = PFt sig_p^{-1} via Gauss-Jordan solve
        pft = [[sum(sig_f[i, j] * A_next[k, j] for j in range(n)) for k in range(n)]
               for i in range(n)]
        S = [[sig_p[i, j] for j in range(n)] for i in range(n)]
        J = _ge_solve(S, pft, n)

        mu_new = [
            mu_f[i] + sum(J[i][j] * (mu_s[j] - mu_p[j]) for j in range(n))
            for i in range(n)
        ]
        # sig_new = sig_f + J (sig_s - sig_p) J^T, symmetrized
        diff = [[sig_s[i, j] - sig_p[i, j] for j in range(n)] for i in range(n)]
        jd = [[sum(J[i][k] * diff[k][j] for k in range(n)) for j in range(n)]
              for i in range(n)]
        jdjt = [[sum(jd[i][k] * J[j][k] for k in range(n)) for j in range(n)]
                for i in range(n)]
        sig_new = [[sig_f[i, j] + 0.5 * (jdjt[i][j] + jdjt[j][i]) for j in range(n)]
                   for i in range(n)]

        mu_arr = jnp.stack(mu_new)
        sig_arr = jnp.stack([jnp.stack(row) for row in sig_new])
        mus_ref[t] = mu_arr
        sigs_ref[t] = sig_arr
        return mu_arr, sig_arr

    jax.lax.fori_loop(0, T, body, (cmu_ref[...], csig_ref[...]))


def _rts_chunk_len(T: int, n: int) -> int:
    tiles_per_step = 2 * n + 4 * n * n + n + n * n  # in (5 arrays) + out (2)
    bytes_per_step = tiles_per_step * _SUBLANES * _LANES * 4
    return max(1, min(T, _VMEM_BUDGET_BYTES // bytes_per_step))


def _rts_pallas_chunk(muf_c, sigf_c, mupn_c, sigpn_c, an_c, cmu, csig,
                      *, n_tiles, interpret):
    Tc = muf_c.shape[0]
    n = muf_c.shape[1]
    sp = _SUBLANES
    spd = muf_c.shape[-2]

    def vspec(*dims, t=True):
        block = ((Tc,) if t else ()) + dims + (sp, _LANES)
        zeros = (0,) * ((1 if t else 0) + len(dims))
        return pl.BlockSpec(
            block, lambda g, _z=zeros: _z + (g, 0), memory_space=pltpu.VMEM
        )

    out_shape = [
        jax.ShapeDtypeStruct((Tc, n, spd, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((Tc, n, n, spd, _LANES), jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(_rts_kernel, T=Tc, n=n),
        grid=(n_tiles,),
        in_specs=[
            vspec(n), vspec(n, n), vspec(n), vspec(n, n), vspec(n, n),
            vspec(n, t=False), vspec(n, n, t=False),
        ],
        out_specs=[vspec(n), vspec(n, n)],
        out_shape=out_shape,
        interpret=interpret,
    )(muf_c, sigf_c, mupn_c, sigpn_c, an_c, cmu, csig)


def _rts_pallas_raw(muf, sigf, mup, sigp, A, *, interpret):
    batch, T, n = muf.shape
    b_pad = -(-batch // _TILE_B) * _TILE_B
    n_tiles = b_pad // _TILE_B

    muf_t = _to_tiles(muf, b_pad)
    sigf_t = _to_tiles(sigf, b_pad)
    mup_t = _to_tiles(mup, b_pad)
    sigp_t = _to_tiles(sigp, b_pad)
    A_t = _to_tiles(A, b_pad)

    # carry starts at the filtered posterior of the last step
    cmu, csig = muf_t[T - 1], sigf_t[T - 1]
    ct = _rts_chunk_len(T, n)
    # recursion covers indices [0, T-1); walk chunks from the end backwards
    starts = list(range(0, T - 1, ct))
    parts = []
    for start in reversed(starts):
        end = min(start + ct, T - 1)
        mus_c, sigs_c = _rts_pallas_chunk(
            muf_t[start:end], sigf_t[start:end],
            mup_t[start + 1:end + 1], sigp_t[start + 1:end + 1],
            A_t[start + 1:end + 1],
            cmu, csig, n_tiles=n_tiles, interpret=interpret,
        )
        parts.append((mus_c, sigs_c))
        cmu, csig = mus_c[0], sigs_c[0]

    parts.reverse()  # back to forward time order
    mus = jnp.concatenate([p[0] for p in parts] + [muf_t[T - 1:T]], axis=0)
    sigs = jnp.concatenate([p[1] for p in parts] + [sigf_t[T - 1:T]], axis=0)
    return _from_tiles(mus, batch), _from_tiles(sigs, batch)


def _rts_scan_raw(muf, sigf, mup, sigp, A):
    fr = FilterResult(
        mu_filt=muf, sigma_filt=sigf, mu_pred=mup, sigma_pred=sigp,
        A=A, B=jnp.zeros_like(A[..., :1]), C=jnp.zeros_like(A[..., :1, :]),
        Q=jnp.zeros_like(A), aux=None,
    )
    sr = lgssm_smooth_from_filter(fr)
    return sr.mu_smooth, sr.sigma_smooth


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _rts_pallas_core(muf, sigf, mup, sigp, A, interpret):
    return _rts_pallas_raw(muf, sigf, mup, sigp, A, interpret=interpret)


def _rts_fwd(muf, sigf, mup, sigp, A, interpret):
    return (
        _rts_pallas_raw(muf, sigf, mup, sigp, A, interpret=interpret),
        (muf, sigf, mup, sigp, A),
    )


def _rts_bwd(interpret, residuals, cotangents):
    _, vjp = jax.vjp(_rts_scan_raw, *residuals)
    return vjp(cotangents)


_rts_pallas_core.defvjp(_rts_fwd, _rts_bwd)


def lgssm_smooth_pallas(
    y: jax.Array,
    u: jax.Array,
    mask: Optional[jax.Array],
    params: LGSSMParams,
    dynamics: SequenceDynamics,
    interpret: Optional[bool] = None,
) -> SmoothResult:
    """Fully fused path: Pallas filter + Pallas RTS smoother (both with
    scan-backed custom VJPs for training)."""
    fr = lgssm_filter_pallas(y, u, mask, params, dynamics, interpret=interpret)
    if interpret is None:
        interpret = _default_interpret()
    mu_s, sig_s = _rts_pallas_core(
        fr.mu_filt, fr.sigma_filt, fr.mu_pred, fr.sigma_pred, dynamics.A, interpret
    )
    return SmoothResult(mu_smooth=mu_s, sigma_smooth=sig_s, filter_result=fr)
