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
  - Grid = (batch tiles of 1024, time chunks): the time axis is cut into
    VMEM-budget-sized chunks that form the MINOR grid axis, with the
    recursion carry held in VMEM scratch across chunks (seeded at chunk 0,
    re-seeded per batch tile). One pallas_call — hence ONE Mosaic kernel
    compile — covers the whole sequence regardless of T; a trailing
    remainder chunk gets a second call. Batch is padded up; pad lanes
    compute garbage that is sliced off on the way out.
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


def _filter_body(smem, tin, tout, carry):
    """One time-chunk of the filter recursion (see _seq_chunked_call)."""
    (r_ref,) = smem
    y_ref, u_ref, mask_ref, a_ref, b_ref, c_ref, q_ref = tin
    muf_ref, sigf_ref, mup_ref, sigp_ref = tout
    T, p = y_ref.shape[0], y_ref.shape[1]
    m = u_ref.shape[1]
    n = a_ref.shape[1]
    mu0, sigma0 = carry     # [n,8,128], [n,n,8,128]
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

    return jax.lax.fori_loop(0, T, body, (mu0, sigma0))


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


def fits_vmem(n: int, m: int, p: int) -> bool:
    """Static check that the gridded LGSSM kernels fit the 16 MiB
    scoped-VMEM stack even at chunk length 1. Each scalar matrix entry is a
    full [8,128] batch tile, so the per-step footprint grows as n^2 tiles:
    n=8 fits comfortably, n=12 fits (verified on a v5e), n=16 requests
    ~17.6 MiB and Mosaic refuses. The model's `filter_impl: auto` consults
    this and falls back to the scan engine for unfittable state widths
    instead of failing at compile time."""
    tiles_in = p + m + 1 + n * n + n * m + p * n + n * n
    tiles_out = n + n * n + n + n * n
    bytes_per_step = (tiles_in + tiles_out) * _SUBLANES * _LANES * 4
    carry_bytes = (n + n * n) * _SUBLANES * _LANES * 4
    # 2x: double-buffered time blocks; 3x carry: in + out + scratch;
    # 4 MiB margin for the unrolled step body's live temporaries.
    return 2 * bytes_per_step + 3 * carry_bytes + (4 << 20) <= (16 << 20)


def _steps_in_budget(T: int, tiles_per_step: int) -> int:
    """Chunk length that keeps a gridded recursion within scoped VMEM.

    With the chunk index on the grid (see _seq_chunked_call), Mosaic
    double-buffers every time-axis in/out block so chunk c+1's DMAs overlap
    chunk c's compute — the resident footprint is 2x the block bytes (plus
    the carry blocks/scratch, small). Budgeting bytes_per_step directly
    OOM'd the 16 MiB scoped-VMEM stack at T=100, n=8 (18.7 MiB requested)."""
    bytes_per_step = tiles_per_step * _SUBLANES * _LANES * 4
    return max(1, min(T, _VMEM_BUDGET_BYTES // (2 * bytes_per_step)))


def _chunk_len(T: int, n: int, m: int, p: int) -> int:
    tiles_per_step = (
        p + m + 1 + n * n + n * m + p * n + n * n     # inputs
        + n + n * n + n + n * n                        # outputs
    )
    return _steps_in_budget(T, tiles_per_step)


def _wrap_seq_kernel(body, n_smem, n_tin, n_carry, n_tout):
    """Wrap a chunk body into a pallas kernel whose carry lives in VMEM
    scratch across the chunk grid axis (grid = (batch_tiles, n_chunks)).

    Ref order: smem ins, time ins, carry ins, time outs, carry outs, scratch.
    At chunk 0 the scratch is seeded from the carry-in blocks; every chunk
    writes the updated carry to both scratch and the carry-out blocks (the
    final write is the one flushed to HBM)."""
    def kernel(*refs):
        smem = refs[:n_smem]
        tin = refs[n_smem:n_smem + n_tin]
        cin = refs[n_smem + n_tin:n_smem + n_tin + n_carry]
        tout = refs[n_smem + n_tin + n_carry:n_smem + n_tin + n_carry + n_tout]
        cout = refs[-2 * n_carry:-n_carry]
        scratch = refs[-n_carry:]

        @pl.when(pl.program_id(1) == 0)
        def _seed():
            for s, ci in zip(scratch, cin):
                s[...] = ci[...]

        carry = tuple(s[...] for s in scratch)
        new = body(smem, tin, tout, carry)
        for s, co, v in zip(scratch, cout, new):
            s[...] = v
            co[...] = v

    return kernel


def _seq_chunked_call(
    body, *, smem_ins, time_ins, carry_init, out_dims,
    T, ct, reverse, n_tiles, interpret,
):
    """Run a sequential per-timestep recursion over [0, T) in at most TWO
    pallas_calls — one gridded over all full-length time chunks (chunk index
    = minor grid axis, carry in VMEM scratch) and one for the remainder —
    instead of one call per chunk. Compile time is then O(1) in T: a T=100
    n=8 training step previously emitted ~100 Mosaic kernels (one per chunk
    across the four recursions), each a separate multi-second compile.

    `body(smem_refs, time_in_refs, time_out_refs, carry) -> new_carry`
    implements one chunk; chunk length is read off the refs' block shape.
    `reverse=True` processes chunks back-to-front (the per-step layout inside
    each chunk is the body's business); the remainder chunk is the one at the
    END of the time axis, so in reverse mode it runs first.

    Returns (time_outs, final_carry); time outs are in storage (forward)
    order, each [T, *dims, spd, 128]."""
    spd = carry_init[0].shape[-2]
    n_carry = len(carry_init)
    kernel = _wrap_seq_kernel(
        body, len(smem_ins), len(time_ins), n_carry, len(out_dims)
    )
    if T == 0:
        empty = [
            jnp.zeros((0,) + d + (spd, _LANES), jnp.float32) for d in out_dims
        ]
        return empty, list(carry_init)
    n_full, rem = divmod(T, ct)

    def run(t0, t1, n_chunks, rev, carries):
        Tc = (t1 - t0) // n_chunks

        def tspec(dims):
            zeros = (0,) * len(dims)
            if rev:
                im = lambda g, c, _z=zeros, _n=n_chunks: (_n - 1 - c,) + _z + (g, 0)
            else:
                im = lambda g, c, _z=zeros: (c,) + _z + (g, 0)
            return pl.BlockSpec(
                (Tc,) + dims + (_SUBLANES, _LANES), im, memory_space=pltpu.VMEM
            )

        def cspec(dims):
            zeros = (0,) * len(dims)
            return pl.BlockSpec(
                dims + (_SUBLANES, _LANES),
                lambda g, c, _z=zeros: _z + (g, 0),
                memory_space=pltpu.VMEM,
            )

        in_specs = (
            [pl.BlockSpec(a.shape, lambda g, c, _r=a.ndim: (0,) * _r,
                          memory_space=pltpu.SMEM) for a in smem_ins]
            + [tspec(a.shape[1:-2]) for a in time_ins]
            + [cspec(a.shape[:-2]) for a in carries]
        )
        out_specs = (
            [tspec(d) for d in out_dims] + [cspec(a.shape[:-2]) for a in carries]
        )
        out_shape = (
            [jax.ShapeDtypeStruct((t1 - t0,) + d + (spd, _LANES), jnp.float32)
             for d in out_dims]
            + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in carries]
        )
        scratch = [
            pltpu.VMEM(a.shape[:-2] + (_SUBLANES, _LANES), jnp.float32)
            for a in carries
        ]
        sl = slice(t0, t1)
        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles, n_chunks),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*smem_ins, *[a[sl] for a in time_ins], *carries)
        return list(outs[:len(out_dims)]), list(outs[len(out_dims):])

    t_mid = n_full * ct
    touts_full = touts_rem = None
    carries = list(carry_init)
    if reverse:
        if rem:
            touts_rem, carries = run(t_mid, T, 1, False, carries)
        if n_full:
            touts_full, carries = run(0, t_mid, n_full, True, carries)
    else:
        if n_full:
            touts_full, carries = run(0, t_mid, n_full, False, carries)
        if rem:
            touts_rem, carries = run(t_mid, T, 1, False, carries)
    if touts_full is None:
        touts = touts_rem
    elif touts_rem is None:
        touts = touts_full
    else:
        touts = [jnp.concatenate([a, b], axis=0)
                 for a, b in zip(touts_full, touts_rem)]
    return touts, carries


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

    touts, _ = _seq_chunked_call(
        _filter_body,
        smem_ins=[R],
        time_ins=[y_t, u_t, mask_t, A_t, B_t, C_t, Q_t],
        carry_init=[mu0_t, sig0_t],
        out_dims=[(n,), (n, n), (n,), (n, n)],
        T=T, ct=_chunk_len(T, n, m, p), reverse=False,
        n_tiles=n_tiles, interpret=interpret,
    )
    muf, sigf, mup, sigp = touts
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

def _rts_body(smem, tin, tout, carry):
    """Reverse RTS recursion over a time chunk, tiles VMEM-resident. Mirrors
    ops/lgssm.lgssm_smooth_from_filter (reference kalman_filter.py:204-279).
    Index t here covers recursion steps only (the wrapper writes the T-1
    identity element); *_n refs are pre-shifted to hold the t+1 values."""
    del smem
    muf_ref, sigf_ref, mupn_ref, sigpn_ref, an_ref = tin
    mus_ref, sigs_ref = tout
    T, n = muf_ref.shape[0], muf_ref.shape[1]

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

    return jax.lax.fori_loop(0, T, body, carry)


def _rts_chunk_len(T: int, n: int) -> int:
    tiles_per_step = 2 * n + 4 * n * n + n + n * n  # in (5 arrays) + out (2)
    return _steps_in_budget(T, tiles_per_step)


def _rts_pallas_raw(muf, sigf, mup, sigp, A, *, interpret):
    batch, T, n = muf.shape
    b_pad = -(-batch // _TILE_B) * _TILE_B
    n_tiles = b_pad // _TILE_B

    muf_t = _to_tiles(muf, b_pad)
    sigf_t = _to_tiles(sigf, b_pad)
    mup_t = _to_tiles(mup, b_pad)
    sigp_t = _to_tiles(sigp, b_pad)
    A_t = _to_tiles(A, b_pad)

    # recursion covers indices [0, T-1), walked back-to-front; the carry
    # starts at the filtered posterior of the last step
    touts, _ = _seq_chunked_call(
        _rts_body,
        smem_ins=[],
        time_ins=[muf_t[:T - 1], sigf_t[:T - 1],
                  mup_t[1:T], sigp_t[1:T], A_t[1:T]],
        carry_init=[muf_t[T - 1], sigf_t[T - 1]],
        out_dims=[(n,), (n, n)],
        T=T - 1, ct=_rts_chunk_len(T, n), reverse=True,
        n_tiles=n_tiles, interpret=interpret,
    )
    mus = jnp.concatenate([touts[0], muf_t[T - 1:T]], axis=0)
    sigs = jnp.concatenate([touts[1], sigf_t[T - 1:T]], axis=0)
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
