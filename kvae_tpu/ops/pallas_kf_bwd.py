"""Hand-derived adjoint (backward) Pallas kernels for the fused Kalman filter
and RTS smoother — training through the Pallas path no longer re-runs the
scan implementation for its VJP.

The reverse recursions recompute each step's intermediates (gain, innovation
covariance inverse, smoother gain) from the forward's stored outputs
(mu_filt, sigma_filt, mu_pred, sigma_pred) — no extra residuals are saved.
All tile algebra follows ops/pallas_kf.py ((8,128) batch tiles, unrolled
small-matrix math).

VJP derivation (filter step; notation: g* = cotangent of *, sym(X) = (X+X^T)/2,
P = sigma_pred, W = S^{-1}):
  forward:  mp = A mu + B u ;  P = A Sigma A^T + Q
            r = y - C mp ;  S = sym(C P C^T + R) ;  K = mask * P C^T W
            mu' = mp + K r ;  Sigma' = sym((I-KC) P (I-KC)^T + K R K^T)
  reverse:  G   = sym(gSigma')
            gIKC = 2 G IKC P
            gK   = 2 G K R + gmu' r^T - gIKC C^T            (then *= mask)
            gW   = C P gK ;  gS = -W sym(gW) W  (as sym matrix)
            gP   = IKC^T G IKC + gK W C + C^T sym(gS) C + gP_stored
            gC   = -K^T gIKC + W gK^T P + 2 sym(gS) C P - gr mp^T
            gr   = K^T gmu' ;  gy = gr
            gmp  = gmu' - C^T gr + gmp_stored
            gA   = gmp mu^T + 2 sym(gP) A Sigma
            gmu  = A^T gmp ;  gB = gmp u^T ;  gu = B^T gmp
            gSigma = A^T gP A ;  gQ = gP ;  gR += sym(gS) + K^T G K
(RTS step analogous; see _rts_bwd_body.)

Gated by tests/test_pallas_bwd.py: gradients versus jax.vjp of the scan
implementation for every input, masked and unmasked.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from kvae_tpu.ops.pallas_kf import (
    _LANES,
    _SUBLANES,
    _TILE_B,
    _steps_in_budget,
    _ge_inv,
    _ge_solve,
    _from_tiles,
    _seq_chunked_call,
    _to_tiles,
)


# ---------------------------------------------------------------------------
# tile-list helpers (operands are [8,128] arrays or nested lists of them)
# ---------------------------------------------------------------------------

def _mat(x, r, c):
    """jnp array [r,c,8,128] -> nested list."""
    return [[x[i, j] for j in range(c)] for i in range(r)]


def _vec(x, r):
    return [x[i] for i in range(r)]


def _stackm(m):
    return jnp.stack([jnp.stack(row) for row in m])


def _stackv(v):
    return jnp.stack(v)


def _mm(a, b, r, k, c):
    """[r,k] @ [k,c]"""
    return [[sum(a[i][q] * b[q][j] for q in range(k)) for j in range(c)]
            for i in range(r)]


def _mmT(a, b, r, k, c):
    """[r,k] @ [c,k]^T"""
    return [[sum(a[i][q] * b[j][q] for q in range(k)) for j in range(c)]
            for i in range(r)]


def _mTm(a, b, k, r, c):
    """[k,r]^T @ [k,c]"""
    return [[sum(a[q][i] * b[q][j] for q in range(k)) for j in range(c)]
            for i in range(r)]


def _mv(a, v, r, k):
    return [sum(a[i][q] * v[q] for q in range(k)) for i in range(r)]


def _mTv(a, v, k, r):
    return [sum(a[q][i] * v[q] for q in range(k)) for i in range(r)]


def _outer(a, b, r, c):
    return [[a[i] * b[j] for j in range(c)] for i in range(r)]


def _addm(a, b, r, c):
    return [[a[i][j] + b[i][j] for j in range(c)] for i in range(r)]


def _subm(a, b, r, c):
    return [[a[i][j] - b[i][j] for j in range(c)] for i in range(r)]


def _scalem(a, s, r, c):
    return [[a[i][j] * s for j in range(c)] for i in range(r)]


def _symm(a, r):
    return [[0.5 * (a[i][j] + a[j][i]) for j in range(r)] for i in range(r)]


def _inv_psd(S, p):
    """S^{-1} for a (nearly) symmetric invertible [p][p] tile matrix.
    Gauss-Jordan rather than Cholesky: training can drift the learned Q (and
    hence sigma_pred / S) indefinite, where sqrt-based factorizations NaN."""
    return _ge_inv(S, p)


# ---------------------------------------------------------------------------
# filter backward kernel (one time chunk, reverse order)
# ---------------------------------------------------------------------------

def _filter_bwd_body(smem, tin, tout, carry):
    """One reverse-order time chunk of the filter adjoint (see
    pallas_kf._seq_chunked_call). The gR accumulator rides along as a third
    carry, so it totals across chunks inside the gridded call for free."""
    (r_ref,) = smem
    (y_ref, u_ref, mask_ref, a_ref, b_ref, c_ref,     # fwd inputs (no Q: unused)
     muprev_ref, sigprev_ref,                          # mu/sigma_{t-1|t-1} (t=0 -> prior)
     mup_ref, sigp_ref,                                # stored predictions
     gmuf_ref, gsigf_ref, gmup_ref, gsigp_ref) = tin   # stored output cotangents
    gy_ref, gu_ref, ga_ref, gb_ref, gc_ref, gq_ref = tout
    T, p = y_ref.shape[0], y_ref.shape[1]
    m = u_ref.shape[1]
    n = a_ref.shape[1]
    R = [[r_ref[i, j] for j in range(p)] for i in range(p)]

    def body(step, carry):
        gmu_c, gsig_c, gR_acc = carry     # cotangents of (mu', Sigma') as inputs downstream
        t = T - 1 - step

        A = _mat(a_ref[t], n, n)
        Bm = _mat(b_ref[t], n, m)
        C = _mat(c_ref[t], p, n)
        y = _vec(y_ref[t], p)
        u = _vec(u_ref[t], m)
        mk = mask_ref[t]
        mu_in = _vec(muprev_ref[t], n)
        sig_in = _mat(sigprev_ref[t], n, n)
        mp = _vec(mup_ref[t], n)
        P = _mat(sigp_ref[t], n, n)

        # recompute step intermediates
        S = _addm(_mm(_mm(C, P, p, n, n), [[C[j][i] for j in range(p)] for i in range(n)], p, n, p), R, p, p)
        S = _symm(S, p)
        W = _inv_psd(S, p)
        PCt = _mmT(P, C, n, n, p)                      # [n,p]
        K = [[mk * sum(PCt[i][q] * W[q][j] for q in range(p)) for j in range(p)]
             for i in range(n)]
        y_hat = _mv(C, mp, p, n)
        resid = [y[q] - y_hat[q] for q in range(p)]
        IKC = [[(1.0 if i == j else 0.0) - sum(K[i][q] * C[q][j] for q in range(p))
                for j in range(n)] for i in range(n)]

        # total output cotangents at this step
        gmu_p = [gmuf_ref[t][i] + gmu_c[i] for i in range(n)]          # gmu'
        gsig_full = _mat(gsigf_ref[t], n, n)
        gsig_p = [[gsig_full[i][j] + gsig_c[i, j] for j in range(n)] for i in range(n)]
        G = _symm(gsig_p, n)

        # gIKC = 2 G IKC P
        G_IKC = _mm(G, IKC, n, n, n)
        gIKC = _scalem(_mm(G_IKC, P, n, n, n), 2.0, n, n)
        # gK = 2 G K R + gmu' r^T - gIKC C^T ; then mask
        GK = _mm(G, K, n, n, p)
        gK = _addm(_scalem(_mm(GK, R, n, p, p), 2.0, n, p),
                   _outer(gmu_p, resid, n, p), n, p)
        gK = _subm(gK, _mmT(gIKC, C, n, n, p), n, p)
        gK = [[mk * gK[i][q] for q in range(p)] for i in range(n)]

        # gW = C P gK  ([p,n][n,n][n,p])
        CP = _mm(C, P, p, n, n)
        gW = _mm(CP, gK, p, n, p)
        # gS = -W sym(gW) W
        gW_sym = _symm(gW, p)
        gS = _scalem(_mm(_mm(W, gW_sym, p, p, p), W, p, p, p), -1.0, p, p)
        gS_sym = _symm(gS, p)

        # gr = K^T gmu'
        gr = _mTv(K, gmu_p, n, p)
        # gy / accumulate
        gy_ref[t] = _stackv(gr)

        # gmp = gmu' - C^T gr + stored gmp
        gmp_stored = _vec(gmup_ref[t], n)
        gmp = [gmu_p[i] - sum(C[q][i] * gr[q] for q in range(p)) + gmp_stored[i]
               for i in range(n)]

        # gP = IKC^T G IKC + gK W C + C^T gS_sym C + stored gsigp
        IKCt_G = _mTm(IKC, G, n, n, n)
        gP = _mm(IKCt_G, IKC, n, n, n)
        WC = _mm(W, C, p, p, n)
        gP = _addm(gP, _mm(gK, WC, n, p, n), n, n)
        gSC = _mm(gS_sym, C, p, p, n)
        gP = _addm(gP, _mTm(C, gSC, p, n, n), n, n)
        gP_stored = _mat(gsigp_ref[t], n, n)
        gP = _addm(gP, gP_stored, n, n)

        # gC = -K^T gIKC + W gK^T P + 2 gS_sym C P - gr mp^T
        gC = _scalem(_mTm(K, gIKC, n, p, n), -1.0, p, n)
        gKtP = _mm([[gK[i][q] for i in range(n)] for q in range(p)], P, p, n, n)
        gC = _addm(gC, _mm(W, gKtP, p, p, n), p, n)
        gC = _addm(gC, _scalem(_mm(gSC, P, p, n, n), 2.0, p, n), p, n)
        gC = _subm(gC, _outer(gr, mp, p, n), p, n)
        gc_ref[t] = _stackm(gC)

        # gR accumulation: sym(gS) + K^T G K
        KtG = _mTm(K, G, n, p, n)
        KtGK = _mm(KtG, K, p, n, p)
        gR_t = _addm(gS_sym, KtGK, p, p)
        gR_acc = gR_acc + _stackm(gR_t)

        # predict-stage adjoints
        gP_sym = _symm(gP, n)
        gA = _addm(_outer(gmp, mu_in, n, n),
                   _scalem(_mm(_mm(gP_sym, A, n, n, n), sig_in, n, n, n), 2.0, n, n),
                   n, n)
        ga_ref[t] = _stackm(gA)
        gb_ref[t] = _stackm(_outer(gmp, u, n, m))
        gu_ref[t] = _stackv(_mTv(Bm, gmp, n, m))
        gq_ref[t] = _stackm(gP)

        gmu_prev = _mTv(A, gmp, n, n)
        AtgP = _mTm(A, gP, n, n, n)
        gsig_prev = _mm(AtgP, A, n, n, n)

        return (_stackv(gmu_prev), _stackm(gsig_prev), gR_acc)

    return jax.lax.fori_loop(0, T, body, carry)


# ---------------------------------------------------------------------------
# RTS smoother backward kernel (one chunk, FORWARD time order)
# ---------------------------------------------------------------------------

def _rts_bwd_body(smem, tin, tout, carry):
    """One FORWARD-time chunk of the RTS adjoint (see
    pallas_kf._seq_chunked_call)."""
    del smem
    (muf_ref, sigf_ref, mupn_ref, sigpn_ref, an_ref,    # fwd inputs (shifted)
     msn_ref, psn_ref,                                   # smoothed at t+1 (shifted)
     gms_ref, gps_ref) = tin                             # stored smoothed cotangents
    gmf_ref, gpf_ref, gmpn_ref, gppn_ref, gan_ref = tout
    T, n = muf_ref.shape[0], muf_ref.shape[1]

    def body(t, carry):
        gm_c, gp_c = carry                       # cotangent of smoothed[t] via step t-1
        mf = _vec(muf_ref[t], n)
        Pf = _mat(sigf_ref[t], n, n)
        mpn = _vec(mupn_ref[t], n)
        Pp = _mat(sigpn_ref[t], n, n)
        An = _mat(an_ref[t], n, n)
        msn = _vec(msn_ref[t], n)
        psn = _mat(psn_ref[t], n, n)

        g_ms = [gms_ref[t][i] + gm_c[i] for i in range(n)]
        gps_t = _mat(gps_ref[t], n, n)
        g_Ps = [[gps_t[i][j] + gp_c[i, j] for j in range(n)] for i in range(n)]
        G = _symm(g_Ps, n)

        # recompute J = Pf An^T Pp^{-1}
        W = _inv_psd(Pp, n)
        PfAt = _mmT(Pf, An, n, n, n)
        J = _mm(PfAt, W, n, n, n)
        D = _subm(psn, Pp, n, n)
        d = [msn[i] - mpn[i] for i in range(n)]

        # gJ = 2 G J D + g_ms d^T
        GJ = _mm(G, J, n, n, n)
        gJ = _addm(_scalem(_mm(GJ, D, n, n, n), 2.0, n, n),
                   _outer(g_ms, d, n, n), n, n)
        JtG = _mTm(J, G, n, n, n)
        JtGJ = _mm(JtG, J, n, n, n)                      # [n,n]
        Jt_gms = _mTv(J, g_ms, n, n)

        # carry to smoothed[t+1]
        gm_next = _stackv(Jt_gms)
        gp_next = _stackm(JtGJ)

        # direct grads
        gmf_ref[t] = _stackv(g_ms)
        gmpn_ref[t] = _stackv([-Jt_gms[i] for i in range(n)])

        # gPf = G + gJ W An  (W sym)
        WAn = _mm(W, An, n, n, n)
        gPf = _addm(G, _mm(gJ, WAn, n, n, n), n, n)
        gpf_ref[t] = _stackm(gPf)

        # gAn = W gJ^T Pf
        gJt = [[gJ[j][i] for j in range(n)] for i in range(n)]
        gAn = _mm(_mm(W, gJt, n, n, n), Pf, n, n, n)
        gan_ref[t] = _stackm(gAn)

        # gPp = -J^T G J - W gW W with gW = An Pf gJ.
        # No symmetrization here: unlike the filter's S (which the forward
        # explicitly symmetrizes), Pp is consumed raw, so its cotangent keeps
        # the asymmetric part (it flows into gQ via the filter backward).
        AnPf = _mm(An, Pf, n, n, n)
        gW = _mm(AnPf, gJ, n, n, n)
        WgWW = _mm(_mm(W, gW, n, n, n), W, n, n, n)
        gPp = [[-JtGJ[i][j] - WgWW[i][j] for j in range(n)] for i in range(n)]
        gppn_ref[t] = _stackm(gPp)

        return gm_next, gp_next

    return jax.lax.fori_loop(0, T, body, carry)


# ---------------------------------------------------------------------------
# chunked raw wrappers
# ---------------------------------------------------------------------------

def _filter_bwd_chunk_len(T, n, m, p):
    tiles = (
        p + m + 1 + n * n + n * m + p * n            # y,u,mask,A,B,C
        + 2 * n + 2 * n * n                           # muprev,sigprev? (n + nn)*2
        + 2 * n + 2 * n * n                           # stored cotangents
        + p + m + 2 * n * n + n * m + p * n + n * n   # grads out
    )
    return _steps_in_budget(T, tiles)


def _filter_bwd_raw(
    y, u, mask, A, B, C, Q, mu0, sigma0, R,
    muf, sigf, mup, sigp,
    gmuf, gsigf, gmup, gsigp,
    *, interpret,
):
    batch, T, p = y.shape
    n = A.shape[-1]
    m = B.shape[-1]
    b_pad = -(-batch // _TILE_B) * _TILE_B
    n_tiles = b_pad // _TILE_B
    spd = b_pad // _LANES
    del Q  # the adjoint recomputes from stored predictions; Q never appears

    tt = lambda x: _to_tiles(x, b_pad)
    y_t, u_t, mask_t = tt(y), tt(u), tt(mask)
    A_t, B_t, C_t = tt(A), tt(B), tt(C)
    mup_t, sigp_t = tt(mup), tt(sigp)
    gmuf_t, gsigf_t = tt(gmuf), tt(gsigf)
    gmup_t, gsigp_t = tt(gmup), tt(gsigp)
    # previous-step filtered state (prior at t=0)
    muprev = jnp.concatenate(
        [jnp.broadcast_to(mu0, (batch, 1, n)), muf[:, :-1]], axis=1
    )
    sigprev = jnp.concatenate(
        [jnp.broadcast_to(sigma0, (batch, 1, n, n)), sigf[:, :-1]], axis=1
    )
    muprev_t, sigprev_t = tt(muprev), tt(sigprev)

    touts, carries = _seq_chunked_call(
        _filter_bwd_body,
        smem_ins=[R],
        time_ins=[y_t, u_t, mask_t, A_t, B_t, C_t,
                  muprev_t, sigprev_t, mup_t, sigp_t,
                  gmuf_t, gsigf_t, gmup_t, gsigp_t],
        carry_init=[
            jnp.zeros((n, spd, _LANES), jnp.float32),
            jnp.zeros((n, n, spd, _LANES), jnp.float32),
            jnp.zeros((p, p, spd, _LANES), jnp.float32),
        ],
        out_dims=[(p,), (m,), (n, n), (n, m), (p, n), (n, n)],
        T=T, ct=_filter_bwd_chunk_len(T, n, m, p), reverse=True,
        n_tiles=n_tiles, interpret=interpret,
    )
    gy = _from_tiles(touts[0], batch)
    gu = _from_tiles(touts[1], batch)
    gA = _from_tiles(touts[2], batch)
    gB = _from_tiles(touts[3], batch)
    gC = _from_tiles(touts[4], batch)
    gQ = _from_tiles(touts[5], batch)
    cgmu, cgsig, gR_total = carries
    gmu0 = jnp.sum(_from_tiles(cgmu[None], batch)[:, 0], axis=0)
    gsigma0 = jnp.sum(_from_tiles(cgsig[None], batch)[:, 0], axis=0)
    gR = jnp.sum(_from_tiles(gR_total[None], batch)[:, 0], axis=0)
    return gy, gu, gA, gB, gC, gQ, gmu0, gsigma0, gR


def _rts_bwd_chunk_len(T, n):
    tiles = 2 * n + 2 * n * n + n * n + n + n * n + 2 * n + 2 * n * n + 3 * n * n
    return _steps_in_budget(T, tiles)


def _rts_bwd_raw(muf, sigf, mup, sigp, A, mus, sigs, gmus, gsigs, *, interpret):
    batch, T, n = muf.shape
    b_pad = -(-batch // _TILE_B) * _TILE_B
    n_tiles = b_pad // _TILE_B
    spd = b_pad // _LANES

    tt = lambda x: _to_tiles(x, b_pad)
    muf_t, sigf_t = tt(muf), tt(sigf)
    mup_t, sigp_t, A_t = tt(mup), tt(sigp), tt(A)
    mus_t, sigs_t = tt(mus), tt(sigs)
    gmus_t, gsigs_t = tt(gmus), tt(gsigs)

    cgm = jnp.zeros((n, spd, _LANES), jnp.float32)
    cgp = jnp.zeros((n, n, spd, _LANES), jnp.float32)

    # FORWARD over recursion indices [0, T-1)
    touts, carries = _seq_chunked_call(
        _rts_bwd_body,
        smem_ins=[],
        time_ins=[muf_t[:T - 1], sigf_t[:T - 1],
                  mup_t[1:T], sigp_t[1:T], A_t[1:T],
                  mus_t[1:T], sigs_t[1:T],
                  gmus_t[:T - 1], gsigs_t[:T - 1]],
        carry_init=[cgm, cgp],
        out_dims=[(n,), (n, n), (n,), (n, n), (n, n)],
        T=T - 1, ct=_rts_bwd_chunk_len(T, n), reverse=False,
        n_tiles=n_tiles, interpret=interpret,
    )
    gmf, gpf, gmpn, gppn, gan = touts
    cgm, cgp = carries

    # last smoothed element is the filtered posterior at T-1
    gmuf_t = jnp.concatenate([gmf, (gmus_t[T - 1] + cgm)[None]], axis=0)
    gsigf_t = jnp.concatenate([gpf, (gsigs_t[T - 1] + cgp)[None]], axis=0)
    zpad_v = jnp.zeros((1, n, spd, _LANES), jnp.float32)
    zpad_m = jnp.zeros((1, n, n, spd, _LANES), jnp.float32)
    gmup_t = jnp.concatenate([zpad_v, gmpn], axis=0)
    gsigp_t = jnp.concatenate([zpad_m, gppn], axis=0)
    gA_t = jnp.concatenate([zpad_m, gan], axis=0)

    ft = lambda x: _from_tiles(x, batch)
    return ft(gmuf_t), ft(gsigf_t), ft(gmup_t), ft(gsigp_t), ft(gA_t)


# ---------------------------------------------------------------------------
# fused forward + hand-derived backward, as one custom-vjp smooth
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def _smooth_adjoint_core(y, u, mask, A, B, C, Q, mu0, sigma0, R, interpret):
    from kvae_tpu.ops.pallas_kf import _filter_pallas_raw, _rts_pallas_raw

    muf, sigf, mup, sigp = _filter_pallas_raw(
        y, u, mask, A, B, C, Q, mu0, sigma0, R, interpret=interpret
    )
    mus, sigs = _rts_pallas_raw(muf, sigf, mup, sigp, A, interpret=interpret)
    return muf, sigf, mup, sigp, mus, sigs


def _smooth_adjoint_fwd(y, u, mask, A, B, C, Q, mu0, sigma0, R, interpret):
    out = _smooth_adjoint_core(y, u, mask, A, B, C, Q, mu0, sigma0, R, interpret)
    muf, sigf, mup, sigp, mus, sigs = out
    return out, (y, u, mask, A, B, C, Q, mu0, sigma0, R, muf, sigf, mup, sigp, mus, sigs)


def _smooth_adjoint_bwd(interpret, res, cots):
    (y, u, mask, A, B, C, Q, mu0, sigma0, R,
     muf, sigf, mup, sigp, mus, sigs) = res
    gmuf_d, gsigf_d, gmup_d, gsigp_d, gmus, gsigs = cots

    gmuf_s, gsigf_s, gmup_s, gsigp_s, gA_s = _rts_bwd_raw(
        muf, sigf, mup, sigp, A, mus, sigs, gmus, gsigs, interpret=interpret
    )
    gmuf = gmuf_d + gmuf_s
    gsigf = gsigf_d + gsigf_s
    gmup = gmup_d + gmup_s
    gsigp = gsigp_d + gsigp_s

    gy, gu, gA_f, gB, gC, gQ, gmu0, gsigma0, gR = _filter_bwd_raw(
        y, u, mask, A, B, C, Q, mu0, sigma0, R,
        muf, sigf, mup, sigp, gmuf, gsigf, gmup, gsigp, interpret=interpret,
    )
    gA = gA_f + gA_s
    gmask = jnp.zeros_like(mask)
    return gy, gu, gmask, gA, gB, gC, gQ, gmu0, gsigma0, gR


_smooth_adjoint_core.defvjp(_smooth_adjoint_fwd, _smooth_adjoint_bwd)


def lgssm_smooth_pallas_adjoint(y, u, mask, params, dynamics, interpret=None):
    """Fully fused Pallas smooth with hand-derived Pallas adjoints — both the
    forward recursions AND the backward pass run as VMEM kernels (no scan
    replay in the VJP). API-compatible with ops.lgssm.lgssm_smooth
    (sequence-dynamics mode)."""
    from kvae_tpu.ops.lgssm import FilterResult, SmoothResult
    from kvae_tpu.ops.pallas_kf import _default_interpret

    batch, T, _ = y.shape
    if mask is None:
        mask = jnp.ones((batch, T), dtype=y.dtype)
    if interpret is None:
        interpret = _default_interpret()
    muf, sigf, mup, sigp, mus, sigs = _smooth_adjoint_core(
        y.astype(jnp.float32), u.astype(jnp.float32), mask.astype(jnp.float32),
        dynamics.A, dynamics.B, dynamics.C, dynamics.Q,
        jnp.broadcast_to(params.mu0, (dynamics.A.shape[-1],)).astype(jnp.float32),
        params.sigma0.astype(jnp.float32), params.R.astype(jnp.float32),
        interpret,
    )
    fr = FilterResult(
        mu_filt=muf, sigma_filt=sigf, mu_pred=mup, sigma_pred=sigp,
        A=dynamics.A, B=dynamics.B, C=dynamics.C, Q=dynamics.Q, aux=None,
    )
    return SmoothResult(mu_smooth=mus, sigma_smooth=sigs, filter_result=fr)
