"""Fused Pallas kernel for the COUPLED alpha-LSTM masked Kalman filter.

The one reference code path that round 2 left without a kernel story:
with masked frames the alpha-LSTM consumes the filter's own masked
prediction feedback (reference kvae/kalman/kalman_filter.py:159,183-185),
so the LSTM and the filter are a single recursion and the sequence-dynamics
kernels (ops/pallas_kf.py) don't apply. Imputation-time inference therefore
ran the per-step `lax.scan` (ops/lgssm.py step_dynamics path). Here the
WHOLE coupled step — LSTM cell, alpha softmax head, bank mixing, masked
Kalman predict/update, pseudo-observation feedback — runs inside one
VMEM-resident Pallas body per time chunk.

Layout (see ops/pallas_kf.py for the tile conventions):
  - Filter-state quantities use the standard batch-tile layout: each scalar
    entry of mu/Sigma/A/... is one [8,128] tile covering 1024 batch lanes;
    the small-matrix algebra is Python-unrolled on the VPU.
  - The LSTM hidden/cell states are [H, 8, 128] arrays. Per sublane group
    s, the gate preactivation is TWO REAL MXU MATMULS:
        gates_s = wiT @ fb_s + whT @ h_s + b      # [4H,128]
    ([4H,p]x[p,128] and [4H,H]x[H,128]) — the one place in this model where
    the MXU is actually the right unit, because the batch rides the lane
    axis and H=50 is a real contraction dimension.
  - The alpha head is another small matmul + an unrolled K-row softmax; the
    mixed (A,B,C) tiles come from SMEM-resident banks weighted by the alpha
    tiles.
  - Chunked over time exactly like ops/pallas_kf.py (_seq_chunked_call
    semantics, one kernel for all full chunks + one remainder call), but
    with a single batch tile (B <= 1024 — eval/imputation batches; larger
    batches fall back to the scan path): the recursion carry
    (mu, Sigma, h, c, feedback) lives in VMEM scratch across chunks.

Gradients: `jax.custom_vjp` whose backward is the VJP of the numerically
equivalent coupled `lax.scan` (`_coupled_scan_raw`) — the kernel serves
inference/eval; training on the unmasked path keeps using the decoupled
sequence engines (models/dynamics.py `sequence`).

Equivalence to the coupled scan is gated by tests/test_pallas_lstm.py
(interpret mode on CPU; real-TPU spot check in PARITY.md).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kvae_tpu.ops.lgssm import (
    FilterResult,
    LGSSMParams,
    SmoothResult,
    lgssm_filter,
    lgssm_smooth_from_filter,
)
from kvae_tpu.ops.pallas_kf import (
    _LANES,
    _SUBLANES,
    _TILE_B,
    _from_tiles,
    _ge_solve,
    _rts_pallas_core,
    _steps_in_budget,
    _to_tiles,
)

# Largest batch the single-tile fused kernel accepts — the public constant the
# model's fusible-path gate checks against (KVAE.__call__), so the gate and
# the ValueError below can never diverge.
MAX_BATCH = _TILE_B


# ---------------------------------------------------------------------------
# the fused chunk body
# ---------------------------------------------------------------------------

def _lstm_filter_kernel(
    # SMEM: R [p,p], banks a [K,n*n], b [K,n*m], c [K,p*n], q [n,n]
    r_ref, abank_ref, bbank_ref, cbank_ref, qfix_ref,
    # VMEM consts: wiT [4H,p], whT [4H,H], bias [4H,1], hwT [K,H], hb [K,1]
    wiT_ref, whT_ref, bias_ref, hwT_ref, hb_ref,
    # time ins: y [Tc,p,8,128], u [Tc,m,8,128], mask [Tc,8,128]
    y_ref, u_ref, mask_ref,
    # carry ins
    mu0_ref, sig0_ref, h0_ref, c0_ref, fb0_ref,
    # time outs
    muf_ref, sigf_ref, mup_ref, sigp_ref, aseq_ref, bseq_ref, cseq_ref,
    alpha_ref,
    # carry outs
    muK_ref, sigK_ref, hK_ref, cK_ref, fbK_ref,
    # scratch (carry across the chunk grid axis)
    mu_s, sig_s, h_s, c_s, fb_s,
):
    T = y_ref.shape[0]
    p = y_ref.shape[1]
    m = u_ref.shape[1]
    n = mu0_ref.shape[0]
    K = hwT_ref.shape[0]
    H = whT_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _seed():
        mu_s[...] = mu0_ref[...]
        sig_s[...] = sig0_ref[...]
        h_s[...] = h0_ref[...]
        c_s[...] = c0_ref[...]
        fb_s[...] = fb0_ref[...]

    R = [[r_ref[i, j] for j in range(p)] for i in range(p)]
    wiT = wiT_ref[...]
    whT = whT_ref[...]
    bias = bias_ref[...]
    hwT = hwT_ref[...]
    hb = hb_ref[...]

    def body(t, carry):
        mu, sigma, h, c, fb = carry
        y = y_ref[t]       # [p,8,128]
        u = u_ref[t]       # [m,8,128]
        mk = mask_ref[t]   # [8,128]

        # ---- alpha-LSTM step on the feedback pseudo-observation ----
        h_rows, c_rows, alpha_rows = [], [], []
        for s in range(_SUBLANES):
            fb_g = fb[:, s, :]                     # [p,128]
            h_g = h[:, s, :]                       # [H,128]
            c_g = c[:, s, :]
            gates = (
                jnp.dot(wiT, fb_g, preferred_element_type=jnp.float32)
                + jnp.dot(whT, h_g, preferred_element_type=jnp.float32)
                + bias
            )                                      # [4H,128]
            i_g = jax.nn.sigmoid(gates[0:H])
            f_g = jax.nn.sigmoid(gates[H:2 * H])
            g_g = jnp.tanh(gates[2 * H:3 * H])
            o_g = jax.nn.sigmoid(gates[3 * H:4 * H])
            c_n = f_g * c_g + i_g * g_g
            h_n = o_g * jnp.tanh(c_n)
            logits = jnp.dot(hwT, h_n, preferred_element_type=jnp.float32) + hb
            mx = jnp.max(logits, axis=0, keepdims=True)
            e = jnp.exp(logits - mx)
            alpha_rows.append(e / jnp.sum(e, axis=0, keepdims=True))  # [K,128]
            h_rows.append(h_n)
            c_rows.append(c_n)
        h_new = jnp.stack(h_rows, axis=1)          # [H,8,128]
        c_new = jnp.stack(c_rows, axis=1)
        alpha = [
            jnp.stack([alpha_rows[s][k] for s in range(_SUBLANES)], axis=0)
            for k in range(K)
        ]                                          # K x [8,128]

        # ---- mix banks: A = sum_k alpha_k A_k (SMEM scalars x tiles) ----
        A = [[sum(alpha[k] * abank_ref[k, i * n + j] for k in range(K))
              for j in range(n)] for i in range(n)]
        Bm = [[sum(alpha[k] * bbank_ref[k, i * m + j] for k in range(K))
               for j in range(m)] for i in range(n)]
        C = [[sum(alpha[k] * cbank_ref[k, q * n + j] for k in range(K))
              for j in range(n)] for q in range(p)]

        # ---- masked Kalman step (mirrors ops/pallas_kf._filter_body) ----
        mu_pred = [
            sum(A[i][j] * mu[j] for j in range(n))
            + sum(Bm[i][j] * u[j] for j in range(m))
            for i in range(n)
        ]
        a_sig = [[sum(A[i][k] * sigma[k, j] for k in range(n))
                  for j in range(n)] for i in range(n)]
        sigma_pred = [[
            sum(a_sig[i][k] * A[j][k] for k in range(n)) + qfix_ref[i, j]
            for j in range(n)] for i in range(n)]

        y_hat = [sum(C[q][i] * mu_pred[i] for i in range(n)) for q in range(p)]
        resid = [y[q] - y_hat[q] for q in range(p)]
        c_sig = [[sum(C[q][k] * sigma_pred[k][j] for k in range(n))
                  for j in range(n)] for q in range(p)]
        S = [[sum(c_sig[q][k] * C[r][k] for k in range(n)) + R[q][r]
              for r in range(p)] for q in range(p)]
        S = [[0.5 * (S[q][r] + S[r][q]) for r in range(p)] for q in range(p)]

        pct = [[sum(sigma_pred[i][k] * C[q][k] for k in range(n))
                for q in range(p)] for i in range(n)]
        Kg = _ge_solve(S, pct, p)
        Kg = [[mk * Kg[i][q] for q in range(p)] for i in range(n)]

        mu_new = [mu_pred[i] + sum(Kg[i][q] * resid[q] for q in range(p))
                  for i in range(n)]
        ikc = [[(1.0 if i == j else 0.0)
                - sum(Kg[i][q] * C[q][j] for q in range(p))
                for j in range(n)] for i in range(n)]
        t1 = [[sum(ikc[i][k] * sigma_pred[k][j] for k in range(n))
               for j in range(n)] for i in range(n)]
        t2 = [[sum(t1[i][k] * ikc[j][k] for k in range(n)) for j in range(n)]
              for i in range(n)]
        krk = [[sum(Kg[i][q] * R[q][r] * Kg[j][r]
                    for q in range(p) for r in range(p))
                for j in range(n)] for i in range(n)]
        sigma_new = [[0.5 * (t2[i][j] + krk[i][j] + t2[j][i] + krk[j][i])
                      for j in range(n)] for i in range(n)]

        # ---- pseudo-observation feedback for the next step ----
        fb_new = jnp.stack([mk * y[q] + (1.0 - mk) * y_hat[q]
                            for q in range(p)])

        mu_arr = jnp.stack(mu_new)
        sig_arr = jnp.stack([jnp.stack(row) for row in sigma_new])
        muf_ref[t] = mu_arr
        sigf_ref[t] = sig_arr
        mup_ref[t] = jnp.stack(mu_pred)
        sigp_ref[t] = jnp.stack([jnp.stack(row) for row in sigma_pred])
        aseq_ref[t] = jnp.stack([jnp.stack(row) for row in A])
        bseq_ref[t] = jnp.stack([jnp.stack(row) for row in Bm])
        cseq_ref[t] = jnp.stack([jnp.stack(row) for row in C])
        alpha_ref[t] = jnp.stack(alpha)
        return mu_arr, sig_arr, h_new, c_new, fb_new

    carry = (mu_s[...], sig_s[...], h_s[...], c_s[...], fb_s[...])
    mu, sig, h, c, fb = jax.lax.fori_loop(0, T, body, carry)
    for ref_s, ref_o, v in (
        (mu_s, muK_ref, mu), (sig_s, sigK_ref, sig), (h_s, hK_ref, h),
        (c_s, cK_ref, c), (fb_s, fbK_ref, fb),
    ):
        ref_s[...] = v
        ref_o[...] = v


def _tiles_per_step_lstm(n: int, m: int, p: int, K: int) -> int:
    return (
        p + m + 1                                   # time ins
        + n + n * n + n + n * n                     # muf/sigf/mup/sigp
        + n * n + n * m + p * n + K                 # A,B,C,alpha
    )


def _chunk_len_lstm(T: int, n: int, m: int, p: int, K: int, H: int) -> int:
    return _steps_in_budget(T, _tiles_per_step_lstm(n, m, p, K))


# Probe-calibrated fusion envelope. Above ~400 [8,128] tiles of time-axis
# blocks per step, Mosaic's scoped-VMEM stack allocation for this fused
# kernel becomes UNPREDICTABLE in T even at chunk length 1: measured on a
# real v5e toolchain (2026-08-21, n=12 m=12 p=6 K=9, ct=1), T=56/72/100
# OOM the 16 MiB scoped stack at ~28.8 MiB while T=24/50/64/80/128 compile
# fine — non-monotone in T, so no byte-budget formula can gate it. Below
# the threshold (n<=8-class states, e.g. n=8 m=8 p=4 K=9 -> 326 tiles)
# every probed (T, B) compiled. The gate therefore admits only the
# validated regime; wider states take the coupled-scan path.
_LSTM_FUSE_MAX_TILES = 400


def fits_vmem_lstm(n: int, m: int, p: int, K: int, H: int = 0) -> bool:
    """Can the fused masked-LSTM kernel be safely compiled for this state
    width? (See _LSTM_FUSE_MAX_TILES — probe-calibrated, conservative.)
    Checked by KVAE.__call__'s fusible-path gate alongside MAX_BATCH."""
    del H  # h/c carries are T-independent; the hazard scales with time blocks
    return _tiles_per_step_lstm(n, m, p, K) <= _LSTM_FUSE_MAX_TILES


def _call_chunks(
    smem_ins, const_ins, time_ins, carries, out_dims, T, ct, interpret
):
    """Grid over full time chunks (carry in VMEM scratch) + a remainder
    call; single batch tile. Returns (time_outs, final_carries)."""
    def run(t0, t1, n_chunks, carries):
        Tc = (t1 - t0) // n_chunks

        def tspec(dims):
            zeros = (0,) * len(dims)
            return pl.BlockSpec(
                (Tc,) + dims + (_SUBLANES, _LANES),
                lambda c, _z=zeros: (c,) + _z + (0, 0),
                memory_space=pltpu.VMEM,
            )

        def fullspec(a, space):
            return pl.BlockSpec(
                a.shape, lambda c, _r=a.ndim: (0,) * _r, memory_space=space
            )

        in_specs = (
            [fullspec(a, pltpu.SMEM) for a in smem_ins]
            + [fullspec(a, pltpu.VMEM) for a in const_ins]
            + [tspec(a.shape[1:-2]) for a in time_ins]
            + [fullspec(a, pltpu.VMEM) for a in carries]
        )
        out_specs = (
            [tspec(d) for d in out_dims]
            + [fullspec(a, pltpu.VMEM) for a in carries]
        )
        out_shape = (
            [jax.ShapeDtypeStruct((t1 - t0,) + d + (_SUBLANES, _LANES),
                                  jnp.float32) for d in out_dims]
            + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in carries]
        )
        scratch = [pltpu.VMEM(a.shape, jnp.float32) for a in carries]
        sl = slice(t0, t1)
        outs = pl.pallas_call(
            _lstm_filter_kernel,
            grid=(n_chunks,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*smem_ins, *const_ins, *[a[sl] for a in time_ins], *carries)
        return list(outs[:len(out_dims)]), list(outs[len(out_dims):])

    n_full, rem = divmod(T, ct)
    t_mid = n_full * ct
    touts_full = touts_rem = None
    if n_full:
        touts_full, carries = run(0, t_mid, n_full, carries)
    if rem:
        touts_rem, carries = run(t_mid, T, 1, carries)
    if touts_full is None:
        touts = touts_rem
    elif touts_rem is None:
        touts = touts_full
    else:
        touts = [jnp.concatenate([a, b], axis=0)
                 for a, b in zip(touts_full, touts_rem)]
    return touts, carries


def _lstm_filter_pallas_raw(
    y, u, mask, A_bank, B_bank, C_bank, wi, wh, b, head_w, head_b,
    Q, mu0, sigma0, R, *, interpret,
):
    batch, T, p = y.shape
    K, n, _ = A_bank.shape
    m = B_bank.shape[-1]
    H = wh.shape[0]
    if batch > _TILE_B:
        raise ValueError(
            f"fused LSTM filter supports batch <= {_TILE_B}, got {batch} "
            "(use the scan path for larger batches)"
        )
    b_pad = _TILE_B

    y_t = _to_tiles(y, b_pad)
    u_t = _to_tiles(u, b_pad)
    mask_t = _to_tiles(mask, b_pad)
    mu0_t = _to_tiles(jnp.broadcast_to(mu0, (batch, n)), b_pad)
    sig0_t = _to_tiles(jnp.broadcast_to(sigma0, (batch, n, n)), b_pad)
    zeros_hc = jnp.zeros((H, _SUBLANES, _LANES), jnp.float32)
    fb0 = jnp.zeros((p, _SUBLANES, _LANES), jnp.float32)

    smem_ins = [
        R,
        A_bank.reshape(K, n * n),
        B_bank.reshape(K, n * m),
        C_bank.reshape(K, p * n),
        Q,
    ]
    const_ins = [
        wi.T,                      # [4H,p]
        wh.T,                      # [4H,H]
        b[:, None],                # [4H,1]
        head_w.T,                  # [K,H]
        head_b[:, None],           # [K,1]
    ]
    touts, _ = _call_chunks(
        smem_ins, const_ins,
        time_ins=[y_t, u_t, mask_t],
        carries=[mu0_t, sig0_t, zeros_hc, zeros_hc, fb0],
        out_dims=[(n,), (n, n), (n,), (n, n), (n, n), (n, m), (p, n), (K,)],
        T=T, ct=_chunk_len_lstm(T, n, m, p, K, H), interpret=interpret,
    )
    muf, sigf, mup, sigp, As, Bs, Cs, al = touts
    f = lambda a: _from_tiles(a, batch)
    return f(muf), f(sigf), f(mup), f(sigp), f(As), f(Bs), f(Cs), f(al)


# ---------------------------------------------------------------------------
# scan twin (numerics oracle + custom-vjp backward)
# ---------------------------------------------------------------------------

def _coupled_scan_raw(
    y, u, mask, A_bank, B_bank, C_bank, wi, wh, b, head_w, head_b,
    Q, mu0, sigma0, R,
):
    """The coupled LSTM+filter recursion as a pure lax.scan — identical math
    to models/dynamics.LSTMAlphaDynamics.step inside ops/lgssm.lgssm_filter's
    step_dynamics path."""
    batch = y.shape[0]
    n = A_bank.shape[-1]
    H = wh.shape[0]
    params = LGSSMParams(mu0=mu0, sigma0=sigma0, R=R, Q=Q)
    lstm_p = {"wi": wi, "wh": wh, "b": b}

    from kvae_tpu.models import rnn

    def step(carry, y_prev):
        carry, h = rnn.lstm_step(lstm_p, carry, y_prev)
        alpha = jax.nn.softmax(h @ head_w + head_b, axis=-1)
        A = jnp.einsum("bk,kij->bij", alpha, A_bank)
        B = jnp.einsum("bk,knm->bnm", alpha, B_bank)
        C = jnp.einsum("bk,kpn->bpn", alpha, C_bank)
        Qb = jnp.broadcast_to(Q, (batch, n, n))
        return carry, (A, B, C, Qb, alpha)

    fr = lgssm_filter(
        y, u, mask, params,
        step_dynamics=step,
        step_dynamics_carry=rnn.lstm_init_carry(batch, H, dtype=y.dtype),
    )
    return (
        fr.mu_filt, fr.sigma_filt, fr.mu_pred, fr.sigma_pred,
        fr.A, fr.B, fr.C, fr.aux,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(15,))
def _lstm_filter_core(
    y, u, mask, A_bank, B_bank, C_bank, wi, wh, b, head_w, head_b,
    Q, mu0, sigma0, R, interpret,
):
    return _lstm_filter_pallas_raw(
        y, u, mask, A_bank, B_bank, C_bank, wi, wh, b, head_w, head_b,
        Q, mu0, sigma0, R, interpret=interpret,
    )


def _core_fwd(y, u, mask, A_bank, B_bank, C_bank, wi, wh, b, head_w, head_b,
              Q, mu0, sigma0, R, interpret):
    out = _lstm_filter_pallas_raw(
        y, u, mask, A_bank, B_bank, C_bank, wi, wh, b, head_w, head_b,
        Q, mu0, sigma0, R, interpret=interpret,
    )
    return out, (y, u, mask, A_bank, B_bank, C_bank, wi, wh, b, head_w,
                 head_b, Q, mu0, sigma0, R)


def _core_bwd(interpret, residuals, cotangents):
    _, vjp = jax.vjp(_coupled_scan_raw, *residuals)
    return vjp(cotangents)


_lstm_filter_core.defvjp(_core_fwd, _core_bwd)


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def lstm_filter_pallas(
    y: jax.Array,
    u: jax.Array,
    mask: Optional[jax.Array],
    params: LGSSMParams,
    A_bank: jax.Array, B_bank: jax.Array, C_bank: jax.Array,
    lstm_params: dict, head_w: jax.Array, head_b: jax.Array,
    interpret: Optional[bool] = None,
) -> FilterResult:
    """Fused coupled alpha-LSTM masked filter; output contract matches
    ops/lgssm.lgssm_filter's step_dynamics path (aux = alpha [B,T,K])."""
    batch, T, _ = y.shape
    if mask is None:
        mask = jnp.ones((batch, T), dtype=y.dtype)
    if interpret is None:
        interpret = _default_interpret()
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    muf, sigf, mup, sigp, As, Bs, Cs, alpha = _lstm_filter_core(
        f32(y), f32(u), f32(mask), f32(A_bank), f32(B_bank), f32(C_bank),
        f32(lstm_params["wi"]), f32(lstm_params["wh"]), f32(lstm_params["b"]),
        f32(head_w), f32(head_b),
        f32(params.Q), f32(params.mu0), f32(params.sigma0), f32(params.R),
        interpret,
    )
    n = A_bank.shape[-1]
    Qs = jnp.broadcast_to(params.Q, (batch, T, n, n))
    return FilterResult(
        mu_filt=muf, sigma_filt=sigf, mu_pred=mup, sigma_pred=sigp,
        A=As, B=Bs, C=Cs, Q=Qs, aux=alpha,
    )


def lgssm_smooth_lstm_pallas(
    y: jax.Array,
    u: jax.Array,
    mask: Optional[jax.Array],
    params: LGSSMParams,
    A_bank: jax.Array, B_bank: jax.Array, C_bank: jax.Array,
    lstm_params: dict, head_w: jax.Array, head_b: jax.Array,
    interpret: Optional[bool] = None,
) -> SmoothResult:
    """Fused coupled filter + Pallas RTS smoother (the imputation hot path:
    KVAE.impute with dynamics_model='lstm')."""
    fr = lstm_filter_pallas(
        y, u, mask, params, A_bank, B_bank, C_bank,
        lstm_params, head_w, head_b, interpret=interpret,
    )
    if interpret is None:
        interpret = _default_interpret()
    mu_s, sig_s = _rts_pallas_core(
        fr.mu_filt, fr.sigma_filt, fr.mu_pred, fr.sigma_pred, fr.A, interpret
    )
    return SmoothResult(mu_smooth=mu_s, sigma_smooth=sig_s, filter_result=fr)
