"""Linear-Gaussian state-space model core: masked Kalman filter, RTS smoother,
ELBO, and free-running generation — all as `lax.scan` programs that fuse into a
single XLA computation (no per-timestep Python, no host round-trips).

Reference parity (math, not code):
  - filter step        <- reference kvae/kalman/kalman_filter.py:31-104
    (predict; innovation with symmetrized S; gain via solve, never inverse;
     missing frames handled by zeroing the Kalman gain, :92;
     Joseph-form covariance update + symmetrization, :99-101)
  - filter loop        <- kalman_filter.py:107-201 (Python loop over T there,
    one `lax.scan` here; LSTM-mode pseudo-observation feedback
    y_for_dyn = m*y + (1-m)*C mu_pred, :183-185, zeros at t=0, :142)
  - RTS smoother       <- kalman_filter.py:204-279 (backward Python loop there,
    reverse `lax.scan` here)
  - ELBO               <- kalman_filter.py:305-401 (rsample from smoothed
    posterior; transition term via the zero-mean trick log p(z_t - mu_trans);
    masked emission term; init term; switching prior/posterior terms; entropy;
    normalized by observed-frame count clamped >= 1)
  - generation         <- restores the `generate_sample` rollout capability the
    reference lost (still invoked by its kvae/kalman/test_optim.py:211,270 but
    deleted from KalmanFilter) as `lgssm_generate`.

Shapes: B batch, T time, n state dim, p observation dim, m control dim.
All LGSSM numerics are float32 (tiny matrices; PSD-ness binds, not FLOPs).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from kvae_tpu.ops.precision import einsum
from kvae_tpu.ops.linalg import solve_small

from kvae_tpu.ops.gaussian import (
    mvn_logpdf_chol,
    mvn_sample_chol,
    safe_cholesky,
    symmetrize,
)


class LGSSMParams(NamedTuple):
    """Static (per-model) filter parameters."""

    mu0: jax.Array     # [n]  initial state mean
    sigma0: jax.Array  # [n,n] initial state covariance
    R: jax.Array       # [p,p] observation noise covariance (fixed)
    Q: jax.Array       # [n,n] default process noise covariance (fixed; may be
    #                     overridden per-step by sequence dynamics)


class SequenceDynamics(NamedTuple):
    """Per-timestep dynamics matrices, precomputed for the whole sequence
    (the switching / K=1 path: reference kalman_filter.py:135-139)."""

    A: jax.Array  # [B,T,n,n]
    B: jax.Array  # [B,T,n,m]
    C: jax.Array  # [B,T,p,n]
    Q: jax.Array  # [B,T,n,n]


class FilterResult(NamedTuple):
    mu_filt: jax.Array      # [B,T,n]
    sigma_filt: jax.Array   # [B,T,n,n]
    mu_pred: jax.Array      # [B,T,n]
    sigma_pred: jax.Array   # [B,T,n,n]
    A: jax.Array            # [B,T,n,n]
    B: jax.Array            # [B,T,n,m]
    C: jax.Array            # [B,T,p,n]
    Q: jax.Array            # [B,T,n,n]
    aux: Optional[jax.Array]  # e.g. alpha mixture weights [B,T,K] (LSTM mode)


class SmoothResult(NamedTuple):
    mu_smooth: jax.Array     # [B,T,n]
    sigma_smooth: jax.Array  # [B,T,n,n]
    filter_result: FilterResult


def _predict(mu, sigma, A, B, u, Q):
    mu_pred = einsum("bij,bj->bi", A, mu) + einsum("bij,bj->bi", B, u)
    sigma_pred = einsum("bij,bjk,blk->bil", A, sigma, A) + Q
    return mu_pred, sigma_pred


def _update(mu_pred, sigma_pred, y, mask, C, R, eye_n):
    """Masked measurement update. Returns (mu, sigma, y_hat)."""
    y_hat = einsum("bpn,bn->bp", C, mu_pred)
    resid = y - y_hat
    S = einsum("bpn,bnm,bqm->bpq", C, sigma_pred, C) + R
    S = symmetrize(S)
    PCt = einsum("bnm,bpm->bnp", sigma_pred, C)
    # gain via solve (reference :82-89); solve(S, PCt^T)^T
    gain = jnp.swapaxes(solve_small(S, jnp.swapaxes(PCt, -1, -2)), -1, -2)
    gain = mask[:, None, None] * gain  # zero gain on missing frames (:92)
    mu = mu_pred + einsum("bnp,bp->bn", gain, resid)
    i_kc = eye_n - einsum("bnp,bpm->bnm", gain, C)
    sigma = (
        einsum("bij,bjk,blk->bil", i_kc, sigma_pred, i_kc)
        + einsum("bip,pq,bjq->bij", gain, R, gain)
    )
    return mu, symmetrize(sigma), y_hat


def filter_step(mu, sigma, y, u, mask, A, B, C, Q, R, eye_n):
    """One masked Kalman filter step (predict + update).

    Mirrors reference kalman_filter.py:31-104 exactly.
    Returns (mu_t|t, sigma_t|t, mu_t|t-1, sigma_t|t-1, y_hat_t).
    """
    mu_pred, sigma_pred = _predict(mu, sigma, A, B, u, Q)
    mu_new, sigma_new, y_hat = _update(mu_pred, sigma_pred, y, mask, C, R, eye_n)
    return mu_new, sigma_new, mu_pred, sigma_pred, y_hat


# ---------------------------------------------------------------------------
# Filter over a whole sequence
# ---------------------------------------------------------------------------

# A step-dynamics callback computes the dynamics matrices for the *current*
# step from its own carry and the previous step's pseudo-observation feedback:
#   (dyn_carry, y_for_dyn [B,p]) -> (dyn_carry', (A,B,C,Q, aux))
StepDynamicsFn = Callable[..., Tuple]


def lgssm_filter(
    y: jax.Array,
    u: jax.Array,
    mask: Optional[jax.Array],
    params: LGSSMParams,
    dynamics: SequenceDynamics | None = None,
    step_dynamics: StepDynamicsFn | None = None,
    step_dynamics_carry=None,
    return_carry: bool = False,
) -> FilterResult:
    """Masked Kalman filter over [B,T] sequences, as one `lax.scan`.

    Exactly one of `dynamics` (whole-sequence matrices) or `step_dynamics`
    (per-step callback, for the LSTM-alpha network whose input is the filter's
    own masked prediction feedback — the two recursions are inseparable,
    reference kalman_filter.py:159,183-185) must be provided.

    `return_carry=True` (step-dynamics path only) additionally returns the
    final scan carry `(mu, sigma, dyn_carry, y_for_dyn_next)` — the state a
    closed-loop rollout continues from (KVAE.generate(closed_loop=True)).
    """
    batch, T, p = y.shape
    n = params.mu0.shape[0]
    dtype = y.dtype
    if mask is None:
        mask = jnp.ones((batch, T), dtype=dtype)
    mask = mask.astype(dtype)
    eye_n = jnp.eye(n, dtype=dtype)
    R = params.R.astype(dtype)

    mu0 = jnp.broadcast_to(params.mu0, (batch, n)).astype(dtype)
    sigma0 = jnp.broadcast_to(params.sigma0, (batch, n, n)).astype(dtype)

    y_t = jnp.swapaxes(y, 0, 1)        # [T,B,p]
    u_t = jnp.swapaxes(u, 0, 1)        # [T,B,m]
    m_t = jnp.swapaxes(mask, 0, 1)     # [T,B]

    if dynamics is not None:
        if return_carry:
            raise ValueError(
                "return_carry is only meaningful on the step_dynamics path"
            )
        A_t = jnp.swapaxes(dynamics.A, 0, 1)
        B_t = jnp.swapaxes(dynamics.B, 0, 1)
        C_t = jnp.swapaxes(dynamics.C, 0, 1)
        Q_t = jnp.swapaxes(dynamics.Q, 0, 1)

        def body(carry, xs):
            mu, sigma = carry
            yt, ut, mt, A, B, C, Q = xs
            mu_new, sigma_new, mu_pred, sigma_pred, _ = filter_step(
                mu, sigma, yt, ut, mt, A, B, C, Q, R, eye_n
            )
            return (mu_new, sigma_new), (mu_new, sigma_new, mu_pred, sigma_pred)

        (_, _), outs = jax.lax.scan(
            body, (mu0, sigma0), (y_t, u_t, m_t, A_t, B_t, C_t, Q_t)
        )
        mu_f, sig_f, mu_p, sig_p = outs
        return FilterResult(
            mu_filt=jnp.swapaxes(mu_f, 0, 1),
            sigma_filt=jnp.swapaxes(sig_f, 0, 1),
            mu_pred=jnp.swapaxes(mu_p, 0, 1),
            sigma_pred=jnp.swapaxes(sig_p, 0, 1),
            A=dynamics.A, B=dynamics.B, C=dynamics.C, Q=dynamics.Q,
            aux=None,
        )

    if step_dynamics is None:
        raise ValueError("provide either `dynamics` or `step_dynamics`")

    y_for_dyn0 = jnp.zeros((batch, p), dtype=dtype)  # reference :142

    def body(carry, xs):
        mu, sigma, dyn_carry, y_for_dyn = carry
        yt, ut, mt = xs
        dyn_carry, (A, B, C, Q, aux) = step_dynamics(dyn_carry, y_for_dyn)
        mu_new, sigma_new, mu_pred, sigma_pred, y_hat = filter_step(
            mu, sigma, yt, ut, mt, A, B, C, Q, R, eye_n
        )
        # Pseudo-observation feedback for the next step's dynamics net
        # (reference :183-185)
        m_col = mt[:, None]
        y_next = m_col * yt + (1.0 - m_col) * y_hat
        return (mu_new, sigma_new, dyn_carry, y_next), (
            mu_new, sigma_new, mu_pred, sigma_pred, A, B, C, Q, aux,
        )

    init = (mu0, sigma0, step_dynamics_carry, y_for_dyn0)
    final_carry, outs = jax.lax.scan(body, init, (y_t, u_t, m_t))
    mu_f, sig_f, mu_p, sig_p, A_s, B_s, C_s, Q_s, aux = outs
    swap = lambda a: jnp.swapaxes(a, 0, 1)
    fr = FilterResult(
        mu_filt=swap(mu_f), sigma_filt=swap(sig_f),
        mu_pred=swap(mu_p), sigma_pred=swap(sig_p),
        A=swap(A_s), B=swap(B_s), C=swap(C_s), Q=swap(Q_s),
        aux=jax.tree.map(swap, aux),
    )
    if return_carry:
        return fr, final_carry
    return fr


# ---------------------------------------------------------------------------
# RTS smoother
# ---------------------------------------------------------------------------

def lgssm_smooth_from_filter(fr: FilterResult) -> SmoothResult:
    """Rauch-Tung-Striebel smoother as a reverse `lax.scan` over the filter
    outputs (reference kalman_filter.py:204-279)."""
    swap = lambda a: jnp.swapaxes(a, 0, 1)
    mu_last = fr.mu_filt[:, -1]
    sig_last = fr.sigma_filt[:, -1]

    xs = (
        swap(fr.mu_filt[:, :-1]),      # mu_t|t           t = 0..T-2
        swap(fr.sigma_filt[:, :-1]),   # sigma_t|t
        swap(fr.mu_pred[:, 1:]),       # mu_t+1|t
        swap(fr.sigma_pred[:, 1:]),    # sigma_t+1|t
        swap(fr.A[:, 1:]),             # A_t+1
    )

    def body(carry, x):
        mu_next_T, sig_next_T = carry
        mu_f, sig_f, mu_p_next, sig_p_next, A_next = x
        # J = solve(sigma_pred^T, (sigma_filt A^T)^T)^T  (reference :229)
        sig_at = einsum("bij,bkj->bik", sig_f, A_next)  # sigma_f @ A^T
        J = jnp.swapaxes(
            solve_small(jnp.swapaxes(sig_p_next, -1, -2), jnp.swapaxes(sig_at, -1, -2)),
            -1, -2,
        )
        mu_s = mu_f + einsum("bij,bj->bi", J, mu_next_T - mu_p_next)
        sig_s = sig_f + einsum(
            "bij,bjk,blk->bil", J, sig_next_T - sig_p_next, J
        )
        sig_s = symmetrize(sig_s)
        return (mu_s, sig_s), (mu_s, sig_s)

    _, (mu_s, sig_s) = jax.lax.scan(body, (mu_last, sig_last), xs, reverse=True)
    mu_smooth = jnp.concatenate([swap(mu_s), fr.mu_filt[:, -1:]], axis=1)
    sigma_smooth = jnp.concatenate([swap(sig_s), fr.sigma_filt[:, -1:]], axis=1)
    return SmoothResult(mu_smooth=mu_smooth, sigma_smooth=sigma_smooth, filter_result=fr)


def lgssm_smooth(
    y: jax.Array,
    u: jax.Array,
    mask: Optional[jax.Array],
    params: LGSSMParams,
    dynamics: SequenceDynamics | None = None,
    step_dynamics: StepDynamicsFn | None = None,
    step_dynamics_carry=None,
) -> SmoothResult:
    """Filter then RTS-smooth (reference kalman_filter.py:240-279)."""
    fr = lgssm_filter(
        y, u, mask, params,
        dynamics=dynamics,
        step_dynamics=step_dynamics,
        step_dynamics_carry=step_dynamics_carry,
    )
    return lgssm_smooth_from_filter(fr)


# ---------------------------------------------------------------------------
# ELBO
# ---------------------------------------------------------------------------

def lgssm_elbo(
    key: jax.Array,
    sr: SmoothResult,
    y: jax.Array,
    u: jax.Array,
    params: LGSSMParams,
    mask: Optional[jax.Array] = None,
    log_q_extra: Optional[jax.Array] = None,  # [B,T] switching posterior terms
    log_p_extra: Optional[jax.Array] = None,  # [B,T] switching prior terms
) -> jax.Array:
    """Single-sample LGSSM ELBO (reference kalman_filter.py:305-401).

    E_q[ log p(z_1) + sum log p(z_t|z_{t-1},u_t) + sum_obs log p(y_t|z_t)
         + log p(s) - log q(s) - log q(z) ] / (#observed frames)
    with z ~ q (reparameterized single sample) and masked emission terms.
    """
    batch, T, p = y.shape
    dtype = y.dtype
    if mask is None:
        mask = jnp.ones((batch, T), dtype=dtype)
    mask = mask.astype(dtype)
    fr = sr.filter_result

    # Reparameterized sample from the smoothed posterior (reference :348-351)
    L = safe_cholesky(sr.sigma_smooth)
    z = mvn_sample_chol(key, sr.mu_smooth, L)  # [B,T,n]

    # Transition term: zero-mean MVN trick log p(z_t - mu_trans; 0, Q_t)
    mu_trans = (
        einsum("btij,btj->bti", fr.A[:, 1:], z[:, :-1])
        + einsum("btij,btj->bti", fr.B[:, 1:], u[:, 1:])
    )
    L_Q = safe_cholesky(fr.Q[:, 1:])
    log_trans = mvn_logpdf_chol(z[:, 1:] - mu_trans, 0.0, L_Q)  # [B,T-1]

    # Emission term, masked (reference :371-377)
    mu_emiss = einsum("btpn,btn->btp", fr.C, z)
    L_R = jnp.linalg.cholesky(params.R.astype(dtype))
    log_emiss = mvn_logpdf_chol(y - mu_emiss, 0.0, L_R) * mask  # [B,T]

    # Initial term (reference :380-381)
    L0 = jnp.linalg.cholesky(params.sigma0.astype(dtype))
    log_init = mvn_logpdf_chol(z[:, 0], params.mu0.astype(dtype), L0)  # [B]

    # Entropy of the smoothed posterior at the sample (reference :389)
    entropy = -mvn_logpdf_chol(z, sr.mu_smooth, L)  # [B,T]

    if log_q_extra is None:
        log_q_extra = jnp.zeros((batch, T), dtype=dtype)
    if log_p_extra is None:
        log_p_extra = jnp.zeros((batch, T), dtype=dtype)

    num_el = jnp.clip(jnp.sum(mask), min=1.0)
    return (
        jnp.sum(log_trans)
        + jnp.sum(log_emiss)
        + jnp.sum(log_init)
        + jnp.sum(log_p_extra)
        - jnp.sum(log_q_extra)
        + jnp.sum(entropy)
    ) / num_el


# ---------------------------------------------------------------------------
# Generation / rollout (restored capability)
# ---------------------------------------------------------------------------

def lgssm_generate(
    key: jax.Array,
    mu_init: jax.Array,       # [B,n] posterior mean to roll from
    sigma_init: jax.Array,    # [B,n,n] posterior covariance
    A: jax.Array,             # [B,S,n,n] dynamics for the S generated steps
    B: jax.Array,             # [B,S,n,m]
    C: jax.Array,             # [B,S,p,n]
    Q: jax.Array,             # [B,S,n,n]
    u: jax.Array,             # [B,S,m]
    R: Optional[jax.Array] = None,  # [p,p]; observation noise if sampling a
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Free-run the LDS forward from a (filtered/smoothed) posterior.

    Restores the reference's deleted `generate_sample` capability
    (kvae/kalman/test_optim.py:211-216): warm up a posterior with the filter,
    then roll z_{t+1} = A z_t + B u_{t+1} (+ N(0,Q) if sampling) and emit
    a_t = C z_t (+ N(0,R) if sampling).

    Returns (z_seq [B,S,n], a_seq [B,S,p]).
    """
    batch, S = A.shape[:2]
    n = mu_init.shape[-1]
    dtype = mu_init.dtype
    key_z0, key_roll = jax.random.split(key)

    if deterministic:
        z0 = mu_init
    else:
        z0 = mvn_sample_chol(key_z0, mu_init, safe_cholesky(sigma_init))

    swap = lambda a: jnp.swapaxes(a, 0, 1)
    L_Q = safe_cholesky(Q) if not deterministic else jnp.zeros_like(Q)
    noise_keys = jax.random.split(key_roll, S)
    xs = (swap(A), swap(B), swap(C), swap(L_Q), swap(u), noise_keys)

    def body(z, x):
        A_t, B_t, C_t, LQ_t, u_t, k = x
        z_next = einsum("bij,bj->bi", A_t, z) + einsum("bij,bj->bi", B_t, u_t)
        if not deterministic:
            z_next = z_next + einsum(
                "bij,bj->bi", LQ_t, jax.random.normal(k, (batch, n), dtype=dtype)
            )
        a_t = einsum("bpn,bn->bp", C_t, z_next)
        return z_next, (z_next, a_t)

    _, (z_seq, a_seq) = jax.lax.scan(body, z0, xs)
    z_seq, a_seq = swap(z_seq), swap(a_seq)
    if not deterministic and R is not None:
        L_R = jnp.linalg.cholesky(R.astype(dtype))
        key_obs = jax.random.fold_in(key, 1)
        a_seq = a_seq + einsum(
            "pq,btq->btp", L_R, jax.random.normal(key_obs, a_seq.shape, dtype=dtype)
        )
    return z_seq, a_seq
