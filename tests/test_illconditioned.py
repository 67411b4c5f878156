"""Adversarial ill-conditioned dynamics: solvers and filter engines must
stay finite and agree, forward AND gradient.

Reproduces the failure class found on real TPU during round 1: a near-zero
leading pivot in a Gauss-Jordan solve goes denormal, TPU flush-to-zero turns
it into exactly 0, and one bad batch lane NaN-poisons the whole fused
program (PARITY.md, scaling-step row). The scan path was fixed with
branchless partial pivoting in ops/linalg.py `solve_small`; the Pallas
kernels share `_ge_solve` (ops/pallas_kf.py), which this file guards.

Layering (Pallas interpret mode costs ~30 s per kernel call, so the sharp
checks run OUTSIDE the kernels):
  - fast: `_ge_solve`/`_ge_inv` called directly on tile lists (they are pure
    jnp) against numpy LU, including exact-zero and denormal leading pivots;
    and scan vs assoc engine agreement on an adversarial system at n=8.
  - slow: the same adversarial system through the real Pallas kernels in
    interpret mode, forward + adjoint gradients vs scan VJP.
A real-TPU spot check of the B=128/T=100/n=8 shape is recorded in PARITY.md.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvae_tpu.ops.assoc import lgssm_smooth_assoc
from kvae_tpu.ops.lgssm import lgssm_smooth
from kvae_tpu.ops.pallas_kf import _ge_inv, _ge_solve, lgssm_smooth_pallas
from kvae_tpu.ops.pallas_kf_bwd import lgssm_smooth_pallas_adjoint
from tests.test_lgssm import _params, _to_seq_dynamics


# ---------------------------------------------------------------------------
# Unit: the shared Gauss-Jordan tile solver
# ---------------------------------------------------------------------------

def _tiles_from_dense(M):
    """[B,k,k] dense -> [k][k] list-of-tiles (tile = the batch vector)."""
    k = M.shape[-1]
    return [[jnp.asarray(M[:, i, j]) for j in range(k)] for i in range(k)]


def _dense_from_tiles(cols_as_rows):
    return np.stack(
        [np.stack([np.asarray(v) for v in row], -1) for row in cols_as_rows], -2
    )


def _assert_scaled_close(got, want, rtol, atol_frac):
    """allclose with a per-batch-element atol = atol_frac * max|want|
    (assert_allclose only takes scalar atol)."""
    scale = np.abs(want).max(axis=(-2, -1), keepdims=True)
    err = np.abs(got - want)
    bound = atol_frac * scale + rtol * np.abs(want)
    worst = (err - bound).max()
    assert np.all(err <= bound), (
        f"max excess error {worst:.3e} (rtol={rtol}, atol_frac={atol_frac})"
    )


def _evil_matrices(rng, batch, k):
    """Invertible systems with adversarial pivots in random lanes."""
    M = rng.normal(size=(batch, k, k)).astype(np.float64)
    M += 2.0 * np.eye(k)
    # lane 0: exact-zero leading pivot (needs a row swap)
    M[0, 0, 0] = 0.0
    M[0, 0, 1] = M[0, 1, 0] = 1.0
    # lane 1: denormal leading pivot (TPU flushes to 0; CPU nearly so)
    M[1, 0, 0] = 1e-40
    # lane 2: indefinite 2x2 swap block, tiny diagonal
    M[2, :2, :2] = [[1e-12, 1.0], [1.0, 1e-12]]
    # lane 3: badly scaled rows
    M[3, 0] *= 1e-6
    M[3, 1] *= 1e6
    return M


@pytest.mark.parametrize("k", [2, 4, 8])
def test_ge_solve_pivots_evil_systems(rng, k):
    batch = 16
    M = _evil_matrices(rng, batch, k)
    b = rng.normal(size=(batch, k, 3))
    want = np.linalg.solve(M, b)  # float64 pivoted LU oracle

    M32, b32 = M.astype(np.float32), b.astype(np.float32)
    Mt = _tiles_from_dense(M32)
    bs = [[jnp.asarray(b32[:, i, r]) for i in range(k)] for r in range(3)]
    xs = _ge_solve(Mt, bs, k)
    got = np.stack(
        [np.stack([np.asarray(v) for v in x], -1) for x in xs], -1
    )  # [B,k,nrhs]
    assert np.all(np.isfinite(got)), "solver produced non-finite values"
    _assert_scaled_close(got, want, rtol=2e-4, atol_frac=2e-5)


def test_ge_inv_evil_systems(rng):
    k, batch = 4, 8
    M = _evil_matrices(rng, batch, k)
    want = np.linalg.inv(M)
    inv_t = _ge_inv(_tiles_from_dense(M.astype(np.float32)), k)
    got = _dense_from_tiles(inv_t)
    assert np.all(np.isfinite(got))
    _assert_scaled_close(got, want, rtol=2e-4, atol_frac=2e-5)


def test_ge_solve_flush_to_zero_pivot(rng):
    """The exact TPU failure: leading pivot EXACTLY 0 (flushed denormal).
    Pivot-free elimination divides by it -> inf/NaN; pivoting must not."""
    k = 4
    M = np.eye(k, dtype=np.float32)[None].repeat(8, 0)
    M[:, 0, 0] = 0.0
    M[:, 0, 1] = M[:, 1, 0] = 1.0  # row swap fixes it; det = -1
    b = rng.normal(size=(8, k)).astype(np.float32)
    xs = _ge_solve(
        _tiles_from_dense(M), [[jnp.asarray(b[:, i]) for i in range(k)]], k
    )
    got = np.stack([np.asarray(v) for v in xs[0]], -1)
    want = np.linalg.solve(M, b[..., None])[..., 0]
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Adversarial LGSSM (shared by the engine tests)
# ---------------------------------------------------------------------------

def _adversarial_lgssm(rng, batch, T, n=8, p=2, m=4, n_evil=3):
    """Random LGSSM with injected near-singular-pivot / indefinite steps:
    at evil timesteps A_t ~ 0 and Q_t has a ~0 leading diagonal with O(1)
    off-diagonals, so sigma_pred ~ Q_t and the RTS solve hits the bad pivot;
    elsewhere spectral radius ~1.04 (drifting, as mid-training learned A)."""
    A = rng.normal(size=(T, n, n)) * 0.25 + np.eye(n)
    for t in range(T):
        rho = np.max(np.abs(np.linalg.eigvals(A[t])))
        A[t] = A[t] / (rho + 1e-6) * 1.04
    B = rng.normal(size=(T, n, m)) * 0.1
    C = rng.normal(size=(T, p, n)) * 0.5
    Q = np.stack([np.eye(n) * 0.02] * T)

    evil_q = np.eye(n)
    evil_q[0, 0] = evil_q[1, 1] = 1e-12
    evil_q[0, 1] = evil_q[1, 0] = 1.0
    for t in np.linspace(T // 3, T - 2, n_evil).astype(int):
        Q[t] = evil_q
        A[t] = A[t] * 1e-4
    R = np.eye(p) * 0.03
    y = rng.normal(size=(batch, T, p)).astype(np.float32)
    u = rng.normal(size=(batch, T, m)).astype(np.float32) * 0.1
    return dict(
        A=A, B=B, C=C, Q=Q, R=R, mu0=np.zeros(n), P0=np.eye(n) * 5.0, y=y, u=u
    )


def _loss(sr):
    fr = sr.filter_result
    return (
        jnp.mean(sr.mu_smooth ** 2)
        + 0.5 * jnp.mean(sr.sigma_smooth ** 2)
        + 0.3 * jnp.mean(fr.mu_filt ** 2)
    )


def _assert_close(name, got, want, rtol, atol):
    g, w = np.asarray(got), np.asarray(want)
    assert np.all(np.isfinite(g)), f"{name}: non-finite values"
    np.testing.assert_allclose(g, w, rtol=rtol, atol=atol, err_msg=name)


@pytest.mark.slow  # grads through the assoc combine chain compile for
# minutes on CPU; the non-adversarial assoc equivalence gates stay fast and
# the real-TPU adversarial spot check is recorded in PARITY.md
def test_illconditioned_scan_vs_assoc(rng):
    """n=8 routes the scan path's solves through solve_small; assoc builds
    the non-symmetric I + C J elements that first exposed the pivot bug."""
    s = _adversarial_lgssm(rng, batch=8, T=16)
    params, dyn = _params(s), _to_seq_dynamics(s, 8)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])

    def loss_fn(smooth_fn):
        def f(args):
            d = dyn._replace(A=args["A"], C=args["C"], Q=args["Q"])
            sr = smooth_fn(args["y"], u, None, params, dynamics=d)
            return _loss(sr)
        return f

    args = {"y": y, "A": dyn.A, "C": dyn.C, "Q": dyn.Q}
    val_s, g_scan = jax.value_and_grad(loss_fn(lgssm_smooth))(args)
    val_a, g_assoc = jax.value_and_grad(loss_fn(lgssm_smooth_assoc))(args)
    assert np.isfinite(float(val_s)) and np.isfinite(float(val_a))
    np.testing.assert_allclose(float(val_a), float(val_s), rtol=1e-3)
    # Measured against a float64 scan oracle on this system: scan32 grads are
    # ~1e-6 of scale for ALL inputs; assoc32 matches except the Q-gradient at
    # the evil (indefinite, ~0-pivot) steps, which carries ~2e-2 of scale —
    # a real fp32 limitation of the parallel-in-time VJP on adversarial
    # inputs, bounded and finite, documented in ops/assoc.py.
    tol = {"y": 2e-3, "A": 2e-3, "C": 2e-3, "Q": 5e-2}
    for k in args:
        ref = np.asarray(g_scan[k])
        assert np.all(np.isfinite(ref)), f"scan grad[{k}] non-finite"
        scale = np.abs(ref).max() + 1e-8
        _assert_close(f"assoc grad[{k}]", g_assoc[k], ref, 2e-2, tol[k] * scale)


@pytest.mark.slow
def test_illconditioned_pallas_engines(rng):
    """The adversarial system through the real Pallas kernels (interpret
    mode), forward + adjoint gradients vs scan VJP, at n=8 where `_ge_solve`
    elimination runs deep enough to need the pivot search."""
    s = _adversarial_lgssm(rng, batch=8, T=10)
    params, dyn = _params(s), _to_seq_dynamics(s, 8)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])

    ref = lgssm_smooth(y, u, None, params, dynamics=dyn)
    pal = lgssm_smooth_pallas(y, u, None, params, dynamics=dyn, interpret=True)
    sig_scale = float(np.abs(np.asarray(ref.sigma_smooth)).max())
    _assert_close("pallas.mu_smooth", pal.mu_smooth, ref.mu_smooth, 5e-3, 1e-3)
    _assert_close(
        "pallas.sigma_smooth", pal.sigma_smooth, ref.sigma_smooth,
        5e-3, 1e-4 * sig_scale,
    )
    _assert_close(
        "pallas.mu_filt", pal.filter_result.mu_filt,
        ref.filter_result.mu_filt, 5e-3, 1e-3,
    )

    def loss_fn(smooth_fn, **kw):
        def f(args):
            d = dyn._replace(A=args["A"], Q=args["Q"])
            sr = smooth_fn(args["y"], u, None, params, dynamics=d, **kw)
            return _loss(sr)
        return f

    args = {"y": y, "A": dyn.A, "Q": dyn.Q}
    val_s, g_scan = jax.value_and_grad(loss_fn(lgssm_smooth))(args)
    val_a, g_adj = jax.value_and_grad(
        loss_fn(lgssm_smooth_pallas_adjoint, interpret=True)
    )(args)
    assert np.isfinite(float(val_a))
    np.testing.assert_allclose(float(val_a), float(val_s), rtol=1e-3)
    for k in args:
        refg = np.asarray(g_scan[k])
        scale = np.abs(refg).max() + 1e-8
        _assert_close(f"adjoint grad[{k}]", g_adj[k], refg, 2e-2, 2e-3 * scale)
