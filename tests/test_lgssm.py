"""Closed-form correctness tests for the LGSSM core.

Turns the reference's manual rocket validation scripts
(reference kvae/kalman/test_filter.py, test_optim.py — matplotlib demos, not
asserting tests) into real assertions, plus an independent textbook numpy
implementation as oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvae_tpu.ops.lgssm import (
    LGSSMParams,
    SequenceDynamics,
    lgssm_elbo,
    lgssm_filter,
    lgssm_generate,
    lgssm_smooth,
)


# ---------------------------------------------------------------------------
# Independent numpy oracle (textbook Kalman filter + RTS smoother)
# ---------------------------------------------------------------------------

def np_kalman(y, u, A, B, C, Q, R, mu0, P0, mask=None):
    T, p = y.shape
    n = mu0.shape[0]
    mask = np.ones(T) if mask is None else mask
    mu, P = mu0.copy(), P0.copy()
    mus_f, Ps_f, mus_p, Ps_p = [], [], [], []
    for t in range(T):
        At, Bt, Ct, Qt = A[t], B[t], C[t], Q[t]
        mu_p = At @ mu + Bt @ u[t]
        P_p = At @ P @ At.T + Qt
        S = Ct @ P_p @ Ct.T + R
        K = P_p @ Ct.T @ np.linalg.inv(S)
        K = mask[t] * K
        mu = mu_p + K @ (y[t] - Ct @ mu_p)
        ikc = np.eye(n) - K @ Ct
        P = ikc @ P_p @ ikc.T + K @ R @ K.T
        mus_f.append(mu); Ps_f.append(P); mus_p.append(mu_p); Ps_p.append(P_p)
    mus_f, Ps_f = np.array(mus_f), np.array(Ps_f)
    mus_p, Ps_p = np.array(mus_p), np.array(Ps_p)
    # RTS
    mus_s, Ps_s = mus_f.copy(), Ps_f.copy()
    for t in range(T - 2, -1, -1):
        J = Ps_f[t] @ A[t + 1].T @ np.linalg.inv(Ps_p[t + 1])
        mus_s[t] = mus_f[t] + J @ (mus_s[t + 1] - mus_p[t + 1])
        Ps_s[t] = Ps_f[t] + J @ (Ps_s[t + 1] - Ps_p[t + 1]) @ J.T
    return mus_f, Ps_f, mus_p, Ps_p, mus_s, Ps_s


def _random_lgssm(rng, batch=3, T=15, n=4, p=2, m=4, time_varying=True):
    def stable(k):
        a = rng.normal(size=(k, n, n)) * 0.3 + np.eye(n)
        # scale to spectral radius < 1
        for i in range(k):
            rho = np.max(np.abs(np.linalg.eigvals(a[i])))
            a[i] = a[i] / (rho + 1e-6) * 0.95
        return a

    reps = T if time_varying else 1
    A = stable(reps)
    B = rng.normal(size=(reps, n, m)) * 0.1
    C = rng.normal(size=(reps, p, n)) * 0.5
    Q = np.stack([np.eye(n) * 0.02] * reps)
    if not time_varying:
        A, B, C, Q = (np.repeat(x, T, axis=0) for x in (A, B, C, Q))
    R = np.eye(p) * 0.03
    mu0 = np.zeros(n)
    P0 = np.eye(n) * 5.0
    y = rng.normal(size=(batch, T, p)).astype(np.float32)
    u = rng.normal(size=(batch, T, m)).astype(np.float32) * 0.1
    return dict(A=A, B=B, C=C, Q=Q, R=R, mu0=mu0, P0=P0, y=y, u=u)


def _to_seq_dynamics(s, batch):
    tile = lambda x: jnp.broadcast_to(
        jnp.asarray(x, jnp.float32), (batch,) + x.shape
    )
    return SequenceDynamics(A=tile(s["A"]), B=tile(s["B"]), C=tile(s["C"]), Q=tile(s["Q"]))


def _params(s):
    return LGSSMParams(
        mu0=jnp.asarray(s["mu0"], jnp.float32),
        sigma0=jnp.asarray(s["P0"], jnp.float32),
        R=jnp.asarray(s["R"], jnp.float32),
        Q=jnp.asarray(s["Q"][0], jnp.float32),
    )


@pytest.mark.parametrize("masked", [False, True])
def test_filter_smoother_match_numpy_oracle(rng, masked):
    s = _random_lgssm(rng)
    batch, T = s["y"].shape[:2]
    mask = None
    np_masks = [None] * batch
    if masked:
        mask_np = (rng.uniform(size=(batch, T)) > 0.3).astype(np.float32)
        mask_np[:, 0] = 1.0
        mask = jnp.asarray(mask_np)
        np_masks = list(mask_np)

    sr = jax.jit(
        lambda y, u, m: lgssm_smooth(y, u, m, _params(s), dynamics=_to_seq_dynamics(s, batch))
    )(jnp.asarray(s["y"]), jnp.asarray(s["u"]), mask)
    fr = sr.filter_result

    for b in range(batch):
        mf, Pf, mp, Pp, ms, Ps = np_kalman(
            s["y"][b].astype(np.float64), s["u"][b].astype(np.float64),
            s["A"], s["B"], s["C"], s["Q"], s["R"], s["mu0"], s["P0"],
            mask=np_masks[b],
        )
        np.testing.assert_allclose(np.asarray(fr.mu_filt)[b], mf, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(fr.sigma_filt)[b], Pf, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(fr.mu_pred)[b], mp, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sr.mu_smooth)[b], ms, rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(sr.sigma_smooth)[b], Ps, rtol=1e-3, atol=2e-4)


def test_rocket_tracking():
    """Constant-velocity rocket (reference kvae/kalman/test_filter.py setup):
    the filter must beat the raw observations and the smoother must not
    increase posterior variance over the filter."""
    dt, g = 0.1, -9.81
    N = 100
    t = np.arange(N) * dt
    std_obs, std_dyn = 2.0, 0.5
    rng = np.random.default_rng(0)

    x = np.zeros((N, 2))
    for k in range(N - 1):
        acc = (20.0 if t[k] < 6.0 else 0.0) + g
        x[k + 1, 0] = x[k, 0] + x[k, 1] * dt + 0.5 * acc * dt * dt
        x[k + 1, 1] = x[k, 1] + acc * dt
    u = (np.r_[(x[1:, 1] - x[:-1, 1]) / dt, 0.0])[:, None]  # specific accel
    y = (x[:, 0] + rng.normal(size=N) * std_obs)[:, None]

    A = np.array([[1.0, dt], [0.0, 1.0]])
    B = np.array([[0.5 * dt * dt], [dt]])
    C = np.array([[1.0, 0.0]])
    params = LGSSMParams(
        mu0=jnp.zeros(2),
        sigma0=jnp.eye(2) * 1.0,
        R=jnp.eye(1) * std_obs**2,
        Q=jnp.eye(2) * std_dyn**2,
    )
    dyn = SequenceDynamics(
        A=jnp.broadcast_to(jnp.asarray(A, jnp.float32), (1, N, 2, 2)),
        B=jnp.broadcast_to(jnp.asarray(B, jnp.float32), (1, N, 2, 1)),
        C=jnp.broadcast_to(jnp.asarray(C, jnp.float32), (1, N, 1, 2)),
        Q=jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32) * std_dyn**2, (1, N, 2, 2)),
    )
    sr = lgssm_smooth(
        jnp.asarray(y[None], jnp.float32), jnp.asarray(u[None], jnp.float32), None, params, dynamics=dyn
    )
    pos_filt = np.asarray(sr.filter_result.mu_filt)[0, :, 0]
    pos_smooth = np.asarray(sr.mu_smooth)[0, :, 0]

    mse_obs = np.mean((y[:, 0] - x[:, 0]) ** 2)
    mse_filt = np.mean((pos_filt - x[:, 0]) ** 2)
    mse_smooth = np.mean((pos_smooth - x[:, 0]) ** 2)
    assert mse_filt < mse_obs
    assert mse_smooth < mse_filt

    var_f = np.asarray(sr.filter_result.sigma_filt)[0, :, 0, 0]
    var_s = np.asarray(sr.sigma_smooth)[0, :, 0, 0]
    assert np.all(var_s <= var_f + 1e-6)


def test_masked_steps_are_pure_prediction(rng):
    s = _random_lgssm(rng, batch=1, T=10)
    y = jnp.asarray(s["y"])
    u = jnp.asarray(s["u"])
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0, 1, 1, 1, 1]], np.float32))
    fr = lgssm_filter(y, u, mask, _params(s), dynamics=_to_seq_dynamics(s, 1))
    # on masked steps the posterior equals the prediction (gain zeroed)
    for t in (3, 4, 5):
        np.testing.assert_allclose(
            np.asarray(fr.mu_filt)[0, t], np.asarray(fr.mu_pred)[0, t], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(fr.sigma_filt)[0, t],
            np.asarray(fr.sigma_pred)[0, t],
            rtol=1e-5, atol=1e-6,
        )
    # uncertainty grows through the gap
    v = np.asarray(fr.sigma_filt)[0, :, 0, 0]
    assert v[5] > v[2]


def test_elbo_finite_and_differentiable(rng):
    s = _random_lgssm(rng, batch=2, T=8)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])
    params = _params(s)
    dyn = _to_seq_dynamics(s, 2)
    mask = jnp.ones((2, 8))

    def loss(A_seq):
        d = dyn._replace(A=A_seq)
        sr = lgssm_smooth(y, u, mask, params, dynamics=d)
        return -lgssm_elbo(jax.random.PRNGKey(0), sr, y, u, params, mask=mask)

    val, grad = jax.value_and_grad(loss)(dyn.A)
    assert np.isfinite(float(val))
    g = np.asarray(grad)
    assert np.all(np.isfinite(g)) and np.any(g != 0)


def test_elbo_mask_excludes_emission(rng):
    """Emission terms on masked frames must not contribute: perturbing a
    masked observation leaves the ELBO's emission sum unchanged (it only
    enters via the encoder in the full model, not the LGSSM ELBO)."""
    s = _random_lgssm(rng, batch=1, T=6)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])
    params = _params(s)
    dyn = _to_seq_dynamics(s, 1)
    mask = jnp.asarray(np.array([[1, 1, 0, 0, 1, 1]], np.float32))
    sr = lgssm_smooth(y, u, mask, params, dynamics=dyn)
    key = jax.random.PRNGKey(3)
    e1 = lgssm_elbo(key, sr, y, u, params, mask=mask)
    y2 = y.at[0, 2].add(100.0)  # masked frame
    e2 = lgssm_elbo(key, sr, y2, u, params, mask=mask)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-6)


def test_generate_deterministic_rollout(rng):
    s = _random_lgssm(rng, batch=2, T=5)
    n, m = 4, 4
    S = 5
    A = jnp.asarray(np.broadcast_to(s["A"], (2, S, n, n)), jnp.float32)
    B = jnp.asarray(np.broadcast_to(s["B"], (2, S, n, m)), jnp.float32)
    C = jnp.asarray(np.broadcast_to(s["C"], (2, S, 2, n)), jnp.float32)
    Q = jnp.asarray(np.broadcast_to(s["Q"], (2, S, n, n)), jnp.float32)
    u = jnp.asarray(s["u"])
    mu = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    sig = jnp.broadcast_to(jnp.eye(n), (2, n, n))

    z_seq, a_seq = lgssm_generate(
        jax.random.PRNGKey(0), mu, sig, A, B, C, Q, u, deterministic=True
    )
    # manual recursion
    z = np.asarray(mu)
    for t in range(S):
        z = np.einsum("bij,bj->bi", np.asarray(A[:, t]), z) + np.einsum(
            "bij,bj->bi", np.asarray(B[:, t]), np.asarray(u[:, t])
        )
        np.testing.assert_allclose(np.asarray(z_seq)[:, t], z, rtol=1e-4, atol=1e-5)
        a = np.einsum("bpn,bn->bp", np.asarray(C[:, t]), z)
        np.testing.assert_allclose(np.asarray(a_seq)[:, t], a, rtol=1e-4, atol=1e-5)


def test_filter_jit_no_retrace_over_batch():
    """The filter must be a single compiled program reusable across calls."""
    s = _random_lgssm(np.random.default_rng(1), batch=4, T=6)
    params = _params(s)
    dyn = _to_seq_dynamics(s, 4)
    f = jax.jit(lambda y, u: lgssm_filter(y, u, None, params, dynamics=dyn))
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])
    r1 = f(y, u)
    r2 = f(y + 0.0, u)
    np.testing.assert_allclose(np.asarray(r1.mu_filt), np.asarray(r2.mu_filt))
