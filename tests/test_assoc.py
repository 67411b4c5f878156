"""Associative-scan (parallel-in-time) filter/smoother must be numerically
equivalent to the sequential scan — including under masking — and
differentiable."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvae_tpu.ops.assoc import lgssm_filter_assoc, lgssm_smooth_assoc
from kvae_tpu.ops.lgssm import (
    LGSSMParams,
    SequenceDynamics,
    lgssm_elbo,
    lgssm_filter,
    lgssm_smooth,
)
from tests.test_lgssm import _params, _random_lgssm, _to_seq_dynamics


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("T", [1, 2, 7, 33])
def test_assoc_filter_equals_sequential(rng, masked, T):
    s = _random_lgssm(rng, batch=2, T=T)
    batch = 2
    params, dyn = _params(s), _to_seq_dynamics(s, batch)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])
    mask = None
    if masked:
        m = (rng.uniform(size=(batch, T)) > 0.4).astype(np.float32)
        mask = jnp.asarray(m)

    fr_seq = lgssm_filter(y, u, mask, params, dynamics=dyn)
    fr_par = lgssm_filter_assoc(y, u, mask, params, dynamics=dyn)
    np.testing.assert_allclose(
        np.asarray(fr_par.mu_filt), np.asarray(fr_seq.mu_filt), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(fr_par.sigma_filt), np.asarray(fr_seq.sigma_filt), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(fr_par.mu_pred), np.asarray(fr_seq.mu_pred), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(fr_par.sigma_pred), np.asarray(fr_seq.sigma_pred), rtol=2e-3, atol=2e-4
    )


@pytest.mark.parametrize("masked", [False, True])
def test_assoc_smoother_equals_sequential(rng, masked):
    T = 15
    s = _random_lgssm(rng, batch=3, T=T)
    params, dyn = _params(s), _to_seq_dynamics(s, 3)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])
    mask = None
    if masked:
        m = np.ones((3, T), np.float32)
        m[:, 5:11] = 0.0
        mask = jnp.asarray(m)

    sr_seq = lgssm_smooth(y, u, mask, params, dynamics=dyn)
    sr_par = lgssm_smooth_assoc(y, u, mask, params, dynamics=dyn)
    np.testing.assert_allclose(
        np.asarray(sr_par.mu_smooth), np.asarray(sr_seq.mu_smooth), rtol=2e-3, atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(sr_par.sigma_smooth), np.asarray(sr_seq.sigma_smooth),
        rtol=2e-3, atol=3e-4,
    )


@pytest.mark.slow
def test_assoc_elbo_matches_sequential(rng):
    s = _random_lgssm(rng, batch=2, T=10)
    params, dyn = _params(s), _to_seq_dynamics(s, 2)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])
    key = jax.random.PRNGKey(0)
    e_seq = lgssm_elbo(key, lgssm_smooth(y, u, None, params, dynamics=dyn), y, u, params)
    e_par = lgssm_elbo(key, lgssm_smooth_assoc(y, u, None, params, dynamics=dyn), y, u, params)
    np.testing.assert_allclose(float(e_seq), float(e_par), rtol=1e-3)


@pytest.mark.slow
def test_assoc_differentiable(rng):
    s = _random_lgssm(rng, batch=2, T=8)
    params, dyn = _params(s), _to_seq_dynamics(s, 2)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])

    def loss(A_seq, smooth_fn):
        sr = smooth_fn(y, u, None, params, dynamics=dyn._replace(A=A_seq))
        return jnp.sum(sr.mu_smooth ** 2)

    g_seq = jax.grad(lambda A: loss(A, lgssm_smooth))(dyn.A)
    g_par = jax.grad(lambda A: loss(A, lgssm_smooth_assoc))(dyn.A)
    assert np.all(np.isfinite(np.asarray(g_par)))
    np.testing.assert_allclose(np.asarray(g_par), np.asarray(g_seq), rtol=5e-3, atol=1e-4)


@pytest.mark.slow
def test_assoc_long_sequence_stability(rng):
    """T=200: the scaling regime this path exists for."""
    s = _random_lgssm(rng, batch=1, T=64)
    # extend to T=200 by tiling dynamics and fresh observations
    T = 200
    reps = -(-T // 64)
    A = np.tile(s["A"], (reps, 1, 1))[:T]
    B = np.tile(s["B"], (reps, 1, 1))[:T]
    C = np.tile(s["C"], (reps, 1, 1))[:T]
    Q = np.tile(s["Q"], (reps, 1, 1))[:T]
    y = rng.normal(size=(1, T, 2)).astype(np.float32)
    u = rng.normal(size=(1, T, 4)).astype(np.float32) * 0.1
    tile = lambda x: jnp.broadcast_to(jnp.asarray(x, jnp.float32), (1,) + x.shape)
    dyn = SequenceDynamics(A=tile(A), B=tile(B), C=tile(C), Q=tile(Q))
    params = _params(s)
    sr = lgssm_smooth_assoc(jnp.asarray(y), jnp.asarray(u), None, params, dynamics=dyn)
    assert np.all(np.isfinite(np.asarray(sr.mu_smooth)))
    assert np.all(np.isfinite(np.asarray(sr.sigma_smooth)))
    # covariances stay PSD
    eig = np.linalg.eigvalsh(np.asarray(sr.sigma_smooth)[0])
    assert eig.min() > -1e-4
