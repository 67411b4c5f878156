import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from kvae_tpu.ops.gaussian import (
    log_gaussian,
    mvn_logpdf,
    mvn_logpdf_chol,
    mvn_sample_chol,
    safe_cholesky,
    symmetrize,
)


def test_log_gaussian_matches_scipy(rng):
    x = rng.normal(size=(4, 3)).astype(np.float32)
    mu = rng.normal(size=(4, 3)).astype(np.float32)
    var = rng.uniform(0.1, 2.0, size=(4, 3)).astype(np.float32)
    got = np.asarray(log_gaussian(jnp.array(x), jnp.array(mu), jnp.array(var)))
    want = scipy.stats.norm.logpdf(x, mu, np.sqrt(var))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mvn_logpdf_matches_scipy(rng):
    n = 4
    a = rng.normal(size=(n, n))
    cov = (a @ a.T + n * np.eye(n)).astype(np.float32)
    mu = rng.normal(size=n).astype(np.float32)
    x = rng.normal(size=(7, n)).astype(np.float32)
    got = np.asarray(mvn_logpdf(jnp.array(x), jnp.array(mu), jnp.array(cov)))
    want = scipy.stats.multivariate_normal.logpdf(x, mu, cov)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_safe_cholesky_pd_matches_plain(rng):
    a = rng.normal(size=(5, 4, 4))
    cov = (a @ np.swapaxes(a, -1, -2) + 4 * np.eye(4)).astype(np.float32)
    got = np.asarray(safe_cholesky(jnp.array(cov), jitter_init=1e-6))
    want = np.linalg.cholesky(cov + 1e-6 * np.eye(4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_safe_cholesky_escalates_per_matrix(rng):
    # one PD matrix and one slightly indefinite one in the same batch
    pd = 2.0 * np.eye(3)
    indef = np.diag([1.0, 1e-9, -1e-5])  # needs jitter ~1e-4
    batch = np.stack([pd, indef]).astype(np.float32)
    L = np.asarray(safe_cholesky(jnp.array(batch)))
    assert np.all(np.isfinite(L))
    # PD member must get the minimal jitter, not the escalated one
    np.testing.assert_allclose(
        L[0], np.linalg.cholesky(pd + 1e-6 * np.eye(3)), rtol=1e-5, atol=1e-6
    )
    # reconstructions are PSD
    rec = L @ np.swapaxes(L, -1, -2)
    assert np.all(np.linalg.eigvalsh(rec) >= -1e-6)


def test_safe_cholesky_fallback_diag():
    # hopeless matrix: strongly negative diag -> clamped-diagonal fallback
    bad = jnp.array([[[-1.0, 0.5], [0.5, -2.0]]], dtype=jnp.float32)
    L = np.asarray(safe_cholesky(bad))
    assert np.all(np.isfinite(L))
    assert L[0, 0, 1] == 0.0 and L[0, 1, 0] == 0.0  # diagonal fallback


def test_mvn_sample_chol_moments(rng):
    n = 3
    a = rng.normal(size=(n, n))
    cov = (a @ a.T + n * np.eye(n)).astype(np.float32)
    L = np.linalg.cholesky(cov)
    mu = np.array([1.0, -2.0, 0.5], dtype=np.float32)
    key = jax.random.PRNGKey(0)
    samples = mvn_sample_chol(
        key, jnp.broadcast_to(mu, (200_000, n)), jnp.broadcast_to(L, (200_000, n, n))
    )
    s = np.asarray(samples)
    np.testing.assert_allclose(s.mean(0), mu, atol=2e-2)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=5e-2)


def test_symmetrize():
    m = jnp.arange(9.0).reshape(1, 3, 3)
    s = symmetrize(m)
    np.testing.assert_allclose(np.asarray(s), np.asarray(jnp.swapaxes(s, -1, -2)))


def test_logpdf_chol_grad_finite(rng):
    n = 4
    a = rng.normal(size=(n, n))
    cov = (a @ a.T + n * np.eye(n)).astype(np.float32)
    L = jnp.array(np.linalg.cholesky(cov))
    x = jnp.array(rng.normal(size=n).astype(np.float32))

    def f(mu):
        return mvn_logpdf_chol(x, mu, L)

    g = jax.grad(f)(jnp.zeros(n))
    assert np.all(np.isfinite(np.asarray(g)))
