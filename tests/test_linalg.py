import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvae_tpu.ops.linalg import solve_small, solve_small_vec


@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_solve_small_matches_numpy(rng, n):
    a = rng.normal(size=(50, n, n))
    spd = (a @ np.swapaxes(a, -1, -2) + n * np.eye(n)).astype(np.float32)
    b = rng.normal(size=(50, n, 3)).astype(np.float32)
    got = np.asarray(solve_small(jnp.asarray(spd), jnp.asarray(b)))
    want = np.linalg.solve(spd.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_solve_small_vec(rng):
    a = rng.normal(size=(7, 4, 4))
    spd = (a @ np.swapaxes(a, -1, -2) + 4 * np.eye(4)).astype(np.float32)
    b = rng.normal(size=(7, 4)).astype(np.float32)
    got = np.asarray(solve_small_vec(jnp.asarray(spd), jnp.asarray(b)))
    want = np.linalg.solve(spd, b[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_solve_small_differentiable(rng):
    a = rng.normal(size=(3, 3))
    spd = jnp.asarray((a @ a.T + 3 * np.eye(3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))

    g = jax.grad(lambda m: jnp.sum(solve_small_vec(m, b)))(spd)
    # compare against jnp.linalg.solve gradient
    g_ref = jax.grad(lambda m: jnp.sum(jnp.linalg.solve(m, b[:, None])))(spd)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-5)


def test_solve_small_falls_back_above_limit(rng):
    n = 20
    a = rng.normal(size=(2, n, n))
    spd = (a @ np.swapaxes(a, -1, -2) + n * np.eye(n)).astype(np.float32)
    b = rng.normal(size=(2, n, 1)).astype(np.float32)
    got = np.asarray(solve_small(jnp.asarray(spd), jnp.asarray(b)))
    want = np.linalg.solve(spd, b)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
