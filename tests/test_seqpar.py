"""Sequence-parallel (time-sharded) filter/smoother vs the sequential scan,
on the virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvae_tpu.ops.lgssm import LGSSMParams, SequenceDynamics, lgssm_smooth
from kvae_tpu.parallel.seqpar import (
    lgssm_smooth_seqpar,
    make_data_time_mesh,
    make_time_mesh,
    time_sharding,
)

B, T, N, M, P_DIM = 3, 32, 4, 4, 2


def _system(rng, T=T):
    """Random stable per-step dynamics + params + a holey mask."""
    def r(*s):
        return jnp.asarray(rng.normal(size=s).astype(np.float32))

    A = jnp.eye(N) * 0.9 + 0.05 * r(B, T, N, N)
    Bm = 0.1 * r(B, T, N, M)
    C = r(B, T, P_DIM, N)
    Q = jnp.eye(N) * 0.05 + jnp.zeros((B, T, N, N))
    params = LGSSMParams(
        mu0=jnp.zeros(N), sigma0=jnp.eye(N) * 2.0,
        R=jnp.eye(P_DIM) * 0.1, Q=jnp.eye(N) * 0.05,
    )
    dyn = SequenceDynamics(A=A, B=Bm, C=C, Q=Q)
    y = r(B, T, P_DIM)
    u = r(B, T, M)
    mask = jnp.ones((B, T)).at[:, 5:11].set(0.0).at[:, 20].set(0.0)
    return y, u, mask, params, dyn


@pytest.mark.parametrize(
    "n_shards",
    [pytest.param(2, marks=pytest.mark.slow),
     pytest.param(4, marks=pytest.mark.slow),
     8],  # the full-width shard count stays in the fast suite
)
def test_seqpar_matches_sequential(rng, n_shards):
    y, u, mask, params, dyn = _system(rng)
    ref = lgssm_smooth(y, u, mask, params, dynamics=dyn)

    mesh = make_time_mesh(n_shards)
    sh = time_sharding(mesh)
    put = lambda x: jax.device_put(x, sh)
    y_s, u_s, mask_s = put(y), put(u), put(mask)
    dyn_s = jax.tree.map(put, dyn)

    out = jax.jit(
        lambda *a: lgssm_smooth_seqpar(*a, mesh=mesh)
    )(y_s, u_s, mask_s, params, dyn_s)

    fr, fr_ref = out.filter_result, ref.filter_result
    np.testing.assert_allclose(
        np.asarray(fr.mu_filt), np.asarray(fr_ref.mu_filt), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fr.sigma_filt), np.asarray(fr_ref.sigma_filt), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fr.mu_pred), np.asarray(fr_ref.mu_pred), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.mu_smooth), np.asarray(ref.mu_smooth), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.sigma_smooth), np.asarray(ref.sigma_smooth),
        rtol=1e-4, atol=1e-5,
    )


def test_seqpar_unmasked(rng):
    y, u, _, params, dyn = _system(rng)
    ref = lgssm_smooth(y, u, None, params, dynamics=dyn)
    mesh = make_time_mesh(4)
    # jit the call: eager shard_map dispatches each tiny op separately over
    # the 8 virtual devices (~4 min on one core); jitted it is one program.
    sh = time_sharding(mesh)
    y_s, u_s = jax.device_put(y, sh), jax.device_put(u, sh)
    dyn_s = jax.tree.map(lambda v: jax.device_put(v, sh), dyn)
    out = jax.jit(
        lambda a, b, p, d: lgssm_smooth_seqpar(a, b, None, p, d, mesh=mesh)
    )(y_s, u_s, params, dyn_s)
    np.testing.assert_allclose(
        np.asarray(out.mu_smooth), np.asarray(ref.mu_smooth), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow  # grads through the ppermute prefix exchange: ~2 min
def test_seqpar_differentiable(rng):
    """Gradients flow through the collectives and match the sequential path."""
    y, u, mask, params, dyn = _system(rng)
    mesh = make_time_mesh(4)
    sh = time_sharding(mesh)
    y_s, u_s, mask_s = (jax.device_put(v, sh) for v in (y, u, mask))
    dyn_s = jax.tree.map(lambda v: jax.device_put(v, sh), dyn)

    @jax.jit
    def loss_seqpar(A):
        d = dyn_s._replace(A=A)
        out = lgssm_smooth_seqpar(y_s, u_s, mask_s, params, d, mesh=mesh)
        return jnp.sum(out.mu_smooth ** 2)

    def loss_ref(A):
        d = dyn._replace(A=A)
        out = lgssm_smooth(y, u, mask, params, dynamics=d)
        return jnp.sum(out.mu_smooth ** 2)

    g1 = jax.grad(loss_seqpar)(jax.device_put(dyn.A, sh))
    g2 = jax.grad(loss_ref)(dyn.A)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-3, atol=1e-4)


def test_seqpar_2d_data_time_mesh(rng):
    """Batch AND time sharded (2D mesh): same numbers as sequential."""
    y, u, mask, params, dyn = _system(rng)  # B=3 not divisible by 2 -> pad B
    y, u, mask = y[:2], u[:2], mask[:2]
    dyn = jax.tree.map(lambda v: v[:2], dyn)
    ref = lgssm_smooth(y, u, mask, params, dynamics=dyn)

    mesh = make_data_time_mesh(2, 4)
    sh = time_sharding(mesh, batch_axis="data")
    put = lambda x: jax.device_put(x, sh)
    out = jax.jit(
        lambda *a: lgssm_smooth_seqpar(
            *a, mesh=mesh, batch_axis="data"
        )
    )(put(y), put(u), put(mask), params, jax.tree.map(put, dyn))

    np.testing.assert_allclose(
        np.asarray(out.mu_smooth), np.asarray(ref.mu_smooth), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.filter_result.mu_filt), np.asarray(ref.filter_result.mu_filt),
        rtol=1e-4, atol=1e-5,
    )


def test_seqpar_sharding_preserved(rng):
    """Outputs stay time-sharded — no implicit gather."""
    y, u, mask, params, dyn = _system(rng)
    mesh = make_time_mesh(8)
    sh = time_sharding(mesh)
    y_s = jax.device_put(y, sh)
    out = jax.jit(
        lambda *a: lgssm_smooth_seqpar(*a, mesh=mesh)
    )(y_s, u, mask, params, dyn)
    assert out.mu_smooth.sharding.spec == sh.spec
