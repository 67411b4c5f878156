"""Pallas fused filter == scan filter (interpret mode on CPU; the same kernel
compiles on real TPU — exercised by bench/training when
filter_impl='pallas')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels: minutes per call on CPU

from kvae_tpu.ops.lgssm import lgssm_filter, lgssm_smooth
from kvae_tpu.ops.pallas_kf import lgssm_filter_pallas, lgssm_smooth_pallas
from tests.test_lgssm import _params, _random_lgssm, _to_seq_dynamics


@pytest.mark.parametrize("masked", [False, True])
def test_pallas_filter_equals_scan(rng, masked):
    s = _random_lgssm(rng, batch=5, T=9)
    params, dyn = _params(s), _to_seq_dynamics(s, 5)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])
    mask = None
    if masked:
        m = (rng.uniform(size=(5, 9)) > 0.4).astype(np.float32)
        mask = jnp.asarray(m)

    fr_scan = lgssm_filter(y, u, mask, params, dynamics=dyn)
    fr_pal = lgssm_filter_pallas(y, u, mask, params, dynamics=dyn, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fr_pal.mu_filt), np.asarray(fr_scan.mu_filt), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fr_pal.sigma_filt), np.asarray(fr_scan.sigma_filt),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(fr_pal.mu_pred), np.asarray(fr_scan.mu_pred), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fr_pal.sigma_pred), np.asarray(fr_scan.sigma_pred),
        rtol=1e-4, atol=1e-5,
    )


def test_pallas_smoother_equals_scan(rng):
    s = _random_lgssm(rng, batch=2, T=8)
    params, dyn = _params(s), _to_seq_dynamics(s, 2)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])
    sr_scan = lgssm_smooth(y, u, None, params, dynamics=dyn)
    sr_pal = lgssm_smooth_pallas(y, u, None, params, dynamics=dyn, interpret=True)
    np.testing.assert_allclose(
        np.asarray(sr_pal.mu_smooth), np.asarray(sr_scan.mu_smooth),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sr_pal.sigma_smooth), np.asarray(sr_scan.sigma_smooth),
        rtol=1e-4, atol=1e-5,
    )


def test_pallas_smoother_gradients_match_scan(rng):
    s = _random_lgssm(rng, batch=2, T=6)
    params, dyn = _params(s), _to_seq_dynamics(s, 2)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])

    def loss(A, smooth_fn, **kw):
        sr = smooth_fn(y, u, None, params, dynamics=dyn._replace(A=A), **kw)
        return jnp.sum(sr.mu_smooth ** 2) + jnp.sum(sr.sigma_smooth ** 2)

    g_pal = jax.grad(lambda A: loss(A, lgssm_smooth_pallas, interpret=True))(dyn.A)
    g_scan = jax.grad(lambda A: loss(A, lgssm_smooth))(dyn.A)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_scan), rtol=2e-3, atol=1e-5)


def test_pallas_odd_batch_padding(rng):
    """Batch not a multiple of the 1024 tile: pad lanes must not leak."""
    s = _random_lgssm(rng, batch=3, T=5)
    params, dyn = _params(s), _to_seq_dynamics(s, 3)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])
    fr = lgssm_filter_pallas(y, u, None, params, dynamics=dyn, interpret=True)
    fr_scan = lgssm_filter(y, u, None, params, dynamics=dyn)
    np.testing.assert_allclose(
        np.asarray(fr.mu_filt), np.asarray(fr_scan.mu_filt), rtol=1e-4, atol=1e-5
    )
    assert fr.mu_filt.shape == (3, 5, 4)


def test_pallas_gradients_match_scan(rng):
    """custom_vjp: gradients through the pallas filter == scan gradients."""
    s = _random_lgssm(rng, batch=2, T=6)
    params, dyn = _params(s), _to_seq_dynamics(s, 2)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])

    def loss_pal(A):
        fr = lgssm_filter_pallas(
            y, u, None, params, dynamics=dyn._replace(A=A), interpret=True
        )
        return jnp.sum(fr.mu_filt ** 2) + jnp.sum(fr.sigma_filt ** 2)

    def loss_scan(A):
        fr = lgssm_filter(y, u, None, params, dynamics=dyn._replace(A=A))
        return jnp.sum(fr.mu_filt ** 2) + jnp.sum(fr.sigma_filt ** 2)

    g_pal = jax.grad(loss_pal)(dyn.A)
    g_scan = jax.grad(loss_scan)(dyn.A)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_scan), rtol=1e-3, atol=1e-5)


def test_pallas_time_chunking(rng):
    """Long-T inputs split into VMEM-sized chunks with the carry crossing
    chunk boundaries; results must equal the scan exactly."""
    from kvae_tpu.ops import pallas_kf

    s = _random_lgssm(rng, batch=3, T=24, n=8, p=4, m=8)
    params, dyn = _params(s), _to_seq_dynamics(s, 3)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])
    assert pallas_kf._chunk_len(24, 8, 8, 4) < 24  # chunking actually engages
    mask = jnp.asarray((rng.uniform(size=(3, 24)) > 0.3).astype(np.float32))
    fr_pal = lgssm_filter_pallas(y, u, mask, params, dynamics=dyn, interpret=True)
    fr_scan = lgssm_filter(y, u, mask, params, dynamics=dyn)
    np.testing.assert_allclose(
        np.asarray(fr_pal.mu_filt), np.asarray(fr_scan.mu_filt), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fr_pal.sigma_filt), np.asarray(fr_scan.sigma_filt),
        rtol=1e-4, atol=1e-5,
    )


def test_kvae_with_pallas_filter(rng):
    """filter_impl='pallas' end-to-end through the model."""
    from kvae_tpu.config import KVAEConfig
    from kvae_tpu.models.kvae import KVAE

    cfg = KVAEConfig(dynamics_model="switching", filter_impl="pallas")
    x = jnp.asarray(rng.uniform(size=(2, 5, 1, 32, 32)).astype(np.float32))
    model = KVAE(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    variables = model.init(rngs, x, tau=jnp.asarray(1.0), train=True)
    losses, outputs = model.apply(
        variables, x, tau=jnp.asarray(1.0), train=True,
        rngs={"sample": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)},
        method=KVAE.forward_and_loss,
    )
    assert np.isfinite(float(losses["loss"]))

    # must match the scan implementation exactly (same rngs)
    cfg2 = KVAEConfig(dynamics_model="switching", filter_impl="scan")
    model2 = KVAE(cfg2)
    losses2, _ = model2.apply(
        variables, x, tau=jnp.asarray(1.0), train=True,
        rngs={"sample": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)},
        method=KVAE.forward_and_loss,
    )
    np.testing.assert_allclose(float(losses["loss"]), float(losses2["loss"]), rtol=1e-4)
