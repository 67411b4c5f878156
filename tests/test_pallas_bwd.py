"""Hand-derived Pallas adjoint kernels vs jax.vjp of the scan implementation.

Every input's gradient must match (y, u, dynamics matrices, prior, R), for
unmasked, masked, and time-chunked cases, through both the smoothed outputs
and the filtered/predicted outputs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels: minutes per call on CPU

from kvae_tpu.ops.lgssm import lgssm_smooth
from kvae_tpu.ops.pallas_kf_bwd import lgssm_smooth_pallas_adjoint
from tests.test_lgssm import _params, _random_lgssm, _to_seq_dynamics


def _loss_all_outputs(sr):
    """Exercise cotangents of every output with distinct weights."""
    fr = sr.filter_result
    return (
        jnp.sum(sr.mu_smooth ** 2)
        + 0.5 * jnp.sum(sr.sigma_smooth ** 2)
        + 0.3 * jnp.sum(fr.mu_filt ** 2)
        + 0.2 * jnp.sum(fr.sigma_filt ** 2)
        + 0.7 * jnp.sum(jnp.sin(fr.mu_pred))
        + 0.1 * jnp.sum(fr.sigma_pred ** 2)
    )


def _grads(smooth_fn, y, u, mask, params, dyn, wrt, **kw):
    def loss(args):
        d = dyn._replace(A=args["A"], B=args["B"], C=args["C"], Q=args["Q"])
        p = params._replace(
            mu0=args["mu0"], sigma0=args["sigma0"], R=args["R"]
        )
        sr = smooth_fn(args["y"], args["u"], mask, p, dynamics=d, **kw)
        return _loss_all_outputs(sr)

    args = {
        "y": y, "u": u, "A": dyn.A, "B": dyn.B, "C": dyn.C, "Q": dyn.Q,
        "mu0": params.mu0, "sigma0": params.sigma0, "R": params.R,
    }
    return jax.grad(loss)(args)


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("T", [1, 2, 5])
def test_adjoint_matches_scan_vjp(rng, masked, T):
    s = _random_lgssm(rng, batch=3, T=T)
    params, dyn = _params(s), _to_seq_dynamics(s, 3)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])
    mask = None
    if masked:
        m = (rng.uniform(size=(3, T)) > 0.4).astype(np.float32)
        m[:, 0] = 1.0
        mask = jnp.asarray(m)

    g_scan = _grads(lgssm_smooth, y, u, mask, params, dyn, None)
    g_pal = _grads(
        lgssm_smooth_pallas_adjoint, y, u, mask, params, dyn, None, interpret=True
    )
    for k in g_scan:
        np.testing.assert_allclose(
            np.asarray(g_pal[k]), np.asarray(g_scan[k]),
            rtol=2e-3, atol=1e-3, err_msg=f"grad mismatch for {k} (T={T})",
        )


def test_adjoint_chunked_matches(rng, monkeypatch):
    """Force time-chunking (tiny chunk length) so carry-across-chunk logic is
    exercised in fwd and bwd kernels (full-size n=8 chunking is validated on
    real TPU; interpret mode is too slow for it in CI)."""
    from kvae_tpu.ops import pallas_kf, pallas_kf_bwd as bwd

    monkeypatch.setattr(pallas_kf, "_chunk_len", lambda T, n, m, p: 2)
    monkeypatch.setattr(pallas_kf, "_rts_chunk_len", lambda T, n: 2)
    monkeypatch.setattr(bwd, "_filter_bwd_chunk_len", lambda T, n, m, p: 2)
    monkeypatch.setattr(bwd, "_rts_bwd_chunk_len", lambda T, n: 2)
    s = _random_lgssm(rng, batch=2, T=6)
    params, dyn = _params(s), _to_seq_dynamics(s, 2)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])
    g_scan = _grads(lgssm_smooth, y, u, None, params, dyn, None)
    g_pal = _grads(
        lgssm_smooth_pallas_adjoint, y, u, None, params, dyn, None, interpret=True
    )
    for k in g_scan:
        np.testing.assert_allclose(
            np.asarray(g_pal[k]), np.asarray(g_scan[k]),
            rtol=3e-3, atol=2e-3, err_msg=f"grad mismatch for {k}",
        )


def test_adjoint_forward_values(rng):
    s = _random_lgssm(rng, batch=2, T=7)
    params, dyn = _params(s), _to_seq_dynamics(s, 2)
    y, u = jnp.asarray(s["y"]), jnp.asarray(s["u"])
    sr_s = lgssm_smooth(y, u, None, params, dynamics=dyn)
    sr_p = lgssm_smooth_pallas_adjoint(y, u, None, params, dyn, interpret=True)
    np.testing.assert_allclose(
        np.asarray(sr_p.mu_smooth), np.asarray(sr_s.mu_smooth), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sr_p.sigma_smooth), np.asarray(sr_s.sigma_smooth),
        rtol=1e-4, atol=1e-5,
    )
