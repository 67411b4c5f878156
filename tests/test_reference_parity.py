"""Numerics parity against the REFERENCE torch implementation.

tests/fixtures/reference_lgssm.npz holds filter/smoother posteriors produced
by the reference KalmanFilter (see tools/gen_reference_fixtures.py) on a
fixed masked LGSSM problem. Our `lax.scan` filter/smoother must reproduce
them within fp32 tolerance — the BASELINE.json numerics gate.
"""
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from kvae_tpu.ops.lgssm import LGSSMParams, SequenceDynamics, lgssm_smooth

FIXTURE = Path(__file__).parent / "fixtures" / "reference_lgssm.npz"


@pytest.fixture(scope="module")
def fx():
    if not FIXTURE.exists():
        pytest.skip("reference fixture missing — run tools/gen_reference_fixtures.py")
    return dict(np.load(FIXTURE))


def _run(fx):
    B, T, p = fx["Y"].shape
    tile = lambda M: jnp.broadcast_to(jnp.asarray(M), (B, T) + M.shape)
    dyn = SequenceDynamics(A=tile(fx["A"]), B=tile(fx["B"]), C=tile(fx["C"]), Q=tile(fx["Q"]))
    params = LGSSMParams(
        mu0=jnp.asarray(fx["mu0"]),
        sigma0=jnp.asarray(fx["sigma0"]),
        R=jnp.asarray(fx["R"]),
        Q=jnp.asarray(fx["Q"]),
    )
    return lgssm_smooth(
        jnp.asarray(fx["Y"]), jnp.asarray(fx["U"]), jnp.asarray(fx["mask"]),
        params, dynamics=dyn,
    )


def test_filter_matches_reference(fx):
    sr = _run(fx)
    fr = sr.filter_result
    np.testing.assert_allclose(np.asarray(fr.mu_filt), fx["mus_filt"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fr.sigma_filt), fx["sigmas_filt"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fr.mu_pred), fx["mus_pred"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fr.sigma_pred), fx["sigmas_pred"], rtol=1e-4, atol=1e-5)


def test_smoother_matches_reference(fx):
    sr = _run(fx)
    np.testing.assert_allclose(np.asarray(sr.mu_smooth), fx["mus_smooth"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sr.sigma_smooth), fx["sigmas_smooth"], rtol=1e-4, atol=1e-5
    )
