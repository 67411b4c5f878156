"""Fused coupled alpha-LSTM filter kernel vs the step-dynamics scan.

The kernel (ops/pallas_kf_lstm.py) must reproduce the coupled recursion —
LSTM on the masked pseudo-observation feedback, alpha mixing, masked Kalman
update (reference kvae/kalman/kalman_filter.py:142-185 semantics) — to fp32
tolerance, including with masked (imputation) frames, and its custom-vjp
backward must agree with the scan path's gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvae_tpu.ops.lgssm import LGSSMParams
from kvae_tpu.ops.pallas_kf_lstm import (
    _coupled_scan_raw,
    lgssm_smooth_lstm_pallas,
    lstm_filter_pallas,
)


def _setup(b=5, t=7, p=2, n=4, m=4, K=3, H=11, seed=0, sigma0=20.0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    y = f(b, t, p)
    u = 0.1 * f(b, t, m)
    mask = jnp.asarray(
        (rng.uniform(size=(b, t)) > 0.4).astype(np.float32)
    ).at[:, 0].set(1.0)
    A_bank = jnp.stack([jnp.eye(n) + 0.05 * f(n, n) for _ in range(K)])
    B_bank = 0.05 * f(K, n, m)
    C_bank = 0.3 * f(K, p, n)
    k = 1.0 / np.sqrt(H)
    lstm = {"wi": k * f(p, 4 * H), "wh": k * f(H, 4 * H), "b": k * f(4 * H)}
    head_w = k * f(H, K)
    head_b = jnp.asarray(np.r_[0.0, -2.0 * np.ones(K - 1)].astype(np.float32))
    params = LGSSMParams(
        mu0=jnp.zeros(n), sigma0=sigma0 * jnp.eye(n),
        R=0.03 * jnp.eye(p), Q=0.02 * jnp.eye(n),
    )
    return y, u, mask, A_bank, B_bank, C_bank, lstm, head_w, head_b, params


def _flat_args(y, u, mask, A_bank, B_bank, C_bank, lstm, head_w, head_b, params):
    return (y, u, mask, A_bank, B_bank, C_bank, lstm["wi"], lstm["wh"],
            lstm["b"], head_w, head_b, params.Q, params.mu0, params.sigma0,
            params.R)


@pytest.mark.parametrize("masked", [True, False])
def test_fused_lstm_filter_matches_coupled_scan(masked):
    y, u, mask, A_bank, B_bank, C_bank, lstm, head_w, head_b, params = _setup()
    if not masked:
        mask = jnp.ones_like(mask)
    want = _coupled_scan_raw(
        *_flat_args(y, u, mask, A_bank, B_bank, C_bank, lstm, head_w, head_b,
                    params)
    )
    fr = lstm_filter_pallas(
        y, u, mask, params, A_bank, B_bank, C_bank, lstm, head_w, head_b,
        interpret=True,
    )
    got = (fr.mu_filt, fr.sigma_filt, fr.mu_pred, fr.sigma_pred,
           fr.A, fr.B, fr.C, fr.aux)
    names = ("mu_filt", "sigma_filt", "mu_pred", "sigma_pred", "A", "B", "C",
             "alpha")
    # fp32 gate: the kernel's MXU gate matmuls accumulate in a different
    # order than the scan's [B,p]x[p,4H] form; the recursion amplifies the
    # last-ulp differences to ~5e-4 over 7 steps.
    for name, w, g in zip(names, want, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-4, err_msg=name
        )


@pytest.mark.slow  # chunk-grid equivalence, interpret mode (~1.5 min)
def test_fused_lstm_filter_chunked_time_axis():
    """T larger than one chunk: carry crosses the chunk grid correctly."""
    import kvae_tpu.ops.pallas_kf_lstm as mod

    y, u, mask, A_bank, B_bank, C_bank, lstm, head_w, head_b, params = _setup(
        b=3, t=23, seed=1
    )
    want = _coupled_scan_raw(
        *_flat_args(y, u, mask, A_bank, B_bank, C_bank, lstm, head_w, head_b,
                    params)
    )
    orig = mod._chunk_len_lstm
    mod._chunk_len_lstm = lambda *a: 5  # force 4 full chunks + remainder 3
    try:
        fr = lstm_filter_pallas(
            y, u, mask, params, A_bank, B_bank, C_bank, lstm, head_w, head_b,
            interpret=True,
        )
    finally:
        mod._chunk_len_lstm = orig
    np.testing.assert_allclose(
        np.asarray(fr.mu_filt), np.asarray(want[0]), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(fr.sigma_filt), np.asarray(want[1]), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(fr.aux), np.asarray(want[7]), rtol=2e-3, atol=2e-4
    )


@pytest.mark.slow  # interpret-mode fwd+bwd kernels: ~3 min on CPU; the
# filter-equivalence gate above stays fast
def test_fused_lstm_smoother_and_grads():
    # sigma0=1: the default sigma0=20 start makes this random system's
    # gradients chaotic (|g| ~ 1e4) — 1e-5 forward rounding differences
    # (kernel matches the float64 oracle as well as the scan does) blow past
    # any tolerance through the VJP. The gate is "same well-conditioned
    # gradients", not "stable gradients for an arbitrary random LGSSM".
    y, u, mask, A_bank, B_bank, C_bank, lstm, head_w, head_b, params = _setup(
        b=4, t=6, seed=2, sigma0=1.0
    )

    def loss_pallas(A_bank, C_bank, wi):
        sr = lgssm_smooth_lstm_pallas(
            y, u, mask, params, A_bank, B_bank, C_bank,
            {"wi": wi, "wh": lstm["wh"], "b": lstm["b"]}, head_w, head_b,
            interpret=True,
        )
        return jnp.sum(sr.mu_smooth ** 2) + jnp.sum(sr.filter_result.mu_filt)

    def loss_scan(A_bank, C_bank, wi):
        out = _coupled_scan_raw(
            y, u, mask, A_bank, B_bank, C_bank, wi, lstm["wh"], lstm["b"],
            head_w, head_b, params.Q, params.mu0, params.sigma0, params.R,
        )
        from kvae_tpu.ops.lgssm import FilterResult, lgssm_smooth_from_filter

        fr = FilterResult(
            mu_filt=out[0], sigma_filt=out[1], mu_pred=out[2],
            sigma_pred=out[3], A=out[4], B=out[5], C=out[6], Q=None,
            aux=out[7],
        )
        sr = lgssm_smooth_from_filter(fr)
        return jnp.sum(sr.mu_smooth ** 2) + jnp.sum(fr.mu_filt)

    v_p, g_p = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(
        A_bank, C_bank, lstm["wi"]
    )
    v_s, g_s = jax.value_and_grad(loss_scan, argnums=(0, 1, 2))(
        A_bank, C_bank, lstm["wi"]
    )
    np.testing.assert_allclose(float(v_p), float(v_s), rtol=1e-4)
    for a, b_ in zip(g_p, g_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
        )


@pytest.mark.slow  # full KVAE impute through the interpret-mode kernel
def test_kvae_impute_uses_fused_path_and_matches_scan():
    """End-to-end: KVAE.impute on the pallas engine (fused coupled kernel)
    equals the scan engine's imputation outputs."""
    import dataclasses

    from kvae_tpu.config import KVAEConfig
    from kvae_tpu.models.kvae import KVAE

    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.uniform(size=(2, 6, 1, 32, 32)) > 0.7).astype(np.float32))
    mask = jnp.ones((2, 6), jnp.float32).at[:, 2:5].set(0.0)
    cfg = KVAEConfig(dynamics_model="lstm", num_modes=3, filter_impl="scan")
    model = KVAE(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    variables = model.init(rngs, x, tau=jnp.asarray(1.0), train=True)
    call_rngs = {"sample": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)}

    want = model.apply(variables, x, mask, rngs=call_rngs, method=KVAE.impute)
    model_p = KVAE(dataclasses.replace(cfg, filter_impl="pallas"))
    got = model_p.apply(variables, x, mask, rngs=call_rngs, method=KVAE.impute)
    for k in ("x_imputed", "x_filtered", "a_imputed", "a_filtered",
              "state_probs"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )


def test_fits_vmem_lstm_envelope():
    """Probe-calibrated fusion gate: flagship-class states fuse, the
    z=12/K=9 T=100 config that OOM'd Mosaic's scoped stack does not."""
    from kvae_tpu.ops.pallas_kf_lstm import fits_vmem_lstm

    assert fits_vmem_lstm(4, 4, 2, 3)        # flagship (z=4, a=2, K=3)
    assert fits_vmem_lstm(8, 8, 4, 9)        # n=8-class: probed OK at all T
    assert not fits_vmem_lstm(12, 12, 6, 9)  # the T=100 quality config
    assert not fits_vmem_lstm(12, 12, 6, 3)  # K alone is not the hazard
