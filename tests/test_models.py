"""Shape/contract and gradient-flow tests for the model layer
(mirrors the reference's tests/test_vae_wrapper.py + grad-flow smoke test in
tests/test_vae_stability.py:75-109, widened to the full KVAE)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvae_tpu.config import KVAEConfig
from kvae_tpu.models.dynamics import (
    LSTMAlphaDynamics,
    SwitchingDynamics,
    gumbel_softmax,
    sticky_transition_matrix,
)
from kvae_tpu.models.kvae import KVAE
from kvae_tpu.models.losses import count_active_units, get_beta, get_tau, vae_loss
from kvae_tpu.models.vae import VAE, depth_to_space


B, T = 2, 6


def _cfg(**kw):
    return KVAEConfig(**kw)


def _x(rng, b=B, t=T, size=32):
    return jnp.asarray(rng.uniform(size=(b, t, 1, size, size)).astype(np.float32))


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def test_depth_to_space_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    y = depth_to_space(x, 2)
    assert y.shape == (2, 8, 8, 2)


def test_vae_forward_shapes(rng):
    cfg = _cfg()
    model = VAE(cfg)
    x = _x(rng)
    params = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)
    out = model.apply(params, x, rngs={"sample": jax.random.PRNGKey(2)})
    assert out["x_recon"].shape == (B, T, 1, 32, 32)
    assert out["a_mu"].shape == (B, T, cfg.a_dim)
    # bernoulli output in (0,1); variance bounded by noise_emission
    assert float(out["x_recon"].min()) >= 0.0 and float(out["x_recon"].max()) <= 1.0
    assert float(out["a_var"].max()) <= cfg.noise_emission
    assert float(out["a_var"].min()) >= 0.0


def test_vae_sample_from_prior(rng):
    cfg = _cfg()
    model = VAE(cfg)
    x = _x(rng)
    params = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)
    samples = model.apply(
        params, 3, rngs={"sample": jax.random.PRNGKey(2)}, method=VAE.sample_from_prior
    )
    assert samples.shape == (3, 1, 32, 32)


# ---------------------------------------------------------------------------
# dynamics
# ---------------------------------------------------------------------------

def test_sticky_transition_matrix():
    m = np.asarray(sticky_transition_matrix(3, 0.8))
    np.testing.assert_allclose(np.diag(m), 0.8)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, rtol=1e-6)


def test_gumbel_softmax_hard_is_onehot_with_soft_grads():
    logits = jnp.asarray([[2.0, 0.0, -1.0]])
    y = gumbel_softmax(jax.random.PRNGKey(0), logits, jnp.asarray(0.5), hard=True)
    v = np.asarray(y)
    np.testing.assert_allclose(v.sum(), 1.0, rtol=1e-6)
    assert set(np.round(v.flatten(), 5)) <= {0.0, 1.0}

    def f(l):
        return jnp.sum(gumbel_softmax(jax.random.PRNGKey(0), l, jnp.asarray(0.5), hard=True) ** 2)

    g = np.asarray(jax.grad(f)(logits))
    assert np.any(g != 0)  # straight-through gradient flows


@pytest.mark.parametrize("K", [1, 3])
def test_switching_dynamics_contract(rng, K):
    dyn = SwitchingDynamics(K=K, n=4, m=4, p=2)
    a_seq = jnp.asarray(rng.normal(size=(B, T, 2)).astype(np.float32))
    params = dyn.init(jax.random.PRNGKey(0), a_seq, jnp.asarray(1.0), False,
                      jax.random.PRNGKey(1))
    seq, log_q, log_p, probs = dyn.apply(
        params, a_seq, jnp.asarray(1.0), False, jax.random.PRNGKey(2)
    )
    assert seq.A.shape == (B, T, 4, 4)
    assert seq.C.shape == (B, T, 2, 4)
    assert log_q.shape == (B, T) and log_p.shape == (B, T)
    assert probs.shape == (B, T, K)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)
    if K == 1:
        np.testing.assert_allclose(np.asarray(log_q), 0.0)
        # K=1: A bank is identity
        np.testing.assert_allclose(np.asarray(seq.A[0, 0]), np.eye(4))


def test_switching_hard_mode_onehot(rng):
    dyn = SwitchingDynamics(K=3, n=4, m=4, p=2)
    a_seq = jnp.asarray(rng.normal(size=(B, T, 2)).astype(np.float32))
    params = dyn.init(jax.random.PRNGKey(0), a_seq, jnp.asarray(1.0), True,
                      jax.random.PRNGKey(1))
    _, _, _, probs = dyn.apply(params, a_seq, jnp.asarray(0.5), True, jax.random.PRNGKey(2))
    v = np.asarray(probs)
    assert set(np.round(v.flatten(), 5)) <= {0.0, 1.0}


@pytest.mark.parametrize("K", [1, 3])
def test_lstm_alpha_step(rng, K):
    dyn = LSTMAlphaDynamics(K=K, n=4, m=4, p=2, hidden=8)
    y = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    q = jnp.eye(4) * 0.02

    def run(mdl):
        carry = mdl.init_carry(B)
        carry, (A, Bm, C, Q, alpha) = mdl.step(carry, y, q)
        return A, Bm, C, Q, alpha

    params = dyn.init(jax.random.PRNGKey(0), method=run)
    A, Bm, C, Q, alpha = dyn.apply(params, method=run)
    assert A.shape == (B, 4, 4) and C.shape == (B, 2, 4)
    assert alpha.shape == (B, K)
    np.testing.assert_allclose(np.asarray(alpha).sum(-1), 1.0, rtol=1e-5)
    if K > 1:
        # head bias -10 except mode 0: alpha starts pinned at mode 0
        assert np.all(np.asarray(alpha)[:, 0] > 0.99)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def test_vae_loss_bernoulli_and_mask(rng):
    x = jnp.asarray((rng.uniform(size=(B, T, 1, 8, 8)) > 0.5).astype(np.float32))
    logits = jnp.asarray(rng.normal(size=(B, T, 1, 8, 8)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(B, T, 2)).astype(np.float32))
    a_mu = jnp.zeros_like(a)
    a_var = jnp.ones_like(a) * 0.02
    mask = jnp.ones((B, T)).at[:, 2].set(0.0)
    elbo, recon, reg = vae_loss(x, logits, 0.1, a, a_mu, a_var, mask=mask, out_distr="bernoulli")
    assert np.isfinite(float(elbo))
    # perturbing a masked frame's pixels does not change the loss
    x2 = x.at[:, 2].set(1.0 - x[:, 2])
    elbo2, _, _ = vae_loss(x2, logits, 0.1, a, a_mu, a_var, mask=mask, out_distr="bernoulli")
    np.testing.assert_allclose(float(elbo), float(elbo2), rtol=1e-6)


def test_beta_schedule():
    cfg = _cfg(scheduled_beta=True, start_epoch=0, end_epoch=5, start_val=0.0, end_val=1.0)
    assert float(get_beta(cfg, 0)) == 0.0
    np.testing.assert_allclose(float(get_beta(cfg, 2)), 0.4, rtol=1e-6)
    assert float(get_beta(cfg, 10)) == 1.0
    cfg2 = _cfg(scheduled_beta=False)
    assert float(get_beta(cfg2, 3)) == 1.0


def test_tau_schedule():
    cfg = _cfg(tau_init=1.0, tau_decay_rate=0.5, tau_decay_steps=1, tau_min=0.1)
    start = 16
    assert float(get_tau(cfg, 5, start)) == 1.0        # before decay start
    np.testing.assert_allclose(float(get_tau(cfg, 16, start)), 0.5)
    np.testing.assert_allclose(float(get_tau(cfg, 17, start)), 0.25)
    np.testing.assert_allclose(float(get_tau(cfg, 40, start)), 0.1, rtol=1e-6)  # floor


def test_count_active_units(rng):
    mu = np.zeros((64, 4), np.float32)
    mu[:, 0] = rng.normal(size=64)  # only unit 0 active
    active, var = count_active_units(jnp.asarray(mu))
    assert int(active) == 1
    assert var.shape == (4,)


# ---------------------------------------------------------------------------
# KVAE end-to-end
# ---------------------------------------------------------------------------

def _init_kvae(cfg, x):
    model = KVAE(cfg)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sample": jax.random.PRNGKey(1),
        "gumbel": jax.random.PRNGKey(2),
    }
    variables = model.init(rngs, x, tau=jnp.asarray(1.0), train=True)
    return model, variables


@pytest.mark.parametrize("dynamics_model", ["switching", "lstm"])
def test_kvae_forward_loss_shapes(rng, dynamics_model):
    cfg = _cfg(dynamics_model=dynamics_model)
    x = _x(rng)
    model, variables = _init_kvae(cfg, x)
    rngs = {"sample": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)}

    losses, outputs = model.apply(
        variables, x, tau=jnp.asarray(1.0), beta=jnp.asarray(0.5),
        train=True, rngs=rngs, method=KVAE.forward_and_loss,
    )
    assert outputs["x_recon"].shape == x.shape
    assert outputs["mus_smooth"].shape == (B, T, cfg.z_dim)
    assert outputs["Sigmas_smooth"].shape == (B, T, cfg.z_dim, cfg.z_dim)
    assert outputs["state_probs"].shape == (B, T, cfg.num_modes)
    for k in ("loss", "elbo_kf", "elbo_vae_total"):
        assert np.isfinite(float(losses[k])), k


@pytest.mark.parametrize("dynamics_model", ["switching", "lstm"])
def test_kvae_grads_flow(rng, dynamics_model):
    cfg = _cfg(dynamics_model=dynamics_model)
    x = _x(rng)
    model, variables = _init_kvae(cfg, x)
    rngs = {"sample": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)}

    def loss_fn(params):
        losses, _ = model.apply(
            {"params": params}, x, tau=jnp.asarray(1.0), beta=jnp.asarray(1.0),
            train=True, rngs=rngs, method=KVAE.forward_and_loss,
        )
        return losses["loss"]

    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # every major component must receive gradient
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    nonzero_paths = {
        jax.tree_util.keystr(path) for path, leaf in flat if np.any(np.asarray(leaf) != 0)
    }
    for component in ("encoder", "decoder", "dynamics"):
        assert any(component in p for p in nonzero_paths), component


def test_lstm_decoupled_matches_coupled(rng):
    """With all frames observed, the whole-sequence alpha-LSTM fast path
    (LSTMAlphaDynamics.sequence + sequence-dynamics filter) must match the
    coupled step-inside-the-filter-scan path exactly — values, alphas, and
    parameter gradients. mask=None triggers the fast path; an explicit
    all-ones mask keeps the coupled path."""
    cfg = _cfg(dynamics_model="lstm")
    x = _x(rng)
    model, variables = _init_kvae(cfg, x)
    rngs = {"sample": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)}
    ones = jnp.ones((B, T), jnp.float32)

    def run(params, mask):
        losses, outputs = model.apply(
            {"params": params}, x, mask=mask, tau=jnp.asarray(1.0),
            beta=jnp.asarray(1.0), train=True, rngs=rngs,
            method=KVAE.forward_and_loss,
        )
        return losses["loss"], outputs

    (l_fast, out_fast) = run(variables["params"], None)
    (l_coup, out_coup) = run(variables["params"], ones)
    np.testing.assert_allclose(float(l_fast), float(l_coup), rtol=1e-6)
    for k in ("mus_filt", "Sigmas_filt", "mus_smooth", "state_probs", "A", "C"):
        np.testing.assert_allclose(
            np.asarray(out_fast[k]), np.asarray(out_coup[k]), rtol=1e-5,
            atol=1e-6, err_msg=k,
        )

    g_fast = jax.grad(lambda p: run(p, None)[0])(variables["params"])
    g_coup = jax.grad(lambda p: run(p, ones)[0])(variables["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        g_fast, g_coup,
    )


def test_kvae_impute_contract(rng):
    cfg = _cfg(dynamics_model="switching")
    x = _x(rng)
    model, variables = _init_kvae(cfg, x)
    mask = jnp.ones((B, T)).at[:, 2:5].set(0.0)
    rngs = {"sample": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)}
    out = model.apply(variables, x, mask, rngs=rngs, method=KVAE.impute)
    for k in ("x_recon", "x_imputed", "x_filtered"):
        assert out[k].shape == x.shape
        assert np.all(np.isfinite(np.asarray(out[k])))
    assert out["a_imputed"].shape == (B, T, cfg.a_dim)


def test_kvae_generate(rng):
    cfg = _cfg(dynamics_model="lstm")
    x = _x(rng)
    model, variables = _init_kvae(cfg, x)
    rngs = {"sample": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)}
    out = model.apply(
        variables, x[:, :4], 5, rngs=rngs, method=KVAE.generate
    )
    assert out["x_gen"].shape == (B, 5, 1, 32, 32)
    assert out["z_gen"].shape == (B, 5, cfg.z_dim)
    assert np.all(np.isfinite(np.asarray(out["x_gen"])))


def test_closed_loop_lstm_equals_masked_filter(rng):
    """closed_loop=True (LSTM, deterministic) must be bit-equivalent to the
    masked filter run over [warmup | generated] with mask = [1...1 | 0...0]:
    the filter's mask=0 path advances mu_filt = mu_pred and feeds
    y_hat = C mu_pred to the alpha-LSTM (reference kalman_filter.py:183-185)
    — exactly the closed-loop recursion."""
    from kvae_tpu.ops.lgssm import lgssm_filter

    cfg = _cfg(dynamics_model="lstm")
    x = _x(rng)
    model, variables = _init_kvae(cfg, x)
    tw, s = 3, T - 3
    a_full = jnp.asarray(rng.normal(size=(B, T, cfg.a_dim)).astype(np.float32))

    def roll_probe(m):
        u_gen = jnp.zeros((B, s, cfg.u_dim), jnp.float32)
        return m._closed_loop_roll_lstm(
            a_full[:, :tw], u_gen, jax.random.PRNGKey(7), True
        )

    z_seq, a_seq, alpha_seq, _ = model.apply(variables, method=roll_probe)

    def filter_probe(m):
        params = m.lgssm_params
        mask = jnp.ones((B, T)).at[:, tw:].set(0.0)
        u = jnp.zeros((B, T, cfg.u_dim), jnp.float32)

        def stepfn(carry, y_prev):
            return m.dynamics.step(carry, y_prev, params.Q)

        return lgssm_filter(
            a_full, u, mask, params,
            step_dynamics=stepfn, step_dynamics_carry=m.dynamics.init_carry(B),
        )

    fr = model.apply(variables, method=filter_probe)
    # masked span: mu_filt == mu_pred (gain zeroed) == the rollout's z
    np.testing.assert_allclose(
        np.asarray(z_seq), np.asarray(fr.mu_filt[:, tw:]), rtol=1e-6, atol=1e-6
    )
    a_filt = np.einsum(
        "btpn,btn->btp", np.asarray(fr.C[:, tw:]), np.asarray(fr.mu_filt[:, tw:])
    )
    np.testing.assert_allclose(np.asarray(a_seq), a_filt, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(alpha_seq), np.asarray(fr.aux[:, tw:]), rtol=1e-6, atol=1e-6
    )


def test_closed_loop_switching_samples_regimes(rng):
    """Closed-loop SKVAE rollout: regimes are one-hot draws from the sticky
    prior chain — long rollouts must actually SWITCH regime (the frozen-
    dynamics legacy path cannot), and outputs stay finite."""
    cfg = _cfg(dynamics_model="switching", sticky_p_stay=0.5)
    x = _x(rng)
    model, variables = _init_kvae(cfg, x)
    rngs = {"sample": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)}
    S = 40
    out = model.apply(
        variables, x[:, :4], S, rngs=rngs, method=KVAE.generate,
        closed_loop=True, deterministic=True,
    )
    assert out["x_gen"].shape == (B, S, 1, 32, 32)
    assert np.all(np.isfinite(np.asarray(out["x_gen"])))
    probs = np.asarray(out["state_probs_gen"])  # [B,S,K] one-hot draws
    assert probs.shape == (B, S, cfg.num_modes)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-6)
    assert np.all(probs.max(-1) == 1.0), "regime draws must be hard one-hot"
    # with p_stay=0.5 over 40 steps the no-switch probability is ~2^-39
    switches = (probs[:, 1:].argmax(-1) != probs[:, :-1].argmax(-1)).sum()
    assert switches > 0, "regime chain never switched in 40 sticky-prior draws"


def test_closed_loop_lstm_generate_api(rng):
    """Public API path: closed_loop LSTM generation (stochastic) produces
    finite frames and per-step alpha weights that EVOLVE (not frozen)."""
    cfg = _cfg(dynamics_model="lstm")
    x = _x(rng)
    model, variables = _init_kvae(cfg, x)
    rngs = {"sample": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)}
    out = model.apply(
        variables, x[:, :4], 8, rngs=rngs, method=KVAE.generate,
        closed_loop=True, deterministic=False,
    )
    assert out["x_gen"].shape == (B, 8, 1, 32, 32)
    assert np.all(np.isfinite(np.asarray(out["x_gen"])))
    alpha = np.asarray(out["state_probs_gen"])
    assert alpha.shape == (B, 8, cfg.num_modes)
    # alpha trajectories respond to the evolving feedback: not constant
    assert np.abs(np.diff(alpha, axis=1)).max() > 0.0


def test_kvae_whole_forward_jits(rng):
    """The full forward+loss must compile to ONE XLA program."""
    cfg = _cfg(dynamics_model="switching")
    x = _x(rng)
    model, variables = _init_kvae(cfg, x)
    rngs = {"sample": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)}

    @jax.jit
    def step(params, x, tau, beta):
        losses, _ = model.apply(
            {"params": params}, x, tau=tau, beta=beta, train=True,
            rngs=rngs, method=KVAE.forward_and_loss,
        )
        return losses["loss"]

    l1 = step(variables["params"], x, jnp.asarray(1.0), jnp.asarray(0.5))
    # annealed tau/beta must NOT retrace
    l2 = step(variables["params"], x, jnp.asarray(0.7), jnp.asarray(0.9))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert step._cache_size() == 1


def test_kvae_bfloat16_compute_path(rng):
    """compute_dtype="bfloat16" (the MXU-native conv/MLP policy; 17% step
    speedup at B=256 on a v5e, PARITY.md) must keep params/outputs float32
    and stay close to the float32 path — same init (param_dtype is float32
    in both), loose tolerance on loss and gradients."""
    x = _x(rng)
    rngs = {"sample": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)}

    results = {}
    for dt in ("float32", "bfloat16"):
        cfg = _cfg(dynamics_model="lstm", compute_dtype=dt)
        model, variables = _init_kvae(cfg, x)
        assert all(
            np.asarray(l).dtype == np.float32
            for l in jax.tree.leaves(variables["params"])
        ), "params must stay float32 regardless of compute_dtype"

        def loss_fn(params):
            losses, outputs = model.apply(
                {"params": params}, x, tau=jnp.asarray(1.0),
                beta=jnp.asarray(1.0), train=True, rngs=rngs,
                method=KVAE.forward_and_loss,
            )
            return losses["loss"], outputs

        (val, outputs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        assert outputs["x_recon"].dtype == jnp.float32
        assert outputs["a_samples"].dtype == jnp.float32
        assert np.isfinite(float(val))
        assert all(
            np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(grads)
        )
        results[dt] = (float(val), grads)

    l32, g32 = results["float32"]
    l16, g16 = results["bfloat16"]
    # bf16 rounding moves the Bernoulli ELBO only slightly at these scales
    np.testing.assert_allclose(l16, l32, rtol=5e-3)
    # gradient direction must agree per-leaf (cosine similarity)
    for (p32, a), (p16, b) in zip(
        jax.tree_util.tree_flatten_with_path(g32)[0],
        jax.tree_util.tree_flatten_with_path(g16)[0],
    ):
        assert p32 == p16
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na < 1e-7 or nb < 1e-7:
            continue
        cos = float(a @ b / (na * nb))
        assert cos > 0.98, (jax.tree_util.keystr(p32), cos)


# ---------------------------------------------------------------------------
# noise-floor anneal (training-time LGSSM noise_scale)
# ---------------------------------------------------------------------------

def test_noise_scale_loss_equals_widened_config(rng):
    """`loss(noise_scale=s)` under a TIGHT config must equal `loss()` under a
    config whose noise_emission/noise_transition are s-times wider, given
    identical forward outputs — the anneal multiplier IS the wide config on
    the LGSSM side (it deliberately does NOT widen the encoder's variance
    bound, which is the point: only the KF floors needed widening for the
    T=100 warmup shock)."""
    s = 10.0
    tight = _cfg(dynamics_model="lstm", noise_emission=0.03,
                 noise_transition=0.02)
    wide = _cfg(dynamics_model="lstm", noise_emission=0.03 * s,
                noise_transition=0.02 * s)
    x = _x(rng)
    model_t, variables = _init_kvae(tight, x)
    model_w = KVAE(wide)  # same param structure: reuse variables
    rngs = {"sample": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)}

    # The scaled LGSSM params ARE the wide config's params
    p_scaled = model_t.bind(variables)._scaled_lgssm_params(jnp.asarray(s))
    p_wide = model_w.bind(variables).lgssm_params
    np.testing.assert_allclose(np.asarray(p_scaled.R), np.asarray(p_wide.R), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_scaled.Q), np.asarray(p_wide.Q), rtol=1e-6)

    # One forward to produce a shared outputs dict (the wide model's — which
    # floors produced it is irrelevant for the loss-equivalence below)
    out_w = model_w.apply(variables, x, tau=jnp.asarray(1.0), train=True, rngs=rngs)

    loss_rngs = {"sample": jax.random.PRNGKey(7)}
    l_t = model_t.apply(
        variables, x, out_w, noise_scale=jnp.asarray(s),
        rngs=loss_rngs, method=KVAE.loss,
    )
    l_w = model_w.apply(variables, x, out_w, rngs=loss_rngs, method=KVAE.loss)
    np.testing.assert_allclose(
        float(l_t["elbo_kf"]), float(l_w["elbo_kf"]), rtol=1e-6
    )
    # scale=1 (the default) is the unscaled model
    l_1 = model_t.apply(variables, x, out_w, rngs=loss_rngs, method=KVAE.loss)
    assert abs(float(l_1["elbo_kf"]) - float(l_t["elbo_kf"])) > 1e-3


def test_noise_anneal_init_validation():
    with pytest.raises(ValueError, match="noise_anneal_init"):
        _cfg(noise_anneal_init=0.5)
