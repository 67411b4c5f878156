"""Serving layer: AOT export round-trip + padded-bucket inference session.

Gates:
- an exported artifact (params baked in) reproduces the live model's impute
  outputs exactly, after a serialize/deserialize round trip;
- InferenceSession bucket padding is airtight: a B=3 request padded into a
  B=8 program returns bit-identical rows to the unpadded B=3 program (batch
  rows are independent end-to-end);
- generation through the session matches the direct method.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvae_tpu.config import KVAEConfig
from kvae_tpu.models.kvae import KVAE
from kvae_tpu.ops.lgssm import lgssm_filter
from kvae_tpu.serve import (
    InferenceSession,
    StreamingSession,
    export_imputer,
    export_stream,
    load_exported,
)


@pytest.fixture(scope="module")
def small_model():
    cfg = KVAEConfig(
        dynamics_model="switching", num_modes=2, a_dim=2, z_dim=3,
        img_size=16, encoder_channels=[8, 8], decoder_channels=[8, 8],
        filter_impl="scan",
    )
    model = KVAE(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(4, 6, 1, 16, 16)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "gumbel": jax.random.PRNGKey(2)},
        x, tau=jnp.asarray(1.0), train=True,
    )
    return cfg, model, variables["params"]


def _direct_impute(model, params, x, mask, key):
    k_sample, k_gumbel = jax.random.split(key)
    return model.apply(
        {"params": params}, x, mask,
        rngs={"sample": k_sample, "gumbel": k_gumbel},
        method=KVAE.impute,
    )


def test_export_roundtrip_matches_live_model(small_model):
    cfg, model, params = small_model
    B, T = 2, 6
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(B, T, 1, 16, 16)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(B, T)) > 0.3).astype(np.float32))
    key = jax.random.PRNGKey(7)

    blob = export_imputer(cfg, params, batch_size=B, T=T)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0
    fn = load_exported(blob)

    got = fn(x, mask, key)
    want = _direct_impute(model, params, x, mask, key)
    assert set(got.keys()) == set(want.keys())
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-6, atol=1e-6,
            err_msg=k,
        )


def test_session_padding_is_airtight(small_model):
    """No cross-batch leakage: within ONE compiled program, changing ONLY the
    padding rows' content must leave the real rows bit-identical. And a
    padded-bucket request must match an exact-size program to fp32 tolerance
    (different-shape XLA programs fuse/reduce in different orders, so
    bit-equality across programs is not an XLA guarantee)."""
    cfg, model, params = small_model
    T = 6
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(3, T, 1, 16, 16)).astype(np.float32)
    mask = (rng.uniform(size=(3, T)) > 0.3).astype(np.float32)

    # 1. same program, different padding content -> bit-identical real rows
    key = jax.random.PRNGKey(5)
    fn = jax.jit(lambda xx, mm: _direct_impute(model, params, xx, mm, key))
    pad_a = np.concatenate([x, np.zeros((5,) + x.shape[1:], np.float32)])
    pad_b = np.concatenate([x, rng.uniform(size=(5,) + x.shape[1:]).astype(np.float32)])
    mask8 = np.concatenate([mask, np.ones((5, T), np.float32)])
    out_a = fn(jnp.asarray(pad_a), jnp.asarray(mask8))
    out_b = fn(jnp.asarray(pad_b), jnp.asarray(mask8))
    for k in out_a:
        np.testing.assert_array_equal(
            np.asarray(out_a[k])[:3], np.asarray(out_b[k])[:3], err_msg=k
        )

    # 2. padded session vs exact-size session: fp32-tight across programs
    sess = InferenceSession(cfg, params, T=T, buckets=(8,), seed=5)
    out_padded = sess.impute(x, mask)
    assert out_padded["x_imputed"].shape[0] == 3
    sess_exact = InferenceSession(cfg, params, T=T, buckets=(3,), seed=5)
    out_exact = sess_exact.impute(x, mask)
    for k in out_exact:
        np.testing.assert_allclose(
            out_padded[k], out_exact[k], rtol=2e-5, atol=2e-6, err_msg=k
        )


def test_session_rejects_oversize_and_bad_T(small_model):
    cfg, _, params = small_model
    sess = InferenceSession(cfg, params, T=6, buckets=(2,))
    x = np.zeros((4, 6, 1, 16, 16), np.float32)
    with pytest.raises(ValueError, match="exceeds the largest bucket"):
        sess.impute(x, np.ones((4, 6), np.float32))
    with pytest.raises(ValueError, match="must be"):
        sess.impute(np.zeros((1, 5, 1, 16, 16), np.float32), np.ones((1, 5), np.float32))


@pytest.fixture(scope="module")
def lstm_model():
    cfg = KVAEConfig(
        dynamics_model="lstm", num_modes=2, a_dim=2, z_dim=3,
        img_size=16, encoder_channels=[8, 8], decoder_channels=[8, 8],
        filter_impl="scan",
    )
    model = KVAE(cfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(size=(4, 6, 1, 16, 16)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(3), "sample": jax.random.PRNGKey(4),
         "gumbel": jax.random.PRNGKey(5)},
        x, tau=jnp.asarray(1.0), train=True,
    )
    return cfg, model, variables["params"]


def test_streaming_matches_offline_masked_filter(lstm_model):
    """A stream of per-frame `stream_step` calls computes the same filtered
    posterior (and alpha mixture) as the offline masked filter run on the
    identical encoder outputs — streaming is exact, not an approximation."""
    cfg, model, params = lstm_model
    B, T = 3, 8
    rng = np.random.default_rng(6)
    frames = rng.uniform(size=(T, B, 1, 16, 16)).astype(np.float32)
    mask = (rng.uniform(size=(B, T)) > 0.4).astype(np.float32)
    mask[:, 0] = 1.0  # first frame observed

    sess = StreamingSession(cfg, params, batch_size=B)
    a_steps, mu_steps, sig_steps, alpha_steps = [], [], [], []
    for t in range(T):
        out = sess.step(frames[t], observed=mask[:, t])
        a_steps.append(out["a_t"])
        mu_steps.append(out["mu_filt"])
        sig_steps.append(out["sigma_filt"])
        alpha_steps.append(out["alpha"])
        assert out["x_filt"].shape == (B, 1, 16, 16)
        assert np.isfinite(out["x_filt"]).all()
        assert np.isfinite(out["x_pred"]).all()

    a_seq = jnp.asarray(np.stack(a_steps, axis=1))  # [B,T,p]

    def offline(m, a_seq, mask):
        b, t, _ = a_seq.shape
        u = jnp.zeros((b, t, m.config.u_dim), jnp.float32)
        carry0 = m.dynamics.init_carry(b)
        step = lambda c, y: m.dynamics.step(c, y, m.lgssm_params.Q)
        return lgssm_filter(
            a_seq, u, jnp.asarray(mask), m.lgssm_params,
            step_dynamics=step, step_dynamics_carry=carry0,
        )

    fr = model.apply({"params": params}, a_seq, mask, method=offline)
    np.testing.assert_allclose(
        np.stack(mu_steps, axis=1), np.asarray(fr.mu_filt),
        rtol=1e-5, atol=1e-6, err_msg="mu_filt",
    )
    np.testing.assert_allclose(
        np.stack(sig_steps, axis=1), np.asarray(fr.sigma_filt),
        rtol=1e-5, atol=1e-6, err_msg="sigma_filt",
    )
    np.testing.assert_allclose(
        np.stack(alpha_steps, axis=1), np.asarray(fr.aux),
        rtol=1e-5, atol=1e-6, err_msg="alpha",
    )


def test_streaming_dropped_frame_and_reset(lstm_model):
    cfg, _, params = lstm_model
    sess = StreamingSession(cfg, params, batch_size=2)
    rng = np.random.default_rng(7)
    sess.step(rng.uniform(size=(2, 1, 16, 16)).astype(np.float32))
    out_drop = sess.step(None)  # dropped frame: pure predict
    assert np.isfinite(out_drop["x_pred"]).all()
    # after reset, the same first frame reproduces the same posterior
    sess.reset()
    frame0 = rng.uniform(size=(2, 1, 16, 16)).astype(np.float32)
    ra = sess.step(frame0)
    sess.reset()
    rb = sess.step(frame0)
    np.testing.assert_array_equal(ra["mu_filt"], rb["mu_filt"])


def test_streaming_rejects_acausal_dynamics(small_model):
    cfg, _, params = small_model  # switching: BiGRU posterior, acausal
    with pytest.raises(ValueError, match="causal"):
        StreamingSession(cfg, params, batch_size=1)


def test_stream_export_roundtrip(lstm_model):
    """The exported streaming artifact reproduces the live session exactly,
    with the caller threading the carry between frames."""
    cfg, _, params = lstm_model
    B = 2
    blob = export_stream(cfg, params, batch_size=B)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0
    fn = load_exported(blob)

    sess = StreamingSession(cfg, params, batch_size=B)
    carry = sess.initial_carry
    rng = np.random.default_rng(8)
    for t in range(3):
        frame = rng.uniform(size=(B, 1, 16, 16)).astype(np.float32)
        observed = np.ones((B,), np.float32) if t != 1 else np.zeros((B,), np.float32)
        carry, got = fn(carry, jnp.asarray(frame), jnp.asarray(observed))
        want = sess.step(frame, observed=observed)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), want[k], rtol=1e-6, atol=1e-6, err_msg=k
            )


def test_session_generate(small_model):
    cfg, model, params = small_model
    rng = np.random.default_rng(3)
    x_warm = rng.uniform(size=(2, 4, 1, 16, 16)).astype(np.float32)
    sess = InferenceSession(cfg, params, T=6, buckets=(2,), seed=9)
    out = sess.generate(x_warm, gen_steps=5)
    assert out["x_gen"].shape == (2, 5, 1, 16, 16)
    assert np.isfinite(out["x_gen"]).all()
    # second call with same shapes reuses the cached program
    out2 = sess.generate(x_warm, gen_steps=5)
    assert out2["x_gen"].shape == (2, 5, 1, 16, 16)
