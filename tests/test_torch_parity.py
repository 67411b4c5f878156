"""Weight-conversion parity against the reference torch components.

tests/fixtures/reference_torch_parity.npz holds reference state_dicts +
deterministic outputs on fixed inputs (see tools/gen_torch_parity_fixture.py).
Converting those weights with utils.torch_compat and running OUR modules must
reproduce the reference outputs within fp32 tolerance — this gates every
layout conversion (conv kernels, flatten order, pixel-shuffle channel order,
LSTM/GRU gate blocks) and hence the reference-checkpoint migration path.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvae_tpu.config import KVAEConfig
from kvae_tpu.models.dynamics import LSTMAlphaDynamics, MarkovRegimePosterior
from kvae_tpu.models.vae import Decoder, Encoder
from kvae_tpu.utils.torch_compat import (
    convert_decoder,
    convert_encoder,
    convert_lstm_dynamics,
    convert_switching_dynamics,
)

FIXTURE = Path(__file__).parent / "fixtures" / "reference_torch_parity.npz"


@pytest.fixture(scope="module")
def fx():
    if not FIXTURE.exists():
        pytest.skip("fixture missing — run tools/gen_torch_parity_fixture.py")
    return dict(np.load(FIXTURE))


def _sub(fx, prefix):
    return {k[len(prefix):]: v for k, v in fx.items() if k.startswith(prefix)}


def test_encoder_conversion(fx):
    cfg = KVAEConfig()
    params = convert_encoder(_sub(fx, "encoder."), cfg)
    enc = Encoder(cfg)
    x = jnp.transpose(jnp.asarray(fx["x"]), (0, 2, 3, 1))  # NCHW -> NHWC
    mu, var = enc.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(mu), fx["enc_mu"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), fx["enc_var"], rtol=1e-4, atol=1e-6)


def test_decoder_conversion(fx):
    cfg = KVAEConfig()
    params = convert_decoder(_sub(fx, "decoder."), cfg)
    dec = Decoder(cfg)
    out = dec.apply({"params": params}, jnp.asarray(fx["a_in"]))
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, fx["dec_logits"], rtol=1e-4, atol=1e-4)


def test_lstm_alpha_conversion(fx):
    cfg = KVAEConfig()
    params = convert_lstm_dynamics(_sub(fx, "lstm_dyn."), cfg)
    dyn = LSTMAlphaDynamics(
        K=cfg.num_modes, n=cfg.z_dim, m=cfg.u_dim, p=cfg.a_dim,
        hidden=cfg.dynamics_hidden_dim,
    )
    y_seq = jnp.asarray(fx["dyn_y_seq"])  # [T,B,p]
    T, B, _ = y_seq.shape
    q = jnp.eye(cfg.z_dim) * 0.02

    def run(mdl):
        carry = mdl.init_carry(B)
        alphas, a_mats = [], []
        for t in range(T):
            carry, (A, _, _, _, alpha) = mdl.step(carry, y_seq[t], q)
            alphas.append(alpha)
            a_mats.append(A)
        return jnp.stack(alphas), jnp.stack(a_mats)

    alphas, a_mats = dyn.apply({"params": params}, method=run)
    np.testing.assert_allclose(np.asarray(alphas), fx["dyn_alphas"], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_mats), fx["dyn_A_mix"], rtol=1e-3, atol=1e-5)


def test_bigru_posterior_conversion(fx):
    cfg = KVAEConfig()
    sd = _sub(fx, "posterior.")
    # reuse the switching converter's posterior mapping
    full = {"A": fx["lstm_dyn.A"], "B": fx["lstm_dyn.B"], "C": fx["lstm_dyn.C"],
            "Q": fx["lstm_dyn.A"]}
    full.update({f"markov_regime_posterior.{k}": v for k, v in sd.items()})
    params = convert_switching_dynamics(full, cfg)["posterior"]
    post = MarkovRegimePosterior(
        cfg.num_modes, input_dim=cfg.a_dim, hidden=cfg.dynamics_hidden_dim
    )
    logits, init_logits = post.apply({"params": params}, jnp.asarray(fx["post_a_seq"]))
    np.testing.assert_allclose(np.asarray(logits), fx["post_logits"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(init_logits), fx["post_init_logits"], rtol=1e-3, atol=1e-4
    )
