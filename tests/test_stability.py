"""Golden-output ("stability") regression tests.

Mirrors the reference pattern (reference tests/test_imputation_stability.py:
deterministically re-randomized weights + fixed dummy batch + planning mask ->
model.impute compared to a pickled fixture) with two deliberate upgrades
(SURVEY.md §4): fixtures ARE committed, and RNG is explicit keys rather than
a global seed.

Regenerate after intentional model changes:
    python tests/test_stability.py regen
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvae_tpu.config import KVAEConfig
from kvae_tpu.models.kvae import KVAE

FIXDIR = Path(__file__).parent / "fixtures"
B, T = 2, 10


def set_deterministic_weights(params, scale=0.01, seed=42):
    """Every param leaf <- seeded normal * scale (reference
    test_imputation_stability.py:16-22 semantics, explicit keys)."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    new = [
        scale * jax.random.normal(k, l.shape, jnp.float32)
        for k, l in zip(keys, leaves)
    ]
    return jax.tree.unflatten(treedef, new)


def _dummy_batch():
    key = jax.random.PRNGKey(123)
    return jax.random.uniform(key, (B, T, 1, 32, 32), jnp.float32)


def _planning_mask():
    mask = jnp.ones((B, T))
    return mask.at[:, 4:10].set(0.0)  # observe 4, hide 6 (reference :45-50)


def _run(dynamics_model: str):
    cfg = KVAEConfig(dynamics_model=dynamics_model)
    model = KVAE(cfg)
    x = _dummy_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "gumbel": jax.random.PRNGKey(2)},
        x, tau=jnp.asarray(1.0), train=True,
    )
    params = set_deterministic_weights(variables["params"])
    out = model.apply(
        {"params": params}, x, _planning_mask(),
        rngs={"sample": jax.random.PRNGKey(7), "gumbel": jax.random.PRNGKey(8)},
        method=KVAE.impute,
    )
    return {k: np.asarray(v) for k, v in out.items() if k != "state_probs"} | {
        "state_probs": np.asarray(out["state_probs"])
    }


def _fixture_path(mode):
    return FIXDIR / f"stability_impute_{mode}.npz"


@pytest.mark.parametrize("mode", ["lstm", "switching"])
def test_impute_stability(mode):
    path = _fixture_path(mode)
    if not path.exists():
        pytest.skip(f"fixture missing — run: python {__file__} regen")
    want = dict(np.load(path))
    got = _run(mode)
    for key in ("x_recon", "x_imputed", "x_filtered", "a_imputed", "state_probs"):
        np.testing.assert_allclose(
            got[key], want[key], rtol=1e-5, atol=1e-6,
            err_msg=f"{mode}/{key} drifted from golden fixture",
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        # fixtures must be generated on the SAME backend the tests run on (CPU)
        jax.config.update("jax_platforms", "cpu")
        FIXDIR.mkdir(exist_ok=True)
        for mode in ("lstm", "switching"):
            np.savez_compressed(_fixture_path(mode), **_run(mode))
            print(f"wrote {_fixture_path(mode)}")
