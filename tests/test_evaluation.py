"""FoIP / dropout-sweep evaluation metrics (notebook-parity layer)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvae_tpu.config import KVAEConfig, TrainingConfig
from kvae_tpu.train.evaluation import (
    dropout_sweep,
    fraction_incorrect_pixels,
    make_foip_step,
)
from kvae_tpu.train.state import create_train_state


def test_foip_exact_counts():
    x = jnp.zeros((1, 2, 1, 4, 4))
    x_hat = jnp.zeros((1, 2, 1, 4, 4)).at[0, 0, 0, 0, :2].set(1.0)  # 2 wrong px
    mask = jnp.ones((1, 2))
    foip = fraction_incorrect_pixels(x, x_hat, mask)
    np.testing.assert_allclose(float(foip), 2 / 32, rtol=1e-6)
    # only frame 1 counted -> 0 wrong
    foip2 = fraction_incorrect_pixels(x, x_hat, mask.at[0, 0].set(0.0))
    np.testing.assert_allclose(float(foip2), 0.0, atol=1e-7)


@pytest.mark.slow
def test_foip_step_and_sweep(rng):
    cfg = KVAEConfig(dynamics_model="switching", num_modes=2)
    tcfg = TrainingConfig(batch_size=4, donate_state=False)
    x = jnp.asarray(rng.uniform(size=(4, 8, 1, 32, 32)).astype(np.float32))
    model, state, _ = create_train_state(cfg, tcfg, x)

    step = make_foip_step(model, cfg)
    mask = jnp.ones((4, 8)).at[:, 4:].set(0.0)
    m = step(state, x, mask, jax.random.PRNGKey(0))
    for k, v in m.items():
        assert np.isfinite(float(v)), k
        assert 0.0 <= float(v) or "mse" in k

    loader = [{"images": x}]
    sweep = dropout_sweep(
        model, cfg, state, loader, jax.random.PRNGKey(1),
        dropout_rates=(0.5, 1.0), t_init_mask=2,
    )
    assert len(sweep) == 2
    assert sweep[0]["dropout_rate"] == 0.5
    assert all(np.isfinite(v) for r in sweep for v in r.values())
