"""Multi-device data parallelism on the virtual 8-CPU mesh.

The TPU-native substitute for multi-node tests (SURVEY.md §4): batches shard
over the 'data' axis, params stay replicated, XLA inserts the gradient
all-reduce. Sharded and single-device runs must agree bitwise-ish (same rng,
same math, different collective order -> fp32 tolerance).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from kvae_tpu.config import KVAEConfig, TrainingConfig
from kvae_tpu.parallel.mesh import make_mesh, make_mesh_for_batch
from kvae_tpu.train.state import create_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup(batch=8):
    cfg = KVAEConfig(dynamics_model="switching", num_modes=2)
    tcfg = TrainingConfig(batch_size=batch, donate_state=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(batch, 6, 1, 32, 32)).astype(np.float32))
    model, state, tx = create_train_state(cfg, tcfg, x)
    return cfg, tcfg, model, state, tx, x


def test_mesh_helpers():
    assert make_mesh(4).shape["data"] == 4
    assert make_mesh_for_batch(12).shape["data"] == 6   # largest divisor <= 8
    assert make_mesh_for_batch(32).shape["data"] == 8
    assert make_mesh_for_batch(7).shape["data"] == 7


def test_data_parallel_step_matches_single_device():
    cfg, tcfg, model, state, tx, x = _setup()
    train_step = make_train_step(model, cfg, tcfg, tx)

    # single device
    s1, m1 = train_step(state, x, "all")

    # 8-way data parallel
    mesh = make_mesh(8)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    state_r = jax.device_put(state, NamedSharding(mesh, P()))
    s8, m8 = train_step(state_r, xs, "all")

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        # collective reduction order differs from the single-device sum
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5)
    # params stay replicated after the update
    assert jax.tree.leaves(s8.params)[0].sharding.is_fully_replicated


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    loss, x_recon, mus = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert x_recon.shape == args[1].shape


@pytest.mark.parametrize("n", [2, 8])
def test_graft_dryrun_multichip(n):
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)
