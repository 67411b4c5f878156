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


@pytest.mark.slow
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


_DIST_WORKER = r'''
import os, sys
port, idx = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
# counter sitecustomize-registered accelerator plugins (e.g. the axon TPU)
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from kvae_tpu.parallel.mesh import (
    batch_sharding, init_distributed, make_global_mesh, replicate,
)

assert init_distributed(f"127.0.0.1:{port}", num_processes=2, process_id=idx)
assert jax.process_count() == 2
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
mesh = make_global_mesh()

# Each process contributes its own half of the global batch; the jitted
# grad must see the GLOBAL mean (cross-process all-reduce over the wire).
local = np.arange(8 * 3, dtype=np.float32).reshape(8, 3) + 100.0 * idx
x = jax.make_array_from_process_local_data(batch_sharding(mesh), local)
w = jax.device_put(np.float32(2.0), replicate(mesh))
val, grad = jax.jit(jax.value_and_grad(lambda w, x: (w * x).mean()))(w, x)
both = np.concatenate(
    [np.arange(24, dtype=np.float32) + 100.0 * i for i in (0, 1)]
)
np.testing.assert_allclose(float(val), 2.0 * both.mean(), rtol=1e-6)
np.testing.assert_allclose(float(grad), both.mean(), rtol=1e-6)
print(f"DIST_OK {idx}", flush=True)
'''


@pytest.mark.slow
def test_init_distributed_two_processes(tmp_path):
    """Real multi-process init over localhost — the DCN story without a pod:
    2 processes x 4 virtual CPU devices form one 8-device global mesh; a
    jitted grad on a process-local-sharded batch all-reduces across the
    process boundary (what ICI/DCN carry on hardware)."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "dist_worker.py"
    worker.write_text(_DIST_WORKER)
    import os as _os
    import pathlib

    repo_root = str(pathlib.Path(__file__).resolve().parents[1])
    env = {
        k: v for k, v in _os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = repo_root + _os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [_sys.executable, str(worker), str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in (0, 1)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    for i, out in enumerate(outs):
        assert f"DIST_OK {i}" in out, out


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    loss, x_recon, mus = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert x_recon.shape == args[1].shape


@pytest.mark.parametrize(
    "n", [pytest.param(2, marks=pytest.mark.slow), 8]
)  # [8] covers strictly more (includes the 2D 2x4 dryrun); [2] is the
#    non-power-of-mesh degenerate case, slow-only
def test_graft_dryrun_multichip(n):
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)
