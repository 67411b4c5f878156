"""Device mesh + sharding: the TPU-native communication backend.

The reference has NO distributed path (SURVEY.md §2.5 — no NCCL/MPI, single
process). The TPU-native equivalent is not a port of a DDP stack but a
`jax.sharding.Mesh` with a 'data' axis: parameters are replicated, the batch
dimension is sharded, and XLA emits the gradient all-reduce over ICI when the
jitted train step consumes sharded batches. Multi-host extends the same
program over DCN via `jax.distributed.initialize` (call `init_distributed`
before any jax op when running under a multi-host launcher).

Everything here also runs on a virtual CPU mesh
(--xla_force_host_platform_device_count=N) — how the test suite and the
driver's `dryrun_multichip` validate multi-chip behavior without chips.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host init over DCN — the TPU-native stand-in for the reference's
    (absent) torch.distributed stack.

    Call before any other jax API when running under a multi-host launcher.
    Arguments fall back to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); with none set this is a no-op so
    single-process entry points can call it unconditionally. On TPU pods the
    three values come from the runtime and `jax.distributed.initialize()`
    discovers them itself — passing only the env-var coordinator is enough.

    Returns True iff a multi-process runtime was initialized. Validated by
    tests/test_multidevice.py::test_init_distributed_two_processes, which
    forms a real 2-process × 4-virtual-device global mesh over localhost and
    checks cross-process collectives.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coordinator_address:
        return False
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes if num_processes is not None
        else (int(env_np) if env_np else None),
        process_id=process_id if process_id is not None
        else (int(env_pid) if env_pid else None),
    )
    return jax.process_count() > 1


def make_global_mesh(axis: str = DATA_AXIS) -> Mesh:
    """Mesh over ALL global devices (every process's chips). Under
    `init_distributed` each process passes its local batch shard via
    `jax.make_array_from_process_local_data`; within-host reductions ride
    ICI and cross-host legs ride DCN, both emitted by XLA."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def make_mesh(num_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_for_batch(
    batch_size: int, num_devices: Optional[int] = None, axis: str = DATA_AXIS
) -> Mesh:
    """Data mesh over the most devices (<= available/requested) that evenly
    divide the global batch — batches keep static shapes on every shard."""
    limit = num_devices or len(jax.devices())
    limit = min(limit, len(jax.devices()))
    width = max(d for d in range(1, limit + 1) if batch_size % d == 0)
    return make_mesh(width, axis)


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_sharding(mesh))


def replicate_state(state, mesh: Mesh):
    """Place a train-state pytree replicated on every mesh device."""
    return jax.device_put(state, replicate(mesh))
