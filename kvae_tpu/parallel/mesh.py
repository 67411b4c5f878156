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


def init_distributed():
    """Multi-host init (no-op for single-process runs)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


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
