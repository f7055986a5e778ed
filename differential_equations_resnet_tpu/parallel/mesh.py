"""Mesh construction and sharding rules.

Design (scaling-book recipe): pick a mesh, annotate shardings on jit
boundaries, let XLA insert the collectives.

- ``data`` axis: batch dimension sharded; gradients are reduced by the psum
  XLA inserts for the replicated-parameter jit output (DP over ICI).
- ``model`` axis: optional channel sharding for wide models.  The
  antisymmetric kernel's skew pairing couples channel blocks (i, j) and
  (j, i), so *kernel* materialization stays replicated (it is tiny:
  O(9 C^2) bytes) while activations/Dense can shard channels.

Multi-host: `initialize_multihost` wraps `jax.distributed.initialize`; within
a slice the named axes map onto ICI, across slices onto DCN — placement is
controlled by device order in `create_mesh`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Create a device mesh.  Default: 1-D 'data' mesh over all devices."""
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"Mesh shape {shape} needs {n} devices, have {len(devices)}.")
    try:
        from jax.experimental import mesh_utils

        mesh_devices = mesh_utils.create_device_mesh(shape, devices=devices[:n])
    except Exception:
        mesh_devices = np.asarray(devices[:n]).reshape(shape)
    return Mesh(mesh_devices, tuple(axis_names))


def batch_sharding(mesh: Mesh, batch_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(batch_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, batch_axis: str = "data"):
    """Place a host batch (pytree of arrays with leading batch dim) onto the
    mesh, sharded over the data axis."""
    sharding = batch_sharding(mesh, batch_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_params(mesh: Mesh, params):
    """Replicate parameters across the mesh (DP).  Channel/tensor sharding of
    specific leaves can override this via explicit NamedShardings."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), params)


def local_batch_slice(global_batch_size: int) -> slice:
    """The slice of a globally-indexed batch owned by this host
    (multi-host input pipelines feed per-host shards)."""
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime for multi-host meshes
    (no-op on single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
