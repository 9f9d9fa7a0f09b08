"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY.md section 2.11: no DDP, no
process groups). Here data parallelism is first-class: a 1-D ('data',) mesh,
batches sharded on the leading axis, parameters replicated, and gradients
all-reduced by XLA over ICI as a consequence of the sharding types -- no
hand-written collectives. The mesh abstraction leaves room for wider layouts
(('data', 'model')) without touching model code.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding; remaining dims replicated."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a CGBatch (pytree of (B, ...) arrays) with the batch axis split
    across the mesh. Per-device transfer; XLA inserts any needed collectives
    downstream.

    Batches whose leading axis does not divide the mesh (e.g. ensemble
    sampling with n_ensemble < n_devices) are replicated instead -- correct,
    just without data parallelism for that call."""
    n_dev = mesh.devices.size
    leaves = jax.tree.leaves(batch)
    if leaves and any(l.shape[0] % n_dev != 0 for l in leaves):
        return jax.device_put(batch, replicated_sharding(mesh))
    return jax.device_put(batch, batch_sharding(mesh, axis))


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.device_put(tree, replicated_sharding(mesh))
