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


def zero_shardings(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """ZeRO-1-style sharding specs for optimizer state: each array leaf is
    split along its largest mesh-divisible dimension; indivisible or scalar
    leaves replicate.

    With parameters and gradients replicated (plain data parallelism), XLA
    partitions the Adam elementwise update to follow the moment shardings
    -- each chip updates only its 1/n shard of the moments and produces a
    sharded update, and the apply-to-replicated-params step becomes an
    all-gather over ICI. Per-chip optimizer memory drops ~n x; the extra
    communication is one update all-gather per step (same volume class as
    the gradient all-reduce that data parallelism already pays).
    """
    n = mesh.devices.size

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        best = None
        for d, s in enumerate(shape):
            if s % n == 0 and s >= n and (best is None or s > shape[best]):
                best = d
        if best is None:
            return replicated_sharding(mesh)
        p = [None] * len(shape)
        p[best] = axis
        return NamedSharding(mesh, P(*p))

    return jax.tree.map(spec, tree)
