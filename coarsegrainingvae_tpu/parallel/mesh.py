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


def make_mesh(
    num_devices: Optional[int] = None,
    axis: str = "data",
    model_devices: int = 1,
    model_axis: str = "model",
) -> Mesh:
    """1-D ('data',) mesh by default; model_devices > 1 folds the devices
    into a 2-D ('data', 'model') mesh for feature-dim (tensor) sharding of
    the widest matmuls (SURVEY.md section 2.11 TP row). The model axis is
    the minor (fastest-varying) device dimension so TP collectives ride the
    shortest ICI hops."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if model_devices > 1:
        if n % model_devices != 0:
            raise ValueError(
                f"{n} devices do not factor into model_devices={model_devices}"
            )
        arr = np.array(devices).reshape(n // model_devices, model_devices)
        return Mesh(arr, (axis, model_axis))
    return Mesh(np.array(devices), (axis,))


def tensor_shardings(
    tree: Any,
    mesh: Mesh,
    min_dim: int = 128,
    model_axis: str = "model",
) -> Any:
    """Feature-dim (tensor-parallel) sharding specs: any array leaf whose
    LAST dimension is mesh-divisible and at least min_dim wide is split over
    the model axis; everything else replicates. Applied to params and Adam
    moments, this shards every n_basis-wide Dense kernel/bias column-wise;
    XLA's SPMD partitioner then splits the matmuls and inserts the
    activation collectives automatically."""
    n = mesh.shape[model_axis]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if shape and shape[-1] % n == 0 and shape[-1] >= min_dim:
            p = [None] * (len(shape) - 1) + [model_axis]
            return NamedSharding(mesh, P(*p))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding; remaining dims replicated."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a CGBatch (pytree of (B, ...) arrays) with the batch axis split
    across the mesh. Per-device transfer; XLA inserts any needed collectives
    downstream.

    Batches whose leading axis does not divide the mesh's DATA axis (e.g.
    ensemble sampling with n_ensemble < n_devices) are replicated instead --
    correct, just without data parallelism for that call."""
    n_dev = mesh.shape[axis]
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
