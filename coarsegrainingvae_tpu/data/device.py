"""Device-resident dataset: zero host work per training step.

Host-side batch assembly (numpy slice + broadcast per step) is the feeding
bottleneck once the train step itself is fast -- measured on one v5e chip,
the dipeptide bench step runs ~3x faster when the host is idle than when it
competes with preprocessing. For single-topology datasets that fit in HBM
(dipeptide 20k frames ~= tens of MB), the whole dataset lives on device and
the batch gather happens INSIDE the jitted step: per step the host transfers
only a (B,) index vector.

The reference streams every batch through a torch DataLoader + collate
(data.py:255-289 in /root/reference); this is the TPU-native inversion of
that design.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from coarsegrainingvae_tpu.data.batch import CGBatch
from coarsegrainingvae_tpu.data.dataset import CGDatasetArrays

Array = jnp.ndarray


@struct.dataclass
class DeviceDataset:
    """All frames on device. Per-frame arrays are indexed by the batch's
    frame indices inside jit; per-topology arrays are broadcast."""

    xyz: Array          # (F, N, 3)
    cg_xyz: Array       # (F, M, 3)
    nbrs: Array         # (F, E, 2)
    nbr_mask: Array     # (F, E)
    cg_nbrs: Array      # (F, Ec, 2)
    cg_nbr_mask: Array  # (F, Ec)
    z: Array            # (N,)
    cg_z: Array         # (M,)
    mapping: Array      # (N,)
    channel_idx: Array  # (N,)
    bonds: Array        # (Eb, 2)
    n_frames: int = struct.field(pytree_node=False)

    @classmethod
    def from_dataset(cls, ds: CGDatasetArrays) -> "DeviceDataset":
        return cls(
            xyz=jnp.asarray(ds.xyz, jnp.float32),
            cg_xyz=jnp.asarray(ds.cg_xyz, jnp.float32),
            nbrs=jnp.asarray(ds.nbrs, jnp.int32),
            nbr_mask=jnp.asarray(ds.nbr_mask),
            cg_nbrs=jnp.asarray(ds.cg_nbrs, jnp.int32),
            cg_nbr_mask=jnp.asarray(ds.cg_nbr_mask),
            z=jnp.asarray(ds.z, jnp.int32),
            cg_z=jnp.arange(ds.n_cgs, dtype=jnp.int32),
            mapping=jnp.asarray(ds.mapping, jnp.int32),
            channel_idx=jnp.asarray(ds.channel_idx, jnp.int32),
            bonds=jnp.asarray(ds.bonds, jnp.int32),
            n_frames=len(ds),
        )

    def gather(self, idx: Array) -> CGBatch:
        """Assemble a CGBatch for frame indices idx (traced; zero host
        work)."""
        b = idx.shape[0]
        n = self.z.shape[0]
        m = self.cg_z.shape[0]
        tile = lambda a: jnp.broadcast_to(a, (b,) + a.shape)
        take = lambda a: jnp.take(a, idx, axis=0)
        return CGBatch(
            z=tile(self.z),
            xyz=take(self.xyz),
            atom_mask=jnp.ones((b, n), bool),
            cg_z=tile(self.cg_z),
            cg_xyz=take(self.cg_xyz),
            cg_mask=jnp.ones((b, m), bool),
            mapping=tile(self.mapping),
            channel_idx=tile(self.channel_idx),
            nbrs=take(self.nbrs),
            nbr_mask=take(self.nbr_mask),
            cg_nbrs=take(self.cg_nbrs),
            cg_nbr_mask=take(self.cg_nbr_mask),
            bonds=tile(self.bonds),
            bond_mask=jnp.ones((b, self.bonds.shape[0]), bool),
        )


def epoch_index_batches(
    n_frames: int, batch_size: int, rng: np.random.Generator | None
) -> np.ndarray:
    """(S, B) int32 frame indices covering one epoch (shuffled when rng
    given, short tail cycled)."""
    order = np.arange(n_frames)
    if rng is not None:
        rng.shuffle(order)
    n_steps = max(n_frames // batch_size, 1)
    need = n_steps * batch_size
    if need > n_frames:
        order = np.resize(order, need)
    return order[:need].reshape(n_steps, batch_size).astype(np.int32)
