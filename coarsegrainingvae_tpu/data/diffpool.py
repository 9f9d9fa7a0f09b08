"""Padded dense dataset for the DiffPool family.

Replaces the reference's DiffPoolDataset / padding_tensor / DiffPool_collate
(data.py:84-183 in /root/reference) and get_diffpool_data
(datasets.py:108-168). For the single-topology case every frame shares
(z, bonds), so a batch is just an index into the frame axis -- the bond
adjacency is built once and tiled. Optional shift/rotate augmentation
mirrors get_diffpool_data's flags.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import numpy as np
from flax import struct

from coarsegrainingvae_tpu.data.dataset import rotate_frames


@struct.dataclass
class DiffPoolBatch:
    """Dense padded batch (a jit-able pytree): z (B, N) int32,
    xyz (B, N, 3) f32, adj (B, N, N) f32 bond adjacency, bonds (Eb, 2)
    shared edge list (high-order 'hyperedges' for the graph loss,
    run_diffpool.py:203-206), angles (A, 3) / dihedrals (Q, 4) bonded
    index tuples (the reference collects these via moleculekit,
    datasets.py:117-128; unused by its live loss but carried for parity
    and for angle/dihedral-aware losses)."""

    z: np.ndarray
    xyz: np.ndarray
    adj: np.ndarray
    bonds: np.ndarray
    angles: Optional[np.ndarray] = None
    dihedrals: Optional[np.ndarray] = None


@dataclasses.dataclass
class DiffPoolDatasetArrays:
    """Single-topology dense dataset."""

    z: np.ndarray       # (N,) int32
    xyz: np.ndarray     # (F, N, 3) float32
    bonds: np.ndarray   # (Eb, 2) undirected bonds (graph-loss edges)
    adj: np.ndarray     # (N, N) float32 bond adjacency
    angles: Optional[np.ndarray] = None      # (A, 3) bonded angle triplets
    dihedrals: Optional[np.ndarray] = None   # (Q, 4) proper dihedral quads

    def __len__(self) -> int:
        return self.xyz.shape[0]

    @property
    def n_atoms(self) -> int:
        return self.xyz.shape[1]

    def subset(self, idx: np.ndarray) -> "DiffPoolDatasetArrays":
        return dataclasses.replace(self, xyz=self.xyz[idx])

    def batch(self, idx: np.ndarray) -> DiffPoolBatch:
        b = idx.shape[0]
        return DiffPoolBatch(
            z=np.ascontiguousarray(np.broadcast_to(self.z, (b,) + self.z.shape)),
            xyz=self.xyz[idx],
            adj=np.ascontiguousarray(np.broadcast_to(self.adj, (b,) + self.adj.shape)),
            bonds=self.bonds,
            angles=self.angles,
            dihedrals=self.dihedrals,
        )

    def iter_batches(
        self,
        batch_size: int,
        rng: Optional[np.random.Generator] = None,
        drop_last: bool = True,
    ) -> Iterator[DiffPoolBatch]:
        order = np.arange(len(self))
        if rng is not None:
            rng.shuffle(order)
        # always yield at least one (padded) batch, even when the
        # split is smaller than batch_size
        stop = max(len(self) - batch_size + 1, 1) if drop_last else len(self)
        for lo in range(0, stop, batch_size):
            idx = order[lo : lo + batch_size]
            if idx.shape[0] < batch_size:
                idx = np.resize(np.concatenate([idx, order]), batch_size)
            yield self.batch(idx)


def build_diffpool_dataset(
    frames: np.ndarray,
    atomic_nums: np.ndarray,
    bonds: np.ndarray,
    rotate: bool = False,
    shift: bool = False,
    seed: int = 123,
) -> DiffPoolDatasetArrays:
    """Frames -> dense props (reference get_diffpool_data,
    datasets.py:108-168). Frames are centered per-frame; optional random
    shift/rotation augmentation."""
    traj = np.asarray(frames, dtype=np.float32)
    traj = traj - traj.mean(axis=1, keepdims=True)
    if rotate:
        traj = rotate_frames(traj, seed)
    if shift:
        rng = np.random.default_rng(seed + 1)
        traj = traj + rng.normal(scale=1.0, size=(traj.shape[0], 1, 3)).astype(
            np.float32
        )

    n = traj.shape[1]
    bonds = np.asarray(bonds, dtype=np.int32)
    adj = np.zeros((n, n), dtype=np.float32)
    adj[bonds[:, 0], bonds[:, 1]] = 1.0
    adj[bonds[:, 1], bonds[:, 0]] = 1.0

    from coarsegrainingvae_tpu.data.topology import (
        angle_triplets,
        dihedral_quads_from_bonds,
    )

    return DiffPoolDatasetArrays(
        z=np.asarray(atomic_nums, dtype=np.int32),
        xyz=traj,
        bonds=bonds,
        adj=adj,
        angles=angle_triplets(bonds, n),
        dihedrals=dihedral_quads_from_bonds(bonds, n),
    )
