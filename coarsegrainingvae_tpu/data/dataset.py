"""Array-backed dataset + fixed-shape batching.

Replaces the reference's torch Dataset/DataLoader/collate stack (CGDataset +
CG_collate, data.py:186-289 in /root/reference) with plain numpy arrays and a
batch iterator that emits statically-shaped `CGBatch` pytrees. All per-frame
preprocessing (rotation augmentation, CG coordinates, radius graphs) happens
once, vectorized on host, before training.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

from coarsegrainingvae_tpu.data.batch import CGBatch
from coarsegrainingvae_tpu.data.neighbors import make_directed, radius_graph_frames
from coarsegrainingvae_tpu.data.topology import (
    channel_index_from_mapping,
    cg_graph_from_bonds,
    high_order_edges,
)


@dataclasses.dataclass
class CGDatasetArrays:
    """Single-topology dataset: every frame shares (z, mapping, bonds).

    Shapes: xyz (F,N,3), cg_xyz (F,M,3), nbrs (F,E,2)+mask, cg_nbrs
    (F,Ec,2)+mask; z/mapping/channel_idx (N,), bonds (Eb,2).
    """

    z: np.ndarray
    xyz: np.ndarray
    cg_xyz: np.ndarray
    mapping: np.ndarray
    channel_idx: np.ndarray
    bonds: np.ndarray
    nbrs: np.ndarray
    nbr_mask: np.ndarray
    cg_nbrs: np.ndarray
    cg_nbr_mask: np.ndarray
    n_cgs: int
    # optional per-frame aux edges replacing the bonded graph-loss edges
    # (reference generate_aux_edges, data.py:199-205: a radius graph at
    # auxcutoff overwrites bond_edge_list)
    aux_bonds: Optional[np.ndarray] = None   # (F, Ea, 2)
    aux_mask: Optional[np.ndarray] = None    # (F, Ea)

    def __len__(self) -> int:
        return self.xyz.shape[0]

    @property
    def n_atoms(self) -> int:
        return self.xyz.shape[1]

    def subset(self, idx: np.ndarray) -> "CGDatasetArrays":
        return dataclasses.replace(
            self,
            xyz=self.xyz[idx],
            cg_xyz=self.cg_xyz[idx],
            nbrs=self.nbrs[idx],
            nbr_mask=self.nbr_mask[idx],
            cg_nbrs=self.cg_nbrs[idx],
            cg_nbr_mask=self.cg_nbr_mask[idx],
            aux_bonds=None if self.aux_bonds is None else self.aux_bonds[idx],
            aux_mask=None if self.aux_mask is None else self.aux_mask[idx],
        )

    def batch(self, idx: np.ndarray) -> CGBatch:
        """Assemble a fixed-shape CGBatch for frame indices idx (size B)."""
        b = idx.shape[0]
        n, m = self.n_atoms, self.n_cgs
        tile = lambda a: np.broadcast_to(a, (b,) + a.shape)
        return CGBatch(
            z=tile(self.z.astype(np.int32)),
            xyz=self.xyz[idx].astype(np.float32),
            atom_mask=np.ones((b, n), dtype=bool),
            cg_z=tile(np.arange(m, dtype=np.int32)),
            cg_xyz=self.cg_xyz[idx].astype(np.float32),
            cg_mask=np.ones((b, m), dtype=bool),
            mapping=tile(self.mapping.astype(np.int32)),
            channel_idx=tile(self.channel_idx.astype(np.int32)),
            nbrs=self.nbrs[idx],
            nbr_mask=self.nbr_mask[idx],
            cg_nbrs=self.cg_nbrs[idx],
            cg_nbr_mask=self.cg_nbr_mask[idx],
            bonds=(tile(self.bonds.astype(np.int32))
                   if self.aux_bonds is None else self.aux_bonds[idx]),
            bond_mask=(np.ones((b, self.bonds.shape[0]), dtype=bool)
                       if self.aux_mask is None else self.aux_mask[idx]),
        )

    def iter_batches(
        self,
        batch_size: int,
        rng: Optional[np.random.Generator] = None,
        drop_last: bool = True,
    ) -> Iterator[CGBatch]:
        order = np.arange(len(self))
        if rng is not None:
            rng.shuffle(order)
        # always yield at least one (padded) batch, even when the
        # split is smaller than batch_size
        stop = max(len(self) - batch_size + 1, 1) if drop_last else len(self)
        for lo in range(0, stop, batch_size):
            idx = order[lo : lo + batch_size]
            if idx.shape[0] < batch_size:
                # pad by cycling (masked semantics unchanged: these are
                # full frames, they just re-enter the epoch average)
                idx = np.resize(np.concatenate([idx, order]), batch_size)
            yield self.batch(idx)


def rotate_frames(traj: np.ndarray, seed: int = 123) -> np.ndarray:
    """Per-frame random rotation augmentation about the frame centroid
    (reference random_rotation, datasets.py:65-71, applied at :475)."""
    traj = np.asarray(traj, dtype=np.float32)
    f = traj.shape[0]
    rng = np.random.default_rng(seed)
    vec = rng.normal(size=(f, 3))
    axis = vec / np.linalg.norm(vec, axis=-1, keepdims=True)
    angle = np.deg2rad(rng.integers(-180, 180, size=f).astype(np.float64))
    c, s = np.cos(angle), np.sin(angle)
    C = 1.0 - c
    x, y, z_ = axis[:, 0], axis[:, 1], axis[:, 2]
    rot = np.stack(
        [
            np.stack([c + x * x * C, x * y * C - z_ * s, x * z_ * C + y * s], -1),
            np.stack([y * x * C + z_ * s, c + y * y * C, y * z_ * C - x * s], -1),
            np.stack([z_ * x * C - y * s, z_ * y * C + x * s, c + z_ * z_ * C], -1),
        ],
        axis=-2,
    )
    center = traj.mean(axis=1, keepdims=True)
    return np.einsum(
        "fni,fij->fnj", traj - center, np.swapaxes(rot, -1, -2)
    ).astype(np.float32) + center.astype(np.float32)


def _segment_mean_np(x: np.ndarray, seg: np.ndarray, m: int) -> np.ndarray:
    """Per-frame scatter_mean over atoms: x (F,N,3), seg (N,) -> (F,m,3)."""
    out = np.zeros((x.shape[0], m, x.shape[2]), dtype=x.dtype)
    for k in range(m):
        sel = seg == k
        out[:, k] = x[:, sel].mean(axis=1)
    return out


def build_dataset(
    mapping: np.ndarray,
    traj: np.ndarray,
    atom_cutoff: float,
    cg_cutoff: Optional[float],
    atomic_nums: np.ndarray,
    bonds: np.ndarray,
    order: int = 1,
    cg_traj: Optional[np.ndarray] = None,
    rotate: bool = True,
    seed: int = 123,
    max_atom_edges: Optional[int] = None,
    max_cg_edges: Optional[int] = None,
    aux_cutoff: Optional[float] = None,
) -> CGDatasetArrays:
    """Frames -> preprocessed arrays (reference build_dataset,
    datasets.py:459-506 + CGDataset.generate_neighbor_list, data.py:207-251).

    - optional per-frame random rotation augmentation (datasets.py:475)
    - CG coordinates = per-bead geometric mean unless cg_traj given
    - atom radius graph at atom_cutoff (directed, padded)
    - CG radius graph at cg_cutoff, or bond-contracted CG graph when
      cg_cutoff is None (data.py:227-248)
    - bonded edges expanded to graph distance <= order (edgeorder flag)
    """
    traj = np.asarray(traj, dtype=np.float32)
    f, n, _ = traj.shape
    mapping = np.asarray(mapping, dtype=np.int32)
    n_cgs = int(mapping.max()) + 1

    if rotate:
        traj = rotate_frames(traj, seed)

    if cg_traj is not None:
        cg_xyz = np.asarray(cg_traj, dtype=np.float32)
    else:
        cg_xyz = _segment_mean_np(traj, mapping, n_cgs).astype(np.float32)

    hyper = high_order_edges(np.asarray(bonds, dtype=np.int64), order, n)

    nbrs, nbr_mask = radius_graph_frames(
        traj, atom_cutoff, max_edges=max_atom_edges, directed=True
    )

    if cg_cutoff is not None:
        cg_nbrs, cg_nbr_mask = radius_graph_frames(
            cg_xyz, cg_cutoff, max_edges=max_cg_edges, directed=True
        )
    else:
        cg_e = make_directed(cg_graph_from_bonds(np.asarray(bonds), mapping, n, n_cgs))
        cg_e = cg_e[np.argsort(cg_e[:, 0], kind="stable")]  # receiver-sorted
        cg_nbrs = np.broadcast_to(cg_e, (f,) + cg_e.shape).copy()
        cg_nbr_mask = np.ones((f, cg_e.shape[0]), dtype=bool)

    aux_bonds = aux_mask = None
    if aux_cutoff is not None and aux_cutoff > 0.0:
        # aux radius edges replace the bonded graph-loss edges
        # (generate_aux_edges, data.py:199-205; run_ala.py:69-71)
        aux_bonds, aux_mask = radius_graph_frames(
            traj, aux_cutoff, directed=False
        )

    return CGDatasetArrays(
        z=np.asarray(atomic_nums, dtype=np.int32),
        xyz=traj,
        cg_xyz=cg_xyz,
        mapping=mapping,
        channel_idx=channel_index_from_mapping(mapping),
        bonds=np.asarray(hyper, dtype=np.int32),
        nbrs=nbrs,
        nbr_mask=nbr_mask,
        cg_nbrs=cg_nbrs,
        cg_nbr_mask=cg_nbr_mask,
        n_cgs=n_cgs,
        aux_bonds=aux_bonds,
        aux_mask=aux_mask,
    )


def kfold_indices(n: int, nsplits: int, seed: int = 123) -> Sequence[Tuple[np.ndarray, np.ndarray]]:
    """Deterministic K-fold split (reference uses sklearn KFold,
    run_ala.py:139-141)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    folds = np.array_split(order, nsplits)
    out = []
    for k in range(nsplits):
        test = folds[k]
        train = np.concatenate([folds[j] for j in range(nsplits) if j != k])
        out.append((np.sort(train), np.sort(test)))
    return out
