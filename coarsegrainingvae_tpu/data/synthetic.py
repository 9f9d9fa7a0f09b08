"""Synthetic molecular-dynamics-like ensembles.

The reference pulls alanine-dipeptide / pentapeptide trajectories from
mdshare and proteins from disk (datasets.py:24-40,170-187 in
/root/reference). Those MD IO libraries (mdtraj/mdshare/pyemma) are not
available in this image, so this module generates topologically realistic
stand-ins: a heavy-atom chain with tetrahedral geometry, attached hydrogens,
and per-frame conformations sampled by rotating random rotatable bonds
between Ramachandran-like torsion basins plus thermal jitter. The resulting
ensembles have a fixed bonded topology (so bond-graph validity metrics are
meaningful) and multi-modal conformational diversity (so the VAE has
something to learn). Real trajectories can be supplied as npz via
data.proteins.load_npz_traj.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

# dipeptide stand-in matches alanine dipeptide's size: 22 atoms, 10 heavy
_PRESETS = {
    "dipeptide": dict(n_heavy=10, n_frames_default=20000),
    "pentapeptide": dict(n_heavy=40, n_frames_default=10000),
    "chignolin": dict(n_heavy=77, n_frames_default=5000),
}

_BOND_CC = 1.52
_BOND_CH = 1.09
_TET = np.deg2rad(109.5)


def _base_geometry(n_heavy: int, rng: np.random.Generator):
    """Zig-zag heavy chain + hydrogens; returns (z, xyz, bonds, rotatable)."""
    heavy_z = rng.choice([6, 6, 6, 7, 8], size=n_heavy, p=[0.5, 0.2, 0.1, 0.1, 0.1])
    heavy_z[0] = 6
    pos = np.zeros((n_heavy, 3))
    direction = np.array([1.0, 0.0, 0.0])
    up = np.array([0.0, 1.0, 0.0])
    for i in range(1, n_heavy):
        # alternate bond direction to make a tetrahedral zig-zag
        ang = _TET / 2 if i % 2 == 0 else -_TET / 2
        c, s = np.cos(ang), np.sin(ang)
        d = c * direction + s * up
        d = d / np.linalg.norm(d)
        pos[i] = pos[i - 1] + _BOND_CC * d
    bonds = [(i - 1, i) for i in range(1, n_heavy)]

    # attach 1-2 hydrogens per carbon/nitrogen (valence-ish), none on O
    h_pos, h_parent = [], []
    for i in range(n_heavy):
        n_h = {6: 2, 7: 1, 8: 0}[int(heavy_z[i])]
        if i == 0 or i == n_heavy - 1:
            n_h = min(n_h + 1, 3)
        for k in range(n_h):
            phi = 2 * np.pi * (k + 1) / 3.0 + (0.5 if i % 2 else 0.0)
            off = np.array([0.0, np.cos(phi), np.sin(phi)])
            off = off - np.dot(off, direction) * direction * 0.3
            off = off / np.linalg.norm(off)
            h_pos.append(pos[i] + _BOND_CH * off)
            h_parent.append(i)

    n_h_total = len(h_pos)
    z = np.concatenate([heavy_z, np.ones(n_h_total)]).astype(np.int32)
    xyz = np.concatenate([pos, np.array(h_pos).reshape(-1, 3)], axis=0)
    bonds += [(p, n_heavy + k) for k, p in enumerate(h_parent)]
    bonds = np.array(bonds, dtype=np.int32)

    # rotatable bonds: interior heavy-chain bonds
    rotatable = [(i - 1, i) for i in range(2, n_heavy - 1)]
    return z, xyz, bonds, rotatable


def _downstream_atoms(bonds: np.ndarray, n_atoms: int, i: int, j: int) -> np.ndarray:
    """Atoms on j's side of bond (i, j) via BFS with edge (i,j) removed."""
    adj = [[] for _ in range(n_atoms)]
    for a, b in bonds:
        adj[a].append(b)
        adj[b].append(a)
    seen = {i, j}
    stack = [j]
    out = [j]
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if v not in seen:
                seen.add(v)
                stack.append(v)
                out.append(v)
    return np.array(sorted(out), dtype=np.int64)


def synthetic_peptide(
    name: str = "dipeptide",
    n_frames: int = 2000,
    seed: int = 123,
    jitter: float = 0.04,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Generate (atomic_nums (N,), frames (F,N,3) Angstrom, bonds (Eb,2)).

    Frames are conformers of one fixed topology: torsions of rotatable
    backbone bonds are drawn per frame from 3 Gaussian basins (trans/gauche+/
    gauche-), then Cartesian thermal noise is added.
    """
    if name not in _PRESETS:
        raise KeyError(f"unknown synthetic preset {name!r}; have {sorted(_PRESETS)}")
    rng = np.random.default_rng(seed)
    z, base, bonds, rotatable = _base_geometry(_PRESETS[name]["n_heavy"], rng)
    n_atoms = base.shape[0]

    downstream = [
        _downstream_atoms(bonds, n_atoms, i, j) for (i, j) in rotatable
    ]
    basins = np.deg2rad(np.array([180.0, 60.0, -60.0]))
    basin_width = np.deg2rad(15.0)

    frames = np.empty((n_frames, n_atoms, 3), dtype=np.float32)
    for f in range(n_frames):
        xyz = base.copy()
        for (i, j), ds in zip(rotatable, downstream):
            angle = basins[rng.integers(0, 3)] + rng.normal() * basin_width
            axis = xyz[j] - xyz[i]
            axis = axis / np.linalg.norm(axis)
            c, s = np.cos(angle), np.sin(angle)
            K = np.array(
                [
                    [0, -axis[2], axis[1]],
                    [axis[2], 0, -axis[0]],
                    [-axis[1], axis[0], 0],
                ]
            )
            R = np.eye(3) + s * K + (1 - c) * (K @ K)
            xyz[ds] = (xyz[ds] - xyz[j]) @ R.T + xyz[j]
        xyz += rng.normal(scale=jitter, size=xyz.shape)
        frames[f] = xyz - xyz.mean(axis=0, keepdims=True)

    return z, frames, bonds


def synthetic_protein(
    n_res: int, seed: int = 0, missing_frac: float = 0.0
) -> Tuple[str, np.ndarray]:
    """Random protein in the atom14 layout for testing the PCN path without
    SidechainNet: (seq, crd (n_res, 14, 3)).

    The backbone follows a smooth random-walk C-alpha trace (3.8 A spacing);
    backbone/sidechain atoms are placed at covalent-scale offsets around
    their C-alpha so the covalent-radius bond graph is well formed.
    missing_frac randomly zeroes sidechain atoms (SidechainNet items have
    missing coordinates; zero rows mean 'absent').
    """
    from coarsegrainingvae_tpu.data.sidechain import ATOM_MAP_14, AMINO_ACIDS

    rng = np.random.default_rng(seed)
    seq = "".join(rng.choice(list(AMINO_ACIDS), size=n_res))

    # smooth C-alpha random walk, offset from the origin (a zero coordinate
    # row means 'missing atom' in the atom14 convention)
    ca = np.full((n_res, 3), 10.0)
    d = np.array([1.0, 0.0, 0.0])
    for i in range(1, n_res):
        d = d + 0.5 * rng.normal(size=3)
        d /= np.linalg.norm(d)
        ca[i] = ca[i - 1] + 3.8 * d

    crd = np.zeros((n_res, 14, 3), np.float32)
    for i, aa in enumerate(seq):
        names = ATOM_MAP_14[aa]
        # backbone frame along the chain
        fwd = (ca[min(i + 1, n_res - 1)] - ca[max(i - 1, 0)])
        fwd /= np.linalg.norm(fwd) + 1e-9
        side = np.cross(fwd, [0.0, 0.0, 1.0])
        side /= np.linalg.norm(side) + 1e-9
        upv = np.cross(fwd, side)
        crd[i, 1] = ca[i]
        crd[i, 0] = ca[i] - 1.46 * fwd + 0.2 * upv            # N
        crd[i, 2] = ca[i] + 1.52 * fwd + 0.2 * upv            # C
        crd[i, 3] = crd[i, 2] + 1.23 * upv                    # O
        # sidechain chain growing off CA
        prev = ca[i]
        grow = side + 0.3 * rng.normal(size=3)
        grow /= np.linalg.norm(grow)
        for slot in range(4, 14):
            if not names[slot]:
                break
            prev = prev + 1.5 * grow
            crd[i, slot] = prev
            grow = grow + 0.4 * rng.normal(size=3)
            grow /= np.linalg.norm(grow)
            if missing_frac > 0 and rng.random() < missing_frac:
                crd[i, slot] = 0.0
    return seq, crd
