"""Trajectory loading: dataset registry + npz cache + gated MD-library path.

The reference registry PROTEINFILES (datasets.py:24-40 in /root/reference)
points at DESRES/mdshare trajectory files loaded through mdtraj/pyemma
(load_protein_traj, datasets.py:170-187; get_traj :396-443). Those libraries
are not installed in this image and there is no network egress, so loading
resolves in order:

1. a packed ``.npz`` cache (``{name}.npz`` with z/xyz/bonds arrays) under
   ``COARSEGRAININGVAE_DATA`` or ``./data`` -- the preprocessed format we
   recommend for real trajectories (compute once, stream fast);
2. mdtraj, if importable, for the registry's raw trajectory formats;
3. the synthetic stand-in ensembles (data/synthetic.py), which keep every
   driver, benchmark and test runnable end-to-end.
"""
from __future__ import annotations

import glob
import os
from typing import Optional, Tuple

import numpy as np

from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide

# name -> (traj glob, topology file); mirrors PROTEINFILES (datasets.py:24-40)
PROTEINFILES = {
    "covid": {"traj_paths": "DESRES-Trajectory_spike/*.dcd",
              "pdb_path": "DESRES_spike.pdb"},
    "chignolin": {"traj_paths": "filtered/*.xtc",
                  "pdb_path": "filtered/filtered.pdb"},
    "dipeptide": {"traj_paths": "alanine-dipeptide-*-250ns-nowater.xtc",
                  "pdb_path": "alanine-dipeptide-nowater.pdb"},
    "pentapeptide": {"traj_paths": "pentapeptide-*-500ns-impl-solv.xtc",
                     "pdb_path": "pentapeptide-impl-solv.pdb"},
}

ATOMIC_NUM = {"H": 1, "C": 6, "N": 7, "O": 8, "S": 16}  # datasets.py:22


def data_root() -> str:
    return os.environ.get("COARSEGRAININGVAE_DATA", "./data")


def save_npz_traj(path: str, z: np.ndarray, xyz: np.ndarray,
                  bonds: np.ndarray) -> None:
    np.savez_compressed(path, z=z.astype(np.int32),
                        xyz=xyz.astype(np.float32),
                        bonds=bonds.astype(np.int32))


def load_npz_traj(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    with np.load(path) as f:
        return f["z"], f["xyz"], f["bonds"]


def _load_mdtraj(name: str, ndata: int):
    """Raw trajectory path via mdtraj (load_protein_traj,
    datasets.py:170-187). Returns None when mdtraj is unavailable."""
    try:
        import mdtraj as md
    except ImportError:
        return None
    entry = PROTEINFILES.get(name)
    if entry is None:
        return None
    root = data_root()
    files = sorted(glob.glob(os.path.join(root, entry["traj_paths"])))[:200]
    top = os.path.join(root, entry["pdb_path"])
    if not files or not os.path.exists(top):
        return None
    traj = md.join([md.load(f, top=top) for f in files])
    heavy_and_h = traj.top.select("protein")
    traj = traj.atom_slice(heavy_and_h)
    z = np.array(
        [ATOMIC_NUM[a.element.symbol] for a in traj.top.atoms], np.int32
    )
    xyz = traj.xyz[:ndata] * 10.0  # nm -> Angstrom (datasets.py:436)
    bonds = np.array(
        [[b[0].index, b[1].index] for b in traj.top.bonds], np.int32
    )
    return z, xyz.astype(np.float32), bonds


def load_frames(
    name: str, ndata: int, seed: int = 123, shuffle: bool = True
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(z, frames (ndata, N, 3), bonds). Resolution order: npz cache ->
    mdtraj -> synthetic stand-in (module docstring)."""
    cache = os.path.join(data_root(), f"{name}.npz")
    if os.path.exists(cache):
        z, xyz, bonds = load_npz_traj(cache)
    else:
        loaded = _load_mdtraj(name, max(ndata * 2, ndata))
        if loaded is not None:
            z, xyz, bonds = loaded
        else:
            # synthetic generation relaxes every frame against covalent
            # cutoffs (minutes at protein scale) -- cache per
            # (generator version, name, ndata, seed) so repeat runs skip it
            # and generator changes invalidate instead of serving stale
            import tempfile

            from coarsegrainingvae_tpu.data.synthetic import SYNTH_VERSION

            cdir = os.path.join(tempfile.gettempdir(), "cgvae_synth_cache")
            cpath = os.path.join(
                cdir, f"v{SYNTH_VERSION}_{name}_{ndata}_{seed}.npz"
            )
            if os.path.exists(cpath):
                with np.load(cpath) as d:
                    z, xyz, bonds = d["z"], d["xyz"], d["bonds"]
            else:
                z, xyz, bonds = synthetic_peptide(name, n_frames=ndata, seed=seed)
                os.makedirs(cdir, exist_ok=True)
                tmp = cpath + ".tmp.npz"
                np.savez_compressed(tmp, z=z, xyz=xyz, bonds=bonds)
                os.replace(tmp, cpath)

    if shuffle:
        # shuffle_traj (scripts/utils.py:17-20)
        order = np.random.default_rng(seed).permutation(xyz.shape[0])
        xyz = xyz[order]
    return z, xyz[:ndata], bonds
