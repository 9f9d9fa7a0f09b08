"""Exercise the mdtraj ingestion branch with an mdtraj-shaped fixture.

The reference loads raw MD trajectories through mdtraj
(/root/reference/CoarseGrainingVAE/datasets.py:170-187); our counterparts
are `data/proteins.py::_load_mdtraj` and `cli/generate_cache.py::
cache_mdtraj`. mdtraj is not installed in this image, so these tests
inject a minimal mdtraj-API-compatible module (load/join/atom_slice/
Topology.select/atoms/bonds, xyz in nm) whose storage is plain npz --
the code under test is OUR branch logic (globbing, joining, protein
slice, nm->Angstrom, bond extraction, npz schema), not mdtraj itself.
On a machine with real mdtraj the same code paths run unchanged.
"""
import glob
import os
import sys
import types

import numpy as np
import pytest

SYMBOL = {1: "H", 6: "C", 7: "N", 8: "O", 16: "S"}


class _Element:
    def __init__(self, symbol):
        self.symbol = symbol


class _Atom:
    def __init__(self, index, symbol, name):
        self.index = index
        self.element = _Element(symbol)
        self.name = name


class _Topology:
    def __init__(self, symbols, names, bonds):
        self._atoms = [
            _Atom(i, s, n) for i, (s, n) in enumerate(zip(symbols, names))
        ]
        self._bonds = [(self._atoms[a], self._atoms[b]) for a, b in bonds]

    @property
    def atoms(self):
        return iter(self._atoms)

    @property
    def bonds(self):
        return iter(self._bonds)

    def select(self, expr):
        assert expr == "protein"
        return np.arange(len(self._atoms))


class _Trajectory:
    def __init__(self, xyz, top):
        self.xyz = np.asarray(xyz, np.float32)  # nm, like mdtraj
        self.top = top

    def atom_slice(self, idx):
        idx = np.asarray(idx)
        symbols = [self.top._atoms[i].element.symbol for i in idx]
        names = [self.top._atoms[i].name for i in idx]
        remap = {int(o): k for k, o in enumerate(idx)}
        bonds = [
            (remap[a.index], remap[b.index])
            for a, b in self.top._bonds
            if a.index in remap and b.index in remap
        ]
        return _Trajectory(self.xyz[:, idx], _Topology(symbols, names, bonds))


def _fake_mdtraj():
    md = types.ModuleType("mdtraj")

    def load(path, top):
        with open(top, "rb") as f:
            t = dict(np.load(f, allow_pickle=False))
        topo = _Topology([str(s) for s in t["symbols"]],
                         [str(n) for n in t["names"]],
                         t["bonds"])
        with open(path, "rb") as f:
            d = dict(np.load(f, allow_pickle=False))
        return _Trajectory(d["xyz_nm"], topo)

    def join(trajs):
        return _Trajectory(
            np.concatenate([t.xyz for t in trajs], 0), trajs[0].top
        )

    md.load, md.join = load, join
    return md


@pytest.fixture
def dipeptide_traj_dir(tmp_path, monkeypatch):
    """A data root holding the dipeptide registry layout (PROTEINFILES,
    data/proteins.py) as fake-mdtraj-readable files: two 'xtc' shards +
    one topology 'pdb' (npz payloads under the registry's file names)."""
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide

    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=24, seed=3)
    symbols = np.array([SYMBOL[int(v)] for v in z])
    names = np.array([f"{SYMBOL[int(v)]}{i}" for i, v in enumerate(z)])
    root = tmp_path / "dataroot"
    root.mkdir()
    with open(root / "alanine-dipeptide-nowater.pdb", "wb") as f:
        np.savez(f, symbols=symbols, names=names,
                 bonds=np.asarray(bonds, np.int32))
    # shard the trajectory over two files; xyz stored in nm like mdtraj
    for k, sl in enumerate((slice(0, 16), slice(16, 24))):
        name = f"alanine-dipeptide-{k}-250ns-nowater.xtc"
        with open(root / name, "wb") as f:
            np.savez(f, xyz_nm=(frames[sl] / 10.0).astype(np.float32))
    monkeypatch.setenv("COARSEGRAININGVAE_DATA", str(root))
    monkeypatch.setitem(sys.modules, "mdtraj", _fake_mdtraj())
    return root, z, frames, bonds


def test_load_frames_mdtraj_branch(dipeptide_traj_dir):
    """No npz cache present -> load_frames resolves through _load_mdtraj:
    glob + join shards in sorted order, protein slice, nm -> Angstrom."""
    from coarsegrainingvae_tpu.data.proteins import load_frames

    root, z, frames, bonds = dipeptide_traj_dir
    assert not os.path.exists(root / "dipeptide.npz")
    z2, xyz2, bonds2 = load_frames("dipeptide", ndata=24, shuffle=False)
    np.testing.assert_array_equal(z2, z)
    assert xyz2.shape == frames.shape
    # nm -> Angstrom round trip is float32-exact to ~1e-5 relative
    np.testing.assert_allclose(xyz2, frames, rtol=0, atol=2e-5)
    assert set(map(tuple, np.sort(bonds2, 1).tolist())) == set(
        map(tuple, np.sort(np.asarray(bonds), 1).tolist())
    )


def test_generate_cache_mdtraj_to_run_cv(dipeptide_traj_dir, tmp_path):
    """generate_cache -kind mdtraj -> native trajectory npz -> run_cv
    trains on it (the full ingestion chain the reference runs through
    datasets.py:170-187 + scripts/run_ala.py)."""
    from coarsegrainingvae_tpu.cli.generate_cache import main as cache_main
    from coarsegrainingvae_tpu.cli.run_cgvae import main as run_main
    from coarsegrainingvae_tpu.data.proteins import load_npz_traj

    root, z, frames, bonds = dipeptide_traj_dir
    out = root / "mytraj_md.npz"
    cache_main([
        "-kind", "mdtraj",
        "-src", str(root / "alanine-dipeptide-*-250ns-nowater.xtc"),
        "-top", str(root / "alanine-dipeptide-nowater.pdb"),
        "-out", str(out),
    ])
    z2, xyz2, bonds2 = load_npz_traj(str(out))
    assert xyz2.shape == frames.shape and z2.shape == z.shape
    np.testing.assert_allclose(xyz2, frames, rtol=0, atol=2e-5)

    rows = run_main([
        "-logdir", str(tmp_path / "run"), "-dataset", "mytraj_md",
        "-n_cgs", "3", "-n_basis", "16", "-n_rbf", "4",
        "-enc_nconv", "1", "-dec_nconv", "1", "-ndata", "24",
        "-nepochs", "1", "-batch_size", "8", "-nsplits", "2",
        "-beta", "0.01", "-gamma", "1.0", "-n_ensemble", "2",
        "-nevals", "2", "--dec_type", "painn", "-cg_method", "newman",
        "-max_folds", "1",
    ])
    assert len(rows) == 1
    assert np.isfinite(rows[0]["test_all_recon_rmsd"])
