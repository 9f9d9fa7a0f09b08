"""Precompute packed dataset caches.

Counterpart of the reference's generate_pkl.py (scripts/generate_pkl.py:12-44
in /root/reference), which pre-parses SidechainNet pickles. Here:

  * proteins:  a pickle of {'seq': [...], 'crd': [...]} OR a directory of
               .pdb files (CASP14-style targets, parsed by utils/pdb.py)
               -> padded PCN arrays saved as npz (skips the per-item parse
               at train time)
  * trajectory: any (z, xyz, bonds) npz is already the native cache format
               (data/proteins.py); this tool validates + re-compresses it.

Usage:
    python -m coarsegrainingvae_tpu.cli.generate_cache -kind protein \
        -src casp12.pkl -out casp12_cache.npz
    python -m coarsegrainingvae_tpu.cli.generate_cache -kind protein \
        -src casp14_targets/ -out casp14_cache.npz
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def cache_proteins(src: str, out: str, cutoff: float = 10.0) -> None:
    from coarsegrainingvae_tpu.data.sidechain import build_pcn_dataset

    if os.path.isdir(src):
        from coarsegrainingvae_tpu.utils.pdb import load_pdb_dir

        items = [(seq, crd) for _, seq, crd in load_pdb_dir(src)]
    else:
        with open(src, "rb") as f:
            d = pickle.load(f)
        items = list(zip(d["seq"], d["crd"]))
    ds = build_pcn_dataset(items, cg_cutoff=cutoff)
    arrays = {
        k: getattr(ds, k)
        for k in ("z", "xyz", "atom_mask", "res_idx", "ca_xyz", "cg_mask",
                  "mapping", "channel_idx", "ca_flag", "nbrs", "nbr_mask",
                  "bonds", "bond_mask", "dihe_quads", "dihe_mask")
    }
    np.savez_compressed(out, seqs=np.array(ds.seqs), **arrays)
    print(f"wrote {out}: {len(ds)} proteins, n_max={ds.z.shape[1]}")


def cache_traj(src: str, out: str) -> None:
    from coarsegrainingvae_tpu.data.proteins import load_npz_traj, save_npz_traj

    z, xyz, bonds = load_npz_traj(src)
    save_npz_traj(out, z, xyz, bonds)
    print(f"wrote {out}: {xyz.shape[0]} frames x {xyz.shape[1]} atoms")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-kind", choices=["protein", "traj"], required=True)
    p.add_argument("-src", required=True)
    p.add_argument("-out", required=True)
    p.add_argument("-cutoff", type=float, default=10.0)
    a = p.parse_args(argv)
    if a.kind == "protein":
        cache_proteins(a.src, a.out, a.cutoff)
    else:
        cache_traj(a.src, a.out)


if __name__ == "__main__":
    main()
