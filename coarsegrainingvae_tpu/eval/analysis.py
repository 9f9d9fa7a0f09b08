"""Post-hoc analysis: TICA projections, Ramachandran features, KDE
free-energy surfaces, cv_stats aggregation.

Rebuild of the reference's plots.py / postanalysis.py (in /root/reference).
The reference leans on pyemma for both TICA (postanalysis.py:25-68) and
Ramachandran featurization (plots.py:88-101); neither pyemma nor mdtraj is
available here, so TICA is implemented directly (time-lagged covariance
generalized eigenproblem -- a page of numpy) and Ramachandran angles come
from our own dihedral op given phi/psi index quads.
"""
from __future__ import annotations

import csv
import glob
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


# --------------------------------------------------------------------- TICA
def tica(
    features: np.ndarray, lag: int = 10, dim: int = 2, eps: float = 1e-6
) -> Tuple[np.ndarray, np.ndarray]:
    """Time-lagged independent component analysis.

    features: (T, F) per-frame features. Returns (projection (T, dim),
    components (F, dim)). Solves the symmetrized time-lagged covariance
    generalized eigenproblem C_tau v = lambda C_0 v (the method pyemma
    provides for postanalysis.py:25-68).
    """
    x = np.asarray(features, np.float64)
    x = x - x.mean(0)
    t = x.shape[0] - lag
    if t <= 1:
        raise ValueError("trajectory shorter than lag")
    x0, x1 = x[:-lag], x[lag:]
    c0 = (x0.T @ x0 + x1.T @ x1) / (2 * t)
    ct = (x0.T @ x1 + x1.T @ x0) / (2 * t)
    c0 += eps * np.eye(c0.shape[0])

    # whiten then ordinary symmetric eigenproblem
    w, u = np.linalg.eigh(c0)
    keep = w > eps
    whiten = u[:, keep] / np.sqrt(w[keep])
    m = whiten.T @ ct @ whiten
    lam, v = np.linalg.eigh((m + m.T) / 2)
    order = np.argsort(lam)[::-1][:dim]
    comps = whiten @ v[:, order]
    return x @ comps, comps


def pairwise_distance_features(xyz: np.ndarray, stride: int = 1) -> np.ndarray:
    """(T, N, 3) -> (T, N*(N-1)/2) pairwise distances, the default TICA
    featurization for small molecules."""
    xyz = np.asarray(xyz)[::stride]
    n = xyz.shape[1]
    iu = np.triu_indices(n, k=1)
    d = np.linalg.norm(xyz[:, iu[0]] - xyz[:, iu[1]], axis=-1)
    return d


# ------------------------------------------------------------- Ramachandran
def phi_psi_quads(
    atom_names, mapping
) -> Tuple[np.ndarray, np.ndarray]:
    """Automatic phi/psi index selection from per-atom names + residue
    mapping (the reference gets these from pyemma's featurizer,
    plots.py:88-101 in /root/reference; this needs no MD library).

    phi(i) = C(i-1), N(i), CA(i), C(i); psi(i) = N(i), CA(i), C(i), N(i+1),
    using only residues whose backbone atoms are all present. atom_names:
    per-atom names ('N'/'CA'/'C'/...; e.g. from a trajectory npz written by
    data.proteins.traj_npz_from_pdb_frames, or ATOM_NAMES[props.atom_idx]);
    mapping: per-atom residue index. Returns (phi (P,4), psi (Q,4))."""
    mapping = np.asarray(mapping)
    n_res = int(mapping.max()) + 1 if mapping.size else 0
    slot = {"N": 0, "CA": 1, "C": 2}
    bb = -np.ones((n_res, 3), np.int64)
    for ai, nm in enumerate(atom_names):
        s = slot.get(str(nm))
        if s is not None:
            bb[mapping[ai], s] = ai
    phis, psis = [], []
    for i in range(n_res):
        if i > 0 and bb[i - 1, 2] >= 0 and np.all(bb[i] >= 0):
            phis.append([bb[i - 1, 2], bb[i, 0], bb[i, 1], bb[i, 2]])
        if i + 1 < n_res and np.all(bb[i] >= 0) and bb[i + 1, 0] >= 0:
            psis.append([bb[i, 0], bb[i, 1], bb[i, 2], bb[i + 1, 0]])
    return (
        np.asarray(phis, np.int32) if phis else np.zeros((0, 4), np.int32),
        np.asarray(psis, np.int32) if psis else np.zeros((0, 4), np.int32),
    )


def ramachandran(xyz: np.ndarray, phi_quads: np.ndarray,
                 psi_quads: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Backbone (phi, psi) angles per frame (plots.py:88-101 uses pyemma's
    featurizer; here the quads come from data.sidechain.backbone_dihedral_quads
    or any explicit index set). xyz: (T, N, 3). Returns (T, n_phi), (T, n_psi)."""
    import jax.numpy as jnp

    from coarsegrainingvae_tpu.ops.geometry import dihedral

    phis = np.stack(
        [np.asarray(dihedral(jnp.asarray(f), jnp.asarray(phi_quads))) for f in xyz]
    )
    psis = np.stack(
        [np.asarray(dihedral(jnp.asarray(f), jnp.asarray(psi_quads))) for f in xyz]
    )
    return phis, psis


# ------------------------------------------------------- KDE free energy
def kde_free_energy(
    x: np.ndarray, y: np.ndarray, grid: int = 100,
    kT: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """2D Gaussian-KDE free-energy surface F = -kT log p (plots.py:61-85).

    Returns (X, Y, F) meshgrid arrays suitable for contour plotting.
    """
    from scipy.stats import gaussian_kde

    pts = np.vstack([x, y])
    kde = gaussian_kde(pts)
    xi = np.linspace(x.min(), x.max(), grid)
    yi = np.linspace(y.min(), y.max(), grid)
    xg, yg = np.meshgrid(xi, yi)
    p = kde(np.vstack([xg.ravel(), yg.ravel()])).reshape(grid, grid)
    f = -kT * np.log(p + 1e-12)
    f -= f.min()
    return xg, yg, f


def plot_free_energy(x, y, path: str, grid: int = 100) -> None:
    """Contour plot of the KDE free energy (matplotlib, Agg backend)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xg, yg, f = kde_free_energy(x, y, grid)
    fig, ax = plt.subplots(figsize=(5, 4))
    c = ax.contourf(xg, yg, f, levels=30)
    fig.colorbar(c, ax=ax, label="free energy / kT")
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


# ------------------------------------------------------- cv_stats rollups
def read_csv_rows(path: str) -> List[Dict[str, str]]:
    with open(path) as f:
        return list(csv.DictReader(f))


def get_cv_stats(logdir: str) -> Dict[str, Tuple[float, float]]:
    """Aggregate a run's cv_stats.csv into mean/std per metric
    (plots.py:21-44)."""
    rows = read_csv_rows(os.path.join(logdir, "cv_stats.csv"))
    out: Dict[str, Tuple[float, float]] = {}
    if not rows:
        return out
    for key in rows[0]:
        try:
            vals = np.array([float(r[key]) for r in rows])
        except ValueError:
            continue
        out[key] = (float(np.nanmean(vals)), float(np.nanstd(vals)))
    return out


def collect_runs(pattern: str) -> Dict[str, Dict[str, Tuple[float, float]]]:
    """Aggregate many run dirs (plots.py retrieve_frames / rmsd-by-resolution
    collation, :46-59,138-169): pattern is a glob over logdirs."""
    return {
        d: get_cv_stats(d)
        for d in sorted(glob.glob(pattern))
        if os.path.exists(os.path.join(d, "cv_stats.csv"))
    }


def bond_length_distribution(
    xyz: np.ndarray, bonds: np.ndarray
) -> np.ndarray:
    """Bonded-distance samples pooled over frames (reference bond-length
    extraction, plots.py:120-136). xyz (T, N, 3), bonds (E, 2) -> (T*E,)."""
    xyz = np.asarray(xyz)
    d = np.linalg.norm(
        xyz[:, np.asarray(bonds)[:, 0]] - xyz[:, np.asarray(bonds)[:, 1]],
        axis=-1,
    )
    return d.reshape(-1)
