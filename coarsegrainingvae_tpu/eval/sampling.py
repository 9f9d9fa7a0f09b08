"""Prior-conditioned ensemble sampling and test-set reconstruction.

The reference samples ensembles with a Python loop over n_ensemble decoder
calls at batch_size=1 (scripts/sampling.py:252-311 in /root/reference). On
TPU the ensemble IS the batch axis: one frame's CG geometry is tiled
n_sample times into a fixed-shape CGBatch and a single jitted generate pass
produces the whole ensemble.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from coarsegrainingvae_tpu.data.batch import CGBatch
from coarsegrainingvae_tpu.data.dataset import CGDatasetArrays
from coarsegrainingvae_tpu.eval.metrics import evaluate_samples


def tile_frame(ds: CGDatasetArrays, frame: int, n: int) -> CGBatch:
    """Replicate one frame n times along the batch axis."""
    idx = np.full((n,), frame, dtype=np.int64)
    return ds.batch(idx)


def reflect_batch(batch: CGBatch) -> CGBatch:
    """Reflect coordinates across the x-z plane (the --reflectiontest probe,
    utils.py:216-219 / sampling.py:258-261)."""
    xyz = np.asarray(batch.xyz).copy()
    cg = np.asarray(batch.cg_xyz).copy()
    xyz[..., 1] *= -1
    cg[..., 1] *= -1
    return batch.replace(xyz=jnp.asarray(xyz), cg_xyz=jnp.asarray(cg))


def sample_ensemble(
    trainer,
    params,
    ds: CGDatasetArrays,
    frames: np.ndarray,
    n_sample: int,
    rng: jax.Array,
    graph_eval: bool = True,
    reflection: bool = False,
) -> Dict[str, object]:
    """Generate n_sample structures per selected frame + quality metrics
    (sample_ensemble, sampling.py:335-399)."""
    n_atoms = ds.n_atoms
    z = ds.z

    sample_xyzs: List[np.ndarray] = []
    data_xyzs: List[np.ndarray] = []
    recon_xyzs: List[np.ndarray] = []
    cg_xyzs: List[np.ndarray] = []
    stats: Dict[str, list] = {
        "all_rmsds": [], "heavy_rmsds": [], "valid_ratio": [],
        "valid_allatom_ratio": [], "graph_val_ratio": [],
        "graph_allatom_val_ratio": [],
    }

    for k, f in enumerate(np.asarray(frames)):
        batch = tile_frame(ds, int(f), n_sample)
        if reflection:
            batch = reflect_batch(batch)
        gen = trainer.generate(params, batch, jax.random.fold_in(rng, k))
        gen = np.asarray(jax.device_get(gen)).reshape(n_sample, n_atoms, 3)
        ref = np.asarray(batch.xyz)[0]

        recon = trainer.reconstruct(
            params, ds.batch(np.array([int(f)])), jax.random.fold_in(rng, 10_000 + k)
        )
        recon = np.asarray(jax.device_get(recon)).reshape(n_atoms, 3)

        sample_xyzs.append(gen)
        data_xyzs.append(ref)
        recon_xyzs.append(recon)
        cg_xyzs.append(np.asarray(batch.cg_xyz)[0])

        if graph_eval:
            q = evaluate_samples(ref, gen, z)
            for key in stats:
                v = q[key]
                if v is not None:
                    stats[key].append(v)

    out: Dict[str, object] = {
        "sample_xyzs": np.stack(sample_xyzs),
        "data_xyzs": np.stack(data_xyzs),
        "recon_xyzs": np.stack(recon_xyzs),
        "cg_xyzs": np.stack(cg_xyzs),
    }
    if graph_eval:
        out["sample_valid"] = float(np.mean(stats["valid_ratio"])) if stats["valid_ratio"] else 0.0
        out["sample_allatom_valid"] = (
            float(np.mean(stats["valid_allatom_ratio"])) if stats["valid_allatom_ratio"] else 0.0
        )
        out["sample_graph_val_ratio"] = (
            float(np.mean(stats["graph_val_ratio"])) if stats["graph_val_ratio"] else 0.0
        )
        out["sample_graph_allatom_val_ratio"] = (
            float(np.mean(stats["graph_allatom_val_ratio"]))
            if stats["graph_allatom_val_ratio"] else 0.0
        )
        out["all_rmsds"] = (
            np.concatenate(stats["all_rmsds"]) if stats["all_rmsds"] else None
        )
        out["heavy_rmsds"] = (
            np.concatenate(stats["heavy_rmsds"]) if stats["heavy_rmsds"] else None
        )
    return out


def reconstruct_all(
    trainer,
    params,
    ds: CGDatasetArrays,
    rng: jax.Array,
    batch_size: int = 32,
    graph_eval: bool = True,
    reflection: bool = False,
) -> Dict[str, object]:
    """Reconstruct every frame + per-structure validity/GED
    (get_all_true_reconstructed_structures, scripts/utils.py:193-268)."""
    n = len(ds)
    n_atoms = ds.n_atoms
    recons = np.empty((n, n_atoms, 3), np.float32)
    trues = np.empty((n, n_atoms, 3), np.float32)
    cgs = np.empty((n, ds.n_cgs, 3), np.float32)

    order = np.arange(n)
    for lo in range(0, n, batch_size):
        idx = order[lo : lo + batch_size]
        pad = batch_size - idx.shape[0]
        if pad:
            idx = np.concatenate([idx, order[:pad]])
        batch = ds.batch(idx)
        if reflection:
            batch = reflect_batch(batch)
        recon = trainer.reconstruct(params, batch, jax.random.fold_in(rng, lo))
        recon = np.asarray(jax.device_get(recon)).reshape(batch_size, n_atoms, 3)
        take = batch_size - pad
        recons[lo : lo + take] = recon[:take]
        trues[lo : lo + take] = np.asarray(batch.xyz)[:take]
        cgs[lo : lo + take] = np.asarray(batch.cg_xyz)[:take]

    out: Dict[str, object] = {
        "true_xyzs": trues, "recon_xyzs": recons, "cg_xyzs": cgs,
    }
    if graph_eval:
        per = [evaluate_samples(trues[i], recons[i : i + 1], ds.z) for i in range(n)]
        out["all_valid_ratio"] = float(np.mean([p["valid_allatom_ratio"] for p in per]))
        out["heavy_valid_ratio"] = float(np.mean([p["valid_ratio"] for p in per]))
        out["all_ged"] = float(np.mean([p["graph_allatom_val_ratio"] for p in per]))
        out["heavy_ged"] = float(np.mean([p["graph_val_ratio"] for p in per]))
    # unaligned recon RMSD over the whole set (run_ala.py:338-352)
    d2 = ((recons - trues) ** 2).sum(-1)
    out["all_atom_rmsd"] = float(np.sqrt(d2.mean()))
    heavy = ds.z != 1
    out["heavy_atom_rmsd"] = float(np.sqrt(d2[:, heavy].mean()))
    # robust per-frame statistics next to the reference-parity mean: a
    # single pathological frame can dominate the pooled mean (a 7e5-RMSD
    # frame once poisoned a whole fold's headline), so also report the
    # median and p99 of the per-frame RMSD distribution
    frame_all = np.sqrt(d2.mean(axis=1))
    frame_heavy = np.sqrt(d2[:, heavy].mean(axis=1))
    out["all_atom_rmsd_median"] = float(np.median(frame_all))
    out["all_atom_rmsd_p99"] = float(np.percentile(frame_all, 99))
    out["heavy_atom_rmsd_median"] = float(np.median(frame_heavy))
    out["heavy_atom_rmsd_p99"] = float(np.percentile(frame_heavy, 99))
    return out
