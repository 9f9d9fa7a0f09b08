"""Reload a finished run and re-evaluate / project it.

Rebuild of the reference's postanalysis.py (in /root/reference): `test()`
reloads modelparams.json + weights and recomputes test metrics
(postanalysis.py:71-146); `tica()` projects true vs generated ensembles into
a shared TICA space (postanalysis.py:25-68). The reference file is
import-broken (mixed absolute/relative imports, postanalysis.py:3-10); this
one is a working CLI:

    python -m coarsegrainingvae_tpu.cli.postanalysis -logdir <run>/fold0 \
        -modelparams <run>/modelparams.json
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from coarsegrainingvae_tpu.config import ExperimentConfig
from coarsegrainingvae_tpu.data.dataset import build_dataset
from coarsegrainingvae_tpu.data.proteins import load_frames
from coarsegrainingvae_tpu.eval.analysis import pairwise_distance_features, tica
from coarsegrainingvae_tpu.eval.sampling import reconstruct_all, sample_ensemble
from coarsegrainingvae_tpu.models.cgvae import build_flagship_model
from coarsegrainingvae_tpu.train.checkpoint import CheckpointManager
from coarsegrainingvae_tpu.train.trainer import Trainer


def load_run(modelparams: str, fold_dir: str):
    """(cfg, trainer, state, mapping) from a finished fold."""
    cfg = ExperimentConfig.load(modelparams)
    with open(os.path.join(fold_dir, "mapping.json")) as f:
        mapping = np.asarray(json.load(f), np.int32)
    # the same model-class decision the training driver made (dense vs
    # sparse) -- restoring with the wrong class fails the orbax tree match
    trainer = Trainer(build_flagship_model(cfg.model), cfg)

    z, frames, bonds = load_frames(cfg.data.dataset, cfg.data.ndata,
                                   seed=cfg.data.seed)
    ds = build_dataset(mapping, frames, cfg.model.atom_cutoff,
                       cfg.model.cg_cutoff, z, bonds,
                       order=cfg.data.edgeorder, rotate=False,
                       seed=cfg.data.seed)
    template = trainer.init_state(
        ds.batch(np.arange(min(cfg.data.batch_size, len(ds)))),
        seed=cfg.data.seed,
    )
    mgr = CheckpointManager(os.path.join(fold_dir, "ckpt"))
    state, _, step = mgr.restore(template)
    mgr.close()
    return cfg, trainer, state, mapping, ds


def reevaluate(modelparams: str, fold_dir: str, graph_eval: bool = True,
               n_ensemble: int = 8, nevals: int = 16) -> dict:
    cfg, trainer, state, mapping, ds = load_run(modelparams, fold_dir)
    rng = jax.random.PRNGKey(cfg.data.seed + 1234)
    recon = reconstruct_all(trainer, state.params, ds, rng,
                            batch_size=cfg.data.batch_size,
                            graph_eval=graph_eval)
    frames_idx = np.linspace(0, len(ds) - 1, min(nevals, len(ds))).astype(int)
    samples = sample_ensemble(trainer, state.params, ds, frames_idx,
                              n_ensemble, jax.random.fold_in(rng, 1),
                              graph_eval=graph_eval)

    # shared-TICA projection of true vs generated (postanalysis.py:25-68)
    true_feats = pairwise_distance_features(recon["true_xyzs"])
    gen_feats = pairwise_distance_features(
        samples["sample_xyzs"].reshape(-1, ds.n_atoms, 3)
    )
    lag = max(min(len(true_feats) // 10, 50), 1)
    _, comps = tica(true_feats, lag=lag, dim=2)
    mean = true_feats.mean(0)
    out = {
        "all_atom_rmsd": recon["all_atom_rmsd"],
        "heavy_atom_rmsd": recon["heavy_atom_rmsd"],
        "tica_true": ((true_feats - mean) @ comps).tolist(),
        "tica_gen": ((gen_feats - mean) @ comps).tolist(),
    }
    if graph_eval:
        out.update({k: recon[k] for k in
                    ("all_valid_ratio", "heavy_valid_ratio", "all_ged",
                     "heavy_ged")})
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-modelparams", type=str, required=True)
    p.add_argument("-logdir", type=str, required=True,
                   help="fold directory containing mapping.json + ckpt/")
    p.add_argument("-out", type=str, default="")
    p.add_argument("--no_graph_eval", action="store_true")
    a = p.parse_args(argv)
    res = reevaluate(a.modelparams, a.logdir, graph_eval=not a.no_graph_eval)
    summary = {k: v for k, v in res.items() if not k.startswith("tica")}
    print(json.dumps(summary, indent=2))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(res, f)
    return res


if __name__ == "__main__":
    main()
