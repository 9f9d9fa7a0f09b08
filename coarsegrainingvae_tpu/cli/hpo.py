"""Hyperparameter search (stand-in for the reference's SigOpt loops,
scripts/opt.py / baseline_opt.py / diffpool_opt.py / pcn_opt.py in
/root/reference).

SigOpt is a hosted service (no egress here), so this provides the same
capability locally: a seeded random-search / successive-halving (ASHA-style)
driver over the same search spaces (opt.py:63-83), optimizing the CV test
reconstruction metric. Observations are appended to ``hpo_log.csv`` with
``failed`` flags, mirroring opt.py:147-160.

Usage:
    python -m coarsegrainingvae_tpu.cli.hpo -n_trials 10 -nepochs 5 ...
"""
from __future__ import annotations

import argparse
import itertools
import math
import os
import time
from typing import Any, Callable, Dict, List, Sequence, Tuple

import numpy as np

from coarsegrainingvae_tpu.utils.logging import CSVLogger

# search space of the main CGequiVAE HPO (opt.py:63-83)
CGVAE_SPACE: Dict[str, Tuple] = {
    "lr": ("log", 1e-5, 1e-3),
    "beta": ("log", 1e-3, 1.0),
    "gamma": ("log", 1.0, 100.0),
    "n_basis": ("int", 64, 600),
    "n_rbf": ("int", 5, 12),
    "enc_nconv": ("int", 2, 5),
    "dec_nconv": ("int", 2, 7),
    "atom_cutoff": ("float", 4.0, 12.0),
    "cg_cutoff": ("float", 6.0, 30.0),
}


def sample_config(space: Dict[str, Tuple], rng: np.random.Generator) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, (kind, lo, hi) in space.items():
        if kind == "log":
            out[k] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
        elif kind == "int":
            out[k] = int(rng.integers(lo, hi + 1))
        elif kind == "float":
            out[k] = float(rng.uniform(lo, hi))
        elif kind == "choice":
            out[k] = lo[rng.integers(0, len(lo))]
        else:
            raise ValueError(kind)
    return out


def random_search(
    objective: Callable[[Dict[str, Any]], float],
    space: Dict[str, Tuple],
    n_trials: int,
    seed: int = 0,
    log_path: str = "hpo_log.csv",
) -> Tuple[Dict[str, Any], float, List[Dict]]:
    """Minimize objective; failures are recorded, not fatal
    (opt.py:147-160)."""
    rng = np.random.default_rng(seed)
    logger = CSVLogger(log_path)
    best, best_val = None, math.inf
    rows = []
    for t in range(n_trials):
        cfg = sample_config(space, rng)
        t0 = time.monotonic()
        try:
            val = float(objective(cfg))
            failed = not np.isfinite(val)
        except Exception as e:  # noqa: BLE001 - a failed trial is data
            val, failed = float("nan"), True
            cfg = dict(cfg, error=repr(e)[:200])
        row = dict(cfg, trial=t, value=val, failed=failed,
                   wall_s=round(time.monotonic() - t0, 3))
        logger.log(row)
        rows.append(row)
        if not failed and val < best_val:
            best, best_val = {k: v for k, v in cfg.items() if k in space}, val
    return best, best_val, rows


def asha_search(
    objective: Callable[[Dict[str, Any], int], float],
    space: Dict[str, Tuple],
    n_trials: int,
    min_epochs: int = 2,
    max_epochs: int = 16,
    reduction: int = 4,
    seed: int = 0,
    log_path: str = "hpo_asha_log.csv",
) -> Tuple[Dict[str, Any], float, List[Dict]]:
    """Successive halving: all trials run min_epochs, the top 1/reduction
    advance to reduction*epochs, until max_epochs. objective(cfg, epochs)
    must be resumable-from-scratch (it is re-run at the longer budget)."""
    rng = np.random.default_rng(seed)
    logger = CSVLogger(log_path)
    trials = [sample_config(space, rng) for _ in range(n_trials)]
    epochs = min_epochs
    rows: List[Dict] = []
    rung = 0
    while trials:
        scored = []
        for i, cfg in enumerate(trials):
            t0 = time.monotonic()
            try:
                val = float(objective(cfg, epochs))
                failed = not np.isfinite(val)
            except Exception as e:  # noqa: BLE001
                val, failed = float("nan"), True
                cfg = dict(cfg, error=repr(e)[:200])
            row = dict(cfg, rung=rung, epochs=epochs, value=val, failed=failed,
                       wall_s=round(time.monotonic() - t0, 3))
            logger.log(row)
            rows.append(row)
            if not failed:
                scored.append((val, {k: v for k, v in cfg.items() if k in space}))
        scored.sort(key=lambda x: x[0])
        if epochs >= max_epochs or len(scored) <= 1:
            if scored:
                return scored[0][1], scored[0][0], rows
            return {}, math.inf, rows
        keep = max(len(scored) // reduction, 1)
        trials = [cfg for _, cfg in scored[:keep]]
        epochs = min(epochs * reduction, max_epochs)
        rung += 1
    return {}, math.inf, rows


def _cv_objective(args: argparse.Namespace):
    """Objective for the CLI: short CV run, return mean test recon RMSD."""
    from coarsegrainingvae_tpu.cli.run_cgvae import params_to_config, run_cv
    from coarsegrainingvae_tpu.config import ExperimentConfig

    # deterministic trial naming: identical -seed reruns produce identical
    # logdirs (the objective is called in a fixed order by both strategies)
    trial_counter = itertools.count()

    def objective(cfg: Dict[str, Any], epochs: int = None) -> float:
        ns = argparse.Namespace(**vars(args))
        for k, v in cfg.items():
            setattr(ns, k, v)
        ns.nepochs = epochs if epochs is not None else args.nepochs
        exp = params_to_config(ns)
        exp = ExperimentConfig(
            model=exp.model, data=exp.data, train=exp.train,
            parallel=exp.parallel,
            logdir=os.path.join(args.logdir, f"trial_{next(trial_counter):04d}"),
        )
        rows = run_cv(exp, n_ensemble=2, nevals=4, graph_eval=False)
        if not rows:
            return float("nan")
        return float(np.mean([r["test_all_recon_rmsd"] for r in rows]))

    return objective


def main(argv=None):
    from coarsegrainingvae_tpu.cli.run_cgvae import build_parser

    p = build_parser()
    p.add_argument("-n_trials", type=int, default=8)
    p.add_argument("-strategy", type=str, default="random",
                   choices=["random", "asha"])
    args = p.parse_args(argv)
    os.makedirs(args.logdir, exist_ok=True)
    obj = _cv_objective(args)
    if args.strategy == "random":
        best, val, _ = random_search(
            lambda c: obj(c), CGVAE_SPACE, args.n_trials, seed=args.seed,
            log_path=os.path.join(args.logdir, "hpo_log.csv"),
        )
    else:
        best, val, _ = asha_search(
            obj, CGVAE_SPACE, args.n_trials, seed=args.seed,
            min_epochs=max(args.nepochs // 4, 1), max_epochs=args.nepochs,
            log_path=os.path.join(args.logdir, "hpo_asha_log.csv"),
        )
    print({"best": best, "value": val})
    return best, val


if __name__ == "__main__":
    main()
