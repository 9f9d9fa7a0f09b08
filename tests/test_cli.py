"""End-to-end CLI driver smokes (tiny configs; artifact contracts)."""
import os

import numpy as np
import pytest


def test_run_cgvae_cli(tmp_path):
    from coarsegrainingvae_tpu.cli.run_cgvae import main

    rows = main([
        "-logdir", str(tmp_path / "run"), "-dataset", "dipeptide",
        "-n_cgs", "3", "-n_basis", "16", "-n_rbf", "4",
        "-enc_nconv", "1", "-dec_nconv", "1", "-ndata", "48",
        "-nepochs", "1", "-batch_size", "16", "-nsplits", "2",
        "-beta", "0.01", "-gamma", "1.0", "-n_ensemble", "2",
        "-nevals", "2", "--dec_type", "painn",
    ])
    assert len(rows) == 2
    run_dir = [p for p in tmp_path.iterdir() if p.name.startswith("run")][0]
    assert (run_dir / "cv_stats.csv").exists()
    assert (run_dir / "modelparams.json").exists()
    for fold in ("fold0", "fold1"):
        assert (run_dir / fold / "train_log.csv").exists()
        assert (run_dir / fold / "mapping.json").exists()
        assert (run_dir / fold / "rotate_recon.xyz").exists()
        assert (run_dir / fold / "ckpt").exists()
    assert np.isfinite(rows[0]["test_all_recon_rmsd"])


def test_run_baseline_cli(tmp_path):
    from coarsegrainingvae_tpu.cli.run_baseline import main

    rows = main([
        "-logdir", str(tmp_path / "bl"), "-model", "equilinear",
        "-ndata", "48", "-nepochs", "2", "-batch_size", "16",
        "-nsplits", "2", "-knn", "2",
    ])
    assert len(rows) == 2
    assert all(np.isfinite(r["test_recon_rmsd"]) for r in rows)


def test_run_pcn_cli(tmp_path):
    from coarsegrainingvae_tpu.cli.run_pcn import main

    rows = main([
        "-logdir", str(tmp_path / "pcn"), "-ndata", "10",
        "-n_basis", "16", "-dec_nconv", "1", "-nepochs", "1",
        "-batch_size", "2", "-n_dump", "1",
    ])
    assert rows and np.isfinite(rows[0]["rmsd"])
    run_dir = [p for p in tmp_path.iterdir() if p.name.startswith("pcn")][0]
    assert (run_dir / "test_results.csv").exists()
    assert (run_dir / "recon_0.pdb").exists()


def test_hpo_random_search(tmp_path):
    from coarsegrainingvae_tpu.cli.hpo import random_search

    calls = []

    def objective(cfg):
        calls.append(cfg)
        if len(calls) == 2:
            raise RuntimeError("boom")  # failures are data, not fatal
        return cfg["lr"] * 1e4

    space = {"lr": ("log", 1e-5, 1e-3), "n_basis": ("int", 8, 32)}
    best, val, rows = random_search(
        objective, space, n_trials=4, seed=0,
        log_path=str(tmp_path / "hpo.csv"),
    )
    assert len(rows) == 4
    assert sum(r["failed"] for r in rows) == 1
    assert best is not None and np.isfinite(val)
    assert os.path.exists(tmp_path / "hpo.csv")


def test_run_cgvae_cli_alpha_mapping_no_site_index(tmp_path):
    """-cg_method alpha with NO -site_index: sites derive from topology and
    n_cgs is overwritten by the site count (reference datasets.py:262-272)."""
    import json

    from coarsegrainingvae_tpu.cli.run_cgvae import main

    rows = main([
        "-logdir", str(tmp_path / "run"), "-dataset", "dipeptide",
        "-n_cgs", "3", "-n_basis", "16", "-n_rbf", "4",
        "-enc_nconv", "1", "-dec_nconv", "1", "-ndata", "32",
        "-nepochs", "1", "-batch_size", "16", "-nsplits", "2",
        "-beta", "0.01", "-gamma", "1.0", "-n_ensemble", "2",
        "-nevals", "2", "--dec_type", "painn", "-cg_method", "alpha",
    ])
    assert len(rows) == 2
    run_dir = [p for p in tmp_path.iterdir() if p.name.startswith("run")][0]
    saved = json.load(open(run_dir / "modelparams.json"))
    # sites were derived and persisted; n_cgs matches the site count
    assert saved["data"]["site_index"] is not None
    assert saved["model"]["n_cgs"] == len(saved["data"]["site_index"])
    mapping = json.load(open(run_dir / "fold0" / "mapping.json"))
    assert max(mapping) + 1 == saved["model"]["n_cgs"]
    assert np.isfinite(rows[0]["test_all_recon_rmsd"])
