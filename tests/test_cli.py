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


def test_run_cgvae_cli_fold_offset(tmp_path):
    """-fold_offset K resumes a multi-fold campaign at fold K: the split is
    seed-deterministic, so fold 1 here is fold 1 of a full run. Only fold 1
    runs; fold 0 is neither trained nor written."""
    from coarsegrainingvae_tpu.cli.run_cgvae import main

    rows = main([
        "-logdir", str(tmp_path / "run"), "-dataset", "dipeptide",
        "-n_cgs", "3", "-n_basis", "16", "-n_rbf", "4",
        "-enc_nconv", "1", "-dec_nconv", "1", "-ndata", "48",
        "-nepochs", "1", "-batch_size", "16", "-nsplits", "2",
        "-fold_offset", "1", "-max_folds", "1",
        "-beta", "0.01", "-gamma", "1.0", "-n_ensemble", "2",
        "-nevals", "2", "--dec_type", "painn",
    ])
    assert len(rows) == 1
    assert rows[0]["fold"] == 1
    run_dir = [p for p in tmp_path.iterdir() if p.name.startswith("run")][0]
    assert (run_dir / "fold1" / "train_log.csv").exists()
    assert not (run_dir / "fold0").exists()


def test_postanalysis_reloads_dense_run(tmp_path):
    """Checkpoint reload must reconstruct the SAME model class the driver
    trained (dense flagship here) -- the orbax restore fails on a param
    tree mismatch otherwise (caught live on a real fold in round 3)."""
    from coarsegrainingvae_tpu.cli.postanalysis import reevaluate
    from coarsegrainingvae_tpu.cli.run_cgvae import main

    main([
        "-logdir", str(tmp_path / "run"), "-dataset", "dipeptide",
        "-n_cgs", "3", "-n_basis", "16", "-n_rbf", "4",
        "-enc_nconv", "1", "-dec_nconv", "1", "-ndata", "48",
        "-nepochs", "1", "-batch_size", "16", "-nsplits", "2",
        "-max_folds", "1", "-beta", "0.01", "-gamma", "1.0",
        "-n_ensemble", "2", "-nevals", "2", "--dec_type", "pseudo",
    ])
    run_dir = [p for p in tmp_path.iterdir() if p.name.startswith("run")][0]
    res = reevaluate(str(run_dir / "modelparams.json"),
                     str(run_dir / "fold0"), graph_eval=False,
                     n_ensemble=2, nevals=2)
    assert np.isfinite(res["all_atom_rmsd"])
    assert len(res["tica_gen"]) > 0


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


def test_real_data_chain_pdb_to_npz_to_run_cv(tmp_path, monkeypatch):
    """The full real-data ingestion chain with zero MD libraries:
    write per-frame PDBs (utils.pdb.write_pdb) -> generate_cache -kind
    pdbtraj -> trajectory npz in the data root -> load_frames -> run_cv
    with the topology-derived alpha mapping. This is exactly what a user
    with a real MD trajectory does (dump frames to PDB anywhere, convert,
    train) -- reference chain datasets.py:170-187 + 252-342."""
    import json

    from coarsegrainingvae_tpu.cli.generate_cache import main as cache_main
    from coarsegrainingvae_tpu.cli.run_cgvae import main as run_main
    from coarsegrainingvae_tpu.data.sidechain import protein_props
    from coarsegrainingvae_tpu.data.synthetic import synthetic_protein
    from coarsegrainingvae_tpu.utils.pdb import write_pdb

    # an "MD trajectory": one topology, 36 jittered/rotated frames
    seq, crd = synthetic_protein(5, seed=11)
    props = protein_props(seq, np.asarray(crd))
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    rng = np.random.default_rng(0)
    for s in range(36):
        # small conformational jitter + rigid rotation
        q = rng.normal(size=(3, 3))
        qr, _ = np.linalg.qr(q)
        xyz = (props.xyz + 0.05 * rng.normal(size=props.xyz.shape)) @ qr.T
        write_pdb(str(frames_dir / f"frame_{s:04d}.pdb"), seq, xyz,
                  props.mapping, props.channel_idx)

    data_root = tmp_path / "dataroot"
    data_root.mkdir()
    monkeypatch.setenv("COARSEGRAININGVAE_DATA", str(data_root))
    cache_main(["-kind", "pdbtraj", "-src", str(frames_dir),
                "-out", str(data_root / "mytraj.npz")])

    # atom names survived the npz round trip (exact CA site selection)
    from coarsegrainingvae_tpu.data.proteins import load_traj_atom_names
    names = load_traj_atom_names("mytraj")
    assert names is not None and names.count("CA") == len(seq)

    rows = run_main([
        "-logdir", str(tmp_path / "run"), "-dataset", "mytraj",
        "-n_cgs", "3", "-n_basis", "16", "-n_rbf", "4",
        "-enc_nconv", "1", "-dec_nconv", "1", "-ndata", "36",
        "-nepochs", "1", "-batch_size", "12", "-nsplits", "2",
        "-beta", "0.01", "-gamma", "1.0", "-n_ensemble", "2",
        "-nevals", "2", "--dec_type", "painn", "-cg_method", "alpha",
    ])
    assert len(rows) == 2
    run_dir = [p for p in tmp_path.iterdir() if p.name.startswith("run")][0]
    saved = json.load(open(run_dir / "modelparams.json"))
    # alpha -> one bead per residue, sites are the CA atoms by NAME
    assert saved["model"]["n_cgs"] == len(seq)
    ca_idx = [i for i, nm in enumerate(names) if nm == "CA"]
    assert list(saved["data"]["site_index"]) == ca_idx
    assert np.isfinite(rows[0]["test_all_recon_rmsd"])


def test_loss_skip_factor_flag_plumbs_to_train_config():
    """-loss_skip_factor must reach TrainConfig (spike-scale runs need it:
    the graph loss is extensive in system size, so the reference's fixed
    loss >= gamma*200 skip guard rejects EVERY update at 10k atoms)."""
    from coarsegrainingvae_tpu.cli.run_cgvae import (
        build_parser,
        params_to_config,
    )

    args = build_parser().parse_args(["-loss_skip_factor", "1e6"])
    assert params_to_config(args).train.loss_skip_factor == 1e6
    default = build_parser().parse_args([])
    assert params_to_config(default).train.loss_skip_factor == 200.0
