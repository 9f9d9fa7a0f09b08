"""Tests for the bench.py driver-contract helpers (CPU, tiny shapes).

bench.py is the driver's per-round throughput probe; these pin the pieces
that broke or drifted in past rounds: batch cycling over the synthetic
dataset (ADVICE r3: `% (n - bs)` degenerated to a single repeated window
when bs divides n), and the measure_scan learning/throughput contract.
"""
import json
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))

from bench import measure_scan, window_starts  # noqa: E402


def test_window_starts_varied_when_batch_divides_dataset():
    # the r3 bug: 256 frames / batch 128 -> every start was 0
    s = window_starts(256, 128, 100)
    assert s.max() <= 256 - 128
    assert len(np.unique(s)) > 1
    # windows stay in-bounds
    assert (s + 128 <= 256).all()


def test_window_starts_full_dataset_batch_no_crash():
    s = window_starts(256, 256, 10)
    assert (s == 0).all()


def test_window_starts_oversized_batch_raises():
    with pytest.raises(ValueError):
        window_starts(256, 257, 10)


def test_bench_headline_survives_hung_extras(tmp_path):
    """The ONE contract JSON line must print (and BENCH_DETAILS.json must be
    on disk) even if the extras hang forever.

    Round-4 regression: bench printed the contract line only AFTER the
    matched-b32 + chignolin extras, so a wedged tunnel during the extras
    forfeited the already-measured headline (BENCH_r04.json rc=124,
    parsed=null). This drives bench.main() with a stubbed instant headline
    and an extras stage that sleeps 10 minutes, under a 2 s extras budget:
    the process must exit 0 quickly with exactly one JSON line out.
    """
    import os
    import pathlib

    repo = pathlib.Path(__file__).parents[1]
    stub = """
import time
import bench

def fake_measure(cfg, ds, batch_size, n_steps):
    d = {"batch_size": batch_size, "n_steps": n_steps, "ms_per_step": 1.0,
         "samples_per_sec_per_chip": 1000.0, "vs_baseline": 0.833,
         "loss_scan1_first10_mean": 1.0, "loss_scan2_last10_mean": 0.5,
         "recon_scan1_first10_mean": 1.0, "recon_scan2_last10_mean": 0.5,
         "learning": True}
    return 1000.0, d

bench.dipeptide_dataset = lambda: None
bench.measure_scan = fake_measure
bench.chignolin_scan = lambda *a, **k: time.sleep(600)
bench.main()
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [str(repo)]
        + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
           if p and "axon" not in p]
    )
    env["BENCH_EXTRAS_BUDGET_S"] = "2"
    env.pop("BENCH_FAST", None)
    proc = subprocess.run(
        [sys.executable, "-c", stub],
        cwd=tmp_path, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, timeout=120,
    )
    assert proc.returncode == 0, (proc.stdout, proc.stderr[-2000:])
    json_lines = []
    for line in proc.stdout.splitlines():
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict):
            json_lines.append(obj)
    assert len(json_lines) == 1, proc.stdout
    assert json_lines[0]["metric"] == "train_samples_per_sec_per_chip_dipeptide"
    assert json_lines[0]["value"] == 1000.0
    details = json.loads((tmp_path / "BENCH_DETAILS.json").read_text())
    assert details["samples_per_sec_per_chip"] == 1000.0
    # the hung extra never landed, and that's fine
    assert "chignolin" not in details


def test_pcn_scan_tiny_config():
    """The round-5 "pcn" bench extra: tiny shapes, real PCN train steps.
    Pins the row schema and that the timed loop actually optimizes."""
    from bench import pcn_scan

    d = pcn_scan(n_steps=3, batch_size=2, n_basis=16, dec_nconv=1,
                 min_res=6, max_res=9)
    for k in ("ms_per_step", "samples_per_sec_per_chip", "loss_first_step",
              "loss_last_step", "learning", "batch_size", "config"):
        assert k in d
    assert d["batch_size"] == 2
    assert np.isfinite(d["loss_last_step"])
    # 3 steps of Adam on 2 alternating batches must not diverge
    assert d["loss_last_step"] <= d["loss_first_step"] * 1.5


def test_measure_scan_tiny_config_learns():
    from coarsegrainingvae_tpu.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from coarsegrainingvae_tpu.data.dataset import build_dataset
    from coarsegrainingvae_tpu.data.mappings import newman_mapping
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide

    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=24, seed=0)
    mapping = newman_mapping(bonds, z.shape[0], 3, seed=0)
    ds = build_dataset(
        mapping, frames, atom_cutoff=8.5, cg_cutoff=9.5, atomic_nums=z,
        bonds=bonds, order=2, rotate=True,
    )
    cfg = ExperimentConfig(
        model=ModelConfig(
            n_cgs=3, n_basis=16, n_rbf=4, atom_cutoff=8.5, cg_cutoff=9.5,
            enc_nconv=1, dec_nconv=1, dec_type="pseudo", breaksym=True,
        ),
        data=DataConfig(batch_size=8),
        train=TrainConfig(lr=1e-3, beta=0.05, gamma=25.0, grad_clip=0.01),
    )
    per_chip, details = measure_scan(cfg, ds, batch_size=8, n_steps=4)
    assert per_chip > 0
    assert np.isfinite(details["loss_scan2_last10_mean"])
    # two scans of an optimizing step must not diverge
    assert (details["loss_scan2_last10_mean"]
            <= details["loss_scan1_first10_mean"] * 1.5)
    for k in ("ms_per_step", "samples_per_sec_per_chip", "vs_baseline",
              "learning", "batch_size"):
        assert k in details


def test_bench_fast_carries_over_extras(tmp_path, monkeypatch):
    """BENCH_FAST must preserve a previous full run's extras rows
    (matched_b32/chignolin/pcn) instead of clobbering BENCH_DETAILS.json."""
    import json

    import bench

    monkeypatch.chdir(tmp_path)
    prev = {"samples_per_sec_per_chip": 1.0,
            "chignolin": {"ms_per_step": 9.0},
            "pcn": {"ms_per_step": 12.7},
            "matched_b32": {"ms_per_step": 5.4}}
    (tmp_path / "BENCH_DETAILS.json").write_text(json.dumps(prev))
    details = {"samples_per_sec_per_chip": 2.0}
    bench._carry_over_extras(details)
    assert details["chignolin"] == prev["chignolin"]
    assert details["pcn"] == prev["pcn"]
    assert details["matched_b32"] == prev["matched_b32"]
    assert details["samples_per_sec_per_chip"] == 2.0  # headline NOT carried

    # absent/corrupt file must be a no-op, not an error
    (tmp_path / "BENCH_DETAILS.json").write_text("{not json")
    bench._carry_over_extras(details)
    (tmp_path / "BENCH_DETAILS.json").unlink()
    bench._carry_over_extras(details)
