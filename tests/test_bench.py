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
