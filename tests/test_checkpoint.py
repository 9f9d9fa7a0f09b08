"""Checkpoint/resume tests — capability beyond the reference's final-only
torch.save (run_ala.py:354-357, SURVEY.md section 5.4)."""
import numpy as np
import jax
import pytest

from coarsegrainingvae_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from coarsegrainingvae_tpu.data.dataset import build_dataset
from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
from coarsegrainingvae_tpu.models.cgvae import CGequiVAE
from coarsegrainingvae_tpu.train.checkpoint import CheckpointManager
from coarsegrainingvae_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def setup():
    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=48, seed=0)
    mapping = np.arange(z.shape[0]) % 3
    ds = build_dataset(mapping, frames, atom_cutoff=8.5, cg_cutoff=9.5,
                       atomic_nums=z, bonds=bonds, order=2, rotate=False)
    cfg = ExperimentConfig(
        model=ModelConfig(n_cgs=3, n_basis=16, n_rbf=5, atom_cutoff=8.5,
                          cg_cutoff=9.5, enc_nconv=1, dec_nconv=1,
                          dec_type="painn"),
        data=DataConfig(batch_size=16),
        train=TrainConfig(lr=1e-3, beta=0.01, gamma=1.0, checkpoint_every=1),
    )
    return cfg, ds


def test_save_restore_roundtrip(setup, tmp_path):
    cfg, ds = setup
    tr = Trainer(CGequiVAE(cfg=cfg.model), cfg)
    state = tr.init_state(ds.batch(np.arange(16)))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, state, metadata={"epoch": 3, "note": "x"})

    template = tr.init_state(ds.batch(np.arange(16)), seed=999)  # different init
    restored, meta, step = mgr.restore(template)
    assert step == 3 and meta["epoch"] == 3
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_fit_resume_continues_from_epoch(setup, tmp_path):
    cfg, ds = setup
    train, val = ds.subset(np.arange(32)), ds.subset(np.arange(32, 48))

    tr = Trainer(CGequiVAE(cfg=cfg.model), cfg)
    mgr = CheckpointManager(str(tmp_path / "c2"))
    state = tr.init_state(ds.batch(np.arange(16)))
    state, hist = tr.fit(state, train, val, nepochs=2, ckpt=mgr)
    assert len(hist) == 2

    # fresh trainer resumes at epoch 2 and runs exactly 2 more epochs
    tr2 = Trainer(CGequiVAE(cfg=cfg.model), cfg)
    state2 = tr2.init_state(ds.batch(np.arange(16)), seed=7)
    state2, hist2 = tr2.fit(state2, train, val, nepochs=4, ckpt=mgr, resume=True)
    assert [h["epoch"] for h in hist2] == [0, 1, 2, 3]
    assert len([h for h in hist2 if h["epoch"] >= 2]) == 2
    mgr.close()
