"""Serving path: backmap new CG coordinates from a trained fold."""
import numpy as np
import pytest

from coarsegrainingvae_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from coarsegrainingvae_tpu.data.dataset import build_dataset
from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
from coarsegrainingvae_tpu.models.dense_cgvae import DenseCGVAE
from coarsegrainingvae_tpu.serve import Backmapper
from coarsegrainingvae_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def trained():
    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=32, seed=0)
    mapping = np.arange(z.shape[0]) % 3
    ds = build_dataset(mapping, frames, 8.5, 9.5, z, bonds, order=2,
                       rotate=False)
    cfg = ExperimentConfig(
        model=ModelConfig(n_cgs=3, n_basis=16, n_rbf=5, atom_cutoff=8.5,
                          cg_cutoff=9.5, enc_nconv=1, dec_nconv=1,
                          dec_type="painn"),
        data=DataConfig(batch_size=8),
        train=TrainConfig(lr=1e-3, beta=0.01, gamma=1.0),
    )
    model = DenseCGVAE(cfg=cfg.model)
    trainer = Trainer(model, cfg)
    state = trainer.init_state(ds.batch(np.arange(8)))
    state, _ = trainer.fit(state, ds.subset(np.arange(24)),
                           ds.subset(np.arange(24, 32)), nepochs=2)
    import jax
    params = jax.device_get(state.params)
    return model, params, mapping, z, cfg, ds


def test_backmap_single_frame(trained):
    model, params, mapping, z, cfg, ds = trained
    bm = Backmapper(model, params, mapping, z, cfg)
    cg = np.asarray(ds.cg_xyz[0])
    ens = bm.backmap(cg, n_samples=4, seed=1)
    assert ens.shape == (4, z.shape[0], 3)
    assert np.isfinite(ens).all()
    # COM constraint survives serving: each bead = mean of its atoms
    for k in range(3):
        np.testing.assert_allclose(
            ens[:, mapping == k].mean(1),
            np.broadcast_to(cg[k], (4, 3)), atol=1e-3,
        )
    # stochastic ensemble: samples differ
    assert np.abs(ens[0] - ens[1]).max() > 1e-5


def test_backmap_multi_frame(trained):
    model, params, mapping, z, cfg, ds = trained
    bm = Backmapper(model, params, mapping, z, cfg)
    out = bm.backmap(np.asarray(ds.cg_xyz[:3]), n_samples=2, seed=0)
    assert out.shape == (3, 2, z.shape[0], 3)


def test_backmap_roundtrip_from_run(tmp_path, trained):
    """from_run reload path: save a checkpointed fold, reload, backmap."""
    import jax
    from coarsegrainingvae_tpu.train.checkpoint import CheckpointManager

    model, params, mapping, z, cfg, ds = trained
    fold = tmp_path / "fold0"
    fold.mkdir()
    cfg.save(str(tmp_path / "modelparams.json"))
    import json
    with open(fold / "mapping.json", "w") as f:
        json.dump([int(x) for x in mapping], f)
    trainer = Trainer(model, cfg)
    state = trainer.init_state(ds.batch(np.arange(8)))
    state = state.replace(params=params)
    mgr = CheckpointManager(str(fold / "ckpt"))
    mgr.save(0, state, metadata={"epoch": 0})
    mgr.close()

    bm = Backmapper.from_run(str(tmp_path / "modelparams.json"), str(fold))
    ens = bm.backmap(np.asarray(ds.cg_xyz[0]), n_samples=2)
    assert ens.shape == (2, z.shape[0], 3)
    # reloaded params produce identical outputs to in-memory params
    bm2 = Backmapper(model, params, mapping, z, cfg)
    np.testing.assert_allclose(
        ens, bm2.backmap(np.asarray(ds.cg_xyz[0]), n_samples=2), atol=1e-5
    )


def test_backmap_h_projection_serving(trained):
    """A projection-enabled config serves projected hydrogens when bonds +
    a reference frame are supplied (and warns when they are not)."""
    import dataclasses
    import warnings

    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide

    model, params, mapping, z, cfg, ds = trained
    z_full, frames, bonds = synthetic_peptide("dipeptide", n_frames=2, seed=0)
    cfg_p = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, h_project_eval=True)
    )
    bm = Backmapper(model, params, mapping, z, cfg_p,
                    bonds=bonds, ref_xyz=frames[0])
    cg = np.asarray(ds.cg_xyz[0])
    ens = bm.backmap(cg, n_samples=2, seed=1)

    parent = {}
    for a, b in bonds:
        if z[a] == 1 and z[b] != 1:
            parent[int(a)] = int(b)
        if z[b] == 1 and z[a] != 1:
            parent[int(b)] = int(a)
    hs = np.array(sorted(parent))
    ps = np.array([parent[h] for h in hs])
    rest = np.linalg.norm(frames[0][hs] - frames[0][ps], axis=-1)
    d = np.linalg.norm(ens[:, hs] - ens[:, ps], axis=-1)
    assert np.abs(d - rest[None]).max() < 1e-4

    # without bonds/ref the constraint cannot apply: warn, serve raw
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bm_raw = Backmapper(model, params, mapping, z, cfg_p)
        assert any("RAW decoder hydrogens" in str(x.message) for x in w)
    ens_raw = bm_raw.backmap(cg, n_samples=2, seed=1)
    d_raw = np.linalg.norm(ens_raw[:, hs] - ens_raw[:, ps], axis=-1)
    assert np.abs(d_raw - rest[None]).max() > 1e-3
