"""Baseline zoo tests (reference baseline.py + run_baseline.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coarsegrainingvae_tpu.data.diffpool import build_diffpool_dataset
from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
from coarsegrainingvae_tpu.data.topology import channel_index_from_mapping, max_atoms_per_bead
from coarsegrainingvae_tpu.models.baseline import (
    BASELINE_ZOO,
    build_baseline,
    fixed_pool,
    knn_edge_vectors,
)
from coarsegrainingvae_tpu.ops.geometry import rotation_matrix_from_axis_angle
from coarsegrainingvae_tpu.train.baseline_trainer import BaselineTrainer


@pytest.fixture(scope="module")
def system():
    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=64, seed=0)
    mapping = np.arange(z.shape[0]) % 3
    return z, frames, bonds, mapping


def _rot(seed=0):
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    return np.asarray(rotation_matrix_from_axis_angle(jnp.asarray(axis, jnp.float32), 0.9))


def test_fixed_pool_means(system):
    z, frames, bonds, mapping = system
    _, _, cg = fixed_pool(jnp.asarray(mapping), 3, jnp.asarray(frames[:4]))
    want = np.stack([frames[:4][:, mapping == k].mean(1) for k in range(3)], 1)
    np.testing.assert_allclose(np.asarray(cg), want, atol=1e-5)


def test_knn_edge_vectors_pick_nearest():
    xyz = np.array([[[0, 0, 0], [1.0, 0, 0], [5.0, 0, 0], [2.0, 0, 0]]], np.float32)
    vec, d = knn_edge_vectors(jnp.asarray(xyz), 2)
    # bead 0: nearest are 1 (d=1) then 3 (d=2)
    np.testing.assert_allclose(np.asarray(d)[0, 0], [1.0, 2.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(vec)[0, 0, 0], [1.0, 0, 0], atol=1e-5)


@pytest.mark.parametrize("name", sorted(BASELINE_ZOO))
def test_baseline_forward_shapes(system, name):
    z, frames, bonds, mapping = system
    n = z.shape[0]
    kwargs = {}
    if name == "setequimlp":
        kwargs = dict(
            channel_idx=channel_index_from_mapping(mapping),
            n_channels=max_atoms_per_bead(mapping),
        )
    model = build_baseline(name, 3, n, mapping, **kwargs)
    xyz = jnp.asarray(frames[:4])
    params = model.init(jax.random.PRNGKey(0), xyz)["params"]
    ref, recon = model.apply({"params": params}, xyz)
    assert recon.shape == (4, n, 3)
    assert np.isfinite(np.asarray(recon)).all()


@pytest.mark.parametrize("name", ["equilinear", "equimlp", "equimlp2", "setequimlp", "edgesetmlp"])
def test_equivariant_baselines_rotate(system, name):
    z, frames, bonds, mapping = system
    n = z.shape[0]
    kwargs = {}
    if name == "setequimlp":
        kwargs = dict(
            channel_idx=channel_index_from_mapping(mapping),
            n_channels=max_atoms_per_bead(mapping),
        )
    model = build_baseline(name, 3, n, mapping, **kwargs)
    xyz = frames[:2]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(xyz))["params"]
    rot = _rot(3)
    _, base = model.apply({"params": params}, jnp.asarray(xyz))
    _, rotated = model.apply({"params": params}, jnp.asarray(xyz @ rot.T))
    np.testing.assert_allclose(
        np.asarray(rotated), np.asarray(base) @ rot.T, atol=1e-3
    )


def test_baseline_training_decreases_loss(system):
    z, frames, bonds, mapping = system
    ds = build_diffpool_dataset(frames, z, bonds)
    model = build_baseline("equilinear", 3, z.shape[0], mapping, knn=2)
    trainer = BaselineTrainer(model, gamma=0.0, lr=2e-2)
    state = trainer.init_state(ds.batch(np.arange(16)))
    state, hist = trainer.fit(
        state, ds.subset(np.arange(48)), ds.subset(np.arange(48, 64)),
        nepochs=30, batch_size=16,
    )
    assert hist[-1]["train_recon"] < hist[0]["train_recon"]
