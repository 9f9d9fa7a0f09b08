"""Tests for the learned CG mapping (cgae) — reference cgae.py:8-33 and
learn_map datasets.py:190-249."""
import jax
import jax.numpy as jnp
import numpy as np

from coarsegrainingvae_tpu.data.mappings import get_mapping
from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
from coarsegrainingvae_tpu.models.cgae import cgae_forward, CGaeParams, gumbel_softmax, learn_map


def test_gumbel_softmax_rows_are_distributions():
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(rng, (5, 4))
    y = gumbel_softmax(jax.random.fold_in(rng, 1), logits, jnp.asarray(0.5))
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-5)

    y_hard = gumbel_softmax(jax.random.fold_in(rng, 2), logits, jnp.asarray(0.5), hard=True)
    arr = np.asarray(y_hard)
    assert set(np.unique(arr)) <= {0.0, 1.0}
    np.testing.assert_allclose(arr.sum(-1), 1.0)


def test_cgae_forward_shapes():
    n, k, b = 10, 3, 4
    rng = jax.random.PRNGKey(0)
    params = CGaeParams(
        assign_logits=jax.random.normal(rng, (n, k)),
        decode=jax.random.normal(jax.random.fold_in(rng, 1), (n, k)),
    )
    xyz = jax.random.normal(jax.random.fold_in(rng, 2), (b, n, 3))
    x_recon, cg_xyz, m = cgae_forward(params, xyz, jax.random.fold_in(rng, 3), jnp.asarray(1.0))
    assert x_recon.shape == (b, n, 3)
    assert cg_xyz.shape == (b, k, 3)
    assert m.shape == (b, n, k)


def test_learn_map_recovers_spatial_clusters():
    """Three well-separated rigid clusters must map to three distinct beads
    with cluster-pure assignment."""
    rng = np.random.default_rng(0)
    centers = np.array([[0.0, 0, 0], [20.0, 0, 0], [0, 20.0, 0]], dtype=np.float32)
    base = np.concatenate(
        [c + rng.normal(scale=0.5, size=(4, 3)) for c in centers]
    ).astype(np.float32)
    frames = base[None] + rng.normal(scale=0.05, size=(64, 12, 3)).astype(np.float32)

    mapping = learn_map(frames, 3, n_steps=600, seed=0)
    assert mapping.shape == (12,)
    assert np.unique(mapping).size == 3
    # atoms of one cluster share a bead
    for g in range(3):
        assert np.unique(mapping[g * 4 : (g + 1) * 4]).size == 1


def test_learn_map_deterministic():
    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=32, seed=0)
    m1 = learn_map(frames, 3, n_steps=120, seed=1)
    m2 = learn_map(frames, 3, n_steps=120, seed=1)
    np.testing.assert_array_equal(m1, m2)


def test_get_mapping_cgae_dispatch():
    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=32, seed=0)
    mapping = get_mapping("cgae", 3, z.shape[0], bonds=bonds, frames=frames, seed=0)
    assert mapping.shape == (z.shape[0],)
    assert np.unique(mapping).size == 3


def test_repair_mapping_fills_empty_beads():
    from coarsegrainingvae_tpu.data.mappings import repair_mapping

    rng = np.random.default_rng(0)
    n, k = 200, 16
    frames = rng.normal(size=(2, n, 3)).astype(np.float32) * 5.0
    # degenerate: only beads 0..3 populated out of 16
    mapping = rng.integers(0, 4, size=n).astype(np.int32)
    repaired = repair_mapping(mapping, frames, k)
    sizes = np.bincount(repaired, minlength=k)
    assert (sizes > 0).all()
    # splitting the largest beads must not grow the worst case
    assert sizes.max() <= np.bincount(mapping, minlength=k).max()
    # deterministic
    np.testing.assert_array_equal(repaired, repair_mapping(mapping, frames, k))


def test_repair_mapping_more_beads_than_atoms_raises():
    import pytest

    from coarsegrainingvae_tpu.data.mappings import repair_mapping

    frames = np.zeros((1, 3, 3), np.float32)
    with pytest.raises(RuntimeError):
        repair_mapping(np.zeros(3, np.int32), frames, 5)


def test_get_mapping_cgae_repairs_degenerate(monkeypatch):
    """At large n_cgs learn_map essentially never populates every bead;
    the dispatch must repair instead of raising (covid spike regression)."""
    import coarsegrainingvae_tpu.data.mappings as mp

    n, k = 120, 30
    rng = np.random.default_rng(1)
    frames = rng.normal(size=(2, n, 3)).astype(np.float32)

    def fake_learn_map(frames, n_cgs, seed=0, **kw):
        return np.random.default_rng(seed).integers(0, 5, size=n).astype(np.int32)

    monkeypatch.setattr(
        "coarsegrainingvae_tpu.models.cgae.learn_map", fake_learn_map
    )
    mapping = mp.get_mapping("cgae", k, n, frames=frames, seed=0)
    assert np.unique(mapping).size == k
