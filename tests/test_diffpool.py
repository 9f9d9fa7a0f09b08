"""DiffPoolVAE family tests (reference diffpoolvae.py + run_diffpool.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coarsegrainingvae_tpu.config import DiffPoolConfig
from coarsegrainingvae_tpu.data.diffpool import build_diffpool_dataset
from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
from coarsegrainingvae_tpu.models.dense import (
    DenseContract,
    DenseEquiMessageBlock,
    degree_norm_adjacency,
    dense_pairwise,
    radius_adjacency,
)
from coarsegrainingvae_tpu.models.diffpool import CGpool, DiffPoolVAE, bond_adjacency, tau_schedule
from coarsegrainingvae_tpu.ops.geometry import rotation_matrix_from_axis_angle
from coarsegrainingvae_tpu.train.diffpool_trainer import DiffPoolTrainer


def _rand_rot(seed=0):
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    return np.asarray(
        rotation_matrix_from_axis_angle(jnp.asarray(axis, jnp.float32), 1.1)
    )


@pytest.fixture(scope="module")
def small_system():
    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=24, seed=0)
    return z, frames, bonds


def test_dense_pairwise_matches_pair_geometry():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(2, 5, 3)).astype(np.float32)
    r, dist, unit = dense_pairwise(jnp.asarray(xyz))
    np.testing.assert_allclose(
        np.asarray(r)[0, 1, 3], xyz[0, 3] - xyz[0, 1], rtol=1e-6
    )
    d = np.linalg.norm(xyz[0, 3] - xyz[0, 1])
    np.testing.assert_allclose(np.asarray(dist)[0, 1, 3], np.sqrt(d**2 + 1e-3), rtol=1e-5)


def test_radius_adjacency_masks_self_and_padding():
    xyz = jnp.asarray(np.zeros((1, 4, 3), np.float32))
    mask = jnp.asarray([[True, True, True, False]])
    _, dist, _ = dense_pairwise(xyz)
    adj = radius_adjacency(dist, 1.0, mask)
    a = np.asarray(adj)[0]
    assert np.all(np.diag(a) == 0)
    assert np.all(a[3] == 0) and np.all(a[:, 3] == 0)
    assert a[0, 1] == 1


def test_dense_message_block_equivariance():
    """Scalars invariant, vectors rotate under a global rotation."""
    rng = np.random.default_rng(1)
    b, n, f = 2, 6, 16
    xyz = rng.normal(size=(b, n, 3)).astype(np.float32) * 2
    s = jnp.asarray(rng.normal(size=(b, n, f)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, 3, f)).astype(np.float32))

    block = DenseEquiMessageBlock(feat_dim=f, activation="swish", n_rbf=6,
                                  cutoff=10.0, cross=True)
    _, dist, unit = dense_pairwise(jnp.asarray(xyz))
    adj = radius_adjacency(dist, 10.0)
    params = block.init(jax.random.PRNGKey(0), s, v, dist, unit, adj)
    ds, dv = block.apply(params, s, v, dist, unit, adj)

    rot = _rand_rot()
    xyz_r = xyz @ rot.T
    v_r = jnp.einsum("de,bnef->bndf", jnp.asarray(rot), v)
    _, dist_r, unit_r = dense_pairwise(jnp.asarray(xyz_r))
    adj_r = radius_adjacency(dist_r, 10.0)
    ds_r, dv_r = block.apply(params, s, v_r, dist_r, unit_r, adj_r)

    np.testing.assert_allclose(np.asarray(ds_r), np.asarray(ds), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dv_r), np.einsum("de,bnef->bndf", rot, np.asarray(dv)), atol=1e-4
    )


def test_dense_contract_shapes_and_equivariance():
    rng = np.random.default_rng(2)
    b, n, k, f = 2, 8, 3, 8
    xyz = rng.normal(size=(b, n, 3)).astype(np.float32)
    cg = rng.normal(size=(b, k, 3)).astype(np.float32)
    h = jnp.asarray(rng.normal(size=(b, n, f)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, 3, f)).astype(np.float32))
    m = jax.nn.softmax(jnp.asarray(rng.normal(size=(b, n, k)).astype(np.float32)))

    blk = DenseContract(feat_dim=f, activation="swish", cutoff=10.0)
    params = blk.init(jax.random.PRNGKey(0), m, h, v, jnp.asarray(cg), jnp.asarray(xyz))
    dH, dV = blk.apply(params, m, h, v, jnp.asarray(cg), jnp.asarray(xyz))
    assert dH.shape == (b, k, f) and dV.shape == (b, k, 3, f)

    rot = _rand_rot(3)
    v_r = jnp.einsum("de,bnef->bndf", jnp.asarray(rot), v)
    dH_r, dV_r = blk.apply(
        params, m, h, v_r, jnp.asarray(cg @ rot.T), jnp.asarray(xyz @ rot.T)
    )
    np.testing.assert_allclose(np.asarray(dH_r), np.asarray(dH), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dV_r), np.einsum("de,bkef->bkdf", rot, np.asarray(dV)), atol=1e-4
    )


def test_cgpool_fixed_assignment(small_system):
    z, frames, bonds = small_system
    n = z.shape[0]
    mapping = tuple(int(i) % 3 for i in range(n))
    pool = CGpool(n_conv=1, feat_dim=16, n_atoms=n, n_cgs=3,
                  assign_idx=mapping)
    adj = jnp.broadcast_to(bond_adjacency(jnp.asarray(bonds), n), (2, n, n))
    zb = jnp.broadcast_to(jnp.asarray(z), (2, n))
    xyz = jnp.asarray(frames[:2])
    params = pool.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        zb, xyz, adj, jnp.asarray(1.0),
    )
    out = pool.apply(params, zb, xyz, adj, jnp.asarray(1.0),
                     rngs={"gumbel": jax.random.PRNGKey(1)})
    m = np.asarray(out.assign)
    assert set(np.unique(m)) <= {0.0, 1.0}
    np.testing.assert_array_equal(m[0].argmax(-1), np.asarray(mapping))
    # with hard one-hot assignment, cg_xyz is the per-bead mean
    want = np.stack(
        [frames[:2][:, np.asarray(mapping) == k].mean(1) for k in range(3)], axis=1
    )
    np.testing.assert_allclose(np.asarray(out.cg_xyz), want, atol=1e-5)


def _tiny_cfg(n_atoms):
    return DiffPoolConfig(
        n_atoms=n_atoms, n_cgs=3, feat_dim=16, n_rbf=5, atom_cutoff=8.0,
        cg_cutoff=30.0, pool_nconv=1, enc_nconv=1, dec_nconv=1,
    )


def test_diffpool_forward_shapes(small_system):
    z, frames, bonds = small_system
    n = z.shape[0]
    model = DiffPoolVAE(cfg=_tiny_cfg(n))
    adj = jnp.broadcast_to(bond_adjacency(jnp.asarray(bonds), n), (4, n, n))
    zb = jnp.broadcast_to(jnp.asarray(z), (4, n))
    xyz = jnp.asarray(frames[:4])
    rngs = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
            "sample": jax.random.PRNGKey(2)}
    params = model.init(rngs, zb, xyz, adj, jnp.asarray(1.0))["params"]
    out = model.apply({"params": params}, zb, xyz, adj, jnp.asarray(1.0),
                      rngs={"gumbel": jax.random.PRNGKey(1),
                            "sample": jax.random.PRNGKey(2)})
    assert out.xyz_recon.shape == (4, n, 3)
    assert out.assign.shape == (4, n, 3)
    assert np.isfinite(np.asarray(out.xyz_recon)).all()

    x_sample = model.apply({"params": params}, zb, xyz, adj, jnp.asarray(0.3),
                           method=model.sample,
                           rngs={"gumbel": jax.random.PRNGKey(1),
                                 "sample": jax.random.PRNGKey(3)})
    assert x_sample.shape == (4, n, 3)


def test_diffpool_rotation_equivariance(small_system):
    """Same RNG draws, rotated input -> rotated reconstruction (the
    assignment is built from E(3)-invariant bond-conv features)."""
    z, frames, bonds = small_system
    n = z.shape[0]
    cfg = _tiny_cfg(n)
    model = DiffPoolVAE(cfg=DiffPoolConfig(**{**cfg.__dict__, "det": True}))
    adj = jnp.broadcast_to(bond_adjacency(jnp.asarray(bonds), n), (2, n, n))
    zb = jnp.broadcast_to(jnp.asarray(z), (2, n))
    xyz = frames[:2]
    rngs = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
            "sample": jax.random.PRNGKey(2)}
    params = model.init(rngs, zb, jnp.asarray(xyz), adj, jnp.asarray(0.7))["params"]

    run = lambda x: np.asarray(
        model.apply({"params": params}, zb, jnp.asarray(x), adj, jnp.asarray(0.7),
                    rngs={"gumbel": jax.random.PRNGKey(1),
                          "sample": jax.random.PRNGKey(2)}).xyz_recon
    )
    rot = _rand_rot(5)
    base = run(xyz)
    rotated = run(xyz @ rot.T)
    np.testing.assert_allclose(rotated, base @ rot.T, atol=2e-3)


def test_tau_schedule_monotone():
    taus = np.asarray([tau_schedule(i, 2.0, 0.3, 0.004) for i in [0, 100, 10000]])
    assert taus[0] == pytest.approx(2.0)
    assert np.all(np.diff(taus) < 0)
    assert taus[-1] == pytest.approx(0.3, abs=1e-3)


def test_diffpool_training_decreases_loss(small_system):
    z, frames, bonds = small_system
    z2, frames2, _ = synthetic_peptide("dipeptide", n_frames=96, seed=1)
    ds = build_diffpool_dataset(frames2, z, bonds)
    trainer = DiffPoolTrainer(_tiny_cfg(z.shape[0]), beta=0.01, gamma=1.0, lr=3e-3)
    state = trainer.init_state(ds.batch(np.arange(16)))
    state, hist = trainer.fit(
        state, ds.subset(np.arange(80)), ds.subset(np.arange(80, 96)),
        nepochs=5, batch_size=16,
    )
    assert hist[-1]["train_recon"] < hist[0]["train_recon"]


def test_diffpool_pretrain_moves_assignment_to_target(small_system):
    z, frames, bonds = small_system
    n = z.shape[0]
    ds = build_diffpool_dataset(frames, z, bonds)
    trainer = DiffPoolTrainer(_tiny_cfg(n), lr=5e-2)
    state = trainer.init_state(ds.batch(np.arange(8)))
    target = np.arange(n) % 3
    state, l0 = trainer.pretrain(state, ds, target, n_epochs=1, batch_size=8)
    state, l1 = trainer.pretrain(state, ds, target, n_epochs=4, batch_size=8)
    assert l1 < l0


def test_diffpool_batch_carries_angle_dihedral_indices():
    """build_diffpool_dataset extracts bonded angle triplets and proper
    dihedral quads from the bond graph (reference collects these via
    moleculekit, datasets.py:117-128) and DiffPoolBatch carries them."""
    import numpy as np

    from coarsegrainingvae_tpu.data.diffpool import build_diffpool_dataset
    from coarsegrainingvae_tpu.data.topology import (
        angle_triplets,
        dihedral_quads_from_bonds,
    )

    # butane-like chain 0-1-2-3 with a branch 1-4
    bonds = np.array([[0, 1], [1, 2], [2, 3], [1, 4]], np.int32)
    ang = angle_triplets(bonds, 5)
    # centers: 1 has nbrs {0,2,4} -> 3 triplets; 2 has {1,3} -> 1
    assert sorted(map(tuple, ang)) == [
        (0, 1, 2), (0, 1, 4), (1, 2, 3), (2, 1, 4)
    ]
    dih = dihedral_quads_from_bonds(bonds, 5)
    # central bonds: (1,2): i in {0,4}, l in {3} -> 2 quads; others none
    assert sorted(map(tuple, dih)) == [(0, 1, 2, 3), (4, 1, 2, 3)]

    frames = np.random.default_rng(0).normal(size=(4, 5, 3)).astype(np.float32)
    ds = build_diffpool_dataset(frames, np.array([6] * 5), bonds)
    batch = ds.batch(np.arange(2))
    assert batch.angles.shape == (4, 3)
    assert batch.dihedrals.shape == (2, 4)


def test_diffpool_hard_sampling_deterministic_assignment(small_system):
    """sample(..., hard=True) commits to the argmax assignment: samples are
    invariant to the gumbel rng (only the prior draw varies), unlike
    hard=False where near-tie logits can flip an atom between beads across
    draws."""
    import jax

    z, frames, bonds = small_system
    ds = build_diffpool_dataset(frames, z, bonds)
    trainer = DiffPoolTrainer(_tiny_cfg(z.shape[0]), lr=1e-3)
    state = trainer.init_state(ds.batch(np.arange(8)))
    b = ds.batch(np.arange(4))

    # same prior rng, different gumbel rng: fold_in(rng, 7) differs, so fix
    # the full rng and check hard sampling is reproducible; then check the
    # pooled assignment itself is one-hot under hard=True
    s1 = np.asarray(trainer.sample(state.params, b, jax.random.PRNGKey(3), True))
    s2 = np.asarray(trainer.sample(state.params, b, jax.random.PRNGKey(3), True))
    np.testing.assert_array_equal(s1, s2)

    pool = trainer.model.apply(
        {"params": state.params},
        np.asarray(b.z), np.asarray(b.xyz), np.asarray(b.adj),
        np.float32(trainer.cfg.tau_min), True,
        method=trainer.model.pool,
        rngs={"gumbel": jax.random.PRNGKey(0)},
    )
    m = np.asarray(pool.assign)
    assert set(np.unique(m)) <= {0.0, 1.0}
    np.testing.assert_allclose(m.sum(-1), 1.0, atol=1e-6)
