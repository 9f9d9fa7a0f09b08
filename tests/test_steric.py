"""Excluded-volume (steric) hinge loss: tables, loss values, trainer wiring.

The steric term is a repo extension (no reference analogue; the reference
loss is recon+KL+graph, scripts/utils.py:141) targeting the bond-graph
validity metric's dominant failure mode: nonbonded 1-3/1-4 pairs
reconstructed inside the covalent cutoff (eval/metrics.py::valid_ratio).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coarsegrainingvae_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from coarsegrainingvae_tpu.eval.metrics import bond_cutoff_matrix
from coarsegrainingvae_tpu.train.losses import (
    build_steric_tables,
    steric_loss,
)


def _chain():
    # 4-atom carbon chain: bonds 0-1, 1-2, 2-3
    z = np.array([6, 6, 6, 6])
    bonds = np.array([[0, 1], [1, 2], [2, 3]])
    return z, bonds


def test_tables_exclude_bonded_and_diagonal():
    z, bonds = _chain()
    thresh, mask = build_steric_tables(z, bonds, margin=0.3)
    assert thresh.shape == (4, 4) and mask.shape == (4, 4)
    assert not mask.diagonal().any()
    for a, b in bonds:
        assert not mask[a, b] and not mask[b, a]
    # 1-3 and 1-4 pairs ARE eligible
    assert mask[0, 2] and mask[0, 3] and mask[1, 3]
    # threshold = validity cutoff + margin
    np.testing.assert_allclose(
        thresh, bond_cutoff_matrix(z) + 0.3, atol=1e-6
    )


def test_tables_data_margin_per_pair():
    """frames=... clips each pair's threshold to the ensemble's own
    closest approach within [cutoff, cutoff + margin]."""
    z, bonds = _chain()
    cutoff = bond_cutoff_matrix(z)
    # two frames along x: pair (0,2) approaches to cutoff+0.1 (inside the
    # uniform cutoff+0.3 band), pair (0,3) never closer than 10 A
    x1 = np.zeros((4, 3), np.float32)
    x1[1, 0] = 1.54
    x1[2, 0] = cutoff[0, 2] + 0.1
    x1[3, 0] = 10.0
    x2 = x1.copy()
    x2[2, 0] = cutoff[0, 2] + 0.25
    frames = np.stack([x1, x2])
    thresh, mask = build_steric_tables(z, bonds, margin=0.3, frames=frames)
    # (0,2): data margin 0.1 < uniform 0.3 -> threshold relaxes to the
    # data's own closest approach
    np.testing.assert_allclose(thresh[0, 2], cutoff[0, 2] + 0.1, atol=1e-5)
    # (0,3): data stays far -> clipped at cutoff + margin (never beyond)
    np.testing.assert_allclose(thresh[0, 3], cutoff[0, 3] + 0.3, atol=1e-5)
    # a pair the data brings INSIDE the validity cutoff still gets at
    # least the cutoff itself (floor of the clip)
    x3 = x1.copy()
    x3[2, 0] = cutoff[0, 2] - 0.5
    t2, _ = build_steric_tables(
        z, bonds, margin=0.3, frames=np.stack([x3])
    )
    np.testing.assert_allclose(t2[0, 2], cutoff[0, 2], atol=1e-5)
    # frames=None keeps round-4 behavior bit-for-bit
    t_none, _ = build_steric_tables(z, bonds, margin=0.3)
    np.testing.assert_allclose(t_none, cutoff + 0.3, atol=1e-6)


def test_tables_exclude_padding():
    z = np.array([6, 6, 0, 0])
    thresh, mask = build_steric_tables(z, np.empty((0, 2), int))
    assert mask[0, 1]
    assert not mask[0, 2] and not mask[2, 3]


def test_steric_loss_zero_when_separated_positive_when_compressed():
    z, bonds = _chain()
    thresh, mask = build_steric_tables(z, bonds, margin=0.3)
    # straight chain at 1.54 A bond length: 1-3 distance 3.08, 1-4 4.62 --
    # all eligible pairs far outside the ~2.07 A threshold
    xyz = np.zeros((1, 4, 3), np.float32)
    xyz[0, :, 0] = np.arange(4) * 1.54
    flat = jnp.asarray(xyz.reshape(-1, 3))
    assert float(steric_loss(flat, jnp.asarray(thresh), jnp.asarray(mask))) == 0.0

    # fold atom 3 onto atom 0 -> spurious-contact violation
    xyz2 = xyz.copy()
    xyz2[0, 3] = xyz2[0, 0] + np.array([0.8, 0, 0], np.float32)
    val = float(
        steric_loss(
            jnp.asarray(xyz2.reshape(-1, 3)),
            jnp.asarray(thresh),
            jnp.asarray(mask),
        )
    )
    assert val > 0.0


def test_steric_gradient_pushes_apart():
    z, bonds = _chain()
    thresh, mask = build_steric_tables(z, bonds, margin=0.3)
    xyz = np.zeros((4, 3), np.float32)
    xyz[:, 0] = np.arange(4) * 1.54
    # atom 3 approaches atom 0 from the far side: only the 0-3 pair
    # violates (3 is 2.34 A from atom 1, outside the ~2.07 A threshold)
    xyz[3] = np.array([-0.8, 0, 0], np.float32)

    g = jax.grad(
        lambda x: steric_loss(x, jnp.asarray(thresh), jnp.asarray(mask))
    )(jnp.asarray(xyz))
    g = np.asarray(g)
    # descent (-g) moves atom 3 further into -x, away from atom 0
    assert g[3, 0] > 0.0
    assert g[0, 0] < 0.0


def test_vae_loss_parity_when_zeta_zero(small_dataset):
    """zeta=0 (default) must not change the loss value or metrics keys."""
    from coarsegrainingvae_tpu.models.cgvae import CGequiVAE, flatten_batch
    from coarsegrainingvae_tpu.train.losses import vae_loss

    cfg = ModelConfig(
        n_cgs=3, n_basis=16, n_rbf=4, atom_cutoff=8.5, cg_cutoff=9.5,
        enc_nconv=1, dec_nconv=1, dec_type="pseudo", breaksym=True,
        compute_dtype="float32",
    )
    model = CGequiVAE(cfg=cfg)
    batch = small_dataset.batch(np.arange(4))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch,
    )["params"]
    out = model.apply({"params": params}, batch,
                      rngs={"sample": jax.random.PRNGKey(2)})
    g = flatten_batch(batch)
    base, base_m = vae_loss(out, g, 0.05, 1.0)
    z = np.asarray(batch.z[0])
    zeroed, zeroed_m = vae_loss(
        out, g, 0.05, 1.0, zeta=0.0,
        steric=tuple(map(jnp.asarray, build_steric_tables(
            z, np.empty((0, 2), int)
        ))),
    )
    assert float(base) == float(zeroed)
    assert "steric" not in zeroed_m


def test_trainer_with_steric_term_trains(small_dataset):
    """End-to-end: zeta>0 adds the metric and training still converges."""
    from coarsegrainingvae_tpu.models.cgvae import CGequiVAE
    from coarsegrainingvae_tpu.parallel.mesh import make_mesh
    from coarsegrainingvae_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(
        model=ModelConfig(
            n_cgs=3, n_basis=16, n_rbf=4, atom_cutoff=8.5, cg_cutoff=9.5,
            enc_nconv=1, dec_nconv=1, dec_type="pseudo", breaksym=True,
            compute_dtype="float32",
        ),
        data=DataConfig(batch_size=4, seed=0),
        train=TrainConfig(nepochs=1, lr=1e-3, beta=0.05, gamma=1.0,
                          zeta=5.0, grad_clip=0.01),
    )
    batch = small_dataset.batch(np.arange(4))
    z = np.asarray(batch.z[0])
    # covalent bonds of the tiny dipeptide come from the fixture topology;
    # rebuild them the same way the CLI does (load_frames -> bonds)
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide

    z_full, _, bonds = synthetic_peptide("dipeptide", n_frames=1, seed=7)
    np.testing.assert_array_equal(z_full, z)
    tables = build_steric_tables(z, bonds)

    model = CGequiVAE(cfg=cfg.model)
    trainer = Trainer(model, cfg, mesh=make_mesh(1), steric_tables=tables)
    state = trainer.init_state(batch, seed=0)
    rng = jax.random.PRNGKey(0)
    first = last = None
    for i in range(8):
        state, m = trainer.train_step(state, batch, jax.random.fold_in(rng, i))
        assert "steric" in m
        assert np.isfinite(float(m["loss"]))
        first = float(m["loss"]) if first is None else first
        last = float(m["loss"])
    assert last < first


def test_diffpool_steric_and_graph_grad_flags():
    """Parity when flags are off; steric metric + finite training when on."""
    from coarsegrainingvae_tpu.config import DiffPoolConfig
    from coarsegrainingvae_tpu.data.diffpool import build_diffpool_dataset
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
    from coarsegrainingvae_tpu.train.diffpool_trainer import DiffPoolTrainer

    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=32, seed=3)
    ds = build_diffpool_dataset(frames, z, bonds)
    cfg = DiffPoolConfig(
        n_atoms=z.shape[0], n_cgs=3, feat_dim=32, n_rbf=4,
        atom_cutoff=8.0, cg_cutoff=30.0, pool_nconv=1, enc_nconv=1,
        dec_nconv=1, tau_0=2.0, tau_min=0.3, tau_rate=0.004,
        trainable_map=True,
    )
    batch = ds.batch(np.arange(8))
    rng = jax.random.PRNGKey(0)

    base = DiffPoolTrainer(cfg, beta=0.01, gamma=1.0, lr=1e-3, seed=11)
    state0 = base.init_state(batch)
    _, m_base = base.train_step(state0, batch, rng)

    tables = build_steric_tables(z, bonds)
    ext = DiffPoolTrainer(
        cfg, beta=0.01, gamma=1.0, lr=1e-3, seed=11,
        zeta=5.0, steric_tables=tables, graph_grad=True,
    )
    state1 = ext.init_state(batch)
    _, m_ext = ext.train_step(state1, batch, rng)

    # identical init + rng: parity of the shared tracked metrics
    assert "steric" not in m_base
    assert "steric" in m_ext and np.isfinite(float(m_ext["steric"]))
    np.testing.assert_allclose(
        float(m_base["recon"]), float(m_ext["recon"]), rtol=1e-5
    )


def test_h_bond_weight_parity_and_effect(small_dataset):
    """h_bond_weight=1 is the reference graph loss exactly; >1 changes it
    only when X-H edges disagree more/less than heavy-heavy edges."""
    from coarsegrainingvae_tpu.models.cgvae import CGequiVAE, flatten_batch
    from coarsegrainingvae_tpu.train.losses import vae_loss

    cfg = ModelConfig(
        n_cgs=3, n_basis=16, n_rbf=4, atom_cutoff=8.5, cg_cutoff=9.5,
        enc_nconv=1, dec_nconv=1, dec_type="pseudo", breaksym=True,
        compute_dtype="float32",
    )
    model = CGequiVAE(cfg=cfg)
    batch = small_dataset.batch(np.arange(4))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch,
    )["params"]
    out = model.apply({"params": params}, batch,
                      rngs={"sample": jax.random.PRNGKey(2)})
    g = flatten_batch(batch)
    base, base_m = vae_loss(out, g, 0.05, 1.0)
    same, same_m = vae_loss(out, g, 0.05, 1.0, h_bond_weight=1.0)
    assert float(base) == float(same)
    up, up_m = vae_loss(out, g, 0.05, 1.0, h_bond_weight=4.0)
    # weighted mean differs from unweighted unless all edges agree equally
    assert float(up_m["graph"]) != float(base_m["graph"])
    assert np.isfinite(float(up))


def test_zeta_warmup_ramps_steric_weight(small_dataset):
    """With zeta_warmup=N the effective steric weight at step k is
    zeta*min(k/N, 1): step 0 must match the zeta=0 loss exactly, and the
    late-step loss must match the unwarmed zeta loss."""
    from coarsegrainingvae_tpu.models.cgvae import CGequiVAE
    from coarsegrainingvae_tpu.parallel.mesh import make_mesh
    from coarsegrainingvae_tpu.train.trainer import Trainer

    def mk(zeta, warmup):
        cfg = ExperimentConfig(
            model=ModelConfig(
                n_cgs=3, n_basis=16, n_rbf=4, atom_cutoff=8.5, cg_cutoff=9.5,
                enc_nconv=1, dec_nconv=1, dec_type="pseudo", breaksym=True,
                compute_dtype="float32",
            ),
            data=DataConfig(batch_size=4, seed=0),
            train=TrainConfig(nepochs=1, lr=1e-3, beta=0.05, gamma=1.0,
                              zeta=zeta, zeta_warmup=warmup, grad_clip=0.01),
        )
        model = CGequiVAE(cfg=cfg.model)
        tables = None
        if zeta:
            from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide

            z_full, _, bonds = synthetic_peptide("dipeptide", n_frames=1, seed=7)
            tables = build_steric_tables(z_full, bonds)
        return Trainer(model, cfg, mesh=make_mesh(1), steric_tables=tables)

    batch = small_dataset.batch(np.arange(4))
    rng = jax.random.PRNGKey(0)

    t_off = mk(0.0, 0)
    t_full = mk(5.0, 0)
    t_warm = mk(5.0, 4)
    s_off = t_off.init_state(batch, seed=0)
    s_full = t_full.init_state(batch, seed=0)
    s_warm = t_warm.init_state(batch, seed=0)

    # step 0: warmup scale = 0 -> loss equals the zeta=0 loss
    _, m_off = t_off.train_step(s_off, batch, rng)
    _, m_full = t_full.train_step(s_full, batch, rng)
    s_w, m_w0 = t_warm.train_step(s_warm, batch, rng)
    np.testing.assert_allclose(float(m_w0["loss"]), float(m_off["loss"]),
                               rtol=1e-6)
    assert float(m_full["loss"]) > float(m_off["loss"])  # steric adds

    # advance past the ramp: identical params would give the full-zeta
    # loss; here just pin that the traced scale reaches 1 (metrics carry
    # the scaled steric contribution: loss - base parts == zeta*steric)
    for i in range(1, 6):
        s_w, m_w = t_warm.train_step(s_w, batch, jax.random.fold_in(rng, i))
    contrib = float(m_w["loss"]) - (
        float(m_w["recon"]) + 0.05 * float(m_w["kl"]) + 1.0 * float(m_w["graph"])
    )
    np.testing.assert_allclose(contrib, 5.0 * float(m_w["steric"]), rtol=1e-4)


def test_diffpool_graph_warmup_recon_first():
    """With --graph_grad -graph_warmup N, the step-0 OPTIMIZED gradient
    excludes the graph term (update == graph_grad-off update) while the
    tracked 'loss' metric still carries the reference's full gamma*graph
    (run_diffpool.py:207-210 tracking semantics)."""
    from coarsegrainingvae_tpu.config import DiffPoolConfig
    from coarsegrainingvae_tpu.data.diffpool import build_diffpool_dataset
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
    from coarsegrainingvae_tpu.train.diffpool_trainer import DiffPoolTrainer

    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=16, seed=3)
    ds = build_diffpool_dataset(frames, z, bonds)
    cfg = DiffPoolConfig(
        n_atoms=z.shape[0], n_cgs=3, feat_dim=32, n_rbf=4,
        atom_cutoff=8.0, cg_cutoff=30.0, pool_nconv=1, enc_nconv=1,
        dec_nconv=1, tau_0=2.0, tau_min=0.3, tau_rate=0.004,
        trainable_map=True,
    )
    batch = ds.batch(np.arange(8))
    rng = jax.random.PRNGKey(0)

    t_off = DiffPoolTrainer(cfg, beta=0.01, gamma=1.0, lr=1e-3, seed=11)
    t_on = DiffPoolTrainer(cfg, beta=0.01, gamma=1.0, lr=1e-3, seed=11,
                           graph_grad=True)
    t_warm = DiffPoolTrainer(cfg, beta=0.01, gamma=1.0, lr=1e-3, seed=11,
                             graph_grad=True, graph_warmup=100)

    s_off, m_off = t_off.train_step(t_off.init_state(batch), batch, rng)
    s_on, m_on = t_on.train_step(t_on.init_state(batch), batch, rng)
    s_w, m_w = t_warm.train_step(t_warm.init_state(batch), batch, rng)

    # tracked metric identical across all three (same init + rng)
    np.testing.assert_allclose(float(m_w["loss"]), float(m_off["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m_w["loss"]), float(m_on["loss"]),
                               rtol=1e-6)

    # step-0 ramp scale = 0: warm update == graph_grad-off update, and it
    # must differ from the full graph_grad update
    leaves_w = jax.tree_util.tree_leaves(s_w.params)
    leaves_off = jax.tree_util.tree_leaves(s_off.params)
    leaves_on = jax.tree_util.tree_leaves(s_on.params)
    # (atol 2e-6: the warm path computes total + 0*graph, one extra fma
    # of rounding vs the off path)
    for a, b in zip(leaves_w, leaves_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        for a, b in zip(leaves_w, leaves_on)
    )


def test_eta_h_additive_term(small_dataset):
    """eta_h adds a separately-normalized H-edge distance MSE: the base
    graph term is untouched (no h_bond_weight-style dilution) and the
    total shifts by exactly eta_h * h_graph."""
    from coarsegrainingvae_tpu.models.cgvae import CGequiVAE, flatten_batch
    from coarsegrainingvae_tpu.train.losses import vae_loss

    cfg = ModelConfig(
        n_cgs=3, n_basis=16, n_rbf=4, atom_cutoff=8.5, cg_cutoff=9.5,
        enc_nconv=1, dec_nconv=1, dec_type="pseudo", breaksym=True,
        compute_dtype="float32",
    )
    model = CGequiVAE(cfg=cfg)
    batch = small_dataset.batch(np.arange(4))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch,
    )["params"]
    out = model.apply({"params": params}, batch,
                      rngs={"sample": jax.random.PRNGKey(2)})
    g = flatten_batch(batch)
    base, base_m = vae_loss(out, g, 0.05, 1.0)
    ext, ext_m = vae_loss(out, g, 0.05, 1.0, eta_h=2.0)
    assert "h_graph" not in base_m and "h_graph" in ext_m
    # graph term identical (the additive form does not reweight it)
    np.testing.assert_allclose(float(ext_m["graph"]), float(base_m["graph"]))
    np.testing.assert_allclose(
        float(ext) - float(base), 2.0 * float(ext_m["h_graph"]), rtol=1e-5
    )
    # the H-edge MSE is a real, finite quantity on this H-bearing topology
    assert np.isfinite(float(ext_m["h_graph"]))
    assert float(ext_m["h_graph"]) > 0.0


def test_steric_loss_batched_matches_host_tables():
    """The in-step batched tables (multi-topology PCN regime) must agree
    with build_steric_tables per sample, including padding atoms and
    padded bond rows."""
    from coarsegrainingvae_tpu.train.losses import (
        steric_loss,
        steric_loss_batched,
    )

    rng = np.random.default_rng(0)
    b, n, eb = 3, 12, 8
    z = rng.integers(1, 9, (b, n)).astype(np.int32)
    z[1, 9:] = 0  # one sample padded shorter
    z[2, 6:] = 0
    xyz = rng.normal(size=(b, n, 3)).astype(np.float32) * 1.5
    bonds = np.zeros((b, eb, 2), np.int32)
    bond_mask = np.zeros((b, eb), bool)
    for s in range(b):
        n_real = int((z[s] > 0).sum())
        k = min(eb, n_real - 1)
        for e in range(k):
            bonds[s, e] = (e, e + 1)
            bond_mask[s, e] = True

    got = float(steric_loss_batched(
        jnp.asarray(xyz.reshape(-1, 3)), jnp.asarray(z), jnp.asarray(bonds),
        jnp.asarray(bond_mask), margin=0.3,
    ))

    # reference: per-sample host tables, pooled over all real pairs
    num = 0.0
    den = 0.0
    for s in range(b):
        thresh, mask = build_steric_tables(
            z[s], bonds[s][bond_mask[s]], margin=0.3
        )
        per = steric_loss(
            jnp.asarray(xyz[s].reshape(-1, 3)), jnp.asarray(thresh),
            jnp.asarray(mask),
        )
        num += float(per) * mask.sum()
        den += mask.sum()
    np.testing.assert_allclose(got, num / den, rtol=1e-5)


def test_pcn_zeta_parity_and_training():
    """run_pcn -zeta 0 keeps the reference loss surface; zeta>0 adds the
    steric metric and the trainer still steps finitely."""
    from coarsegrainingvae_tpu.data.sidechain import build_pcn_dataset
    from coarsegrainingvae_tpu.data.synthetic import synthetic_protein
    from coarsegrainingvae_tpu.models.cgvae import PCN
    from coarsegrainingvae_tpu.train.pcn_trainer import PCNTrainer

    items = [synthetic_protein(6, seed=s) for s in range(4)]
    ds = build_pcn_dataset(items, cg_cutoff=10.0)
    cfg = ModelConfig(n_basis=16, n_rbf=4, atom_cutoff=10.0, dec_nconv=1,
                      dec_type="cross")
    model = PCN(cfg=cfg)

    batch, ca_mask, quads, quad_mask = next(ds.iter_batches(4))
    base = PCNTrainer(model, gamma=1.0, kappa=0.5, lr=1e-3, grad_clip=0.1)
    ext = PCNTrainer(model, gamma=1.0, kappa=0.5, lr=1e-3, grad_clip=0.1,
                     zeta=10.0, zeta_warmup=2)
    s0 = base.init_state(batch, ca_mask)
    s1 = ext.init_state(batch, ca_mask)
    ca = jnp.asarray(ca_mask)
    _, m0 = base._train_step(s0, batch, ca, quads, quad_mask, 1.0)
    s1b, m1 = ext._train_step(s1, batch, ca, quads, quad_mask, 1.0)
    # step 0 of the warmup: steric weight 0 -> identical total loss
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]), rtol=1e-6)
    assert "steric" in m1 and np.isfinite(float(m1["steric"]))
    # past the ramp the steric term contributes
    for i in range(3):
        s1b, m1 = ext._train_step(s1b, batch, ca, quads, quad_mask, 1.0)
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["loss"]) >= float(m1["recon"])


def test_warmup_holds_plateau_controller():
    """While a step-warmup ramp is active, fit() must NOT feed the plateau
    controller (the objective is moving, not plateauing): the LR stays at
    base through the warm epochs even with lr_patience=1. Measured
    failure this guards: the diffpool graph_warmup retrain collapsed to
    lr=2e-6 by epoch 191 while recon was still 3x off."""
    from coarsegrainingvae_tpu.config import DiffPoolConfig
    from coarsegrainingvae_tpu.data.diffpool import build_diffpool_dataset
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
    from coarsegrainingvae_tpu.train.diffpool_trainer import DiffPoolTrainer

    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=24, seed=3)
    ds = build_diffpool_dataset(frames, z, bonds)
    cfg = DiffPoolConfig(
        n_atoms=z.shape[0], n_cgs=3, feat_dim=16, n_rbf=4,
        atom_cutoff=8.0, cg_cutoff=30.0, pool_nconv=1, enc_nconv=1,
        dec_nconv=1, tau_0=2.0, tau_min=0.3, tau_rate=0.004,
        trainable_map=True,
    )
    tables = build_steric_tables(z, bonds)
    ds_tr = ds.subset(np.arange(16))
    ds_val = ds.subset(np.arange(16, 24))
    # 3 epochs' worth of warmup steps (16//8 = 2 steps/epoch)
    tr = DiffPoolTrainer(cfg, beta=0.01, gamma=1.0, lr=1e-3, seed=7,
                         zeta=5.0, steric_tables=tables, zeta_warmup=6)
    state = tr.init_state(ds_tr.batch(np.arange(8)))
    _, hist = tr.fit(state, ds_tr, ds_val, nepochs=4, batch_size=8,
                     patience=50, lr_patience=1, lr_factor=0.1,
                     min_lr=1e-9)
    lrs = [h["lr"] for h in hist]
    assert all(lr == 1e-3 for lr in lrs[:3]), lrs
