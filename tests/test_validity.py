"""Bond-graph validity on physically-valid synthetic geometry.

Round-1 weakness: the stand-in ensembles put non-bonded atoms inside the
1.3x covalent cutoffs, making the reference's headline exact-match validity
metric (reference scripts/sampling.py:170-194) structurally zero. These
tests pin the fix: every generated frame's covalent-distance bond graph
must EQUAL the intended bonded topology, and a trained model's
reconstructions must score nonzero validity.
"""
import numpy as np
import pytest


def _topology_graph(z, bonds):
    n = z.shape[0]
    topo = np.zeros((n, n), np.int8)
    topo[bonds[:, 0], bonds[:, 1]] = 1
    topo[bonds[:, 1], bonds[:, 0]] = 1
    return topo


@pytest.mark.parametrize(
    "name,n_frames",
    [("dipeptide", 16), ("pentapeptide", 4), ("chignolin", 2)],
)
def test_synthetic_frames_match_topology(name, n_frames):
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
    from coarsegrainingvae_tpu.eval.metrics import bond_graphs_batch

    z, frames, bonds = synthetic_peptide(name, n_frames=n_frames, seed=11)
    graphs = bond_graphs_batch(frames, z)
    topo = _topology_graph(z, bonds)
    assert (graphs == topo[None]).all(), (
        f"{name}: {(graphs != topo[None]).any((1, 2)).sum()}/{n_frames} "
        "frames disagree with the bonded topology under covalent cutoffs"
    )


def test_evaluate_samples_validity_one_on_truth():
    """The ensemble scored against one of its own frames must be 100% valid
    with finite RMSDs (the structural-zero regression guard)."""
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
    from coarsegrainingvae_tpu.eval.metrics import evaluate_samples

    z, frames, _ = synthetic_peptide("dipeptide", n_frames=16, seed=3)
    m = evaluate_samples(frames[0], frames, z)
    assert m["valid_ratio"] == 1.0
    assert m["valid_allatom_ratio"] == 1.0
    assert np.isfinite(m["all_rmsds"]).all()
    assert m["graph_allatom_val_ratio"] == 0.0


def test_trained_recon_validity_nonzero():
    """End-to-end: a model trained on the (easy, jitter-only) ensemble
    produces reconstructions whose heavy-atom bond graph matches.

    gamma=0 here is an optimization-speed choice for the unit test only:
    under the reference recipe (gamma=25 with grad clip 0.01,
    reference scripts/utils.py:141,156) the graph term consumes the clipped
    gradient budget and validity needs hundreds of epochs; the flagship CLI
    keeps the faithful recipe.
    """
    import jax

    from coarsegrainingvae_tpu.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from coarsegrainingvae_tpu.data.dataset import build_dataset
    from coarsegrainingvae_tpu.data.mappings import get_mapping
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
    from coarsegrainingvae_tpu.eval.sampling import reconstruct_all
    from coarsegrainingvae_tpu.models.cgvae import CGequiVAE
    from coarsegrainingvae_tpu.train.trainer import Trainer

    z, frames, bonds = synthetic_peptide(
        "dipeptide", n_frames=64, seed=0, jitter=0.02, torsion_diversity=False
    )
    mapping = get_mapping("newman", 3, z.shape[0], bonds=bonds, frames=frames, seed=0)
    ds = build_dataset(
        mapping, frames, atom_cutoff=8.5, cg_cutoff=9.5, atomic_nums=z,
        bonds=bonds, order=2, rotate=False,
    )
    cfg = ExperimentConfig(
        model=ModelConfig(
            n_cgs=3, n_basis=128, n_rbf=8, atom_cutoff=8.5, cg_cutoff=9.5,
            enc_nconv=3, dec_nconv=3, activation="swish", dec_type="pseudo",
            breaksym=True,
        ),
        data=DataConfig(batch_size=32),
        train=TrainConfig(lr=5e-4, beta=1e-4, gamma=0.0),
    )
    tr = Trainer(CGequiVAE(cfg=cfg.model), cfg)
    train = ds.subset(np.arange(64))
    state = tr.init_state(ds.batch(np.arange(32)), seed=0)
    state, _ = tr.fit(state, train, train, nepochs=40)
    out = reconstruct_all(tr, state.params, train, jax.random.PRNGKey(0))
    assert out["heavy_valid_ratio"] > 0.05, out
    assert np.isfinite(out["all_atom_rmsd"])
    assert out["all_atom_rmsd"] < 1.3, out["all_atom_rmsd"]


def test_graph_edit_ratio_catches_compensating_errors():
    """A missing bond + a spurious bond net to 0 under the reference's
    net-difference 'GED' but score 2/ref_bonds under the true edit
    distance (eval/metrics.py divergence note)."""
    import numpy as np
    from coarsegrainingvae_tpu.eval.metrics import (
        graph_diff_ratio,
        graph_edit_ratio,
    )

    n = 5
    ref = np.zeros((n, n), np.int8)
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 4)]:
        ref[a, b] = ref[b, a] = 1
    gen = ref.copy()
    gen[0, 1] = gen[1, 0] = 0   # missing bond
    gen[0, 4] = gen[4, 0] = 1   # spurious bond

    assert graph_diff_ratio(ref, gen[None])[0] == 0.0      # blind
    # 4 differing entries (2 bonds x symmetric) / 8 ref entries
    assert graph_edit_ratio(ref, gen[None])[0] == 0.5      # sees both
    # exact match scores 0 on both
    assert graph_edit_ratio(ref, ref[None])[0] == 0.0


def test_newman_mapping_lumps_excess_components_into_last_bead():
    """When cutting produces more components than n_cgs, components beyond
    n_cgs-1 collapse into the last bead (same behavior class as the
    reference's parition2mapping, datasets.py:374-385) -- every bead stays
    populated and no index exceeds n_cgs-1."""
    import numpy as np
    from coarsegrainingvae_tpu.data.mappings import newman_mapping

    # 4 disconnected dimers -> 4 components but only 2 beads requested
    bonds = np.array([[0, 1], [2, 3], [4, 5], [6, 7]])
    mapping = newman_mapping(bonds, 8, 2, seed=0)
    assert mapping.max() == 1 and mapping.min() == 0
    # first component keeps bead 0; all later components lump into bead 1
    assert (mapping == 1).sum() == 6


def test_ou_dynamics_bound_conformational_drift():
    """Presets with ou_kappa > 0 (chignolin) must produce basin-dominated
    "md" trajectories: torsions mean-revert to the folded reference, so
    late frames stay near the start and every frame has a close neighbor,
    while ou_kappa=0 free diffusion drifts without bound. Pins the v5
    generator semantics (real 300 K miniprotein data is basin-dominated,
    reference README.md:61-64)."""
    import coarsegrainingvae_tpu.data.synthetic as S

    base = dict(n_heavy=8, n_frames_default=10)
    S._PRESETS["_test_free"] = dict(base)
    S._PRESETS["_test_ou"] = dict(base, ou_kappa=0.2, hop_scale=0.25)
    try:
        _, fr_free, _ = S.synthetic_peptide("_test_free", n_frames=150, seed=5)
        _, fr_ou, _ = S.synthetic_peptide("_test_ou", n_frames=150, seed=5)
    finally:
        del S._PRESETS["_test_free"], S._PRESETS["_test_ou"]

    def drift(frames):
        # mean displacement of the last 50 frames from the first frame
        d = frames[-50:] - frames[0]
        return float(np.sqrt((d ** 2).sum(-1).mean()))

    def median_nn(frames):
        x = frames[::2]
        d2 = ((x[:, None] - x[None, :]) ** 2).sum(-1).mean(-1)
        r = np.sqrt(d2)
        np.fill_diagonal(r, np.inf)
        return float(np.median(r.min(1)))

    assert drift(fr_ou) < drift(fr_free), (drift(fr_ou), drift(fr_free))
    assert median_nn(fr_ou) < median_nn(fr_free), (
        median_nn(fr_ou), median_nn(fr_free)
    )


def test_rotatable_stride_and_chunked_violations():
    """The spike-scale ('covid') preset machinery at test scale:
    rotatable_stride thins the torsion set (rigid segments between
    hinges) while every frame stays bond-graph exact, and the
    frame-chunked Gram-matrix graph_violations matches the per-frame
    computation bit-for-bit on the counts."""
    import coarsegrainingvae_tpu.data.synthetic as S

    S._PRESETS["_test_stride"] = dict(
        n_heavy=60, n_frames_default=8, ou_kappa=0.15, hop_scale=0.25,
        relax_margin=1.30, rotatable_stride=4,
    )
    try:
        z, frames, bonds = S.synthetic_peptide(
            "_test_stride", n_frames=8, seed=9
        )
    finally:
        del S._PRESETS["_test_stride"]
    assert (S.graph_violations(z, frames, bonds, band=1.0) == 0).all()
    per = np.concatenate(
        [S.graph_violations(z, frames[i : i + 1], bonds, band=1.02)
         for i in range(len(frames))]
    )
    np.testing.assert_array_equal(
        S.graph_violations(z, frames, bonds, band=1.02), per
    )
    # the spike preset is registered at ~10k-atom scale with a stride
    assert S._PRESETS["covid"]["rotatable_stride"] > 1
    assert S._PRESETS["covid"]["n_heavy"] >= 3000


def test_h_project_constrains_xh_bond_lengths(small_dataset):
    """With ModelConfig.h_project, every X-H distance in the decoded
    output equals the batch's true covalent bond length exactly, in BOTH
    the sparse (CGequiVAE) and dense (DenseCGVAE) regimes; heavy atoms
    are untouched."""
    import jax

    from coarsegrainingvae_tpu.config import ModelConfig
    from coarsegrainingvae_tpu.models.cgvae import CGequiVAE, flatten_batch
    from coarsegrainingvae_tpu.models.dense_cgvae import DenseCGVAE

    batch = small_dataset.batch(np.arange(4))

    def xh_err_and_heavy_delta(model_cls, h_project):
        cfg = ModelConfig(
            n_cgs=3, n_basis=16, n_rbf=4, atom_cutoff=8.5, cg_cutoff=9.5,
            enc_nconv=1, dec_nconv=1, dec_type="pseudo", breaksym=True,
            compute_dtype="float32", h_project=h_project,
        )
        model = model_cls(cfg=cfg)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            batch,
        )["params"]
        out = model.apply({"params": params}, batch,
                          rngs={"sample": jax.random.PRNGKey(2)})
        g = flatten_batch(batch)
        z = np.asarray(g.z)
        bonds = np.asarray(g.bonds)
        bm = np.asarray(g.bond_mask) > 0
        recon = np.asarray(out.xyz_recon)
        true = np.asarray(g.xyz)
        d_true = np.linalg.norm(true[bonds[:, 0]] - true[bonds[:, 1]], axis=-1)
        # per-H covalent parent = nearest heavy partner in true geometry
        # (g.bonds carries the edgeorder-expanded graph-loss list)
        xh = ((z[bonds[:, 0]] == 1) ^ (z[bonds[:, 1]] == 1)) & bm
        h_of = np.where(z[bonds[:, 0]] == 1, bonds[:, 0], bonds[:, 1])
        min_rest = np.full(len(z), np.inf)
        np.minimum.at(min_rest, h_of[xh], d_true[xh])
        is_xh = xh & (d_true <= min_rest[h_of] + 1e-6)

        def dists(x):
            return np.linalg.norm(
                x[bonds[is_xh, 0]] - x[bonds[is_xh, 1]], axis=-1
            )

        return (np.abs(dists(recon) - dists(true)).max(),
                recon[z != 1])

    err_off, _ = xh_err_and_heavy_delta(CGequiVAE, False)
    assert err_off > 1e-3  # untrained decoder is nowhere near bond lengths

    for cls in (CGequiVAE, DenseCGVAE):
        err_on, heavy = xh_err_and_heavy_delta(cls, True)
        assert err_on < 1e-4, f"{cls.__name__}: max X-H error {err_on}"
        assert np.isfinite(heavy).all()


def test_h_project_diffpool_sample_path():
    """DiffPoolTrainer(h_project=True): generative samples carry exact
    X-H covalent bond lengths; with the flag off they do not (untrained)."""
    import jax

    from coarsegrainingvae_tpu.config import DiffPoolConfig
    from coarsegrainingvae_tpu.data.diffpool import build_diffpool_dataset
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
    from coarsegrainingvae_tpu.train.diffpool_trainer import DiffPoolTrainer

    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=8, seed=3)
    ds = build_diffpool_dataset(frames, z, bonds)
    cfg = DiffPoolConfig(
        n_atoms=z.shape[0], n_cgs=3, feat_dim=16, n_rbf=4,
        atom_cutoff=8.0, cg_cutoff=30.0, pool_nconv=1, enc_nconv=1,
        dec_nconv=1, tau_0=2.0, tau_min=0.3, tau_rate=0.004,
        trainable_map=True,
    )
    batch = ds.batch(np.arange(4))
    rng = jax.random.PRNGKey(0)

    # per-H covalent parent from the raw topology
    parent = {}
    for a, b in np.asarray(bonds):
        if z[a] == 1 and z[b] != 1:
            parent[int(a)] = int(b)
        if z[b] == 1 and z[a] != 1:
            parent[int(b)] = int(a)
    hs = np.array(sorted(parent))
    ps = np.array([parent[h] for h in hs])
    rest = np.linalg.norm(frames[0][hs] - frames[0][ps], axis=-1)

    def max_xh_err(h_project):
        tr = DiffPoolTrainer(cfg, beta=0.01, gamma=1.0, lr=1e-3, seed=5,
                             h_project=h_project)
        state = tr.init_state(batch)
        xs = np.asarray(jax.device_get(
            tr.sample(state.params, batch, rng, False)
        ))
        d = np.linalg.norm(xs[:, hs] - xs[:, ps], axis=-1)
        return np.abs(d - rest[None]).max()

    assert max_xh_err(False) > 1e-2
    assert max_xh_err(True) < 1e-4


def test_pcn_bond_project_kills_missing_covalent_bonds():
    """PCNTrainer(bond_project=True): missing covalent bonds in the
    reconstruction drop by >40% even on an UNTRAINED model, with the
    pinned C-alphas untouched. (The synthetic atom14 truth graphs are
    ~40% cyclic -- a template artifact; tree bonds are projected exactly
    and cycle bonds only relaxed, so the count shrinks rather than
    reaching the zero a real tree-like protein graph would.)"""
    import jax
    import numpy as np

    from coarsegrainingvae_tpu.cli.run_pcn import load_protein_items
    from coarsegrainingvae_tpu.config import ModelConfig
    from coarsegrainingvae_tpu.data.sidechain import build_pcn_dataset
    from coarsegrainingvae_tpu.eval.metrics import bond_graphs_batch
    from coarsegrainingvae_tpu.models.cgvae import PCN
    from coarsegrainingvae_tpu.train.pcn_trainer import PCNTrainer

    items = load_protein_items(None, 6, 5, "train", 8, 13)
    ds = build_pcn_dataset(items, cg_cutoff=10.0)
    cfg = ModelConfig(dec_type="cross", n_basis=32, n_rbf=4,
                      atom_cutoff=10.0, dec_nconv=1, activation="swish")

    def missing_and_ca(bond_project):
        tr = PCNTrainer(PCN(cfg=cfg), gamma=1.0, kappa=0.0, lr=1e-3,
                        seed=3, bond_project=bond_project)
        b, cam, _, _ = next(ds.iter_batches(2))
        state = tr.init_state(b, cam)
        recon = np.asarray(jax.device_get(
            tr.reconstruct(state.params, b, cam)
        )).reshape(b.z.shape[0], b.z.shape[1], 3)
        missing = 0
        for i in range(2):
            m = np.asarray(b.atom_mask[i]).astype(bool)
            true = np.asarray(b.xyz[i])
            z = np.asarray(b.z[i])
            gt = bond_graphs_batch(true[None, m], z[m])[0]
            gr = bond_graphs_batch(recon[i][None, m], z[m])[0]
            missing += int(((gt == 1) & (gr == 0)).sum() // 2)
        # pinned C-alphas: reconstruct returns them at the true positions
        ca = np.asarray(cam[0]).astype(bool)
        ca_err = np.abs(recon[0][ca] - np.asarray(b.xyz[0])[ca]).max()
        return missing, ca_err

    miss_off, _ = missing_and_ca(False)
    miss_on, ca_err = missing_and_ca(True)
    assert miss_off > 0
    assert miss_on < 0.6 * miss_off, (miss_on, miss_off)
    assert ca_err < 1e-3


def test_pcn_bond_project_eval_only():
    """bond_project_eval: the PCN TRAINING step is bit-identical to the
    unprojected baseline (training through the projection is unstable --
    the round-5 p7 chip run NaN'd at epoch 30/300), while reconstruct
    output matches the fully-projected variant's geometry."""
    import jax
    import jax.numpy as jnp

    from coarsegrainingvae_tpu.cli.run_pcn import load_protein_items
    from coarsegrainingvae_tpu.config import ModelConfig
    from coarsegrainingvae_tpu.data.sidechain import build_pcn_dataset
    from coarsegrainingvae_tpu.models.cgvae import PCN
    from coarsegrainingvae_tpu.train.pcn_trainer import PCNTrainer

    items = load_protein_items(None, 6, 5, "train", 8, 13)
    ds = build_pcn_dataset(items, cg_cutoff=10.0)
    cfg = ModelConfig(dec_type="cross", n_basis=32, n_rbf=4,
                      atom_cutoff=10.0, dec_nconv=1, activation="swish")
    b, cam, quads, qm = next(ds.iter_batches(2))
    args = (b, jnp.asarray(cam), jnp.asarray(quads), jnp.asarray(qm))

    def mk(**kw):
        tr = PCNTrainer(PCN(cfg=cfg), gamma=1.0, kappa=0.1, lr=1e-3,
                        seed=3, **kw)
        return tr, tr.init_state(b, cam)

    t0, s0 = mk()
    t1, s1 = mk(bond_project_eval=True)
    t2, s2 = mk(bond_project=True)
    # reconstruct first (the jitted train step donates its state):
    # eval-only projects exactly like the trained-through variant at
    # identical params (init is seed-deterministic)
    r1 = np.asarray(jax.device_get(t1.reconstruct(s1.params, b, cam)))
    r2 = np.asarray(jax.device_get(t2.reconstruct(s2.params, b, cam)))
    r0 = np.asarray(jax.device_get(t0.reconstruct(s0.params, b, cam)))
    one = jnp.asarray(1.0, jnp.float32)
    _, m0 = t0._train_step(s0, *args, one)
    _, m1 = t1._train_step(s1, *args, one)
    _, m2 = t2._train_step(s2, *args, one)
    # eval-only: training objective untouched; trained-through: differs
    assert float(m0["loss"]) == float(m1["loss"])
    assert float(m2["loss"]) != float(m0["loss"])
    np.testing.assert_allclose(r1, r2, atol=1e-5)
    assert np.abs(r1 - r0).max() > 1e-3


def test_h_project_eval_only(small_dataset):
    """h_project_eval: the TRAINING step is bit-identical to the baseline
    (reference dynamics), while trainer.reconstruct output carries exact
    X-H bond lengths."""
    import jax

    from coarsegrainingvae_tpu.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from coarsegrainingvae_tpu.models.cgvae import CGequiVAE, flatten_batch
    from coarsegrainingvae_tpu.parallel.mesh import make_mesh
    from coarsegrainingvae_tpu.train.trainer import Trainer

    def mk(h_eval):
        cfg = ExperimentConfig(
            model=ModelConfig(
                n_cgs=3, n_basis=16, n_rbf=4, atom_cutoff=8.5, cg_cutoff=9.5,
                enc_nconv=1, dec_nconv=1, dec_type="pseudo", breaksym=True,
                compute_dtype="float32", h_project_eval=h_eval,
            ),
            data=DataConfig(batch_size=4, seed=0),
            train=TrainConfig(nepochs=1, lr=1e-3, beta=0.05, gamma=1.0),
        )
        return Trainer(CGequiVAE(cfg=cfg.model), cfg, mesh=make_mesh(1))

    batch = small_dataset.batch(np.arange(4))
    rng = jax.random.PRNGKey(0)
    t0, t1 = mk(False), mk(True)
    s0 = t0.init_state(batch, seed=0)
    s1 = t1.init_state(batch, seed=0)
    n0, m0 = t0.train_step(s0, batch, rng)
    n1, m1 = t1.train_step(s1, batch, rng)
    assert float(m0["loss"]) == float(m1["loss"])  # training untouched

    xr = np.asarray(jax.device_get(t1.reconstruct(n1.params, batch, rng)))
    g = flatten_batch(batch)
    z = np.asarray(g.z)
    bonds = np.asarray(g.bonds)
    bm = np.asarray(g.bond_mask) > 0
    true = np.asarray(g.xyz)
    d_true = np.linalg.norm(true[bonds[:, 0]] - true[bonds[:, 1]], axis=-1)
    xh = ((z[bonds[:, 0]] == 1) ^ (z[bonds[:, 1]] == 1)) & bm
    h_of = np.where(z[bonds[:, 0]] == 1, bonds[:, 0], bonds[:, 1])
    min_rest = np.full(len(z), np.inf)
    np.minimum.at(min_rest, h_of[xh], d_true[xh])
    sel = xh & (d_true <= min_rest[h_of] + 1e-6)
    d_rec = np.linalg.norm(xr[bonds[sel, 0]] - xr[bonds[sel, 1]], axis=-1)
    assert np.abs(d_rec - d_true[sel]).max() < 1e-4
