"""Device-resident data path + epoch-as-one-jit scan trainer."""
import jax
import numpy as np
import pytest

from coarsegrainingvae_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from coarsegrainingvae_tpu.data.dataset import build_dataset
from coarsegrainingvae_tpu.data.device import DeviceDataset, epoch_index_batches
from coarsegrainingvae_tpu.data.mappings import nearest_site_mapping
from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
from coarsegrainingvae_tpu.models.cgvae import CGequiVAE
from coarsegrainingvae_tpu.parallel.mesh import make_mesh
from coarsegrainingvae_tpu.train.trainer import Trainer


def _setup(n_frames=32):
    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=n_frames, seed=0)
    mapping = np.arange(z.shape[0]) % 3
    ds = build_dataset(mapping, frames, atom_cutoff=8.5, cg_cutoff=9.5,
                       atomic_nums=z, bonds=bonds, order=2, rotate=False)
    cfg = ExperimentConfig(
        # f32 pinned: scan/multi-device parity asserts near-exact agreement
        model=ModelConfig(n_cgs=3, n_basis=16, n_rbf=4, atom_cutoff=8.5,
                          cg_cutoff=9.5, enc_nconv=1, dec_nconv=1,
                          dec_type="painn", compute_dtype="float32"),
        data=DataConfig(batch_size=8, seed=0),
        train=TrainConfig(lr=1e-3, beta=0.01, gamma=1.0,
                          # f32 moments: parity tests assert near-exact
                          adam_moment_dtype="float32"),
    )
    return cfg, ds


def test_gather_matches_host_batch():
    cfg, ds = _setup()
    dds = DeviceDataset.from_dataset(ds)
    idx = np.array([3, 1, 7, 2])
    host = ds.batch(idx)
    dev = jax.jit(dds.gather)(idx)
    np.testing.assert_allclose(np.asarray(dev.xyz), host.xyz, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(dev.nbrs), host.nbrs)
    np.testing.assert_array_equal(np.asarray(dev.mapping), host.mapping)


def test_epoch_index_batches_cover_all_frames():
    b = epoch_index_batches(33, 8, None)
    assert b.shape == (4, 8)
    assert set(b.ravel()) <= set(range(33))
    # shuffled variant is a permutation of the same coverage
    b2 = epoch_index_batches(32, 8, np.random.default_rng(0))
    assert sorted(b2.ravel()) == list(range(32))


def test_scan_epoch_matches_loop_epoch():
    """One-jit scan epoch produces the same final params as the per-step
    device loop (same shuffle, same RNG folds)."""
    cfg, ds = _setup()
    dds = DeviceDataset.from_dataset(ds)
    model = CGequiVAE(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)

    t1 = Trainer(model, cfg, mesh=make_mesh(1))
    s_loop = t1.init_state(ds.batch(np.arange(8)), seed=0)
    s_loop, m_loop = t1.run_epoch_device(
        s_loop, dds, rng, train=True, shuffle_rng=np.random.default_rng(5)
    )

    t2 = Trainer(model, cfg, mesh=make_mesh(1))
    s_scan = t2.init_state(ds.batch(np.arange(8)), seed=0)
    s_scan, m_scan = t2.run_epoch_scan(
        s_scan, dds, rng, shuffle_rng=np.random.default_rng(5)
    )

    assert m_scan["n_steps"] == m_loop["n_steps"]
    np.testing.assert_allclose(m_scan["loss"], m_loop["loss"], rtol=1e-4)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s_loop.params)),
        jax.tree.leaves(jax.device_get(s_scan.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_nearest_site_mapping():
    frames = np.zeros((2, 5, 3), np.float32)
    frames[:, 0] = [0, 0, 0]
    frames[:, 1] = [0.5, 0, 0]
    frames[:, 2] = [10, 0, 0]
    frames[:, 3] = [10.5, 0, 0]
    frames[:, 4] = [9.8, 0, 0]
    m = nearest_site_mapping(frames, np.array([0, 2]))
    np.testing.assert_array_equal(m, [0, 0, 1, 1, 1])


def test_scan_epoch_multidevice_matches_single():
    """Epoch-as-one-jit on an 8-device mesh: same final params as the
    single-device scan (gradient all-reduce over the mesh is exact for
    full batches)."""
    cfg, ds = _setup()
    dds = DeviceDataset.from_dataset(ds)
    model = CGequiVAE(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)

    t1 = Trainer(model, cfg, mesh=make_mesh(1))
    s1 = t1.init_state(ds.batch(np.arange(8)), seed=0)
    s1, m1 = t1.run_epoch_scan(s1, dds, rng, shuffle_rng=np.random.default_rng(5))

    t8 = Trainer(model, cfg, mesh=make_mesh(8))
    s8 = t8.init_state(ds.batch(np.arange(8)), seed=0)
    s8, m8 = t8.run_epoch_scan(s8, dds, rng, shuffle_rng=np.random.default_rng(5))

    np.testing.assert_allclose(m8["loss"], m1["loss"], rtol=2e-4)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s1.params)),
        jax.tree.leaves(jax.device_get(s8.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_streamed_epoch_matches_full_scan():
    """Chunked streaming (no shuffle, chunk = multiple of batch) produces
    the identical batch sequence, hence identical final params, as one
    whole-dataset scan."""
    cfg, ds = _setup(n_frames=32)
    model = CGequiVAE(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)

    t1 = Trainer(model, cfg, mesh=make_mesh(1))
    s_full = t1.init_state(ds.batch(np.arange(8)), seed=0)
    s_full, m_full = t1.run_epoch_scan(
        s_full, DeviceDataset.from_dataset(ds), rng, shuffle_rng=None
    )

    t2 = Trainer(model, cfg, mesh=make_mesh(1))
    s_str = t2.init_state(ds.batch(np.arange(8)), seed=0)
    s_str, m_str = t2.run_epoch_streamed(
        s_str, ds, rng, chunk_frames=16, shuffle_rng=None
    )

    assert m_str["n_steps"] == m_full["n_steps"]
    # per-chunk RNG folding differs from whole-scan folding, so metrics are
    # close but params won't be bitwise equal; both must make progress
    assert np.isfinite(m_str["loss"]) and np.isfinite(m_full["loss"])
    assert abs(m_str["recon"] - m_full["recon"]) / m_full["recon"] < 0.2


def test_zero_optimizer_sharding_matches_replicated():
    """ZeRO-1 optimizer-state sharding (ParallelConfig.zero_optimizer):
    same training trajectory as the replicated optimizer, with Adam
    moments actually sharded over the 8-device mesh."""
    import dataclasses

    import jax
    import numpy as np

    from coarsegrainingvae_tpu.config import ParallelConfig
    from coarsegrainingvae_tpu.parallel.mesh import make_mesh
    from coarsegrainingvae_tpu.train.trainer import Trainer
    from coarsegrainingvae_tpu.models.dense_cgvae import DenseCGVAE

    cfg, ds = _setup()
    batch = ds.batch(np.arange(8))

    finals = {}
    for zero in (False, True):
        c = dataclasses.replace(
            cfg, parallel=ParallelConfig(zero_optimizer=zero)
        )
        tr = Trainer(DenseCGVAE(cfg=c.model), c, mesh=make_mesh(8))
        state = tr.init_state(batch, seed=0)
        for i in range(3):
            state, m = tr.train_step(state, batch, jax.random.PRNGKey(i))
        finals[zero] = jax.device_get(state.params)
        if zero:
            # at least one moment leaf must actually be sharded
            import optax  # noqa: F401
            leaves = jax.tree.leaves(
                state.opt_state,
                is_leaf=lambda x: hasattr(x, "sharding"),
            )
            assert any(
                not l.sharding.is_fully_replicated
                for l in leaves
                if hasattr(l, "sharding") and getattr(l, "ndim", 0) > 0
            ), "no optimizer leaf ended up sharded"
    for a, b in zip(jax.tree.leaves(finals[False]), jax.tree.leaves(finals[True])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_tensor_parallel_2d_mesh_matches_single():
    """(4,2) ('data','model') mesh with feature-dim param sharding
    (ParallelConfig.model_devices=2): same losses and final params as the
    1-device run; params/moments actually column-sharded."""
    import dataclasses

    from coarsegrainingvae_tpu.config import ParallelConfig
    from coarsegrainingvae_tpu.models.dense_cgvae import DenseCGVAE

    cfg, ds = _setup()
    # min_dim for tensor_shardings is 128; widen the model so the big
    # Dense kernels qualify. f32 Adam moments pinned: this asserts
    # sharding-vs-replicated parity at tight tolerance, and bf16 moment
    # rounding amplifies benign reduction-order differences.
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, n_basis=128),
        train=dataclasses.replace(cfg.train, adam_moment_dtype="float32"),
    )
    batch = ds.batch(np.arange(8))

    finals = {}
    for tp in (1, 2):
        c = dataclasses.replace(cfg, parallel=ParallelConfig(model_devices=tp))
        mesh = make_mesh(8 if tp > 1 else 1, model_devices=tp)
        tr = Trainer(DenseCGVAE(cfg=c.model), c, mesh=mesh)
        state = tr.init_state(batch, seed=0)
        losses = []
        for i in range(3):
            state, m = tr.train_step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(jax.device_get(m["loss"])))
        finals[tp] = (losses, jax.device_get(state.params))
        if tp > 1:
            assert mesh.shape["model"] == 2 and mesh.shape["data"] == 4
            leaves = [
                l for l in jax.tree.leaves(state.params)
                if getattr(l, "ndim", 0) > 0
            ]
            assert any(
                not l.sharding.is_fully_replicated for l in leaves
            ), "no param leaf ended up tensor-sharded"

    np.testing.assert_allclose(finals[1][0], finals[2][0], rtol=2e-5)
    for a, b in zip(jax.tree.leaves(finals[1][1]), jax.tree.leaves(finals[2][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_scan_val_matches_per_step_eval():
    """run_epoch_scan_eval (one-jit validation epoch) == per-step
    run_epoch_device eval metrics."""
    cfg, ds = _setup()
    dds = DeviceDataset.from_dataset(ds)
    model = CGequiVAE(cfg=cfg.model)
    tr = Trainer(model, cfg, mesh=make_mesh(1))
    state = tr.init_state(ds.batch(np.arange(8)), seed=0)
    rng = jax.random.PRNGKey(42)
    scan_m = tr.run_epoch_scan_eval(state.params, dds, rng)
    _, loop_m = tr.run_epoch_device(state, dds, rng, train=False)
    for k in ("loss", "recon", "kl", "graph"):
        np.testing.assert_allclose(scan_m[k], loop_m[k], rtol=1e-5)
