"""Dense-mode flagship model tests: drop-in for CGequiVAE."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coarsegrainingvae_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from coarsegrainingvae_tpu.data.dataset import build_dataset
from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
from coarsegrainingvae_tpu.models.dense_cgvae import DenseCGVAE
from coarsegrainingvae_tpu.ops.geometry import rotation_matrix_from_axis_angle
from coarsegrainingvae_tpu.train.trainer import Trainer


def _cfg(dec_type="pseudo", det=False):
    return ExperimentConfig(
        # f32 pinned: these tests assert tight-tolerance equivariance /
        # drop-in parity, independent of the bf16 perf default
        model=ModelConfig(n_cgs=3, n_basis=16, n_rbf=5, atom_cutoff=8.5,
                          cg_cutoff=9.5, enc_nconv=1, dec_nconv=1,
                          dec_type=dec_type, breaksym=True, det=det,
                          compute_dtype="float32"),
        data=DataConfig(batch_size=8),
        train=TrainConfig(lr=2e-3, beta=0.01, gamma=1.0),
    )


@pytest.fixture(scope="module")
def data():
    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=64, seed=0)
    mapping = np.arange(z.shape[0]) % 3
    ds = build_dataset(mapping, frames, atom_cutoff=8.5, cg_cutoff=9.5,
                       atomic_nums=z, bonds=bonds, order=2, rotate=False)
    return ds


def test_dense_cgvae_forward_shapes(data):
    cfg = _cfg()
    model = DenseCGVAE(cfg=cfg.model)
    batch = data.batch(np.arange(8))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, batch)["params"]
    out = model.apply({"params": params}, batch,
                      rngs={"sample": jax.random.PRNGKey(1)})
    assert out.xyz_recon.shape == (8 * data.n_atoms, 3)
    assert np.isfinite(np.asarray(out.xyz_recon)).all()
    gen = model.apply({"params": params}, batch, method=model.generate,
                      rngs={"sample": jax.random.PRNGKey(2)})
    assert gen.shape == (8 * data.n_atoms, 3)


@pytest.mark.parametrize("dec_type", ["pseudo", "cross", "painn"])
def test_dense_cgvae_rotation_equivariance(data, dec_type):
    cfg = _cfg(dec_type=dec_type, det=True)
    model = DenseCGVAE(cfg=cfg.model)
    batch = data.batch(np.arange(2))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = model.init(rngs, batch)["params"]

    rng = np.random.default_rng(3)
    axis = rng.normal(size=3); axis /= np.linalg.norm(axis)
    rot = np.asarray(rotation_matrix_from_axis_angle(
        jnp.asarray(axis, jnp.float32), 0.8))

    def run(b):
        return np.asarray(
            model.apply({"params": params}, b,
                        rngs={"sample": jax.random.PRNGKey(1)}).xyz_recon
        )

    base = run(batch)
    rotated = run(batch.replace(
        xyz=jnp.asarray(np.asarray(batch.xyz) @ rot.T),
        cg_xyz=jnp.asarray(np.asarray(batch.cg_xyz) @ rot.T),
    ))
    np.testing.assert_allclose(rotated, base @ rot.T, atol=2e-3)


def test_dense_cgvae_com_constraint(data):
    """Each bead remains the geometric mean of its atoms (cgvae.py:478-482
    of the reference)."""
    cfg = _cfg(det=True)
    model = DenseCGVAE(cfg=cfg.model)
    batch = data.batch(np.arange(4))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)}, batch)["params"]
    out = model.apply({"params": params}, batch,
                      rngs={"sample": jax.random.PRNGKey(1)})
    recon = np.asarray(out.xyz_recon).reshape(4, data.n_atoms, 3)
    mapping = np.asarray(batch.mapping[0])
    cg = np.asarray(batch.cg_xyz)
    for k in range(3):
        np.testing.assert_allclose(
            recon[:, mapping == k].mean(1), cg[:, k], atol=1e-4
        )


def test_dense_cgvae_trains_with_standard_trainer(data):
    cfg = _cfg()
    trainer = Trainer(DenseCGVAE(cfg=cfg.model), cfg)
    state = trainer.init_state(data.batch(np.arange(8)))
    state, hist = trainer.fit(
        state, data.subset(np.arange(48)), data.subset(np.arange(48, 64)),
        nepochs=4,
    )
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]


def test_dense_rejects_sparse_only_dec_types(data):
    """pseudo2/en/inv exist only in the sparse formulation; the dense
    flagship must refuse rather than silently training a painn decoder."""
    import pytest as _pytest

    cfg = _cfg(dec_type="pseudo2")
    ds = data
    model = DenseCGVAE(cfg=cfg.model)
    batch = ds.batch(np.arange(4))
    with _pytest.raises(ValueError, match="pseudo2"):
        model.init({"params": jax.random.PRNGKey(0),
                    "sample": jax.random.PRNGKey(1)}, batch)


def test_message_impl_pallas_matches_einsum(data):
    """DenseCGVAE with message_impl='pallas' (fused kernel, hand-derived
    backward) == 'einsum': same params, same outputs, same param grads."""
    import dataclasses

    from coarsegrainingvae_tpu.models.cgvae import flatten_batch
    from coarsegrainingvae_tpu.train.losses import vae_loss

    batch = data.batch(np.arange(4))
    rng = jax.random.PRNGKey(0)
    outs, grads = {}, {}
    for impl in ("einsum", "pallas"):
        cfg = _cfg(dec_type="cross")
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, message_impl=impl)
        )
        model = DenseCGVAE(cfg=cfg.model)
        params = model.init({"params": jax.random.PRNGKey(7),
                             "sample": rng}, batch)["params"]

        def loss_fn(p):
            out = model.apply({"params": p}, batch, rngs={"sample": rng})
            return vae_loss(out, flatten_batch(batch), 0.01, 1.0)[0]

        outs[impl] = model.apply({"params": params}, batch,
                                 rngs={"sample": rng}).xyz_recon
        grads[impl] = jax.grad(loss_fn)(params)

    np.testing.assert_allclose(np.asarray(outs["pallas"]),
                               np.asarray(outs["einsum"]),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(grads["pallas"]),
                    jax.tree.leaves(grads["einsum"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
