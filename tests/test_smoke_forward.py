"""End-to-end forward smoke: model initializes and produces finite outputs
with the right shapes."""
import jax
import jax.numpy as jnp
import numpy as np

from coarsegrainingvae_tpu.models.cgvae import CGequiVAE, flatten_batch


def test_forward_shapes(small_dataset, tiny_model_cfg):
    ds = small_dataset
    batch = ds.batch(np.arange(4))
    model = CGequiVAE(cfg=tiny_model_cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "sample": rng}, batch)["params"]
    out = model.apply({"params": params}, batch, rngs={"sample": rng})

    bn = 4 * ds.n_atoms
    bm = 4 * ds.n_cgs
    assert out.xyz_recon.shape == (bn, 3)
    assert out.mu.shape == (bm, tiny_model_cfg.n_basis)
    assert out.prior_sigma.shape == (bm, tiny_model_cfg.n_basis)
    assert np.isfinite(np.asarray(out.xyz_recon)).all()
    assert np.isfinite(np.asarray(out.mu)).all()


def test_generate(small_dataset, tiny_model_cfg):
    ds = small_dataset
    batch = ds.batch(np.arange(2))
    model = CGequiVAE(cfg=tiny_model_cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "sample": rng}, batch)["params"]
    xyz = model.apply(
        {"params": params}, batch, method=model.generate, rngs={"sample": rng}
    )
    assert xyz.shape == (2 * ds.n_atoms, 3)
    assert np.isfinite(np.asarray(xyz)).all()


def test_com_constraint(small_dataset, tiny_model_cfg):
    """Decoded atoms must average back to their CG bead (cgvae.py:478-482)."""
    ds = small_dataset
    batch = ds.batch(np.arange(2))
    model = CGequiVAE(cfg=tiny_model_cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "sample": rng}, batch)["params"]
    out = model.apply({"params": params}, batch, rngs={"sample": rng})

    g = flatten_batch(batch)
    recon = np.asarray(out.xyz_recon)
    mapping = np.asarray(g.mapping)
    cg = np.asarray(g.cg_xyz)
    for k in range(cg.shape[0]):
        sel = mapping == k
        np.testing.assert_allclose(recon[sel].mean(0), cg[k], atol=1e-4)
