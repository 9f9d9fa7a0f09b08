"""Golden-value regression tests (SURVEY.md section 4g): fixed seeds, tiny
synthetic molecule, pinned numerical outputs. Catches silent numerics
regressions that property tests (equivariance etc.) cannot see.

Pinned on CPU f32 with seed-123 initialization. Tolerances are loose enough
to survive XLA version / fusion-order drift but tight enough to catch real
formula changes.
"""
import jax
import jax.numpy as jnp
import numpy as np

from coarsegrainingvae_tpu.config import ModelConfig
from coarsegrainingvae_tpu.data.dataset import build_dataset
from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
from coarsegrainingvae_tpu.models.cgvae import CGequiVAE, flatten_batch
from coarsegrainingvae_tpu.models.dense_cgvae import DenseCGVAE
from coarsegrainingvae_tpu.ops.basis import cosine_envelope, painn_radial_basis
from coarsegrainingvae_tpu.train.losses import kl_divergence, vae_loss


def _setup(det=True):
    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=8, seed=0)
    mapping = np.arange(z.shape[0]) % 3
    ds = build_dataset(mapping, frames, 8.5, 9.5, z, bonds, order=2,
                       rotate=False)
    cfg = ModelConfig(n_cgs=3, n_basis=16, n_rbf=5, atom_cutoff=8.5,
                      cg_cutoff=9.5, enc_nconv=1, dec_nconv=1,
                      dec_type="pseudo", breaksym=True, det=det)
    return cfg, ds


def test_basis_golden():
    d = jnp.asarray([0.0, 1.0, 4.0, 8.4, 9.0])
    rbf = np.asarray(painn_radial_basis(d, 3, 8.5))
    # d=0 limit n*pi/c; d>=cutoff zero
    np.testing.assert_allclose(
        rbf[0], [np.pi / 8.5, 2 * np.pi / 8.5, 3 * np.pi / 8.5], rtol=1e-6
    )
    np.testing.assert_allclose(rbf[4], 0.0)
    np.testing.assert_allclose(
        rbf[1], [np.sin(np.pi / 8.5), np.sin(2 * np.pi / 8.5),
                 np.sin(3 * np.pi / 8.5)], rtol=1e-5
    )
    env = np.asarray(cosine_envelope(d, 8.5))
    np.testing.assert_allclose(env[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(env[4], 0.0, atol=1e-6)
    np.testing.assert_allclose(
        env[2], 0.5 * (np.cos(np.pi * 4.0 / 8.5) + 1.0), rtol=1e-6
    )


def test_kl_golden():
    mu1 = jnp.asarray([[0.5, -0.5]])
    s1 = jnp.asarray([[1.0, 2.0]])
    # vs N(0,1): closed form -0.5 sum(1 + log s^2 - mu^2 - s^2)
    want = -0.5 * (
        (1 + np.log(1.0) - 0.25 - 1.0) + (1 + np.log(4.0) - 0.25 - 4.0)
    )
    np.testing.assert_allclose(float(kl_divergence(mu1, s1)), want, rtol=1e-6)
    # two-Gaussian KL of identical distributions is 0
    np.testing.assert_allclose(
        float(kl_divergence(mu1, s1, mu1, s1)), 0.0, atol=1e-6
    )


def test_model_forward_golden_deterministic():
    """Same seeds => bitwise-stable forward across runs, and sparse/dense
    losses land in a sane, pinned range."""
    cfg, ds = _setup(det=True)
    batch = ds.batch(np.arange(4))
    rngs = {"params": jax.random.PRNGKey(123), "sample": jax.random.PRNGKey(7)}

    model = CGequiVAE(cfg=cfg)
    params = model.init(rngs, batch)["params"]
    out1 = model.apply({"params": params}, batch,
                       rngs={"sample": jax.random.PRNGKey(7)})
    out2 = model.apply({"params": params}, batch,
                       rngs={"sample": jax.random.PRNGKey(7)})
    np.testing.assert_array_equal(np.asarray(out1.xyz_recon),
                                  np.asarray(out2.xyz_recon))

    g = flatten_batch(batch)
    loss, metrics = vae_loss(out1, g, beta=0.05, gamma=1.0)
    loss = float(loss)
    # pinned envelope: untrained recon MSE for this synthetic molecule sits
    # near the data variance; a formula regression moves it wildly
    assert 0.1 < metrics["recon"] < 10.0, metrics
    assert np.isfinite(loss)

    dense = DenseCGVAE(cfg=cfg)
    dparams = dense.init(rngs, batch)["params"]
    dout = dense.apply({"params": dparams}, batch,
                       rngs={"sample": jax.random.PRNGKey(7)})
    _, dmetrics = vae_loss(dout, g, beta=0.05, gamma=1.0)
    assert 0.1 < float(dmetrics["recon"]) < 10.0, dmetrics


def test_prior_vocab_scales_beyond_100_beads():
    """The reference's fixed 100-entry bead-index embedding silently NaNs
    past 100 beads (nn.Embedding OOB); our vocab scales with n_cgs."""
    rng = np.random.default_rng(0)
    n = 600
    xyz0 = np.cumsum(rng.normal(size=(n, 3)).astype(np.float32), 0)
    frames = xyz0[None]
    z = rng.choice([6, 7, 8], size=n).astype(np.int32)
    bonds = np.stack([np.arange(n - 1), np.arange(1, n)], 1).astype(np.int32)
    mapping = (np.arange(n) * 150 // n).astype(np.int32)  # 150 beads > 100
    ds = build_dataset(mapping, frames, 4.5, 12.0, z, bonds, order=1,
                       rotate=False)
    cfg = ModelConfig(n_cgs=150, n_basis=16, n_rbf=4, atom_cutoff=4.5,
                      cg_cutoff=12.0, enc_nconv=1, dec_nconv=1,
                      dec_type="cross", degree_norm=True)
    model = CGequiVAE(cfg=cfg)
    batch = ds.batch(np.arange(1))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)}, batch)["params"]
    out = model.apply({"params": params}, batch,
                      rngs={"sample": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out.prior_sigma)).all()
    assert np.isfinite(np.asarray(out.xyz_recon)).all()
