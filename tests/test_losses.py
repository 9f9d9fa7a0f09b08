"""Loss-formula tests against closed forms (SURVEY.md section 4 item d)."""
import jax.numpy as jnp
import numpy as np

from coarsegrainingvae_tpu.train.losses import graph_loss, kl_divergence, recon_loss


def test_kl_standard_normal_zero():
    mu = jnp.zeros((4, 8))
    std = jnp.ones((4, 8))
    assert float(kl_divergence(mu, std)) == 0.0


def test_kl_standard_normal_closed_form():
    mu = jnp.full((1, 1), 2.0)
    std = jnp.full((1, 1), 0.5)
    # KL(N(2, .25) || N(0,1)) = 0.5*(sigma^2 + mu^2 - 1 - ln sigma^2)
    expect = 0.5 * (0.25 + 4.0 - 1.0 - np.log(0.25))
    np.testing.assert_allclose(float(kl_divergence(mu, std)), expect, rtol=1e-6)


def test_kl_two_gaussians_closed_form():
    mu1, s1 = jnp.full((1, 1), 1.0), jnp.full((1, 1), 2.0)
    mu2, s2 = jnp.full((1, 1), -1.0), jnp.full((1, 1), 0.5)
    expect = np.log(0.5 / 2.0) + (4.0 + 4.0) / (2 * 0.25) - 0.5
    got = float(kl_divergence(mu1, s1, mu2, s2))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_kl_identical_gaussians_zero():
    mu = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32))
    std = jnp.asarray(np.random.default_rng(1).uniform(0.5, 2, size=(5, 3)).astype(np.float32))
    np.testing.assert_allclose(float(kl_divergence(mu, std, mu, std)), 0.0, atol=1e-5)


def test_kl_legacy_matches_reference_formula():
    """legacy=True reproduces the reference's (mu1-mu2)^2/std2 term
    (scripts/utils.py:85 -- documented divergence)."""
    mu1, s1 = jnp.full((1, 2), 1.0), jnp.full((1, 2), 1.0)
    mu2, s2 = jnp.full((1, 2), 0.0), jnp.full((1, 2), 2.0)
    ref = 0.5 * ((1 / 4) * 2 + (1.0 / 2.0) * 2 + np.log(4.0) * 2 - 0.0 - 2)
    got = float(kl_divergence(mu1, s1, mu2, s2, legacy=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_recon_loss_masked():
    xyz = jnp.zeros((4, 3))
    recon = jnp.ones((4, 3))
    mask = jnp.array([True, True, False, False])
    np.testing.assert_allclose(float(recon_loss(xyz, recon, mask)), 1.0, rtol=1e-6)


def test_graph_loss_zero_for_perfect_recon():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32))
    bonds = jnp.asarray([[0, 1], [2, 3], [4, 5]])
    assert float(graph_loss(xyz, xyz, bonds)) == 0.0


def test_graph_loss_distance_difference():
    xyz = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
    recon = jnp.asarray([[0.0, 0, 0], [3.0, 0, 0]])
    bonds = jnp.asarray([[0, 1]])
    np.testing.assert_allclose(float(graph_loss(xyz, recon, bonds)), 4.0, rtol=1e-4)
