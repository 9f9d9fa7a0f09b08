"""Fused Pallas message kernel: parity with the jnp reference and with
DenseFactoredEquiMessage; gradient correctness via the custom VJP."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coarsegrainingvae_tpu.models.dense import (
    DenseFactoredEquiMessage,
    dense_pairwise,
    radius_adjacency,
)
from coarsegrainingvae_tpu.ops.pallas_message import fused_message, message_reference


def _inputs(b=2, n=11, f=16, s=4, seed=0):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray((rng.normal(size=(b, n, 3)) * 2).astype(np.float32))
    mask = jnp.asarray(np.ones((b, n), np.float32))
    phi = jnp.asarray(rng.normal(size=(b, n, s, f)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, 3, f)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(6, s, f)) * 0.1).astype(np.float32))
    return xyz, mask, phi, v, w


@pytest.mark.parametrize("s", [3, 4])
def test_reference_matches_factored_module(s):
    """message_reference == DenseFactoredEquiMessage under matched params."""
    xyz, mask, phi, v, w = _inputs(s=s)
    f = phi.shape[-1]
    cutoff, n_rbf = 8.0, 5

    ds_ref, dv_ref = message_reference(xyz, mask, phi, v, w, cutoff, n_rbf)

    # drive the module with an identity phi-producing trick: bypass its MLP
    # by comparing against its own math re-derived from (dist, unit, adj)
    _, dist, unit = dense_pairwise(xyz)
    adj = radius_adjacency(dist, cutoff, mask.astype(bool))
    from coarsegrainingvae_tpu.ops.basis import cosine_envelope, painn_radial_basis

    rbf = painn_radial_basis(dist, n_rbf, cutoff)
    rbf = jnp.concatenate([rbf, jnp.ones_like(rbf[..., :1])], -1)
    env = cosine_envelope(dist, cutoff)
    k = adj[..., None] * env[..., None] * rbf
    g_b = jnp.einsum("bijr,bjf->birf", k, phi[:, :, 1])
    ds_mod = jnp.einsum("birf,rf->bif", g_b, w[:, 1])
    np.testing.assert_allclose(np.asarray(ds_ref), np.asarray(ds_mod),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("s", [3, 4])
@pytest.mark.parametrize("n", [8, 11])
def test_pallas_matches_reference_interpret(s, n):
    xyz, mask, phi, v, w = _inputs(n=n, s=s)
    cutoff, n_rbf = 8.0, 5
    ds_p, dv_p = fused_message(xyz, mask, phi, v, w, cutoff, n_rbf,
                               tile_i=4, interpret=True)
    ds_r, dv_r = message_reference(xyz, mask, phi, v, w, cutoff, n_rbf)
    np.testing.assert_allclose(np.asarray(ds_p), np.asarray(ds_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv_p), np.asarray(dv_r),
                               rtol=1e-4, atol=1e-5)


def test_pallas_respects_mask():
    xyz, mask, phi, v, w = _inputs(n=8)
    cutoff, n_rbf = 8.0, 5
    mask = mask.at[:, 5:].set(0.0)
    ds, dv = fused_message(xyz, mask, phi, v, w, cutoff, n_rbf,
                           tile_i=4, interpret=True)
    # masked receivers get zero output; real receivers unaffected by the
    # coordinates of masked senders
    np.testing.assert_allclose(np.asarray(ds[:, 5:]), 0.0, atol=1e-6)
    xyz2 = xyz.at[:, 5:].add(100.0)
    ds2, _ = fused_message(xyz2, mask, phi, v, w, cutoff, n_rbf,
                           tile_i=4, interpret=True)
    np.testing.assert_allclose(np.asarray(ds[:, :5]), np.asarray(ds2[:, :5]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("s", [3, 4])
@pytest.mark.parametrize("n", [8, 11])
def test_custom_vjp_matches_reference_grad(s, n):
    """The hand-derived Pallas backward reproduces the reference VJP for
    every differentiable input (phi, v, w); xyz carries the documented
    zero-cotangent contract (coordinates are batch data in every model)."""
    xyz, mask, phi, v, w = _inputs(n=n, f=8, s=s)
    cutoff, n_rbf = 8.0, 5

    def loss_pallas(xyz_, phi_, v_, w_):
        ds, dv = fused_message(xyz_, mask, phi_, v_, w_, cutoff, n_rbf,
                               tile_i=4, interpret=True)
        return jnp.sum(ds**2) + jnp.sum(dv * jnp.cos(dv))

    def loss_ref(xyz_, phi_, v_, w_):
        ds, dv = message_reference(xyz_, mask, phi_, v_, w_, cutoff, n_rbf)
        return jnp.sum(ds**2) + jnp.sum(dv * jnp.cos(dv))

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(xyz, phi, v, w)
    g_r = jax.grad(loss_ref, argnums=(1, 2, 3))(xyz, phi, v, w)
    np.testing.assert_allclose(np.asarray(g_p[0]), 0.0)  # contract
    for a, b in zip(g_p[1:], g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_custom_vjp_grad_with_mask():
    """Backward parity with padded (masked) nodes in play."""
    xyz, mask, phi, v, w = _inputs(n=11, f=8, s=4)
    mask = mask.at[:, 8:].set(0.0)
    cutoff, n_rbf = 8.0, 5

    def make_loss(fn):
        def loss(phi_, v_, w_):
            ds, dv = fn(xyz, mask, phi_, v_, w_, cutoff, n_rbf)
            return jnp.sum(ds**2) + jnp.sum(dv**2)
        return loss

    pal = make_loss(lambda *a: fused_message(*a, tile_i=4, interpret=True))
    ref = make_loss(message_reference)
    g_p = jax.grad(pal, argnums=(0, 1, 2))(phi, v, w)
    g_r = jax.grad(ref, argnums=(0, 1, 2))(phi, v, w)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
