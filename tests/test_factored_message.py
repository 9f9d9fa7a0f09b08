"""RBF-factored dense message block: exact parity with the naive per-pair
formulation under a matched parameter mapping."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coarsegrainingvae_tpu.models.dense import (
    DenseEquiMessageBlock,
    DenseFactoredEquiMessage,
    dense_pairwise,
    radius_adjacency,
)


def _match_params(naive_params, n_rbf, n_split, f):
    """Map the naive block's params onto the factored block's layout."""
    p = naive_params["params"]["DenseInvariantMessage_0"]
    d0, d1 = p["Dense_0"], p["Dense_1"]
    de = p["DistanceEmbed_0"]["Dense_0"]["Dense_0"]
    w = np.zeros((n_rbf + 1, n_split, f), np.float32)
    w[: n_rbf] = np.asarray(de["kernel"]).reshape(n_rbf, n_split, f)
    w[n_rbf] = np.asarray(de["bias"]).reshape(n_split, f)
    return {"params": {"Dense_0": d0, "Dense_1": d1,
                       "filter_w": jnp.asarray(w)}}


@pytest.mark.parametrize("cross", [False, True])
def test_factored_matches_naive(cross):
    rng = np.random.default_rng(0)
    b, n, f, n_rbf, cutoff = 2, 7, 12, 5, 8.0
    n_split = 4 if cross else 3
    xyz = (rng.normal(size=(b, n, 3)) * 2).astype(np.float32)
    s = jnp.asarray(rng.normal(size=(b, n, f)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, 3, f)).astype(np.float32))
    _, dist, unit = dense_pairwise(jnp.asarray(xyz))
    adj = radius_adjacency(dist, cutoff)

    naive = DenseEquiMessageBlock(feat_dim=f, activation="swish",
                                  n_rbf=n_rbf, cutoff=cutoff, cross=cross)
    p_naive = naive.init(jax.random.PRNGKey(0), s, v, dist, unit, adj)
    ds_n, dv_n = naive.apply(p_naive, s, v, dist, unit, adj)

    fact = DenseFactoredEquiMessage(feat_dim=f, activation="swish",
                                    n_rbf=n_rbf, cutoff=cutoff, cross=cross)
    p_fact = _match_params(p_naive, n_rbf, n_split, f)
    ds_f, dv_f = fact.apply(p_fact, s, v, dist, unit, adj)

    np.testing.assert_allclose(np.asarray(ds_f), np.asarray(ds_n),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv_f), np.asarray(dv_n),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cross", [False, True])
def test_qmat_matches_einsum(cross):
    """The flattened-q single-matmul impl is exactly the einsum impl."""
    rng = np.random.default_rng(2)
    b, n, f, n_rbf, cutoff = 3, 9, 16, 6, 7.0
    xyz = (rng.normal(size=(b, n, 3)) * 2).astype(np.float32)
    s = jnp.asarray(rng.normal(size=(b, n, f)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, 3, f)).astype(np.float32))
    _, dist, unit = dense_pairwise(jnp.asarray(xyz))
    adj = radius_adjacency(dist, cutoff)

    kw = dict(feat_dim=f, activation="swish", n_rbf=n_rbf, cutoff=cutoff,
              cross=cross)
    ein = DenseFactoredEquiMessage(**kw, impl="einsum")
    params = ein.init(jax.random.PRNGKey(3), s, v, dist, unit, adj)
    ds_e, dv_e = ein.apply(params, s, v, dist, unit, adj)
    qm = DenseFactoredEquiMessage(**kw, impl="qmat")
    ds_q, dv_q = qm.apply(params, s, v, dist, unit, adj)

    np.testing.assert_allclose(np.asarray(ds_q), np.asarray(ds_e),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv_q), np.asarray(dv_e),
                               rtol=1e-4, atol=1e-5)

    # gradients agree too (the training hot path)
    def loss(p, impl):
        m = DenseFactoredEquiMessage(**kw, impl=impl)
        a, c = m.apply(p, s, v, dist, unit, adj)
        return jnp.sum(a**2) + jnp.sum(c**2)

    g_e = jax.grad(loss)(params, "einsum")
    g_q = jax.grad(loss)(params, "qmat")
    for ge, gq in zip(jax.tree.leaves(g_e), jax.tree.leaves(g_q)):
        np.testing.assert_allclose(np.asarray(gq), np.asarray(ge),
                                   rtol=2e-4, atol=2e-4)


def test_pseudo_stacked_matches_einsum():
    """Channel-stacked pseudo-message combination == per-channel einsums
    (values and gradients; same params)."""
    from coarsegrainingvae_tpu.models.dense_cgvae import DenseEquiMessagePseudo

    rng = np.random.default_rng(4)
    b, m, f, n_rbf, cutoff = 3, 4, 10, 5, 9.0
    xyz = (rng.normal(size=(b, m, 3)) * 2).astype(np.float32)
    s = jnp.asarray(rng.normal(size=(b, m, f)).astype(np.float32))
    sbar = jnp.asarray(rng.normal(size=(b, m, f)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, m, 3, f)).astype(np.float32))
    vbar = jnp.asarray(rng.normal(size=(b, m, 3, f)).astype(np.float32))
    _, dist, unit = dense_pairwise(jnp.asarray(xyz))
    adj = radius_adjacency(dist, cutoff)

    kw = dict(feat_dim=f, activation="swish", n_rbf=n_rbf, cutoff=cutoff)
    ein = DenseEquiMessagePseudo(**kw, impl="einsum")
    params = ein.init(jax.random.PRNGKey(5), s, sbar, v, vbar, dist, unit, adj)
    out_e = ein.apply(params, s, sbar, v, vbar, dist, unit, adj)
    stk = DenseEquiMessagePseudo(**kw, impl="stacked")
    out_s = stk.apply(params, s, sbar, v, vbar, dist, unit, adj)
    for oe, os_ in zip(out_e, out_s):
        np.testing.assert_allclose(np.asarray(os_), np.asarray(oe),
                                   rtol=1e-5, atol=1e-6)

    def loss(p, impl, *inp):
        mod = DenseEquiMessagePseudo(**kw, impl=impl)
        return sum(jnp.sum(o**2) for o in mod.apply(p, *inp, dist, unit, adj))

    inp = (s, sbar, v, vbar)
    g_e = jax.grad(loss, argnums=(0, 2, 3, 4, 5))(params, "einsum", *inp)
    g_s = jax.grad(loss, argnums=(0, 2, 3, 4, 5))(params, "stacked", *inp)
    for ge, gs in zip(jax.tree.leaves(g_e), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(ge),
                                   rtol=1e-4, atol=1e-5)


def test_factored_equivariance():
    from coarsegrainingvae_tpu.ops.geometry import rotation_matrix_from_axis_angle

    rng = np.random.default_rng(1)
    b, n, f = 2, 6, 8
    xyz = (rng.normal(size=(b, n, 3)) * 2).astype(np.float32)
    s = jnp.asarray(rng.normal(size=(b, n, f)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, 3, f)).astype(np.float32))
    blk = DenseFactoredEquiMessage(feat_dim=f, activation="swish", n_rbf=5,
                                   cutoff=10.0, cross=True)
    _, dist, unit = dense_pairwise(jnp.asarray(xyz))
    adj = radius_adjacency(dist, 10.0)
    params = blk.init(jax.random.PRNGKey(0), s, v, dist, unit, adj)
    ds, dv = blk.apply(params, s, v, dist, unit, adj)

    axis = rng.normal(size=3); axis /= np.linalg.norm(axis)
    rot = np.asarray(rotation_matrix_from_axis_angle(jnp.asarray(axis, jnp.float32), 1.2))
    v_r = jnp.einsum("de,bnef->bndf", jnp.asarray(rot), v)
    _, dist_r, unit_r = dense_pairwise(jnp.asarray(xyz @ rot.T))
    adj_r = radius_adjacency(dist_r, 10.0)
    ds_r, dv_r = blk.apply(params, s, v_r, dist_r, unit_r, adj_r)
    np.testing.assert_allclose(np.asarray(ds_r), np.asarray(ds), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dv_r), np.einsum("de,bnef->bndf", rot, np.asarray(dv)),
        atol=1e-4,
    )
