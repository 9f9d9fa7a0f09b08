"""Unit tests for segment ops, radial bases, and geometry primitives against
numpy oracles."""
import jax
import jax.numpy as jnp
import numpy as np

from coarsegrainingvae_tpu.ops.basis import (
    cosine_envelope,
    gaussian_smearing,
    painn_radial_basis,
)
from coarsegrainingvae_tpu.ops.geometry import (
    preprocess_r,
    random_rotation_matrices,
    rotate,
)
from coarsegrainingvae_tpu.ops.segment import segment_mean, segment_softmax, segment_sum


def test_segment_sum_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(50, 4)).astype(np.float32)
    seg = rng.integers(0, 7, size=50)
    out = segment_sum(jnp.asarray(data), jnp.asarray(seg), 7)
    expect = np.zeros((7, 4), np.float32)
    np.add.at(expect, seg, data)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


def test_segment_sum_mask_zeroes_padding():
    data = np.ones((6, 2), np.float32)
    seg = np.array([0, 0, 1, 1, 0, 0])
    mask = np.array([True, True, True, True, False, False])
    out = segment_sum(jnp.asarray(data), jnp.asarray(seg), 2, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), [[2, 2], [2, 2]])


def test_segment_mean_empty_segment_is_zero():
    data = np.ones((3, 2), np.float32)
    seg = np.array([0, 0, 2])
    out = segment_mean(jnp.asarray(data), jnp.asarray(seg), 4)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out)[1], 0.0)
    np.testing.assert_allclose(np.asarray(out)[0], 1.0)


def test_segment_mean_matches_scatter_mean():
    """Parity with torch_scatter.scatter_mean semantics (the reference's
    aggregation, e.g. cgvae.py:296-298)."""
    rng = np.random.default_rng(1)
    data = rng.normal(size=(40, 3, 5)).astype(np.float32)
    seg = rng.integers(0, 6, size=40)
    out = segment_mean(jnp.asarray(data), jnp.asarray(seg), 6)
    for k in range(6):
        sel = seg == k
        if sel.any():
            np.testing.assert_allclose(
                np.asarray(out)[k], data[sel].mean(0), rtol=1e-5, atol=1e-6
            )


def test_segment_softmax_sums_to_one():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(20,)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, 4, size=20))
    w = segment_softmax(logits, seg, 4)
    sums = segment_sum(w, seg, 4)
    np.testing.assert_allclose(np.asarray(sums), 1.0, rtol=1e-5)


def test_painn_rbf_limits():
    # d=0 -> sinc limit n*pi/c; d>=cutoff -> 0 (modules.py:159-171)
    out = painn_radial_basis(jnp.array([0.0, 5.0, 6.0]), n_rbf=3, cutoff=5.0)
    n = np.arange(1, 4)
    np.testing.assert_allclose(np.asarray(out)[0], n * np.pi / 5.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[1], 0.0)
    np.testing.assert_allclose(np.asarray(out)[2], 0.0)


def test_cosine_envelope():
    out = cosine_envelope(jnp.array([0.0, 2.5, 5.0, 7.0]), cutoff=5.0)
    np.testing.assert_allclose(np.asarray(out), [1.0, 0.5, 0.0, 0.0], atol=1e-7)


def test_gaussian_smearing_shape_and_peak():
    out = gaussian_smearing(jnp.array([1.0]), 0.0, 5.0, 6)
    assert out.shape == (1, 6)
    centers = np.linspace(0, 5, 6)
    assert np.argmax(np.asarray(out)[0]) == np.argmin(np.abs(centers - 1.0))


def test_preprocess_r_unit_norm():
    r = jnp.asarray(np.random.default_rng(3).normal(size=(10, 3)).astype(np.float32))
    dist, unit = preprocess_r(r)
    np.testing.assert_allclose(
        np.asarray(dist), np.linalg.norm(np.asarray(r), axis=-1), rtol=1e-4
    )
    np.testing.assert_allclose(np.linalg.norm(np.asarray(unit), axis=-1), 1.0, rtol=1e-4)


def test_rotation_matrices_orthogonal():
    rots = random_rotation_matrices(jax.random.PRNGKey(0), 5)
    r = np.asarray(rots)
    eye = np.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_invariant_filter_shapes_and_linearity():
    # 3-way linear edge-filter helper (reference conv.py:739-755)
    from coarsegrainingvae_tpu.models.conv import InvariantFilter

    f = 8
    mod = InvariantFilter(feat_dim=f)
    m = jnp.asarray(np.random.default_rng(0).normal(size=(12, f)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), m)
    f1, f2, f3 = mod.apply(params, m)
    assert f1.shape == f2.shape == f3.shape == (12, f)
    # affine in the input: F(a+b) - F(b) == F(a) - F(0)
    a = jnp.asarray(np.random.default_rng(1).normal(size=(12, f)).astype(np.float32))
    lhs = mod.apply(params, m + a)[0] - mod.apply(params, m)[0]
    rhs = mod.apply(params, a)[0] - mod.apply(params, jnp.zeros_like(a))[0]
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)
    # the three filters come from disjoint slices of one Dense: perturbing
    # the input changes all three consistently with a single linear map
    full = jnp.concatenate([f1, f2, f3], axis=-1)
    assert full.shape == (12, 3 * f)
