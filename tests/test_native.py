"""C++ cell-list neighbor search vs the dense numpy oracle."""
import numpy as np
import pytest

from coarsegrainingvae_tpu.data.neighbors import radius_graph_frames
from coarsegrainingvae_tpu.native import cell_list


def _edge_sets(edges, mask):
    return [
        {tuple(e) for e in edges[k][mask[k]]}
        for k in range(edges.shape[0])
    ]


@pytest.mark.skipif(not cell_list.available(), reason="no native toolchain")
def test_cell_list_matches_dense_oracle():
    rng = np.random.default_rng(0)
    frames = (rng.normal(size=(6, 300, 3)) * 8.0).astype(np.float32)
    cutoff = 4.5

    e_np, m_np = radius_graph_frames(frames, cutoff)  # small N -> numpy path
    e_cc, m_cc = cell_list.radius_graph_frames(frames, cutoff)
    want = _edge_sets(e_np, m_np)
    got = _edge_sets(e_cc, m_cc)
    for k in range(6):
        assert want[k] == got[k], f"frame {k}: {len(want[k])} vs {len(got[k])}"


@pytest.mark.skipif(not cell_list.available(), reason="no native toolchain")
def test_cell_list_budget_overflow_raises():
    rng = np.random.default_rng(1)
    frames = rng.normal(size=(2, 64, 3)).astype(np.float32)
    with pytest.raises(ValueError):
        cell_list.radius_graph_frames(frames, cutoff=100.0, max_edges=4)


@pytest.mark.skipif(not cell_list.available(), reason="no native toolchain")
def test_cell_list_used_for_large_systems():
    """data.neighbors routes N >= 256 to the native backend; results must
    stay consistent with the oracle regardless of path."""
    rng = np.random.default_rng(2)
    frames = (rng.normal(size=(2, 400, 3)) * 12.0).astype(np.float32)
    e, m = radius_graph_frames(frames, 5.0)
    # oracle on frame 0
    x = frames[0]
    d = np.sqrt(((x[None] - x[:, None]) ** 2).sum(-1))
    np.fill_diagonal(d, 1e9)
    n_expected = int((d <= 5.0).sum())
    assert int(m[0].sum()) == n_expected


def test_bond_diff_matches_dense_metrics():
    """Native cell-list bond-graph diff == dense numpy statistics on a
    jittered ensemble with real missing/spurious edges."""
    import numpy as np

    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
    from coarsegrainingvae_tpu.eval.metrics import (
        _graph_stats_cell,
        _graph_stats_dense,
    )
    from coarsegrainingvae_tpu.native import bond_diff as nbd

    if not nbd.available():
        import pytest

        pytest.skip("no native toolchain")

    z, frames, bonds = synthetic_peptide("pentapeptide", n_frames=9, seed=0)
    ref = frames[0]
    rng = np.random.default_rng(0)
    # escalating jitter: some samples valid, some with broken graphs
    gen = frames[1:] + rng.normal(
        scale=np.linspace(0.0, 0.6, 8)[:, None, None], size=frames[1:].shape
    ).astype(np.float32)

    vd, nd, ed = _graph_stats_dense(ref, gen, z, 1.3)
    vc, nc, ec = _graph_stats_cell(ref, gen, z, 1.3)
    np.testing.assert_array_equal(vd, vc)
    np.testing.assert_allclose(nd, nc, rtol=1e-12)
    np.testing.assert_allclose(ed, ec, rtol=1e-12)
    assert vd.any() and not vd.all()  # the case actually exercises both


def test_evaluate_samples_large_n_routing():
    """evaluate_samples auto-routes to the cell-list path past the
    threshold and produces the same numbers as the dense path."""
    import numpy as np

    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
    from coarsegrainingvae_tpu.eval.metrics import evaluate_samples
    from coarsegrainingvae_tpu.native import bond_diff as nbd

    if not nbd.available():
        import pytest

        pytest.skip("no native toolchain")

    z, frames, bonds = synthetic_peptide("chignolin", n_frames=5, seed=1)
    ref, gen = frames[0], frames[1:]
    dense = evaluate_samples(ref, gen, z, large_n_threshold=10**9)
    cell = evaluate_samples(ref, gen, z, large_n_threshold=1)
    for k in ("valid_ratio", "valid_allatom_ratio", "graph_val_ratio",
              "graph_allatom_val_ratio", "graph_edit_ratio",
              "graph_allatom_edit_ratio"):
        np.testing.assert_allclose(dense[k], cell[k], rtol=1e-9, err_msg=k)
