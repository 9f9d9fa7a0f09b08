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
