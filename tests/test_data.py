"""Data pipeline tests: radius graphs vs dense oracle, topology utilities,
mapping protocols."""
import numpy as np

from coarsegrainingvae_tpu.data.neighbors import (
    make_directed,
    radius_graph_dense,
    radius_graph_frames,
)
from coarsegrainingvae_tpu.data.topology import (
    channel_index_from_mapping,
    cg_graph_from_bonds,
    check_cg_connected,
    high_order_edges,
    max_atoms_per_bead,
)
from coarsegrainingvae_tpu.data import mappings
from coarsegrainingvae_tpu.data.batch import flatten_ids
import jax.numpy as jnp


def test_radius_graph_matches_dense_oracle():
    rng = np.random.default_rng(0)
    frames = rng.normal(scale=3.0, size=(5, 12, 3)).astype(np.float32)
    edges, mask = radius_graph_frames(frames, cutoff=4.0, directed=True)
    for f in range(5):
        got = {tuple(e) for e in edges[f][mask[f]].tolist()}
        oracle = radius_graph_dense(frames[f], 4.0, undirected=True)
        expect = set()
        for i, j in oracle.tolist():
            expect.add((i, j))
            expect.add((j, i))
        assert got == expect


def test_make_directed():
    und = np.array([[0, 1], [1, 2]])
    out = make_directed(und)
    assert out.shape == (4, 2)
    assert {tuple(r) for r in out.tolist()} == {(0, 1), (1, 0), (1, 2), (2, 1)}
    # already-directed lists pass through (conv.py:10-20 semantics)
    already = np.array([[0, 1], [1, 0], [2, 1]])
    np.testing.assert_array_equal(make_directed(already), already)


def test_high_order_edges():
    # path graph 0-1-2-3; order 2 adds (0,2),(1,3)
    bonds = np.array([[0, 1], [1, 2], [2, 3]])
    e2 = {tuple(r) for r in high_order_edges(bonds, 2, 4).tolist()}
    assert e2 == {(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)}


def test_channel_index():
    mapping = np.array([0, 0, 1, 0, 1, 2])
    ch = channel_index_from_mapping(mapping)
    np.testing.assert_array_equal(ch, [0, 1, 0, 2, 1, 0])
    assert max_atoms_per_bead(mapping) == 3


def test_cg_graph_from_bonds():
    bonds = np.array([[0, 1], [1, 2], [2, 3]])
    mapping = np.array([0, 0, 1, 1])
    cg = cg_graph_from_bonds(bonds, mapping, 4, 2)
    assert {tuple(r) for r in cg.tolist()} == {(0, 1), (1, 0)}
    assert check_cg_connected(cg, 2)


def test_mappings_cover_all_beads():
    bonds = np.array([[i, i + 1] for i in range(19)])
    for method in ["random", "seqpartition", "newman", "spectral"]:
        m = mappings.get_mapping(method, 4, 20, bonds=bonds, seed=3)
        assert m.shape == (20,)
        assert set(np.unique(m)) == set(range(4)), method
        # deterministic under the same seed
        m2 = mappings.get_mapping(method, 4, 20, bonds=bonds, seed=3)
        np.testing.assert_array_equal(m, m2)


def test_newman_groups_are_contiguous_communities():
    # two triangles joined by one edge -> 2 communities = the triangles
    bonds = np.array([[0, 1], [1, 2], [0, 2], [3, 4], [4, 5], [3, 5], [2, 3]])
    m = mappings.newman_mapping(bonds, 6, 2)
    assert m[0] == m[1] == m[2]
    assert m[3] == m[4] == m[5]
    assert m[0] != m[3]


def test_flatten_ids():
    local = jnp.asarray(np.array([[[0, 1], [2, 0]], [[1, 1], [0, 2]]]))  # (B=2,E=2,2)
    out = np.asarray(flatten_ids(local, stride=3))
    np.testing.assert_array_equal(out, [[0, 1], [2, 0], [4, 4], [3, 5]])


def test_backbone_partition():
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(200, 10, 3))
    bb = np.arange(0, 10, 2)
    m = mappings.backbone_partition_mapping(frames, bb, 3, seed=1, skip=50)
    assert m.shape == (10,)
    assert m.max() < 3


def test_edges_receiver_sorted_invariant():
    """The whole pipeline must emit receiver-sorted edge lists (segment sums
    run with indices_are_sorted=True)."""
    import jax.numpy as jnp

    from coarsegrainingvae_tpu.data.batch import flatten_ids
    from coarsegrainingvae_tpu.data.dataset import build_dataset
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide

    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=8, seed=0)
    mapping = np.arange(z.shape[0]) % 3
    for cg_cutoff in (9.5, None):
        ds = build_dataset(mapping, frames, 8.5, cg_cutoff, z, bonds, order=2)
        batch = ds.batch(np.arange(4))
        for local, stride in ((batch.nbrs, ds.n_atoms), (batch.cg_nbrs, 3)):
            flat = np.asarray(flatten_ids(jnp.asarray(local), stride)).reshape(-1, 2)
            recv = flat[:, 0]
            assert np.all(np.diff(recv) >= 0), "receiver column not sorted"


def test_aux_edges_replace_bond_edges():
    from coarsegrainingvae_tpu.data.dataset import build_dataset
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide

    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=6, seed=0)
    mapping = np.arange(z.shape[0]) % 3
    ds = build_dataset(mapping, frames, 8.5, 9.5, z, bonds, order=2,
                       rotate=False, aux_cutoff=3.0)
    assert ds.aux_bonds is not None
    batch = ds.batch(np.arange(2))
    # per-frame aux edges, not the tiled static bond list
    assert batch.bonds.shape[0] == 2
    assert batch.bonds.shape[1] == ds.aux_bonds.shape[1]
    # all real aux edges are within the cutoff
    e = np.asarray(ds.aux_bonds[0][ds.aux_mask[0]])
    d = np.linalg.norm(frames[0][e[:, 0]] - frames[0][e[:, 1]], axis=-1)
    assert (d <= 3.0).all() and e.shape[0] > 0


def test_minimal_alpha_real_site_path():
    """Explicit site indices (synthetic C-alpha markers) produce a
    nearest-site mapping where each site atom owns its own bead
    (reference datasets.py:252-312); the no-site fallback must warn."""
    import warnings

    from coarsegrainingvae_tpu.data.mappings import get_mapping
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide

    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=4, seed=2)
    sites = np.array([1, 4, 8], np.int64)  # heavy-chain 'C-alpha' stand-ins
    mapping = get_mapping("alpha", 3, z.shape[0], frames=frames,
                          site_index=sites)
    assert np.array_equal(mapping[sites], np.arange(3))
    assert np.unique(mapping).size == 3
    # nearest-site property: each atom's bead minimizes the frame-averaged
    # distance to the site atoms (datasets.py nearest-site rule)
    d = np.linalg.norm(
        frames[:, :, None, :] - frames[:, sites][:, None, :, :], axis=-1
    ).mean(0)
    expected = d.argmin(1)
    others = np.setdiff1d(np.arange(z.shape[0]), sites)
    assert np.array_equal(mapping[others], expected[others])

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        get_mapping("minimal", 3, z.shape[0], frames=frames)
    assert any("NOT the reference protocol" in str(x.message) for x in w)


def test_cli_site_index_parsing(tmp_path):
    from coarsegrainingvae_tpu.cli.run_cgvae import parse_site_index

    assert parse_site_index(None) is None
    assert parse_site_index("1,11,21") == (1, 11, 21)
    p = str(tmp_path / "sites.npy")
    np.save(p, np.array([3, 7], np.int64))
    assert parse_site_index(p) == (3, 7)


def test_derive_site_index_from_atom_names():
    """Name-based site derivation pins the exact mdtraj selections
    (reference datasets.py:262-272): alpha = CA, minimal = {N,CA,C,O,CB}."""
    from coarsegrainingvae_tpu.data.mappings import derive_site_index

    names = ["N", "CA", "C", "O", "CB",          # residue 1 (ALA-like)
             "N", "CA", "C", "O", "CB", "CG"]    # residue 2
    alpha = derive_site_index("alpha", atom_names=names)
    np.testing.assert_array_equal(alpha, [1, 6])
    minimal = derive_site_index("minimal", atom_names=names)
    np.testing.assert_array_equal(minimal, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9])


def test_derive_site_index_from_topology():
    """Graph-based derivation on a known hand-built topology: backbone =
    longest heavy path; alpha picks one site per 3 backbone atoms."""
    from coarsegrainingvae_tpu.data.mappings import derive_site_index

    # chain of 6 heavy atoms (C C N C C O) + one heavy branch at atom 2
    # + hydrogens (ignored)
    z = np.array([6, 6, 7, 6, 6, 8, 6, 1, 1], np.int32)
    bonds = np.array(
        [[0, 1], [1, 2], [2, 3], [3, 4], [4, 5],  # backbone
         [2, 6],                                    # heavy branch (CB-like)
         [0, 7], [6, 8]],                           # hydrogens
        np.int32,
    )
    alpha = derive_site_index("alpha", z=z, bonds=bonds)
    # backbone path is 0..5; triplets (0,1,2) and (3,4,5) -> middles 1, 4
    np.testing.assert_array_equal(sorted(alpha), [1, 4])
    minimal = derive_site_index("minimal", z=z, bonds=bonds)
    # backbone 0-5 plus the heavy branch atom 6; hydrogens excluded
    np.testing.assert_array_equal(minimal, [0, 1, 2, 3, 4, 5, 6])


def test_alpha_mapping_without_site_index_uses_topology():
    """get_mapping('alpha') with z+bonds and no site_index derives sites
    from topology (no fallback warning) and returns a site-consistent
    mapping."""
    import warnings

    from coarsegrainingvae_tpu.data.mappings import (
        derive_site_index,
        get_mapping,
    )
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide

    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=8, seed=0)
    sites = derive_site_index("alpha", z=z, bonds=bonds)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the fallback warns; this must not
        mapping = get_mapping(
            "alpha", len(sites), z.shape[0], bonds=bonds, frames=frames,
            z=z,
        )
    # every site atom maps to its own bead, all beads populated
    np.testing.assert_array_equal(mapping[sites], np.arange(len(sites)))
    assert np.unique(mapping).size == len(sites)
