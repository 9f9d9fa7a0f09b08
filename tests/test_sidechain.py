"""Protein/PCN data path tests (reference sidechain.py, pdbutils.py,
run_pdb.py, pcn_utils.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from coarsegrainingvae_tpu.config import ModelConfig
from coarsegrainingvae_tpu.data.sidechain import (
    ATOM_MAP_14,
    RES2IDX,
    backbone_dihedral_quads,
    bond_graph_from_coords,
    build_pcn_dataset,
    protein_props,
)
from coarsegrainingvae_tpu.data.synthetic import synthetic_protein
from coarsegrainingvae_tpu.models.cgvae import PCN
from coarsegrainingvae_tpu.ops.geometry import dihedral, drmsd
from coarsegrainingvae_tpu.train.pcn_trainer import PCNTrainer
from coarsegrainingvae_tpu.utils.pdb import write_pdb


def test_atom_map_14_layout():
    for aa, names in ATOM_MAP_14.items():
        assert len(names) == 14
        assert names[:4] == ["N", "CA", "C", "O"] if aa != "G" else True
    assert ATOM_MAP_14["G"][:4] == ["N", "CA", "C", "O"]
    assert ATOM_MAP_14["G"][4] == ""
    assert len(RES2IDX) == 20


def test_protein_props_basic():
    seq, crd = synthetic_protein(8, seed=0)
    p = protein_props(seq, crd)
    n_expected = sum(sum(1 for a in ATOM_MAP_14[aa] if a) for aa in seq)
    assert p.z.shape[0] == n_expected
    assert p.ca_xyz.shape == (8, 3)
    np.testing.assert_array_equal(np.unique(p.mapping), np.arange(8))
    # C-alphas at slot 1
    assert np.all(p.channel_idx[p.ca_flag] == 1)
    # bonds exist and are within the molecule
    assert p.bonds.shape[0] > 0
    assert p.bonds.max() < p.z.shape[0]


def test_protein_props_missing_atoms():
    seq, crd = synthetic_protein(6, seed=1, missing_frac=0.5)
    p_full = protein_props(seq, synthetic_protein(6, seed=1)[1])
    p = protein_props(seq, crd)
    assert p.z.shape[0] <= p_full.z.shape[0]
    assert np.all(p.channel_idx < 14)


def test_backbone_dihedral_quads():
    seq, crd = synthetic_protein(5, seed=2)
    p = protein_props(seq, crd)
    quads = backbone_dihedral_quads(p)
    # phi for residues 1..4 and psi for residues 0..3 -> 8 quads
    assert quads.shape == (8, 4)
    assert quads.max() < p.z.shape[0]


def test_dihedral_matches_reference_values():
    # planar cis arrangement -> 0; trans -> pi
    xyz = jnp.asarray(
        [[0.0, 1, 0], [0, 0, 0], [1, 0, 0], [1, 1, 0],   # cis (same side)
         [0.0, 1, 0], [0, 0, 0], [1, 0, 0], [1, -1, 0]], # trans
        jnp.float32,
    )
    q = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    ang = np.asarray(dihedral(xyz, q))
    assert abs(ang[0]) < 1e-3
    assert abs(abs(ang[1]) - np.pi) < 1e-3


def test_drmsd_zero_and_positive():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    assert float(drmsd(x, x)) < 1e-5
    y = x + jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    assert float(drmsd(x, y)) > 0.1


@pytest.fixture(scope="module")
def pcn_data():
    items = [synthetic_protein(6 + (i % 3), seed=i) for i in range(8)]
    return build_pcn_dataset(items, cg_cutoff=12.0)


def test_build_pcn_dataset_padding(pcn_data):
    ds = pcn_data
    assert len(ds) == 8
    assert ds.z.shape[0] == 8
    # padded entries are masked off
    assert ds.atom_mask.sum() < ds.atom_mask.size
    # residue types within vocab
    assert ds.res_idx.max() <= 20


def test_pcn_forward_and_training(pcn_data):
    ds = pcn_data
    cfg = ModelConfig(n_basis=16, n_rbf=5, atom_cutoff=12.0, dec_nconv=1,
                      activation="swish")
    model = PCN(cfg=cfg)
    trainer = PCNTrainer(model, gamma=1.0, kappa=0.5, lr=5e-3)
    batch, ca_mask, quads, qmask = next(ds.iter_batches(4))
    state = trainer.init_state(batch, ca_mask)
    state, hist = trainer.fit(
        ds_state := state, ds.subset(np.arange(6)), ds.subset(np.arange(6, 8)),
        nepochs=4, batch_size=4,
    )
    assert np.isfinite(hist[-1]["train_recon"])
    assert hist[-1]["train_recon"] < hist[0]["train_recon"]
    # reconstruction keeps C-alphas pinned to their beads
    recon = np.asarray(trainer.reconstruct(state.params, batch, ca_mask))
    b, n = batch.z.shape
    recon = recon.reshape(b, n, 3)
    ca = np.asarray(batch.cg_xyz)
    for bi in range(b):
        flags = np.asarray(ca_mask[bi])
        res = np.asarray(batch.mapping[bi])[flags]
        np.testing.assert_allclose(recon[bi][flags], ca[bi][res], atol=1e-4)


def test_pcn_pseudo_decoder_variant(pcn_data):
    """PCN accepts dec_type='pseudo' (decoder choice measurable at protein
    scale); C-alpha pinning semantics are decoder-independent."""
    import jax

    ds = pcn_data
    cfg = ModelConfig(dec_type="pseudo", n_basis=16, n_rbf=5,
                      atom_cutoff=12.0, dec_nconv=1, activation="swish")
    model = PCN(cfg=cfg)
    batch, ca_mask, _, _ = next(ds.iter_batches(4))
    params = model.init(jax.random.PRNGKey(0), batch, ca_mask)
    assert any("EquiMessagePseudo" in k for k in params["params"]["dec"])
    out = model.apply(params, batch, ca_mask)
    recon = np.asarray(out.xyz_recon).reshape(*batch.z.shape, 3)
    ca = np.asarray(batch.cg_xyz)
    for bi in range(batch.z.shape[0]):
        flags = np.asarray(ca_mask[bi])
        res = np.asarray(batch.mapping[bi])[flags]
        np.testing.assert_allclose(recon[bi][flags], ca[bi][res], atol=1e-4)


def test_write_pdb_roundtrip(tmp_path, pcn_data):
    seq, crd = synthetic_protein(5, seed=3)
    p = protein_props(seq, crd)
    path = str(tmp_path / "out.pdb")
    write_pdb(path, seq, p.xyz, p.mapping, p.channel_idx)
    lines = open(path).read().splitlines()
    atoms = [l for l in lines if l.startswith("ATOM")]
    assert len(atoms) == p.z.shape[0]
    # fixed-column coordinate fields parse back
    x = float(atoms[0][30:38]); y = float(atoms[0][38:46]); z = float(atoms[0][46:54])
    np.testing.assert_allclose([x, y, z], p.xyz[0], atol=1e-3)
    assert any(l.startswith("SEQRES") for l in lines)


def test_parse_pdb_full_roundtrip(tmp_path):
    """write_pdb -> parse_pdb recovers seq and the full atom14 layout
    (covers the reference's CASP14 ingestion, sidechain.py:334-396)."""
    from coarsegrainingvae_tpu.utils.pdb import parse_pdb

    seq, crd = synthetic_protein(8, seed=5, missing_frac=0.2)
    p = protein_props(seq, crd)
    path = str(tmp_path / "prot.pdb")
    write_pdb(path, seq, p.xyz, p.mapping, p.channel_idx)
    seq2, crd2 = parse_pdb(path)
    assert seq2 == seq
    assert crd2.shape == crd.shape
    # PDB stores 3 decimals; missing atoms stay exactly zero on both sides
    np.testing.assert_allclose(crd2, crd, atol=2e-3)
    # and props rebuilt from the parsed structure match the originals
    p2 = protein_props(seq2, crd2)
    assert np.array_equal(p2.z, p.z)
    assert np.array_equal(p2.mapping, p.mapping)
    assert np.array_equal(p2.channel_idx, p.channel_idx)
    np.testing.assert_allclose(p2.ca_xyz, p.ca_xyz, atol=2e-3)


def test_parse_pdb_skips_offlayout_records(tmp_path):
    """Hydrogens, OXT, altloc B, HETATM and model 2 must be ignored."""
    from coarsegrainingvae_tpu.utils.pdb import parse_pdb

    pdb = "\n".join([
        "TITLE     synthetic",
        "ATOM      1  N   ALA A   1      10.000  10.000  10.000  1.00  0.00           N",
        "ATOM      2  CA  ALA A   1      11.000  10.000  10.000  1.00  0.00           C",
        "ATOM      3  CA BALA A   1      99.000  99.000  99.000  1.00  0.00           C",
        "ATOM      4  HA  ALA A   1      12.000  12.000  12.000  1.00  0.00           H",
        "ATOM      5  OXT ALA A   1      13.000  13.000  13.000  1.00  0.00           O",
        "HETATM    6  O   HOH A   2      14.000  14.000  14.000  1.00  0.00           O",
        "ENDMDL",
        "ATOM      7  C   ALA A   1      15.000  15.000  15.000  1.00  0.00           C",
        "END",
    ])
    path = str(tmp_path / "mixed.pdb")
    open(path, "w").write(pdb + "\n")
    seq, crd = parse_pdb(path)
    assert seq == "A"
    np.testing.assert_allclose(crd[0, 0], [10.0, 10.0, 10.0])
    np.testing.assert_allclose(crd[0, 1], [11.0, 10.0, 10.0])  # altloc A kept
    assert (crd[0, 2] == 0).all()  # model-2 C never read


def test_generate_cache_from_pdb_dir(tmp_path):
    """The cache CLI accepts a directory of PDB files (CASP14 flow)."""
    from coarsegrainingvae_tpu.cli.generate_cache import main as cache_main

    d = tmp_path / "targets"
    d.mkdir()
    for i in range(2):
        seq, crd = synthetic_protein(6, seed=i)
        p = protein_props(seq, crd)
        write_pdb(str(d / f"T{i:04d}.pdb"), seq, p.xyz, p.mapping, p.channel_idx)
    out = str(tmp_path / "cache.npz")
    cache_main(["-kind", "protein", "-src", str(d), "-out", out])
    z = np.load(out, allow_pickle=True)
    assert z["z"].shape[0] == 2
    assert len(z["seqs"]) == 2


def test_sidechainnet_items_mask_and_blacklist():
    """Raw SidechainNet split dict -> items: SEQ_BLACKLIST dropped,
    unresolved residues (msk != '+') DROPPED from seq/crd and renumbered
    (reference mask_seq, sidechain.py:163-164,270-287) -- no phantom
    zero-coordinate CG beads may survive."""
    import numpy as np
    from coarsegrainingvae_tpu.data.sidechain import (
        NUM_COORDS_PER_RES,
        SEQ_BLACKLIST,
        build_pcn_dataset,
        protein_props,
        sidechainnet_items,
    )
    from coarsegrainingvae_tpu.data.synthetic import synthetic_protein

    seq1, crd1 = synthetic_protein(6, seed=0)
    seq2, crd2 = synthetic_protein(5, seed=1)
    split = {
        "seq": [seq1, SEQ_BLACKLIST[0], seq2],
        "crd": [
            np.asarray(crd1).reshape(-1, 3),
            np.zeros((len(SEQ_BLACKLIST[0]) * NUM_COORDS_PER_RES, 3)),
            np.asarray(crd2).reshape(-1, 3),
        ],
        "msk": ["+" * len(seq1), "+" * len(SEQ_BLACKLIST[0]),
                "+-" + "+" * (len(seq2) - 2)],
    }
    items = sidechainnet_items(split)
    assert len(items) == 2  # blacklist entry dropped
    assert items[0][0] == seq1

    # residue 1 of seq2 was unresolved: it is dropped and the rest
    # renumbered, so the item's sequence shrinks by one
    mseq, mcrd = items[1]
    assert mseq == seq2[0] + seq2[2:]
    assert mcrd.shape[0] == len(seq2) - 1
    props = protein_props(mseq, mcrd)
    # every surviving residue has a real (nonzero) C-alpha -> no phantom
    # origin bead can enter the C-alpha radius graph
    assert np.all(np.any(props.ca_xyz != 0.0, axis=-1))
    # and the whole thing still builds a padded dataset whose unmasked
    # beads all carry real coordinates
    ds = build_pcn_dataset(items)
    assert ds.z.shape[0] == 2
    for s in range(2):
        beads = ds.ca_xyz[s][ds.cg_mask[s]]
        assert np.all(np.any(beads != 0.0, axis=-1))
        # no CG edge touches a masked (nonexistent) bead
        live = ds.nbrs[s][ds.nbr_mask[s]]
        n_res = int(ds.cg_mask[s].sum())
        assert live.size == 0 or live.max() < n_res

    # n_data cap applies after filtering
    assert len(sidechainnet_items(split, n_data=1)) == 1


def test_load_sidechainnet_pickle_roundtrip(tmp_path):
    import pickle

    import numpy as np
    from coarsegrainingvae_tpu.data.sidechain import load_sidechainnet
    from coarsegrainingvae_tpu.data.synthetic import synthetic_protein

    seq, crd = synthetic_protein(7, seed=3)
    data = {"train": {"seq": [seq], "crd": [np.asarray(crd).reshape(-1, 3)]}}
    p = tmp_path / "scn_casp12_30.pkl"
    with open(p, "wb") as f:
        pickle.dump(data, f)
    items = load_sidechainnet(str(p), split="train")
    assert len(items) == 1 and items[0][0] == seq


def test_pcn_fit_returns_best_val_params(pcn_data):
    """fit must hand back the parameters of the best-validation epoch, not
    the final step's (long runs can destabilize late; the reference keeps
    best_model the same way, run_pdb.py)."""
    ds = pcn_data
    cfg = ModelConfig(n_basis=16, n_rbf=5, atom_cutoff=12.0, dec_nconv=1,
                      activation="swish")
    trainer = PCNTrainer(PCN(cfg=cfg), gamma=1.0, kappa=0.5, lr=5e-3)
    batch, ca_mask, _, _ = next(ds.iter_batches(4))
    state = trainer.init_state(batch, ca_mask)
    ds_tr, ds_val = ds.subset(np.arange(6)), ds.subset(np.arange(6, 8))
    state, hist = trainer.fit(state, ds_tr, ds_val, nepochs=4, batch_size=4)
    vals = [h["val_loss"] for h in hist]
    _, m = trainer.run_epoch(state, ds_val, 4, train=False)
    np.testing.assert_allclose(m["loss"], min(vals), rtol=1e-5)


def test_synthetic_protein_well_posed_truth_graph_is_tree():
    """well_posed=True relaxes the structure so the coordinate-derived
    covalent-cutoff truth graph equals the intended topology exactly (a
    tree: E = N - 1); the raw generator leaves spurious covalent contacts
    that make exact bond-graph recovery impossible."""
    from coarsegrainingvae_tpu.data.synthetic import intended_atom14_bonds

    seq, crd = synthetic_protein(14, seed=3, well_posed=True)
    p = protein_props(seq, crd)
    assert p.bonds.shape[0] == p.z.shape[0] - 1
    assert p.bonds.shape[0] == len(intended_atom14_bonds(seq))
    # connected single component: union-find over the edges
    parent = list(range(p.z.shape[0]))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in p.bonds:
        parent[find(int(a))] = find(int(b))
    assert len({find(i) for i in range(p.z.shape[0])}) == 1


def test_synthetic_protein_default_path_unchanged():
    """well_posed defaults off and must keep the round-3/4 PCN A/B data
    bit-exact (including the missing_frac rng stream)."""
    a = synthetic_protein(7, seed=9)[1]
    b = synthetic_protein(7, seed=9, well_posed=False)[1]
    np.testing.assert_array_equal(a, b)
    m1 = synthetic_protein(7, seed=9, missing_frac=0.4)[1]
    m2 = synthetic_protein(7, seed=9, missing_frac=0.4)[1]
    np.testing.assert_array_equal(m1, m2)


def test_synthetic_protein_well_posed_missing_frac():
    seq, crd = synthetic_protein(10, seed=4, well_posed=True, missing_frac=0.5)
    # zero rows present (missing atoms) and the structure still parses
    assert (np.abs(crd).sum(-1) == 0).any()
    p = protein_props(seq, crd)
    assert p.z.shape[0] > 0
