"""Analysis & visualization tests (reference plots.py / postanalysis.py /
visualization.py)."""
import os

import numpy as np

from coarsegrainingvae_tpu.eval.analysis import (
    get_cv_stats,
    kde_free_energy,
    pairwise_distance_features,
    ramachandran,
    tica,
)
from coarsegrainingvae_tpu.data.sidechain import backbone_dihedral_quads, protein_props
from coarsegrainingvae_tpu.data.synthetic import synthetic_protein
from coarsegrainingvae_tpu.utils.visualization import (
    rotate_grid,
    save_rotate_frames,
    xyz_grid_view,
)
from coarsegrainingvae_tpu.utils.xyz import read_xyz


def test_tica_finds_slow_mode():
    """A slowly-oscillating coordinate mixed with fast noise: TICA's first
    component must align with the slow direction."""
    rng = np.random.default_rng(0)
    t = np.arange(4000)
    slow = np.sin(2 * np.pi * t / 800.0)
    fast = rng.normal(size=(4000, 4))
    feats = np.column_stack([slow + 0.1 * rng.normal(size=4000), fast])
    proj, comps = tica(feats, lag=20, dim=2)
    assert proj.shape == (4000, 2)
    # dominant weight on feature 0
    w = np.abs(comps[:, 0]) / np.abs(comps[:, 0]).sum()
    assert w[0] > 0.5


def test_pairwise_distance_features_shape():
    xyz = np.random.default_rng(0).normal(size=(10, 6, 3))
    f = pairwise_distance_features(xyz)
    assert f.shape == (10, 15)


def test_ramachandran_angles_shape():
    seq, crd = synthetic_protein(6, seed=0)
    p = protein_props(seq, crd)
    quads = backbone_dihedral_quads(p)
    phi, psi = quads[::2], quads[1::2]
    frames = np.stack([p.xyz, p.xyz + 0.01])
    a, b = ramachandran(frames, phi, psi)
    assert a.shape == (2, phi.shape[0])
    assert np.all(np.abs(a) <= np.pi + 1e-6)


def test_kde_free_energy_minimum_at_mode():
    rng = np.random.default_rng(1)
    x = rng.normal(size=3000)
    y = rng.normal(size=3000)
    xg, yg, f = kde_free_energy(x, y, grid=40)
    i, j = np.unravel_index(np.argmin(f), f.shape)
    assert abs(xg[i, j]) < 0.6 and abs(yg[i, j]) < 0.6
    assert f.min() == 0.0


def test_grid_view_and_rotation(tmp_path):
    rng = np.random.default_rng(2)
    xyzs = rng.normal(size=(4, 5, 3)).astype(np.float32)
    grid = xyz_grid_view(xyzs, grid_cols=2)
    assert grid.shape == xyzs.shape
    # different tiles occupy different x/y cells
    assert grid[0, :, 0].mean() < grid[1, :, 0].mean()

    movie = rotate_grid(xyzs, n_frames=6)
    assert movie.shape == (6, 20, 3)
    # rotation preserves pairwise distances within a frame
    d0 = np.linalg.norm(movie[0][0] - movie[0][7])
    d3 = np.linalg.norm(movie[3][0] - movie[3][7])
    np.testing.assert_allclose(d0, d3, rtol=1e-5)

    path = str(tmp_path / "rot.xyz")
    save_rotate_frames(xyzs, np.full(5, 6), path, n_frames=6)
    z, frames = read_xyz(path)
    assert frames.shape == (6, 20, 3)


def test_get_cv_stats(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "cv_stats.csv"), "w") as f:
        f.write("fold,rmsd\n0,1.0\n1,3.0\n")
    stats = get_cv_stats(d)
    assert stats["rmsd"] == (2.0, 1.0)


def test_hch_metric_ideal_tetrahedron_is_zero():
    from coarsegrainingvae_tpu.eval.metrics import compute_hch, tetrahedral_indices

    # perfect tetrahedron around a carbon
    verts = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], float)
    xyz = np.concatenate([[np.zeros(3)], verts])[None]  # (1, 5, 3)
    z = np.array([6, 1, 1, 1, 1])
    bonds = np.array([[0, 1], [0, 2], [0, 3], [0, 4]])
    tetra = tetrahedral_indices(z, bonds)
    assert list(tetra) == [0]
    assert compute_hch(xyz, tetra) < 1e-10
    # squashed geometry scores worse
    bad = xyz.copy()
    bad[0, 1] = [0.1, 0.1, 1.0]
    assert compute_hch(bad, tetra) > 1e-3


def test_step_timer_and_compile_timing():
    import time as _time

    import jax
    import jax.numpy as jnp

    from coarsegrainingvae_tpu.utils.profiling import StepTimer, save_runtime, time_compile

    t = StepTimer(warmup=1)
    t.start()
    for _ in range(4):
        _time.sleep(0.01)
        t.tick()
    s = t.summary(items_per_step=32)
    assert s["steps"] == 3
    assert 0.005 < s["mean_s"] < 0.1
    assert s["items_per_s"] > 0

    f = jax.jit(lambda x: jnp.sum(x * 2))
    stats = time_compile(f, jnp.ones((64, 64)))
    assert stats["first_call_s"] >= stats["steady_s"] >= 0


def test_save_runtime(tmp_path):
    import json

    from coarsegrainingvae_tpu.utils.profiling import save_runtime

    p = str(tmp_path / "rt.json")
    save_runtime(12.5, p)
    assert json.load(open(p))["wall_clock_s"] == 12.5


def test_vmd_render_script(tmp_path):
    from coarsegrainingvae_tpu.utils.vmd import write_vmd_render_script

    p = write_vmd_render_script(str(tmp_path / "render.vmd"), style="licorice")
    text = open(p).read()
    assert "Licorice" in text and "Background white" in text
    assert "axes location Off" in text
    import pytest

    with pytest.raises(KeyError):
        write_vmd_render_script(str(tmp_path / "x.vmd"), style="nope")


def test_phi_psi_quads_automatic_selection():
    """Automatic phi/psi quads from atom names + residue mapping match the
    protein-props route (reference uses pyemma's featurizer)."""
    import numpy as np

    from coarsegrainingvae_tpu.data.sidechain import (
        ATOM_NAMES,
        backbone_dihedral_quads,
        protein_props,
    )
    from coarsegrainingvae_tpu.data.synthetic import synthetic_protein
    from coarsegrainingvae_tpu.eval.analysis import phi_psi_quads, ramachandran

    seq, crd = synthetic_protein(6, seed=2)
    props = protein_props(seq, np.asarray(crd))
    names = [ATOM_NAMES[i] for i in props.atom_idx]
    phi, psi = phi_psi_quads(names, props.mapping)
    # interleaved phi/psi from the sidechain-path helper == concatenation
    both = backbone_dihedral_quads(props)
    assert phi.shape[0] + psi.shape[0] == both.shape[0]
    merged = sorted(map(tuple, np.concatenate([phi, psi])))
    assert merged == sorted(map(tuple, both))
    # and the angles evaluate finitely over frames
    frames = props.xyz[None].repeat(3, 0)
    phis, psis = ramachandran(frames, phi, psi)
    assert np.isfinite(phis).all() and np.isfinite(psis).all()
    assert phis.shape == (3, phi.shape[0])
