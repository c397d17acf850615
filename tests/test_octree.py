import numpy as np
import h5py
import jax
import jax.numpy as jnp
import pytest

from hyperion_tpu.grid import OctreeGrid
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.sources import PointSource
from hyperion_tpu.transport import (build_dust_tables, build_source_tables,
                                    run_lucy)
from hyperion_tpu.transport.gtable_octree import build_octree_geometry
from hyperion_tpu.transport.imaging import escape_tau_walk
from hyperion_tpu.importers import construct_octree


def two_level_refined():
    # root refined; child 0 refined; everything else leaves
    refined = [True,
               True, False, False, False, False, False, False, False, False,
               False, False, False, False, False, False, False]
    return np.array(refined, dtype=bool)


def test_octree_validation():
    OctreeGrid(0., 0., 0., 1., 1., 1., two_level_refined())
    with pytest.raises(ValueError):
        OctreeGrid(0., 0., 0., 1., 1., 1., np.array([True, False]))
    with pytest.raises(ValueError):
        # truncated: root refined but only 7 children
        OctreeGrid(0., 0., 0., 1., 1., 1.,
                   np.array([True] + [False] * 7))


def test_octree_tables():
    g = OctreeGrid(0., 0., 0., 1., 1., 1., two_level_refined())
    centers, halves, children = g.tree_tables()
    assert centers.shape == (17, 3)
    # root
    assert np.allclose(centers[0], 0.0)
    assert np.allclose(halves[0], 1.0)
    # first child is the (-x,-y,-z) octant
    assert np.allclose(centers[1], (-0.5, -0.5, -0.5))
    assert np.allclose(halves[1], 0.5)
    # first grandchild
    assert np.allclose(centers[2], (-0.75, -0.75, -0.75))
    # volumes: total of leaves equals the root volume
    vols = g.volumes
    leaf_total = vols[~g.refined].sum()
    assert np.isclose(leaf_total, 8.0)


def test_octree_io_roundtrip(tmp_path):
    g = OctreeGrid(0., 0., 0., 1., 1., 1., two_level_refined())
    g['density'] = []
    rho = np.random.RandomState(0).rand(17)
    g['density'].append(rho)
    with h5py.File(str(tmp_path / 'oct.h5'), 'w') as f:
        g.write(f.create_group('Grid'))
    g2 = OctreeGrid()
    with h5py.File(str(tmp_path / 'oct.h5'), 'r') as f:
        g2.read(f['Grid'])
    assert np.array_equal(g2.refined, g.refined)
    assert np.allclose(g2.quantities['density'][0], rho)


def test_octree_escape_tau():
    # uniform density over leaves -> tau to escape == chord * chi * rho
    g = OctreeGrid(0., 0., 0., 1., 1., 1., two_level_refined())
    geo = build_octree_geometry(g, dtype=jnp.float64)
    rho_phys, chi = 0.8, 1.5
    density = np.full((1, geo.n_nodes), rho_phys * geo.length_scale)
    density[0, np.asarray(g.refined)] = 0.0  # refined nodes hold no mass
    density = jnp.asarray(density)
    rng = np.random.RandomState(3)
    n = 1500
    pts = rng.uniform(-0.9, 0.9, (3, n)) / geo.length_scale
    dirs = rng.normal(size=(3, n))
    dirs /= np.linalg.norm(dirs, axis=0)
    x, y, z = [jnp.asarray(v) for v in pts]
    kx, ky, kz = [jnp.asarray(v) for v in dirs]
    cell = geo.find_cell(x, y, z, kx, ky, kz)
    assert int((cell < 0).sum()) == 0
    # all located cells must be leaves
    assert not bool(np.asarray(geo.refined)[np.asarray(cell)].any())
    chi_rows = jnp.full((n, 1), chi, dtype=jnp.float64)
    tau = np.asarray(escape_tau_walk(geo, density, chi_rows, x, y, z,
                                     kx, ky, kz, cell,
                                     jnp.ones(n, dtype=bool)))
    # analytic chord through the [-0.5, 0.5]^3 box (engine units: L=2)
    half = 0.5
    ts = []
    for a in range(3):
        k = dirs[a]
        p = pts[a]
        with np.errstate(divide='ignore'):
            t = np.where(k > 0, (half - p) / k,
                         np.where(k < 0, (-half - p) / k, np.inf))
        ts.append(t)
    chord = np.min(ts, axis=0)
    expected = chi * rho_phys * geo.length_scale * chord
    assert np.allclose(tau, expected, rtol=1e-8)


def test_octree_lucy():
    g = OctreeGrid(0., 0., 0., 1., 1., 1., two_level_refined())
    geo = build_octree_geometry(g, dtype=jnp.float64)
    dust = IsotropicDust(np.logspace(5, 18, 16), np.repeat(0.4, 16),
                         np.repeat(1.0, 16))
    dt = build_dust_tables([dust], dtype=jnp.float64)
    st = build_source_tables([PointSource(luminosity=1.0, temperature=4000.0,
                                          position=(0.21, 0.11, 0.051))],
                             dtype=jnp.float64,
                             length_scale=geo.length_scale)
    density = np.full((1, geo.n_nodes), 0.4 * geo.length_scale)
    density[0, np.asarray(g.refined)] = 0.0
    res = run_lucy(geo, dt, st, jnp.asarray(density), jax.random.PRNGKey(2),
                   n_photons=50000, n_iterations=1, batch_size=4096,
                   verbose=False)
    assert res.killed_geo == 0
    assert res.killed_int == 0
    assert np.isclose(res.energy_current, 50000.0)
    leaves = ~np.asarray(g.refined)
    assert np.all(res.specific_energy[0][leaves] > 0)


def test_sph_importer():
    rng = np.random.RandomState(5)
    n_p = 4000
    # clustered particles
    px = rng.randn(n_p) * 0.1
    py = rng.randn(n_p) * 0.1
    pz = rng.randn(n_p) * 0.1
    sigma = np.full(n_p, 0.02)
    mass = np.full(n_p, 1.0 / n_p)
    grid = construct_octree(0., 0., 0., 1., 1., 1., px, py, pz, sigma, mass,
                            n_ref=64)
    assert grid.n_cells > 9  # refinement happened
    rho = grid.quantities['density'][0]
    vols = grid.volumes
    leaves = ~grid.refined
    total_mass = np.sum(rho[leaves] * vols[leaves])
    assert abs(total_mass - 1.0) < 0.05  # most mass inside the box
    # center cells denser than edge cells
    centers, halves, _ = grid.tree_tables()
    r = np.sqrt((centers ** 2).sum(axis=1))
    inner = leaves & (r < 0.1)
    outer = leaves & (r > 0.7)
    assert rho[inner].mean() > 10 * max(rho[outer].mean(), 1e-300)
