"""Voronoi transport geometry tests (ref: grid_geometry_voronoi.f90 via the
propagation robustness suite: ownership, chord optical depths, zero killed)."""

import numpy as np
import jax
import jax.numpy as jnp

from hyperion_tpu.grid import VoronoiGrid
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.sources import PointSource
from hyperion_tpu.transport import (build_dust_tables, build_source_tables,
                                    run_lucy)
from hyperion_tpu.transport.gtable_voronoi import build_voronoi_geometry
from hyperion_tpu.transport.imaging import escape_tau_walk


def make_grid(n=300, seed=42):
    rng = np.random.RandomState(seed)
    return VoronoiGrid(rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                       rng.uniform(-1, 1, n),
                       xmin=-1., xmax=1., ymin=-1., ymax=1.,
                       zmin=-1., zmax=1.)


def test_voronoi_find_cell_matches_nearest_site():
    from scipy.spatial import cKDTree
    grid = make_grid()
    geo = build_voronoi_geometry(grid, dtype=jnp.float64)
    rng = np.random.RandomState(1)
    pts = rng.uniform(-0.99, 0.99, (3, 2000))
    x, y, z = [jnp.asarray(p / geo.length_scale) for p in pts]
    zeros = jnp.zeros(pts.shape[1])
    cell = np.asarray(geo.find_cell(x, y, z, zeros, zeros, zeros + 1))
    tree = cKDTree(np.stack([grid.x, grid.y, grid.z], axis=1))
    _, owner = tree.query(pts.T)
    assert (cell == owner).all()


def test_voronoi_escape_tau():
    grid = make_grid()
    geo = build_voronoi_geometry(grid, dtype=jnp.float64)
    rho_phys, chi = 0.9, 1.1
    density = jnp.asarray(np.full((1, geo.n_cells),
                                  rho_phys * geo.length_scale))
    rng = np.random.RandomState(3)
    n = 800
    pts = rng.uniform(-0.9, 0.9, (3, n)) / geo.length_scale
    dirs = rng.normal(size=(3, n))
    dirs /= np.linalg.norm(dirs, axis=0)
    x, y, z = [jnp.asarray(v) for v in pts]
    kx, ky, kz = [jnp.asarray(v) for v in dirs]
    cell = geo.find_cell(x, y, z, kx, ky, kz)
    assert int((np.asarray(cell) < 0).sum()) == 0
    chi_rows = jnp.full((n, 1), chi, dtype=jnp.float64)
    tau = np.asarray(escape_tau_walk(geo, density, chi_rows, x, y, z,
                                     kx, ky, kz, cell,
                                     jnp.ones(n, dtype=bool)))
    half = 1.0 / geo.length_scale
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
    assert np.allclose(tau, expected, rtol=1e-6)


def test_voronoi_volumes_partition_box():
    grid = make_grid(n=200)
    geo = build_voronoi_geometry(grid, dtype=jnp.float64)
    assert np.isclose(float(np.asarray(geo.volumes).sum()),
                      8.0 / geo.length_scale ** 3, rtol=1e-6)


def test_voronoi_lucy():
    grid = make_grid(n=150)
    geo = build_voronoi_geometry(grid, dtype=jnp.float64)
    dust = IsotropicDust(np.logspace(5, 18, 16), np.repeat(0.4, 16),
                         np.repeat(1.0, 16))
    dt = build_dust_tables([dust], dtype=jnp.float64)
    st = build_source_tables([PointSource(luminosity=1.0, temperature=4000.0,
                                          position=(0.05, -0.02, 0.01))],
                             dtype=jnp.float64,
                             length_scale=geo.length_scale)
    density = jnp.asarray(np.full((1, geo.n_cells), 0.5 * geo.length_scale))
    res = run_lucy(geo, dt, st, density, jax.random.PRNGKey(7),
                   n_photons=50000, n_iterations=1, batch_size=4096,
                   verbose=False)
    assert res.killed_geo == 0
    assert res.killed_int == 0
    assert np.isclose(res.energy_current, 50000.0)
    se = res.specific_energy[0]
    assert (se > 0).mean() > 0.95


def test_voronoi_random_position_in_cell():
    grid = make_grid(n=120)
    geo = build_voronoi_geometry(grid, dtype=jnp.float64)
    cell = jnp.asarray(np.arange(geo.n_cells, dtype=np.int32))
    x, y, z = geo.random_position_in_cell(cell, jax.random.PRNGKey(0),
                                          jnp.float64)
    owner = np.asarray(geo.find_cell(x, y, z, 0 * x, 0 * x, 0 * x + 1))
    assert (owner == np.arange(geo.n_cells)).all()


def test_voronoi_lattice_matches_cartesian_engine():
    """Voronoi transport cross-validated against the cartesian engine: a
    Voronoi grid whose sites are the centers of a regular lattice has
    cubic cells identical to the cartesian grid's, so one Lucy iteration
    on the same absorbing medium must give the same specific-energy field
    up to MC noise (different traversal code path, different RNG stream
    pairing; ref: the per-grid differential matrix covers car/cyl/sph/
    amr/oct against stored Fortran data — Voronoi has no stored
    reference, so the cartesian engine is the oracle)."""
    from hyperion_tpu.grid import CartesianGrid
    from hyperion_tpu.transport import build_cartesian_geometry

    n = 8
    walls = np.linspace(-1.0, 1.0, n + 1)
    centers = 0.5 * (walls[1:] + walls[:-1])
    zz, yy, xx = np.meshgrid(centers, centers, centers, indexing='ij')
    vgrid = VoronoiGrid(xx.ravel(), yy.ravel(), zz.ravel(),
                        xmin=-1., xmax=1., ymin=-1., ymax=1.,
                        zmin=-1., zmax=1.)
    cgrid = CartesianGrid(walls, walls, walls)

    dust = IsotropicDust(np.logspace(5, 18, 16), np.repeat(0.4, 16),
                         np.repeat(1.0, 16))
    dt = build_dust_tables([dust], dtype=jnp.float64)
    src = PointSource(luminosity=1.0, temperature=4000.0,
                      position=(0.07, -0.03, 0.02))
    n_photons = 200000

    fields = {}
    for name, geo in (('vor', build_voronoi_geometry(vgrid,
                                                     dtype=jnp.float64)),
                      ('car', build_cartesian_geometry(cgrid,
                                                       dtype=jnp.float64))):
        st = build_source_tables([src], dtype=jnp.float64,
                                 length_scale=geo.length_scale)
        density = jnp.asarray(
            np.full((1, geo.n_cells), 1.2 * geo.length_scale))
        res = run_lucy(geo, dt, st, density, jax.random.PRNGKey(3),
                       n_photons=n_photons, n_iterations=1,
                       batch_size=8192, verbose=False)
        assert res.killed_geo == 0 and res.killed_int == 0
        fields[name] = np.asarray(res.specific_energy[0])

    # map the voronoi site ordering onto the cartesian flat ordering
    vse = fields['vor']
    i = np.clip(np.searchsorted(walls, vgrid.x) - 1, 0, n - 1)
    j = np.clip(np.searchsorted(walls, vgrid.y) - 1, 0, n - 1)
    k = np.clip(np.searchsorted(walls, vgrid.z) - 1, 0, n - 1)
    vse_cart = np.zeros(n ** 3)
    vse_cart[(k * n + j) * n + i] = vse
    cse = fields['car']

    assert (vse_cart > 0).all() and (cse > 0).all()
    # totals agree tightly; per-cell fields agree to MC noise
    assert abs(vse_cart.sum() / cse.sum() - 1) < 0.02
    ratio = vse_cart / cse
    assert np.percentile(np.abs(np.log10(ratio)), 95) < 0.08
