"""AMR transport geometry tests (ref: per-grid propagation/robustness suites
in hyperion/model/tests/test_propagation.py — zero-killed-photon oracle)."""

import numpy as np
import jax
import jax.numpy as jnp

from hyperion_tpu.grid import AMRGrid
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.sources import PointSource
from hyperion_tpu.transport import (build_dust_tables, build_source_tables,
                                    run_lucy)
from hyperion_tpu.transport.gtable_amr import build_amr_geometry
from hyperion_tpu.transport.imaging import escape_tau_walk


def two_level_amr():
    amr = AMRGrid()
    level1 = amr.add_level()
    g = level1.add_grid()
    g.xmin, g.xmax = -1.0, 1.0
    g.ymin, g.ymax = -1.0, 1.0
    g.zmin, g.zmax = -1.0, 1.0
    g.nx = g.ny = g.nz = 8
    level2 = amr.add_level()
    f = level2.add_grid()
    f.xmin, f.xmax = -0.5, 0.5
    f.ymin, f.ymax = -0.5, 0.5
    f.zmin, f.zmax = -0.5, 0.5
    f.nx = f.ny = f.nz = 8
    return amr


def uniform_density(geo, rho_phys):
    return jnp.asarray(np.full((1, geo.n_cells), rho_phys *
                               geo.length_scale))


def test_amr_locate():
    amr = two_level_amr()
    geo = build_amr_geometry(amr, dtype=jnp.float64)
    assert geo.n_cells == 1024
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.99, 0.99, (3, 500))
    x, y, z = [jnp.asarray(p / geo.length_scale) for p in pts]
    k = jnp.zeros(500)
    cell = np.asarray(geo.find_cell(x, y, z, k, k, jnp.ones(500)))
    assert (cell >= 0).all()
    # points in the refined region must land in the fine fab (cells >= 512)
    fine = (np.abs(pts) < 0.5).all(axis=0)
    assert (cell[fine] >= 512).all()
    coarse = (np.abs(pts) > 0.52).any(axis=0)
    assert (cell[coarse] < 512).all()
    # decode/encode round trip
    fab, i, j, kk = geo.decode(jnp.asarray(cell))
    nf = np.asarray(geo.fab_n)[np.asarray(fab)]
    flat = np.asarray(geo.fab_offset)[np.asarray(fab)] + \
        (np.asarray(kk) * nf[:, 1] + np.asarray(j)) * nf[:, 0] + np.asarray(i)
    assert (flat == cell).all()


def test_amr_escape_tau():
    """Uniform density: tau to escape is chi*rho*chord regardless of which
    fabs the ray crosses (exercises cross-level transitions)."""
    amr = two_level_amr()
    geo = build_amr_geometry(amr, dtype=jnp.float64)
    rho_phys, chi = 0.7, 1.3
    density = uniform_density(geo, rho_phys)
    rng = np.random.RandomState(3)
    n = 1000
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
        kda = dirs[a]
        p = pts[a]
        with np.errstate(divide='ignore'):
            t = np.where(kda > 0, (half - p) / kda,
                         np.where(kda < 0, (-half - p) / kda, np.inf))
        ts.append(t)
    chord = np.min(ts, axis=0)
    expected = chi * rho_phys * geo.length_scale * chord
    assert np.allclose(tau, expected, rtol=1e-8)


def test_amr_lucy():
    amr = two_level_amr()
    geo = build_amr_geometry(amr, dtype=jnp.float64)
    dust = IsotropicDust(np.logspace(5, 18, 16), np.repeat(0.4, 16),
                         np.repeat(1.0, 16))
    dt = build_dust_tables([dust], dtype=jnp.float64)
    # source on a fab corner: the pathological-placement oracle
    st = build_source_tables([PointSource(luminosity=1.0, temperature=4000.0,
                                          position=(0.0, 0.0, 0.0))],
                             dtype=jnp.float64,
                             length_scale=geo.length_scale)
    density = uniform_density(geo, 0.3)
    # enforce_energy_range=False so untraversed masked cells stay exactly 0
    # (the reference-default True floors every cell to the dust table min)
    res = run_lucy(geo, dt, st, density, jax.random.PRNGKey(2),
                   n_photons=50000, n_iterations=1, batch_size=4096,
                   enforce_energy_range=False, verbose=False)
    assert res.killed_geo == 0
    assert res.killed_int == 0
    assert np.isclose(res.energy_current, 50000.0)
    se = res.specific_energy[0]
    # fine cells adjacent to the source see the highest specific energy
    assert se[512:].max() > se[:512].max()
    # every *visible* cell is heated; coarse cells covered by the fine fab
    # (the central 4x4x4 of the 8^3 coarse fab) are never traversed
    covered = np.zeros(1024, dtype=bool)
    idx = np.arange(512)
    i, j, k = idx % 8, (idx // 8) % 8, idx // 64
    covered[:512] = ((i >= 2) & (i < 6) & (j >= 2) & (j < 6) &
                     (k >= 2) & (k < 6))
    assert covered.sum() == 64
    assert (se[~covered] > 0).all()
    assert (se[covered] == 0).all()
