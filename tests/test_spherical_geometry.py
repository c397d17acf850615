import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.grid import SphericalPolarGrid
from hyperion_tpu.sources import PointSource
from hyperion_tpu.transport import (build_dust_tables, build_source_tables,
                                    run_lucy)
from hyperion_tpu.transport.gtable_spherical import build_spherical_geometry
from hyperion_tpu.transport.imaging import escape_tau_walk


def make_grid(n_r=10, n_t=7, n_p=5, rmax=2.0, r0=0.0):
    if r0 == 0.0:
        r_wall = np.hstack([0.0, np.logspace(-3, np.log10(rmax), n_r)])
    else:
        r_wall = np.logspace(np.log10(r0), np.log10(rmax), n_r + 1)
    t_wall = np.linspace(0.0, np.pi, n_t + 1)
    p_wall = np.linspace(0.0, 2 * np.pi, n_p + 1)
    return SphericalPolarGrid(r_wall, t_wall, p_wall)


def test_find_cell_matches_numpy():
    grid = make_grid()
    geo = build_spherical_geometry(grid, dtype=jnp.float64)
    rng = np.random.RandomState(1)
    n = 3000
    pos = rng.uniform(-1.4, 1.4, (3, n))
    k = rng.normal(size=(3, n))
    k /= np.linalg.norm(k, axis=0)
    cell = np.asarray(geo.find_cell(*[jnp.asarray(p) for p in pos],
                                    *[jnp.asarray(kk) for kk in k]))
    r = np.sqrt((pos ** 2).sum(axis=0))
    L = geo.length_scale
    rw = np.asarray(grid.r_wall) / L
    tw = np.asarray(grid.t_wall)
    pw = np.asarray(grid.p_wall)
    i1 = np.searchsorted(rw, r, side='right') - 1
    theta = np.arccos(np.clip(pos[2] / np.maximum(r, 1e-300), -1, 1))
    i2 = np.clip(np.searchsorted(tw, theta, side='right') - 1, 0, geo.n2 - 1)
    phi = np.arctan2(pos[1], pos[0]) % (2 * np.pi)
    i3 = np.clip(np.searchsorted(pw, phi, side='right') - 1, 0, geo.n3 - 1)
    inside = (i1 >= 0) & (i1 < geo.n1)
    expected = np.where(inside, (i3 * geo.n2 + i2) * geo.n1 + i1, -1)
    # Allow tiny mismatches for points within eps of a wall
    frac_same = np.mean(cell == expected)
    assert frac_same > 0.999


def test_escape_tau_uniform_sphere():
    # Optical depth from interior points to escape = chi * rho * chord length
    grid = make_grid(n_r=20, n_t=9, n_p=6, rmax=1.0)
    geo = build_spherical_geometry(grid, dtype=jnp.float64)
    rho_phys = 0.7
    chi = 1.3
    density = jnp.full((1, geo.n_cells), rho_phys * geo.length_scale,
                       dtype=jnp.float64)
    rng = np.random.RandomState(2)
    n = 2000
    # random interior points and directions
    u = rng.uniform(size=n)
    r = 0.9 * u ** (1 / 3)
    dirs = rng.normal(size=(3, n))
    dirs /= np.linalg.norm(dirs, axis=0)
    pts = rng.normal(size=(3, n))
    pts = pts / np.linalg.norm(pts, axis=0) * r
    x, y, z = [jnp.asarray(p) for p in pts]
    kx, ky, kz = [jnp.asarray(d) for d in dirs]
    cell = geo.find_cell(x, y, z, kx, ky, kz)
    assert int((cell < 0).sum()) == 0
    chi_rows = jnp.full((n, 1), chi, dtype=jnp.float64)
    active = jnp.ones(n, dtype=bool)
    tau = np.asarray(escape_tau_walk(geo, density, chi_rows, x, y, z,
                                     kx, ky, kz, cell, active))
    # chord length to sphere of radius 1 (engine units): -b + sqrt(b^2 - c)
    b = (pts * dirs).sum(axis=0)
    c = (pts ** 2).sum(axis=0) - 1.0
    chord = -b + np.sqrt(b * b - c)
    expected = chi * rho_phys * geo.length_scale * chord
    assert np.allclose(tau, expected, rtol=1e-10)


def test_spherical_lucy_inverse_square():
    grid = make_grid(n_r=16, n_t=7, n_p=5, rmax=1.0)
    geo = build_spherical_geometry(grid, dtype=jnp.float64)
    dust = IsotropicDust(np.logspace(5, 18, 20), np.repeat(0.0, 20),
                         np.repeat(1.0, 20))
    dt = build_dust_tables([dust], dtype=jnp.float64)
    st = build_source_tables([PointSource(luminosity=1.0, temperature=5000.0)],
                             dtype=jnp.float64, length_scale=geo.length_scale)
    rho = 1e-3
    density = jnp.full((1, geo.n_cells), rho * geo.length_scale,
                       dtype=jnp.float64)
    res = run_lucy(geo, dt, st, density, jax.random.PRNGKey(3),
                   n_photons=300000, n_iterations=1, batch_size=8192,
                   verbose=False)
    assert res.killed_geo == 0
    assert res.killed_int == 0
    se = res.specific_energy[0].reshape((geo.n3, geo.n2, geo.n1))
    # volume-averaged analytic expectation per radial shell:
    # <1/(4 pi r^2)> = 3 (r2 - r1) / (4 pi (r2^3 - r1^3))
    r1 = np.asarray(grid.r_wall[:-1])
    r2 = np.asarray(grid.r_wall[1:])
    expected_r = 3 * (r2 - r1) / (4 * np.pi * (r2 ** 3 - r1 ** 3))
    expected = np.broadcast_to(expected_r, se.shape)
    r_c = np.asarray(grid.gr)
    sel = (r_c > 0.1 * geo.length_scale) & (r_c < 0.9 * geo.length_scale)
    ratio = se[sel] / expected[sel]
    assert abs(np.median(ratio) - 1.0) < 0.03
    assert np.std(ratio) < 0.1


def test_spherical_offset_source_conservation():
    # Source off-center exercises cone/phi crossings from all incidence
    # angles; checks photon accounting and (thin) deposit consistency.
    grid = make_grid(n_r=12, n_t=8, n_p=6, rmax=1.0)
    geo = build_spherical_geometry(grid, dtype=jnp.float64)
    dust = IsotropicDust(np.logspace(5, 18, 20), np.repeat(0.5, 20),
                         np.repeat(1.0, 20))
    dt = build_dust_tables([dust], dtype=jnp.float64)
    src = PointSource(luminosity=1.0, temperature=5000.0,
                      position=(0.31, -0.22, 0.17))
    st = build_source_tables([src], dtype=jnp.float64,
                             length_scale=geo.length_scale)
    density = jnp.full((1, geo.n_cells), 0.3 * geo.length_scale,
                       dtype=jnp.float64)
    res = run_lucy(geo, dt, st, density, jax.random.PRNGKey(4),
                   n_photons=100000, n_iterations=1, batch_size=8192,
                   verbose=False)
    assert res.killed_geo == 0
    assert res.killed_int == 0
    assert np.isclose(res.energy_current, 100000.0)
    assert np.all(res.specific_energy >= 0)
    # every cell near the source should have been visited
    assert res.n_photons_cell.sum() > 0
