"""Source re-absorption (ref: iter_lucy.f90:147-185, find_nearest_source
source.f90:206-227): photons whose path crosses a spherical source's surface
are re-absorbed by it and re-emitted (keeping their energy) up to
n_reabs_max successive times."""

import numpy as np
import jax
import jax.numpy as jnp

from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.grid import CartesianGrid
from hyperion_tpu.sources import SphericalSource
from hyperion_tpu.transport import (build_dust_tables,
                                    build_cartesian_geometry,
                                    build_source_tables, run_lucy)
from hyperion_tpu.transport.stable import nearest_source_intersection


def gray_dust(chi=1.0, albedo=0.0):
    nu = np.logspace(5, 18, 20)
    return IsotropicDust(nu, np.repeat(albedo, 20), np.repeat(chi, 20))


def setup_sphere_model(n=15, half=1.0, rho=1e-4, chi=1.0, albedo=0.0,
                       radius=0.1):
    grid = CartesianGrid(np.linspace(-half, half, n + 1),
                         np.linspace(-half, half, n + 1),
                         np.linspace(-half, half, n + 1))
    dust = gray_dust(chi=chi, albedo=albedo)
    source = SphericalSource(luminosity=1.0, temperature=5000.0,
                             radius=radius)
    geometry = build_cartesian_geometry(grid, dtype=jnp.float64)
    dt = build_dust_tables([dust], dtype=jnp.float64)
    st = build_source_tables([source], dtype=jnp.float64,
                             length_scale=geometry.length_scale)
    density = jnp.full((1, grid.n_cells), rho * geometry.length_scale,
                       dtype=jnp.float64)
    return grid, geometry, dt, st, density


def test_nearest_source_intersection_geometry():
    _, _, _, st, _ = setup_sphere_model(radius=0.1)
    x = jnp.asarray([0.5, 0.5, 0.5, 0.1])
    y = jnp.asarray([0.0, 0.0, 0.5, 0.0])
    z = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    kx = jnp.asarray([-1.0, 1.0, -1.0, 1.0])
    ky = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    kz = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    t, row = nearest_source_intersection(st, x, y, z, kx, ky, kz)
    t = np.asarray(t)
    # toward the sphere: hits at 0.5 - 0.1
    assert np.isclose(t[0], 0.4, rtol=1e-6)
    # away from the sphere: no hit
    assert t[1] > 1e30
    # offset ray missing the sphere entirely
    assert t[2] > 1e30
    # starting exactly on the surface moving outward: excluded
    assert t[3] > 1e30


def test_sphere_source_inverse_square_no_self_absorption():
    # Optically thin medium: a spherical source must still produce the
    # 1/r^2 profile far from its surface, with NO photons spuriously
    # re-absorbed at emission (the f32/f64 surface-epsilon guard).
    grid, geometry, dt, st, density = setup_sphere_model(
        n=15, rho=1e-4, chi=1.0, albedo=0.0, radius=0.05)
    res = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(5),
                   n_photons=100000, n_iterations=1, batch_size=8192,
                   n_reabs_max=1000000, verbose=False)
    assert res.killed_int == 0
    assert res.killed_geo == 0
    se = res.specific_energy[0].reshape(grid.shape)
    r = np.sqrt(grid.gx ** 2 + grid.gy ** 2 + grid.gz ** 2)
    expected = 1.0 / (4 * np.pi * r ** 2)
    sel = (r > 0.35) & (r < 0.75)
    ratio = se[sel] / expected[sel]
    assert abs(np.median(ratio) - 1.0) < 0.05


def test_reabs_max_zero_kills_returning_photons():
    # A big source (radius 0.3) inside a scattering medium: many scattered
    # photons re-enter the source. With n_reabs_max=0 they must be killed
    # (ref: ia == n_reabs_max + 1 -> killed, iter_lucy.f90:177-183).
    grid, geometry, dt, st, density = setup_sphere_model(
        n=11, rho=2.0, chi=1.0, albedo=0.9, radius=0.3)
    res = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(9),
                   n_photons=5000, n_iterations=1, batch_size=2048,
                   n_reabs_max=0, verbose=False)
    assert res.killed_int > 0
    assert res.killed_geo == 0


def test_reabsorbed_photons_reemitted_and_conserved():
    # Same thick scattering model but with re-emission allowed: nothing is
    # killed and every budgeted photon is accounted for.
    grid, geometry, dt, st, density = setup_sphere_model(
        n=11, rho=2.0, chi=1.0, albedo=0.9, radius=0.3)
    res = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(9),
                   n_photons=5000, n_iterations=1, batch_size=2048,
                   n_reabs_max=1000000, verbose=False)
    assert res.killed_int == 0
    assert res.killed_geo == 0
    assert np.isclose(res.energy_current, 5000.0)
    # re-emission redistributes energy: deposits must be finite, positive
    assert np.all(np.isfinite(res.specific_energy))
    assert res.specific_energy.max() > 0
