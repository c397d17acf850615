import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.grid import CartesianGrid
from hyperion_tpu.sources import PointSource
from hyperion_tpu.transport import (build_dust_tables,
                                    build_cartesian_geometry,
                                    build_source_tables, run_lucy)


def gray_dust(chi=1.0, albedo=0.0):
    nu = np.logspace(5, 18, 20)
    return IsotropicDust(nu, np.repeat(albedo, 20), np.repeat(chi, 20))


def setup_point_model(n=15, half=1.0, rho=1e-4, chi=1.0, albedo=0.0,
                      luminosity=1.0):
    grid = CartesianGrid(np.linspace(-half, half, n + 1),
                         np.linspace(-half, half, n + 1),
                         np.linspace(-half, half, n + 1))
    dust = gray_dust(chi=chi, albedo=albedo)
    source = PointSource(luminosity=luminosity, temperature=5000.0)
    geometry = build_cartesian_geometry(grid, dtype=jnp.float64)
    dt = build_dust_tables([dust], dtype=jnp.float64)
    st = build_source_tables([source], dtype=jnp.float64,
                             length_scale=geometry.length_scale)
    # engine units: density pre-multiplied by the geometry length scale
    density = jnp.full((1, grid.n_cells), rho * geometry.length_scale,
                       dtype=jnp.float64)
    return grid, geometry, dt, st, density


def test_optically_thin_inverse_square():
    # E(r) = kappa * L / (4 pi r^2) for optically thin dust around a point
    # source (the Lucy estimator's analytic limit).
    grid, geometry, dt, st, density = setup_point_model(
        n=15, rho=1e-4, chi=1.0, albedo=0.0, luminosity=1.0)
    res = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(7),
                   n_photons=200000, n_iterations=1, batch_size=8192,
                   verbose=False)
    se = res.specific_energy[0].reshape(grid.shape)
    r = np.sqrt(grid.gx ** 2 + grid.gy ** 2 + grid.gz ** 2)
    expected = 1.0 / (4 * np.pi * r ** 2)
    # Compare on a shell of cells away from center (avoid r~cell-size) and
    # away from corners (cell-averaging bias)
    sel = (r > 0.35) & (r < 0.75)
    ratio = se[sel] / expected[sel]
    assert res.killed_geo == 0
    assert abs(np.median(ratio) - 1.0) < 0.05
    assert np.std(ratio) < 0.25


def test_determinism():
    grid, geometry, dt, st, density = setup_point_model(n=7)
    r1 = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(3),
                  n_photons=20000, n_iterations=1, batch_size=4096,
                  verbose=False)
    r2 = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(3),
                  n_photons=20000, n_iterations=1, batch_size=4096,
                  verbose=False)
    assert np.array_equal(r1.specific_energy, r2.specific_energy)
    r3 = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(4),
                  n_photons=20000, n_iterations=1, batch_size=4096,
                  verbose=False)
    assert not np.array_equal(r1.specific_energy, r3.specific_energy)


def test_energy_current_counts_photons():
    grid, geometry, dt, st, density = setup_point_model(n=7)
    res = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(0),
                   n_photons=5000, n_iterations=1, batch_size=2048,
                   verbose=False)
    assert np.isclose(res.energy_current, 5000.0)
    assert res.killed_int == 0
    assert res.killed_geo == 0


def test_scattering_preserves_thin_absorption():
    # With albedo > 0 the *absorbed* energy per unit mass in the thin limit
    # is still kappa*L/(4 pi r^2) with kappa = chi*(1-albedo): scattering
    # redistributes but the absorption estimator uses kappa.
    grid, geometry, dt, st, density = setup_point_model(
        n=11, rho=1e-3, chi=1.0, albedo=0.5)
    res = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(11),
                   n_photons=200000, n_iterations=1, batch_size=8192,
                   verbose=False)
    se = res.specific_energy[0].reshape(grid.shape)
    r = np.sqrt(grid.gx ** 2 + grid.gy ** 2 + grid.gz ** 2)
    expected = 0.5 * 1.0 / (4 * np.pi * r ** 2)
    sel = (r > 0.35) & (r < 0.75)
    ratio = se[sel] / expected[sel]
    assert abs(np.median(ratio) - 1.0) < 0.07


def test_temperature_matches_dust_conversion():
    grid, geometry, dt, st, density = setup_point_model(n=7, half=1.5e13,
                                                        luminosity=3.8e33,
                                                        rho=1e-20, chi=10.0)
    res = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(5),
                   n_photons=30000, n_iterations=1, batch_size=4096,
                   verbose=False)
    from hyperion_tpu.util.constants import sigma
    # gray dust: E = 4 sigma T^4 kappa
    T = res.temperature[0]
    E = res.specific_energy[0]
    pos = E > 0
    assert np.allclose(E[pos], 4 * sigma * T[pos] ** 4 * 10.0, rtol=2e-2)


def test_n_photons_cell_unique_photon_dedup():
    """A single photon can count each cell at most once no matter how often
    it re-enters (ref last_photon_id dedup, grid_propagate_3d.f90:91-97)."""
    import jax
    import jax.numpy as jnp
    from hyperion_tpu.dust import IsotropicDust
    from hyperion_tpu.grid import CartesianGrid
    from hyperion_tpu.sources import PointSource
    from hyperion_tpu.transport import (build_dust_tables,
                                        build_cartesian_geometry,
                                        build_source_tables)
    from hyperion_tpu.transport.lucy import compute_jnu_var
    from hyperion_tpu.transport.engine import run_lucy_iteration

    nu = np.logspace(5, 18, 16)
    # pure scattering keeps one photon bouncing through many cells
    dust = IsotropicDust(nu, np.repeat(0.999, 16), np.repeat(1.0, 16))
    grid = CartesianGrid(np.linspace(-1, 1, 5), np.linspace(-1, 1, 5),
                         np.linspace(-1, 1, 5))
    geometry = build_cartesian_geometry(grid, dtype=jnp.float64)
    dt = build_dust_tables([dust], dtype=jnp.float64)
    st = build_source_tables([PointSource(luminosity=1.0,
                                          temperature=5000.0)],
                             dtype=jnp.float64)
    density = jnp.full((1, grid.n_cells), 3.0, dtype=jnp.float64)
    jid, jfrac = compute_jnu_var(dt, jnp.zeros_like(density))
    config = (('n_inter_max', 100000), ('kill_on_scatter', False),
              ('kill_on_absorb', False), ('max_steps', 100000))
    out = run_lucy_iteration(geometry, dt, st, density, jid, jfrac,
                             jax.random.PRNGKey(7), 1, 64, config)
    npc = np.asarray(out[2])
    assert npc.sum() >= 3          # it traversed several cells...
    assert npc.max() <= 1          # ...but never recounted one
