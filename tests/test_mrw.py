import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.grid import CartesianGrid
from hyperion_tpu.sources import PointSource
from hyperion_tpu.transport import (build_dust_tables,
                                    build_cartesian_geometry,
                                    build_source_tables, run_lucy)
from hyperion_tpu.transport.mrw import min09_cumulative


def test_min09_cumulative_props():
    x, P = min09_cumulative()
    assert P[0] == 0.0
    assert np.isclose(P[-1], 1.0)
    assert np.all(np.diff(P) >= 0)
    # median of the distribution (P(y)=0.5) lands near y ~ 0.25
    y_med = np.interp(0.5, P, x)
    assert 0.2 < y_med < 0.35


def setup_thick(rho=30.0, albedo=0.0, n=8):
    # tau across the box ~ 2*rho (chi=1, L=1): very optically thick center.
    # Cells must be several mean-free-paths across for the MRW to trigger.
    nu = np.logspace(5, 18, 20)
    dust = IsotropicDust(nu, np.repeat(albedo, 20), np.repeat(1.0, 20))
    grid = CartesianGrid(np.linspace(-1, 1, n + 1), np.linspace(-1, 1, n + 1),
                         np.linspace(-1, 1, n + 1))
    geometry = build_cartesian_geometry(grid, dtype=jnp.float64)
    dt = build_dust_tables([dust], dtype=jnp.float64)
    st = build_source_tables([PointSource(luminosity=1.0, temperature=500.0)],
                             dtype=jnp.float64,
                             length_scale=geometry.length_scale)
    density = jnp.full((1, geometry.n_cells), rho * geometry.length_scale,
                       dtype=jnp.float64)
    return grid, geometry, dt, st, density


def test_mrw_agrees_with_direct():
    # cells ~20 mean-free-paths across: the MRW regime
    grid, geometry, dt, st, density = setup_thick(rho=60.0, n=6)
    kw = dict(n_photons=2000, n_iterations=1, batch_size=2048, verbose=False)
    res_direct = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(1),
                          **kw)
    res_mrw = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(2),
                       use_mrw=True, mrw_gamma=1.0, **kw)
    # MRW must cut the step count substantially
    # tau_cell ~ 20 gives a modest win here; the MRW payoff grows with
    # tau_cell^2 (inner YSO cells reach 1e4+)
    assert res_mrw.n_steps < 0.85 * res_direct.n_steps
    # and agree on the temperature structure
    sel = res_direct.specific_energy > 0
    ratio = res_mrw.specific_energy[sel] / res_direct.specific_energy[sel]
    assert abs(np.median(ratio) - 1.0) < 0.1
    assert res_mrw.killed_int == 0


def test_mrw_very_thick_completes():
    # Without MRW this would need ~tau^2 ~ 1e4 steps per photon
    grid, geometry, dt, st, density = setup_thick(rho=100.0, n=8)
    res = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(3),
                   n_photons=2000, n_iterations=1, batch_size=1024,
                   use_mrw=True, mrw_gamma=1.0, max_steps=400000,
                   verbose=False)
    assert res.killed_int == 0
    assert np.isclose(res.energy_current, 2000.0)
    assert np.all(res.specific_energy[0] > 0)
