"""Propagation robustness: sources placed exactly at grid origins, vertices
and on walls must produce ZERO killed photons (the reference's de-facto
ray-walk correctness oracle, ref hyperion/model/tests/test_propagation.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.grid import (CartesianGrid, CylindricalPolarGrid,
                               SphericalPolarGrid)
from hyperion_tpu.sources import PointSource
from hyperion_tpu.transport import (build_dust_tables, build_source_tables,
                                    run_lucy)
from hyperion_tpu.transport.gtable import build_cartesian_geometry
from hyperion_tpu.transport.gtable_spherical import build_spherical_geometry
from hyperion_tpu.transport.gtable_cylindrical import build_cylindrical_geometry


def run_at(geo, position, n_photons=20000):
    dust = IsotropicDust(np.logspace(5, 18, 16), np.repeat(0.5, 16),
                         np.repeat(1.0, 16))
    dt = build_dust_tables([dust], dtype=jnp.float64)
    src = PointSource(luminosity=1.0, temperature=5000.0, position=position)
    st = build_source_tables([src], dtype=jnp.float64,
                             length_scale=geo.length_scale)
    density = jnp.full((1, geo.n_cells), 0.5 * geo.length_scale,
                       dtype=jnp.float64)
    # check_frequency > 0 makes the killed_geo == 0 assertions falsifiable:
    # the engine re-locates ~10% of steps from scratch and kills on mismatch
    res = run_lucy(geo, dt, st, density, jax.random.PRNGKey(0),
                   n_photons=n_photons, n_iterations=1, batch_size=4096,
                   check_frequency=0.1, verbose=False)
    return res


CAR_POSITIONS = [
    (0.0, 0.0, 0.0),          # grid center, on walls of 8 cells
    (-1.0, -1.0, -1.0),       # corner of the grid
    (0.0, 0.0, 1.0),          # on the top face
    (0.25, 0.0, 0.0),         # on two walls
    (1. / 3., 1. / 3., 1. / 3.),  # generic interior point
]


@pytest.mark.parametrize("position", CAR_POSITIONS)
def test_cartesian_robustness(position):
    grid = CartesianGrid(np.linspace(-1, 1, 9), np.linspace(-1, 1, 9),
                         np.linspace(-1, 1, 9))
    geo = build_cartesian_geometry(grid, dtype=jnp.float64)
    res = run_at(geo, position)
    assert res.killed_geo == 0
    assert res.killed_int == 0
    assert np.isclose(res.energy_current, 20000.0)


SPH_POSITIONS = [
    (0.0, 0.0, 0.0),          # origin (r=0 wall)
    (0.5, 0.0, 0.0),          # on the midplane and a phi wall
    (0.0, 0.0, 0.5),          # on the polar axis
    (0.0, 0.0, -0.25),        # on the polar axis, below
    (0.3, 0.3, 0.3),          # generic
]


@pytest.mark.parametrize("position", SPH_POSITIONS)
def test_spherical_robustness(position):
    grid = SphericalPolarGrid(np.hstack([0.0, np.logspace(-2, 0, 8)]),
                              np.linspace(0, np.pi, 7),
                              np.linspace(0, 2 * np.pi, 6))
    geo = build_spherical_geometry(grid, dtype=jnp.float64)
    res = run_at(geo, position)
    assert res.killed_geo == 0
    assert res.killed_int == 0
    assert np.isclose(res.energy_current, 20000.0)


CYL_POSITIONS = [
    (0.0, 0.0, 0.0),          # on the axis
    (0.5, 0.0, 0.0),          # on a phi wall
    (0.0, 0.0, 0.5),          # on the axis, above midplane
    (0.3, 0.2, -0.4),         # generic
]


@pytest.mark.parametrize("position", CYL_POSITIONS)
def test_cylindrical_robustness(position):
    grid = CylindricalPolarGrid(np.hstack([0.0, np.logspace(-2, 0, 8)]),
                                np.linspace(-1, 1, 7),
                                np.linspace(0, 2 * np.pi, 6))
    geo = build_cylindrical_geometry(grid, dtype=jnp.float64)
    res = run_at(geo, position)
    assert res.killed_geo == 0
    assert res.killed_int == 0
    assert np.isclose(res.energy_current, 20000.0)


def test_f32_robustness_spherical():
    """The same walk in f32 engine precision (TPU mode) must not lose
    more than a tiny fraction of packets."""
    grid = SphericalPolarGrid(np.hstack([0.0, np.logspace(-2, 0, 8)]),
                              np.linspace(0, np.pi, 7),
                              np.linspace(0, 2 * np.pi, 6))
    geo = build_spherical_geometry(grid, dtype=jnp.float32)
    dust = IsotropicDust(np.logspace(5, 18, 16), np.repeat(0.5, 16),
                         np.repeat(1.0, 16))
    dt = build_dust_tables([dust], dtype=jnp.float32)
    src = PointSource(luminosity=1.0, temperature=5000.0,
                      position=(0.3, 0.3, 0.3))
    st = build_source_tables([src], dtype=jnp.float32,
                             length_scale=geo.length_scale)
    density = jnp.full((1, geo.n_cells), 0.5 * geo.length_scale,
                       dtype=jnp.float32)
    res = run_lucy(geo, dt, st, density, jax.random.PRNGKey(1),
                   n_photons=50000, n_iterations=1, batch_size=4096,
                   check_frequency=0.1, verbose=False)
    assert res.killed_geo == 0
    assert res.killed_int == 0  # the reference's gate: zero killed, even f32
