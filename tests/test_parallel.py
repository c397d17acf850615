import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.grid import CartesianGrid
from hyperion_tpu.sources import PointSource
from hyperion_tpu.transport import (build_dust_tables,
                                    build_cartesian_geometry,
                                    build_source_tables)
from hyperion_tpu.transport.lucy import compute_jnu_var
from hyperion_tpu.parallel import make_mesh, run_lucy_iteration_sharded


def setup():
    nu = np.logspace(5, 18, 20)
    dust = IsotropicDust(nu, np.repeat(0.3, 20), np.repeat(1.0, 20))
    n = 11
    grid = CartesianGrid(np.linspace(-1, 1, n + 1), np.linspace(-1, 1, n + 1),
                         np.linspace(-1, 1, n + 1))
    geometry = build_cartesian_geometry(grid, dtype=jnp.float64)
    dt = build_dust_tables([dust], dtype=jnp.float64)
    st = build_source_tables([PointSource(luminosity=1.0, temperature=5000.0)],
                             dtype=jnp.float64)
    density = jnp.full((1, grid.n_cells), 2e-1, dtype=jnp.float64)
    return grid, geometry, dt, st, density


CONFIG = (('n_inter_max', 1000), ('kill_on_scatter', False),
          ('kill_on_absorb', False), ('max_steps', 100000))


def test_sharded_lucy_8_devices():
    assert jax.device_count() == 8
    grid, geometry, dt, st, density = setup()
    mesh = make_mesh()
    jid, jfrac = compute_jnu_var(dt, jnp.zeros_like(density))
    out = run_lucy_iteration_sharded(mesh, geometry, dt, st, density, jid,
                                     jfrac, jax.random.PRNGKey(5), 80000,
                                     2048, CONFIG)
    energy_sum, energy_current, n_photons_cell, killed_int, killed_geo, \
        n_steps = [np.asarray(o) for o in out]
    assert np.isclose(energy_current, 80000.0)
    assert killed_int == 0 and killed_geo == 0

    # Statistical agreement with the single-device engine
    from hyperion_tpu.transport.engine import run_lucy_iteration
    out1 = run_lucy_iteration(geometry, dt, st, density, jid, jfrac,
                              jax.random.PRNGKey(6), 80000, 4096, CONFIG)
    es1 = np.asarray(out1[0])
    sel = es1 > 0
    ratio = energy_sum[sel] / es1[sel]
    assert abs(np.median(ratio) - 1.0) < 0.05


def test_sharded_deterministic():
    grid, geometry, dt, st, density = setup()
    mesh = make_mesh()
    jid, jfrac = compute_jnu_var(dt, jnp.zeros_like(density))
    a = run_lucy_iteration_sharded(mesh, geometry, dt, st, density, jid,
                                   jfrac, jax.random.PRNGKey(5), 20000,
                                   1024, CONFIG)
    b = run_lucy_iteration_sharded(mesh, geometry, dt, st, density, jid,
                                   jfrac, jax.random.PRNGKey(5), 20000,
                                   1024, CONFIG)
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
