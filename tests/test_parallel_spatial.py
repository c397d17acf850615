"""Spatially sharded grid + ppermute packet exchange (the north-star
extension beyond the reference's replicated-memory MPI design; SURVEY §7
step 6). Deposits must match the replicated path statistically and conserve
energy exactly."""

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
from hyperion_tpu.parallel import make_mesh
from hyperion_tpu.parallel.spatial import run_lucy_iteration_spatial

CONFIG = (('n_inter_max', 100000), ('kill_on_scatter', False),
          ('kill_on_absorb', False), ('max_steps', 100000))


def setup(n=8):
    nu = np.logspace(5, 18, 16)
    dust = IsotropicDust(nu, np.repeat(0.4, 16), np.repeat(1.0, 16))
    grid = CartesianGrid(np.linspace(-1, 1, n + 1), np.linspace(-1, 1, n + 1),
                         np.linspace(-1, 1, n + 1))
    geometry = build_cartesian_geometry(grid, dtype=jnp.float64)
    dt = build_dust_tables([dust], dtype=jnp.float64)
    st = build_source_tables([PointSource(luminosity=1.0, temperature=5000.)],
                             dtype=jnp.float64)
    density = jnp.full((1, grid.n_cells), 0.4, dtype=jnp.float64)
    return grid, geometry, dt, st, density


def test_spatial_deposits_match_replicated():
    assert jax.device_count() == 8
    grid, geometry, dt, st, density = setup()
    mesh = make_mesh()
    jid, jfrac = compute_jnu_var(dt, jnp.zeros_like(density))
    n_ph = 20000
    out = run_lucy_iteration_spatial(mesh, geometry, dt, st, density, jid,
                                     jfrac, jax.random.PRNGKey(3), n_ph,
                                     512, CONFIG)
    energy_sum, energy_current, n_photons_cell, killed, n_steps = \
        [np.asarray(o) for o in out]
    # every photon was emitted, none lost in transit
    assert energy_current == n_ph
    assert killed == 0
    assert energy_sum.shape == (1, grid.n_cells)
    assert n_photons_cell.shape == (grid.n_cells,)

    from hyperion_tpu.transport.engine import run_lucy_iteration
    ref = run_lucy_iteration(geometry, dt, st, density, jid, jfrac,
                             jax.random.PRNGKey(4), n_ph, 4096, CONFIG)
    es_ref = np.asarray(ref[0])
    # total absorbed energy agrees to MC noise
    assert abs(energy_sum.sum() / es_ref.sum() - 1.0) < 0.02
    # per-cell agreement where statistics are decent
    sel = es_ref > np.percentile(es_ref, 60)
    ratio = energy_sum[sel] / es_ref[sel]
    assert abs(np.median(ratio) - 1.0) < 0.05
    # deposits land on every device's slab (not just the source's)
    slab = grid.n_cells // 8
    per_slab = energy_sum.reshape(1, 8, slab).sum(axis=(0, 2))
    assert np.all(per_slab > 0)


def test_spatial_requires_divisible_cells():
    grid, geometry, dt, st, density = setup(n=5)  # 125 cells, not % 8
    mesh = make_mesh()
    jid, jfrac = compute_jnu_var(dt, jnp.zeros_like(density))
    with pytest.raises(ValueError, match="n_cells"):
        run_lucy_iteration_spatial(mesh, geometry, dt, st, density, jid,
                                   jfrac, jax.random.PRNGKey(0), 100, 64,
                                   CONFIG)
