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
    energy_sum, energy_current, n_photons_cell, killed, n_steps, _ = \
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


def test_spatial_pads_non_divisible_cells():
    """125 cells on 8 devices: the wrapper pads the cell axis; results keep
    the un-padded shape and conserve energy."""
    grid, geometry, dt, st, density = setup(n=5)  # 125 cells, not % 8
    mesh = make_mesh()
    jid, jfrac = compute_jnu_var(dt, jnp.zeros_like(density))
    out = run_lucy_iteration_spatial(mesh, geometry, dt, st, density, jid,
                                     jfrac, jax.random.PRNGKey(0), 5000, 512,
                                     CONFIG)
    energy_sum, energy_current, n_photons_cell, killed, n_steps, _ = \
        [np.asarray(o) for o in out]
    assert energy_sum.shape == (1, grid.n_cells)
    assert n_photons_cell.shape == (grid.n_cells,)
    assert energy_current == 5000
    assert killed == 0
    from hyperion_tpu.transport.engine import run_lucy_iteration
    ref = run_lucy_iteration(geometry, dt, st, density, jid, jfrac,
                             jax.random.PRNGKey(4), 5000, 4096, CONFIG)
    assert abs(energy_sum.sum() / np.asarray(ref[0]).sum() - 1.0) < 0.05


def _thick_shell_setup():
    """Optically thick shell + finite-radius source: exercises MRW and
    source re-absorption through the sharded path."""
    from hyperion_tpu.sources import SphericalSource
    from hyperion_tpu.grid import SphericalPolarGrid
    from hyperion_tpu.transport.gtable_spherical import \
        build_spherical_geometry
    nu = np.logspace(5, 18, 16)
    dust = IsotropicDust(nu, np.repeat(0.4, 16), np.repeat(3.0, 16))
    rw = np.hstack([0.0, np.logspace(-2, 0, 24)])
    tw = np.linspace(0.0, np.pi, 9)
    pw = np.array([0.0, 2 * np.pi])
    grid = SphericalPolarGrid(rw, tw, pw)
    geometry = build_spherical_geometry(grid, dtype=jnp.float64)
    dt = build_dust_tables([dust], dtype=jnp.float64)
    st = build_source_tables(
        [SphericalSource(luminosity=1.0, radius=5e-3, temperature=5000.)],
        dtype=jnp.float64, length_scale=geometry.length_scale)
    rho = np.zeros((1, grid.n_cells))
    rho[:] = 2.0   # tau ~ 3*2*1 = 6 across the shell, thicker inside
    density = jnp.asarray(rho, dtype=jnp.float64)
    return grid, geometry, dt, st, density


def test_spatial_mrw_reabs_matches_replicated():
    """MRW + source re-absorption through the sharded-grid path must agree
    with the replicated engine (VERDICT r3 item 6: sharded-grid mode runs a
    thick MRW workload)."""
    assert jax.device_count() == 8
    from hyperion_tpu.transport.mrw import prepare_mrw_tables
    grid, geometry, dt, st, density = _thick_shell_setup()
    mesh = make_mesh()
    se0 = jnp.full_like(density, 1e-2)
    jid, jfrac = compute_jnu_var(dt, se0)
    mrw = prepare_mrw_tables(dt, density, se0, 2.0, jnp.float64)
    config = CONFIG + (('source_intersect', True), ('n_reabs_max', 50),
                       ('n_mrw_max', 100000))
    n_ph = 20000
    out = run_lucy_iteration_spatial(mesh, geometry, dt, st, density, jid,
                                     jfrac, jax.random.PRNGKey(7), n_ph,
                                     512, config, mrw=mrw)
    energy_sum, energy_current, n_photons_cell, killed, n_steps, _ = \
        [np.asarray(o) for o in out]
    assert energy_current == n_ph
    assert killed == 0

    from hyperion_tpu.transport.engine import run_lucy_iteration
    ref = run_lucy_iteration(geometry, dt, st, density, jid, jfrac,
                             jax.random.PRNGKey(8), n_ph, 4096, config,
                             mrw=mrw)
    es_ref = np.asarray(ref[0])
    assert abs(energy_sum.sum() / es_ref.sum() - 1.0) < 0.03
    sel = es_ref > np.percentile(es_ref, 60)
    ratio = energy_sum[sel] / es_ref[sel]
    assert abs(np.median(ratio) - 1.0) < 0.08


def test_run_model_shard_grid(tmp_path):
    """shard_grid reaches the product path: run_model distributes the grid
    for the Lucy stage and writes a normal rtout."""
    import h5py
    from hyperion_tpu.model import Model
    from hyperion_tpu.model.run import run_model
    from hyperion_tpu.util.constants import au, lsun

    nu = np.logspace(np.log10(3e10), np.log10(5e16), 16)
    dust = IsotropicDust(nu, np.repeat(0.4, 16), np.repeat(50.0, 16))
    dust.set_lte_emissivities(n_temp=30, temp_min=0.1, temp_max=1600.)
    m = Model()
    x = np.linspace(-au, au, 7)   # 6^3 = 216 cells = 27 per device
    m.set_cartesian_grid(x, x, x)
    m.add_density_grid(np.full((6, 6, 6), 3e-18), dust)
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 5500.
    m.set_n_photons(initial=4000, imaging=0)
    m.set_n_initial_iterations(2)
    m.set_copy_input(False)
    rtin = str(tmp_path / 'sg.rtin')
    rtout = str(tmp_path / 'sg.rtout')
    m.write(rtin)
    m2 = Model.read(rtin)
    run_model(m2, rtout, parallel=True, shard_grid=True, batch_size=512)
    with h5py.File(rtout, 'r') as f:
        se = np.array(f['iteration_00002']['specific_energy'])
    assert se.shape == (1, 6, 6, 6)
    assert (se > 0).mean() > 0.95
