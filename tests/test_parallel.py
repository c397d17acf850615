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
        n_steps, _spec, _ev = [np.asarray(o) for o in out]
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


def test_run_model_parallel_e2e(tmp_path):
    """Full product path on the 8-virtual-device mesh: Model.run with
    parallel honored for Lucy AND imaging, compared statistically against
    the single-device run (ref: the MPI binaries produce the same results
    as serial by construction; here the psum reduction does)."""
    from hyperion_tpu.model import Model
    from hyperion_tpu.model.run import run_model
    import h5py

    nu = np.logspace(8, 18, 24)
    dust = IsotropicDust(nu, np.repeat(0.4, 24), np.repeat(2.0e4, 24))
    dust.write(str(tmp_path / 'd.hdf5'))

    def build():
        from hyperion_tpu.util.constants import pc, lsun
        m = Model()
        x = np.linspace(-pc, pc, 6)
        m.set_cartesian_grid(x, x, x)
        m.add_density_grid(np.ones((5, 5, 5)) * 2e-23, str(tmp_path / 'd.hdf5'))
        s = m.add_point_source()
        s.luminosity = lsun
        s.temperature = 5000.
        i = m.add_peeled_images()
        i.set_wavelength_range(3, 0.1, 100.)
        i.set_viewing_angles([60.], [45.])
        i.set_image_size(4, 4)
        i.set_image_limits(-pc, pc, -pc, pc)
        i.set_aperture_radii(1, pc, pc)
        m.set_n_photons(initial=40000, imaging=40000)
        return m

    m = build()
    m.write(str(tmp_path / 'm.rtin'))
    run_model(m, str(tmp_path / 'single.rtout'), parallel=False)
    m2 = build()
    m2.write(str(tmp_path / 'm2.rtin'))
    run_model(m2, str(tmp_path / 'par.rtout'), parallel=8)

    with h5py.File(str(tmp_path / 'single.rtout')) as f1, \
            h5py.File(str(tmp_path / 'par.rtout')) as f2:
        se1 = f1['iteration_00005/specific_energy'][:]
        se2 = f2['iteration_00005/specific_energy'][:]
        ratio = se2[se1 > 0] / se1[se1 > 0]
        assert abs(np.median(ratio) - 1.0) < 0.05
        s1 = f1['Peeled/group_00001/seds'][:]
        s2 = f2['Peeled/group_00001/seds'][:]
        ok = s1 > 0
        assert ok.any()
        r = s2[ok] / s1[ok]
        # SEDs are noisy per bin; totals must agree well
        assert abs(s2.sum() / s1.sum() - 1.0) < 0.1
        assert np.median(np.abs(np.log10(np.maximum(r, 1e-30)))) < 0.2


def test_run_model_parallel_mono_and_raytracing(tmp_path):
    """Monochromatic and raytracing stages also honor the mesh."""
    from hyperion_tpu.model import Model
    from hyperion_tpu.model.run import run_model
    import h5py

    nu = np.logspace(8, 18, 24)
    dust = IsotropicDust(nu, np.repeat(0.4, 24), np.repeat(2.0e4, 24))
    dust.write(str(tmp_path / 'd.hdf5'))

    def build(mono):
        from hyperion_tpu.util.constants import pc, lsun
        m = Model()
        x = np.linspace(-pc, pc, 6)
        m.set_cartesian_grid(x, x, x)
        m.add_density_grid(np.ones((5, 5, 5)) * 2e-23,
                           str(tmp_path / 'd.hdf5'))
        s = m.add_point_source()
        s.luminosity = lsun
        s.temperature = 5000.
        i = m.add_peeled_images()
        if mono:
            m.set_monochromatic(True, wavelengths=[1.0, 10.0])
            i.set_wavelength_index_range(0, 1)
            m.set_n_photons(initial=20000, imaging_sources=20000,
                            imaging_dust=20000)
        else:
            i.set_wavelength_range(3, 0.1, 100.)
            m.set_raytracing(True)
            m.set_n_photons(initial=20000, imaging=20000,
                            raytracing_sources=20000, raytracing_dust=20000)
        i.set_viewing_angles([60.], [45.])
        i.set_image_size(4, 4)
        i.set_image_limits(-pc, pc, -pc, pc)
        i.set_aperture_radii(1, pc, pc)
        return m

    for mono in (True, False):
        m1 = build(mono)
        m1.write(str(tmp_path / ('a%s.rtin' % mono)))
        run_model(m1, str(tmp_path / ('a%s.rtout' % mono)), parallel=False)
        m2 = build(mono)
        m2.write(str(tmp_path / ('b%s.rtin' % mono)))
        run_model(m2, str(tmp_path / ('b%s.rtout' % mono)), parallel=8)
        with h5py.File(str(tmp_path / ('a%s.rtout' % mono))) as f1, \
                h5py.File(str(tmp_path / ('b%s.rtout' % mono))) as f2:
            s1 = f1['Peeled/group_00001/seds'][:]
            s2 = f2['Peeled/group_00001/seds'][:]
            assert s2.sum() > 0
            assert abs(s2.sum() / s1.sum() - 1.0) < 0.1, \
                "mono=%s total flux mismatch" % mono
