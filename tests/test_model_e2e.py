import numpy as np
import pytest

from hyperion_tpu.model import Model, ModelOutput
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.util.constants import lsun, au, c


def make_dust(chi=2.0, albedo=0.4):
    nu = np.logspace(5, 18, 30)
    return IsotropicDust(nu, np.repeat(albedo, 30), np.repeat(chi, 30))


def quickstart_model(tmp_path, n_photons=50000, rho=1e-16, albedo=0.4):
    m = Model()
    lim = 3 * au
    m.set_cartesian_grid(np.linspace(-lim, lim, 12),
                         np.linspace(-lim, lim, 12),
                         np.linspace(-lim, lim, 12))
    m.add_density_grid(np.full(m.grid.shape, rho), make_dust(albedo=albedo))
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 6000.0
    m.set_n_photons(initial=n_photons, imaging=n_photons)
    m.set_n_initial_iterations(1)
    sed = m.add_peeled_images(sed=True, image=False)
    sed.set_viewing_angles([45.0], [60.0])
    sed.set_wavelength_range(80, 0.1, 1000.0)
    m.write(str(tmp_path / 'quickstart.rtin'))
    return m


def test_quickstart_end_to_end(tmp_path):
    m = quickstart_model(tmp_path)
    out = m.run()

    # --- temperature grid sane ---
    grid = out.get_quantities()
    T = np.array(grid.quantities['temperature'][0])
    assert T.shape == m.grid.shape
    assert np.all(T > 0)
    # center cells are warmer than corner cells
    assert T[5, 5, 4] > T[0, 0, 0]

    # --- SED energy conservation: all emitted luminosity escapes ---
    sed = out.get_sed(inclination=0, aperture=0)
    assert sed.val.shape == (80,)
    dlognu = np.log(sed.nu[-1] / sed.nu[0]) / (len(sed.nu) - 1)
    total = np.sum(sed.val) * dlognu
    assert abs(total / lsun - 1.0) < 0.05

    # --- flux units / distance scaling ---
    from hyperion_tpu.util.constants import pc
    sed_flux = out.get_sed(inclination=0, aperture=0, distance=100 * pc)
    assert np.allclose(sed_flux.val,
                       sed.val / (4 * np.pi * (100 * pc) ** 2))
    out.close()


def test_quickstart_rtin_roundtrip(tmp_path):
    m = quickstart_model(tmp_path, n_photons=1000)
    m2 = Model.read(str(tmp_path / 'quickstart.rtin'))
    assert m2.grid.shape == m.grid.shape
    assert len(m2.sources) == 1
    assert np.isclose(m2.sources[0].luminosity, lsun)
    assert len(m2.dust) == 1
    assert np.allclose(m2.dust[0].optical_properties.chi,
                       m.dust[0].optical_properties.chi)
    assert len(m2.peeled_output) == 1
    assert m2.peeled_output[0].viewing_angles[0][0] == 45.0
    assert m2.n_photons['initial'] == 1000
    assert m2.n_iterations == 1


def test_scattered_image(tmp_path):
    # Pure scattering dust + kill_on_absorb: image totals ~ scattered light
    m = Model()
    lim = 3 * au
    m.set_cartesian_grid(np.linspace(-lim, lim, 10),
                         np.linspace(-lim, lim, 10),
                         np.linspace(-lim, lim, 10))
    m.add_density_grid(np.full(m.grid.shape, 1e-16), make_dust(albedo=0.9))
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 6000.0
    m.set_n_photons(initial=5000, imaging=30000)
    m.set_n_initial_iterations(1)
    m.set_kill_on_absorb(True)
    img = m.add_peeled_images(sed=False, image=True)
    img.set_viewing_angles([30.0], [0.0])
    img.set_image_size(32, 32)
    img.set_image_limits(-lim, lim, -lim, lim)
    img.set_wavelength_range(20, 0.1, 100.0)
    img.set_track_origin('basic')
    m.write(str(tmp_path / 'scat.rtin'))
    out = m.run()
    image = out.get_image(inclination=0)
    assert image.val.shape == (32, 32, 20)
    assert image.val.sum() > 0
    # component selection: scattered source light exists, dust_emit is small
    i_scat = out.get_image(inclination=0, component='source_scat')
    i_emit = out.get_image(inclination=0, component='source_emit')
    assert i_scat.val.sum() > 0
    assert i_emit.val.sum() > 0
    out.close()
