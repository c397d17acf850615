"""Flux-unit conversions in get_sed/get_image (ref model/tests/test_sed.py
+ test_image.py unit matrices): all units must be mutually consistent and
energy-conserving."""

import numpy as np
import pytest

from hyperion_tpu.model import Model
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.util.constants import au, lsun, pc, pi, c


@pytest.fixture(scope='module')
def run_output(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('units')
    nu = np.logspace(5, 18, 16)
    dust = IsotropicDust(nu, np.repeat(0.3, 16), np.repeat(1.0, 16))
    m = Model()
    lim = 3 * au
    m.set_cartesian_grid(np.linspace(-lim, lim, 8),
                         np.linspace(-lim, lim, 8),
                         np.linspace(-lim, lim, 8))
    m.add_density_grid(np.full(m.grid.shape, 1e-21), dust)
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 6000.0
    img = m.add_peeled_images(sed=True, image=True)
    img.set_viewing_angles([30.], [20.])
    img.set_image_size(16, 16)
    # generous limits: every grid corner projects inside the image,
    # so pixel sums equal the large-aperture SED
    img.set_image_limits(-2 * lim, 2 * lim, -2 * lim, 2 * lim)
    img.set_wavelength_range(8, 0.3, 300.)
    img.set_aperture_radii(1, lim * 10, lim * 10)
    m.set_n_photons(initial=10000, imaging=10000)
    m.set_n_initial_iterations(1)
    m.write(str(tmp / 'u.rtin'))
    return m.run()


def test_sed_unit_consistency(run_output):
    out = run_output
    d = 100 * pc
    ergs_s = out.get_sed(inclination=0, aperture=-1, units='ergs/s')
    ergs_cm2 = out.get_sed(inclination=0, aperture=-1, units='ergs/cm^2/s',
                           distance=d)
    fnu = out.get_sed(inclination=0, aperture=-1, units='ergs/cm^2/s/Hz',
                      distance=d)
    jy = out.get_sed(inclination=0, aperture=-1, units='Jy', distance=d)
    mjy = out.get_sed(inclination=0, aperture=-1, units='mJy', distance=d)
    # nuFnu at distance = L_nu_binned / 4 pi d^2
    np.testing.assert_allclose(ergs_cm2.val,
                               ergs_s.val / (4 * pi * d ** 2), rtol=1e-10)
    np.testing.assert_allclose(fnu.val, ergs_cm2.val / np.asarray(fnu.nu),
                               rtol=1e-10)
    np.testing.assert_allclose(jy.val, fnu.val * 1e23, rtol=1e-10)
    np.testing.assert_allclose(mjy.val, jy.val * 1e3, rtol=1e-10)


def test_sed_requires_distance_for_flux_units(run_output):
    with pytest.raises(ValueError, match="distance"):
        run_output.get_sed(inclination=0, aperture=-1, units='Jy')


def test_image_unit_consistency(run_output):
    out = run_output
    d = 100 * pc
    ergs_s = out.get_image(inclination=0, units='ergs/s')
    jy = out.get_image(inclination=0, units='Jy', distance=d)
    np.testing.assert_allclose(
        jy.val, ergs_s.val / np.asarray(jy.nu)[None, None, :] * 1e23 /
        (4 * pi * d ** 2), rtol=1e-10)


def test_image_surface_brightness(run_output):
    """MJy/sr: integrating surface brightness over pixel solid angles
    recovers the total Jy flux (ref model_output.py:794-797)."""
    out = run_output
    d = 100 * pc
    sb = out.get_image(inclination=0, units='MJy/sr', distance=d)
    jy = out.get_image(inclination=0, units='Jy', distance=d)
    nx, ny = sb.val.shape[1], sb.val.shape[0]
    pix_sr = (sb.x_max - sb.x_min) / nx * (sb.y_max - sb.y_min) / ny / d ** 2
    np.testing.assert_allclose(sb.val.sum(axis=(0, 1)) * pix_sr * 1e6,
                               jy.val.sum(axis=(0, 1)), rtol=1e-8)
    with pytest.raises(ValueError, match="distance"):
        out.get_image(inclination=0, units='MJy/sr')


def test_image_total_matches_sed(run_output):
    """Summing the image over pixels recovers the large-aperture SED."""
    out = run_output
    img = out.get_image(inclination=0, units='ergs/s')
    sed = out.get_sed(inclination=0, aperture=-1, units='ergs/s')
    np.testing.assert_allclose(img.val.sum(axis=(0, 1)), sed.val, rtol=1e-5)
