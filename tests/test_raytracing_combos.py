"""Raytracing combined with filter imaging and inside observers
(ref: iter_raytracing.f90 + images_peeled.f90:176-213 sky projection and
:264-282 filter convolution — the reference supports both combinations)."""

import numpy as np
import pytest

from hyperion_tpu.model import Model
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.filter import Filter
from hyperion_tpu.util.constants import lsun, au, c


def _base_model():
    nu = np.logspace(5, 18, 30)
    dust = IsotropicDust(nu, np.repeat(0.3, 30), np.repeat(2.0, 30))
    m = Model()
    lim = 3 * au
    m.set_cartesian_grid(np.linspace(-lim, lim, 10),
                        np.linspace(-lim, lim, 10),
                        np.linspace(-lim, lim, 10))
    m.add_density_grid(np.full(m.grid.shape, 5e-17), dust)
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 6000.0
    m.set_raytracing(True)
    m.set_n_photons(initial=20000, imaging=20000,
                    raytracing_sources=10000, raytracing_dust=10000)
    m.set_n_initial_iterations(2)
    return m


def _tophat_filter(wav_center_um, width_frac=0.2, n=50):
    nu0 = c / (wav_center_um * 1e-4)
    nu = np.linspace(nu0 * (1 - width_frac), nu0 * (1 + width_frac), n)
    f = Filter(name='F%g' % wav_center_um, nu=nu, transmission=np.ones(n))
    f.detector_type = 'energy'
    f.alpha = 1.0
    f.central_nu = nu0
    return f


def test_raytracing_with_filters(tmp_path):
    """Filter-channel fluxes from the raytraced pass must approximate the
    log-binned SED integrated over the same band."""
    # reference run: plain wavelength grid
    m = _base_model()
    sed = m.add_peeled_images(sed=True, image=False)
    sed.set_viewing_angles([40.0], [10.0])
    sed.set_wavelength_range(120, 0.1, 1500.0)
    m.write(str(tmp_path / 'plain.rtin'))
    out = m.run()
    s0 = out.get_sed(inclination=0, aperture=0, units='ergs/s')
    out.close()

    # filter run at 100 um (thermal, raytraced-dust dominated)
    m2 = _base_model()
    img = m2.add_peeled_images(sed=False, image=True)
    img.set_viewing_angles([40.0], [10.0])
    img.set_image_size(11, 11)
    lim = 4 * au
    img.set_image_limits(-lim, lim, -lim, lim)
    src = _tophat_filter(100.0)
    filt = img.add_filter()
    filt.name = src.name
    filt.nu = src.nu
    filt.transmission = src.transmission
    filt.central_nu = src.central_nu
    filt.alpha = src.alpha
    filt.detector_type = src.detector_type
    m2.write(str(tmp_path / 'filt.rtin'))
    out2 = m2.run()
    i0 = out2.get_image(inclination=0, units='ergs/s')
    out2.close()

    # total channel flux = spectrum folded with the tophat: compare against
    # integrating the plain nu*Fnu SED over the filter band
    fch = float(np.sum(i0.val))
    nu0 = c / (100.0 * 1e-4)
    band = (s0.nu > nu0 * 0.8) & (s0.nu < nu0 * 1.2)
    # s0.val is nu*Fnu per log bin; the energy-detector tophat filter
    # measures mean Fnu*nu0-ish — agreement within a factor reflecting the
    # band shape; gate loosely (the point is wiring, not absolute calib)
    band_mean = float(np.mean(s0.val[band]))
    assert fch > 0
    assert abs(np.log10(fch / band_mean)) < 0.5, (fch, band_mean)


def test_raytracing_with_inside_observer(tmp_path):
    """An inside observer at the grid center with raytracing sees the
    (unresolved) central source in its all-sky image, plus thermal dust."""
    m = _base_model()
    img = m.add_peeled_images(sed=False, image=True)
    img.set_inside_observer((0.5 * au, 0., 0.))
    img.set_viewing_angles([90.0], [0.0])
    img.set_image_size(20, 10)
    img.set_image_limits(180., -180., -90., 90.)
    img.set_wavelength_range(30, 0.1, 1500.0)
    m.write(str(tmp_path / 'inside.rtin'))
    out = m.run()
    i0 = out.get_image(inclination=0)
    out.close()
    total = float(np.sum(i0.val))
    assert total > 0
    # the direct stellar image is concentrated in few pixels: peak pixel
    # (summed over nu) should dominate its row
    img_nu = i0.val.sum(axis=-1)
    assert img_nu.max() > 0.2 * img_nu.sum()
