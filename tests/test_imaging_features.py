"""Peeled-imaging feature matrix: filters, depth cuts, ignore_optical_depth,
inside observers, and detailed/scatterings origin tracking.

Reference semantics: filters image_type.f90:264-282,467-470; depth cuts
images_peeled.f90:154-167; inside observers images_peeled.f90:176-238;
origin slices image_type.f90:228-241,443-461.
"""

import numpy as np
import pytest

from hyperion_tpu.model import Model
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.util.constants import lsun, au, pc, c


def make_dust(chi=2.0, albedo=0.4):
    nu = np.logspace(5, 18, 30)
    return IsotropicDust(nu, np.repeat(albedo, 30), np.repeat(chi, 30))


def base_model(tmp_path, rho=1e-18, n_photons=40000, sources=1,
               albedo=0.4):
    m = Model()
    lim = 3 * au
    m.set_cartesian_grid(np.linspace(-lim, lim, 12),
                         np.linspace(-lim, lim, 12),
                         np.linspace(-lim, lim, 12))
    m.add_density_grid(np.full(m.grid.shape, rho), make_dust(albedo=albedo))
    for i in range(sources):
        s = m.add_point_source()
        s.luminosity = lsun * (i + 1)
        s.temperature = 6000.0
        s.position = (0.0, 0.0, 0.0)
    m.set_n_photons(initial=n_photons, imaging=n_photons)
    m.set_n_initial_iterations(1)
    return m


def sed_total(sed):
    dlognu = np.log(sed.nu[-1] / sed.nu[0]) / (len(sed.nu) - 1)
    return np.sum(sed.val) * dlognu


def test_track_origin_detailed(tmp_path):
    m = base_model(tmp_path, sources=2)
    conf = m.add_peeled_images(sed=True, image=False)
    conf.set_viewing_angles([45.0], [60.0])
    conf.set_wavelength_range(40, 0.1, 1000.0)
    conf.set_track_origin('detailed')
    m.write(str(tmp_path / 'm.rtin'))
    out = m.run()
    tot = sed_total(out.get_sed(inclination=0, aperture=0))
    s0 = sed_total(out.get_sed(inclination=0, aperture=0,
                               component='source_emit', source_id=0))
    s1 = sed_total(out.get_sed(inclination=0, aperture=0,
                               component='source_emit', source_id=1))
    d_emit = sed_total(out.get_sed(inclination=0, aperture=0,
                                   component='dust_emit', dust_id=0))
    s_scat = sed_total(out.get_sed(inclination=0, aperture=0,
                                   component='source_scat'))
    d_scat = sed_total(out.get_sed(inclination=0, aperture=0,
                                   component='dust_scat'))
    # components add up to the total
    assert abs((s0 + s1 + d_emit + s_scat + d_scat) / tot - 1) < 1e-6
    # the 2x-luminosity source contributes ~2x the direct flux
    assert abs(s1 / s0 - 2.0) < 0.15
    # energy conservation overall (optically thin)
    assert abs(tot / (3 * lsun) - 1.0) < 0.05
    out.close()


def test_track_origin_scatterings(tmp_path):
    m = base_model(tmp_path, rho=1e-17)
    conf = m.add_peeled_images(sed=True, image=False)
    conf.set_viewing_angles([45.0], [60.0])
    conf.set_wavelength_range(40, 0.1, 1000.0)
    conf.set_track_origin('scatterings', n_scat=2)
    m.write(str(tmp_path / 'm.rtin'))
    out = m.run()
    tot = sed_total(out.get_sed(inclination=0, aperture=0))
    src = sed_total(out.get_sed(inclination=0, aperture=0,
                                component='source'))
    dust = sed_total(out.get_sed(inclination=0, aperture=0,
                                 component='dust'))
    assert abs((src + dust) / tot - 1) < 1e-6
    # unscattered source light dominates in the thin regime
    s0 = sed_total(out.get_sed(inclination=0, aperture=0,
                               component='source', n_scat=0))
    s1 = sed_total(out.get_sed(inclination=0, aperture=0,
                               component='source', n_scat=1))
    assert s0 > 5 * s1 > 0.0
    out.close()


def test_filter_convolution(tmp_path):
    # Source with F_nu ~ 1/nu (flat nu*F_nu): a boxcar filter with alpha=-1
    # must return nu0*F_nu(nu0) = L / ln(nu_hi/nu_lo) exactly in expectation
    m = base_model(tmp_path, rho=1e-30, n_photons=30000)
    nu_lo, nu_hi = 1e12, 1e16
    spec_nu = np.logspace(np.log10(nu_lo), np.log10(nu_hi), 100)
    m.sources[0].temperature = None
    m.sources[0].spectrum = (spec_nu, 1.0 / spec_nu)
    conf = m.add_peeled_images(sed=True, image=False)
    conf.set_viewing_angles([30.0], [20.0])
    fnu = np.logspace(13.0, 14.0, 50)
    filt = conf.add_filter()
    filt.name = 'box'
    filt.nu = fnu
    filt.transmission = np.ones_like(fnu)
    filt.central_nu = 10.0 ** 13.5
    filt.alpha = -1.0
    filt.detector_type = 'energy'
    m.write(str(tmp_path / 'm.rtin'))
    out = m.run()
    sed = out.get_sed(inclination=0, aperture=0)
    assert sed.val.shape == (1,)
    assert np.isclose(sed.nu[0], 10.0 ** 13.5)
    # expected value of the MC estimate: int L_nu tn(nu) dnu with the
    # filter's own normalized response table
    from hyperion_tpu.util.integrate import integrate
    tn_nu, tn = filt.normalized_response
    L_nu_norm = lsun / np.log(nu_hi / nu_lo)  # L_nu = C / nu
    expected = integrate(tn_nu, (L_nu_norm / tn_nu) * tn)
    assert abs(sed.val[0] / expected - 1.0) < 0.1
    # sanity: for alpha=-1/energy the quoted value matches nu0*F_nu(nu0)
    # when nu0 is the transmission-weighted mean frequency
    nu_eff = integrate(fnu, fnu) / integrate(fnu, np.ones_like(fnu))
    assert np.isclose(expected * nu_eff / 10 ** 13.5, L_nu_norm, rtol=1e-3)
    out.close()


def test_depth_cut_selects_near_events(tmp_path):
    # Two identical point sources on the z axis; observer at theta=0 looks
    # down -z: event depth is -(view . r) = -z. A depth cut [0, inf] keeps
    # only the z<0 source.
    m = base_model(tmp_path, rho=1e-30, sources=1)
    m.sources[0].position = (0.0, 0.0, -1.5 * au)
    s2 = m.add_point_source()
    s2.luminosity = lsun
    s2.temperature = 6000.0
    s2.position = (0.0, 0.0, +1.5 * au)
    for (d_min, d_max, frac) in ((0.0, 1e30, 0.5), (None, None, 1.0)):
        conf = m.add_peeled_images(sed=True, image=False)
        conf.set_viewing_angles([0.0], [0.0])
        conf.set_wavelength_range(40, 0.1, 1000.0)
        if d_min is not None:
            conf.set_depth(d_min, d_max)
    m.write(str(tmp_path / 'm.rtin'))
    out = m.run()
    cut = sed_total(out.get_sed(inclination=0, aperture=0, group=0))
    full = sed_total(out.get_sed(inclination=0, aperture=0, group=1))
    assert abs(full / (2 * lsun) - 1.0) < 0.05
    assert abs(cut / full - 0.5) < 0.05
    out.close()


def test_ignore_optical_depth(tmp_path):
    # optically thick box: the normal SED is heavily extinguished, the
    # ignore_optical_depth SED recovers the full direct luminosity
    # tau ~ rho*chi*half_width = 5e-14*2*4.5e13 ~ 4.5 across the half-box
    m = base_model(tmp_path, rho=5e-14, albedo=0.0, n_photons=10000)
    for ignore in (False, True):
        conf = m.add_peeled_images(sed=True, image=False)
        conf.set_viewing_angles([45.0], [60.0])
        conf.set_wavelength_range(40, 0.1, 1000.0)
        conf.set_ignore_optical_depth(ignore)
        conf.set_track_origin('basic')
    m.write(str(tmp_path / 'm.rtin'))
    out = m.run()
    direct_ext = sed_total(out.get_sed(inclination=0, aperture=0, group=0,
                                       component='source_emit'))
    direct_ign = sed_total(out.get_sed(inclination=0, aperture=0, group=1,
                                       component='source_emit'))
    assert abs(direct_ign / lsun - 1.0) < 0.05
    assert direct_ext < 0.5 * direct_ign
    out.close()


def test_inside_observer_flux(tmp_path):
    # point source, near-empty grid, observer inside the grid: the all-sky
    # SED must equal the local flux L/(4 pi d^2)
    d = 1.0 * au
    m = base_model(tmp_path, rho=1e-30)
    conf = m.add_peeled_images(sed=True, image=False)
    conf.set_inside_observer((d, 0.0, 0.0))
    conf.set_wavelength_range(40, 0.1, 1000.0)
    m.write(str(tmp_path / 'm.rtin'))
    out = m.run()
    sed = out.get_sed(inclination=0, aperture=0)
    assert sed.inside_observer
    dlognu = np.log(sed.nu[-1] / sed.nu[0]) / (len(sed.nu) - 1)
    total = np.sum(sed.val) * dlognu
    expected = lsun / (4 * np.pi * d ** 2)
    assert abs(total / expected - 1.0) < 0.05
    out.close()


def test_inside_observer_image_direction(tmp_path):
    # observer at +x; viewing angle = photon travel direction mapped to the
    # image center (same convention as external peeloff), so light from the
    # origin (traveling +x) centers at angles (90, 0)
    d = 1.0 * au
    m = base_model(tmp_path, rho=1e-30)
    conf = m.add_peeled_images(sed=False, image=True)
    conf.set_inside_observer((d, 0.0, 0.0))
    conf.set_viewing_angles([90.0], [0.0])
    conf.set_image_size(21, 21)
    conf.set_image_limits(180.0, -180.0, -90.0, 90.0)
    conf.set_wavelength_range(3, 0.1, 1000.0)
    m.write(str(tmp_path / 'm.rtin'))
    out = m.run()
    img = out.get_image(inclination=0)
    cube = img.val  # (n_y, n_x, n_nu)
    flat = cube.sum(axis=-1)
    iy, ix = np.unravel_index(np.argmax(flat), flat.shape)
    assert abs(ix - 10) <= 1 and abs(iy - 10) <= 1
    out.close()
