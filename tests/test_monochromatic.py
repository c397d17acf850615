"""Monochromatic (exact-frequency) imaging tests
(ref: hyperion/model/tests/test_mono.py + iter_final_mono.f90 semantics)."""

import numpy as np
import pytest

from hyperion_tpu.model import Model
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.util.constants import lsun, au, c, sigma, pi
from hyperion_tpu.util.functions import B_nu


def make_dust(chi=2.0, albedo=0.4):
    nu = np.logspace(5, 18, 30)
    return IsotropicDust(nu, np.repeat(albedo, 30), np.repeat(chi, 30))


def mono_model(tmp_path, rho, wavelengths, albedo=0.4, n_src=30000,
               n_dust=0, n_initial=0, track='no'):
    m = Model()
    lim = 3 * au
    m.set_cartesian_grid(np.linspace(-lim, lim, 12),
                         np.linspace(-lim, lim, 12),
                         np.linspace(-lim, lim, 12))
    m.add_density_grid(np.full(m.grid.shape, rho), make_dust(albedo=albedo))
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 6000.0
    sed = m.add_peeled_images(sed=True, image=False)
    sed.set_viewing_angles([45.0], [60.0])
    sed.set_aperture_radii(1, lim * 10, lim * 10)
    sed.set_track_origin(track)
    m.set_monochromatic(True, wavelengths=wavelengths)
    sed.set_wavelength_index_range(0, len(wavelengths) - 1)
    m.set_n_photons(initial=n_initial, imaging_sources=n_src,
                    imaging_dust=n_dust)
    m.set_n_initial_iterations(1 if n_initial else 0)
    m.write(str(tmp_path / 'mono.rtin'))
    return m


def test_mono_source_optically_thin(tmp_path):
    """Optically thin: SED(nu) == nu * L * pdf_bb(nu) analytically."""
    wavelengths = [0.5, 1.0, 2.0, 5.0]
    m = mono_model(tmp_path, rho=1e-22, wavelengths=wavelengths)
    out = m.run()
    sed = out.get_sed(inclination=0, aperture=-1)
    assert sed.val.shape == (len(wavelengths),)
    T = 6000.0
    nu = np.asarray(sed.nu)  # SED frequency axis is in user wavelength order
    expected = nu * lsun * pi * B_nu(nu, T) / (sigma * T ** 4)
    assert np.allclose(sed.val, expected, rtol=1e-2)
    out.close()


def test_mono_source_extinction(tmp_path):
    """Pure absorption (albedo=0): direct flux attenuated by exp(-tau) along
    the line of sight; no scattered flux."""
    rho = 2e-18
    wavelengths = [1.0, 2.0]
    m = mono_model(tmp_path, rho=rho, wavelengths=wavelengths, albedo=0.0,
                   n_src=20000)
    out = m.run()
    sed = out.get_sed(inclination=0, aperture=-1)
    # chord from the center to the edge along the 45/60 view direction:
    # the cube is axis-aligned with half-size 3 au; view dir components
    theta, phi = np.radians(45.0), np.radians(60.0)
    d = np.array([np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi),
                  np.cos(theta)])
    lim = 3 * au
    tmax = np.min(lim / np.abs(d))
    tau = 2.0 * rho * tmax  # chi = 2
    T = 6000.0
    nu = np.asarray(sed.nu)  # SED frequency axis is in user wavelength order
    expected = nu * lsun * pi * B_nu(nu, T) / (sigma * T ** 4) * np.exp(-tau)
    assert np.allclose(sed.val, expected, rtol=5e-2)
    out.close()


def test_mono_scattering_conserves_flux_direction_avg(tmp_path):
    """With scattering, total flux (direct+scattered) at moderate tau stays
    close to the thin answer when averaged over enough photons."""
    wavelengths = [1.0]
    m = mono_model(tmp_path, rho=2e-19, wavelengths=wavelengths, albedo=0.9,
                   n_src=50000)
    out = m.run()
    sed = out.get_sed(inclination=0, aperture=-1)
    T = 6000.0
    nu = np.asarray(sed.nu)  # SED frequency axis is in user wavelength order
    expected = nu * lsun * pi * B_nu(nu, T) / (sigma * T ** 4)
    # scattered light roughly fills in what extinction removes (isotropic
    # scattering, quasi-spherical geometry): within 15%
    assert abs(sed.val[0] / expected[0] - 1.0) < 0.15
    out.close()


def test_mono_dust_emission_runs(tmp_path):
    """Dust-emission pass: thermal photons at long wavelengths add flux."""
    wavelengths = [100.0, 300.0]
    m = mono_model(tmp_path, rho=5e-17, wavelengths=wavelengths,
                   n_src=10000, n_dust=10000, n_initial=20000,
                   track='basic')
    out = m.run()
    sed = out.get_sed(inclination=0, aperture=-1)
    assert sed.val.shape == (2,)
    assert (sed.val > 0).all()
    # dust emission should exceed the (attenuated) stellar flux far in the IR
    sed_direct = out.get_sed(inclination=0, aperture=-1,
                             component='source_emit')
    assert sed.val[1] > sed_direct.val[1]
    out.close()


def test_mono_raytracing_matches_mc_direct(tmp_path):
    """Raytraced direct light at exact frequencies equals the MC estimate:
    run the same optically-thin model with and without raytracing — the
    noise-free raytraced SED must match the analytic B_nu expectation
    (ref: do_raytracing after do_final_mono, main.f90:296-302)."""
    wavelengths = [0.5, 1.0, 2.0, 5.0]
    m = Model()
    lim = 3 * au
    m.set_cartesian_grid(np.linspace(-lim, lim, 12),
                         np.linspace(-lim, lim, 12),
                         np.linspace(-lim, lim, 12))
    m.add_density_grid(np.full(m.grid.shape, 1e-22), make_dust())
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 6000.0
    sed = m.add_peeled_images(sed=True, image=False)
    sed.set_viewing_angles([45.0], [60.0])
    sed.set_aperture_radii(1, lim * 10, lim * 10)
    m.set_monochromatic(True, wavelengths=wavelengths)
    sed.set_wavelength_index_range(0, len(wavelengths) - 1)
    m.set_raytracing(True)
    m.set_n_photons(initial=0, imaging_sources=5000, imaging_dust=0,
                    raytracing_sources=20000, raytracing_dust=0)
    m.set_n_initial_iterations(0)
    m.write(str(tmp_path / 'monoray.rtin'))
    out = m.run()
    sed_out = out.get_sed(inclination=0, aperture=-1)
    T = 6000.0
    nu = np.asarray(sed_out.nu)  # SED frequency axis is in user wavelength order
    expected = nu * lsun * pi * B_nu(nu, T) / (sigma * T ** 4)
    # raytraced direct light is noise-free: tight tolerance
    assert np.allclose(sed_out.val, expected, rtol=2e-2)
    out.close()


def test_mono_track_origin_detailed(tmp_path):
    """Detailed origin slices in mono mode: direct flux lands in the source
    slice, scattered flux in the source-scat slice, and their sum matches
    the basic run (ref image_type.f90:228-241 origin expansion)."""
    wavelengths = [1.0, 2.0]
    rho = 2e-19
    m = mono_model(tmp_path, rho=rho, wavelengths=wavelengths,
                   track='detailed')
    out = m.run()
    # component selection through the public API
    direct = out.get_sed(inclination=0, aperture=-1, component='source_emit')
    scat = out.get_sed(inclination=0, aperture=-1, component='source_scat')
    demit = out.get_sed(inclination=0, aperture=-1, component='dust_emit')
    total = out.get_sed(inclination=0, aperture=-1)
    np.testing.assert_allclose(direct.val + scat.val + demit.val, total.val,
                               rtol=1e-6)
    assert direct.val.sum() > 0
    assert scat.val.sum() > 0          # some scattering at this density
    out.close()

    m2 = mono_model(tmp_path, rho=rho, wavelengths=wavelengths, track='no')
    out2 = m2.run()
    total2 = out2.get_sed(inclination=0, aperture=-1)
    np.testing.assert_allclose(total.val, total2.val, rtol=0.1)
    out2.close()


def test_mono_track_origin_scatterings(tmp_path):
    """scatterings mode: slice 0 = unscattered, higher slices = n-times
    scattered; total conserved vs basic."""
    wavelengths = [1.0]
    m = mono_model(tmp_path, rho=2e-19, wavelengths=wavelengths,
                   track='scatterings')
    m.peeled_output[0].set_track_origin('scatterings', n_scat=3)
    m.write(str(tmp_path / 'mono2.rtin'))
    out = m.run()
    total = out.get_sed(inclination=0, aperture=-1)
    s0 = out.get_sed(inclination=0, aperture=-1, component='source',
                     n_scat=0)
    s1 = out.get_sed(inclination=0, aperture=-1, component='source',
                     n_scat=1)
    assert s0.val.sum() > 0
    assert s1.val.sum() > 0
    assert s0.val.sum() > s1.val.sum()   # single-scattering is weaker
    out.close()


def test_mono_stokes_polarized_scattering(tmp_path):
    """Monochromatic imaging with Stokes: scattered light off a polarizing
    dust produces nonzero Q with |Q| <= I, and the I component matches an
    unpolarized run statistically (ref: mono peeloff carries the full
    Stokes vector through scatter_stokes)."""
    from hyperion_tpu.dust import HenyeyGreensteinDust
    nu = np.logspace(5, 18, 30)
    dust = HenyeyGreensteinDust(nu, np.repeat(0.6, 30), np.repeat(2.0, 30),
                                np.repeat(0.4, 30), np.repeat(1.0, 30))
    m = Model()
    lim = 3 * au
    m.set_cartesian_grid(np.linspace(-lim, lim, 10),
                         np.linspace(-lim, lim, 10),
                         np.linspace(-lim, lim, 10))
    m.add_density_grid(np.full(m.grid.shape, 3e-19), dust)
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 6000.0
    sed = m.add_peeled_images(sed=True, image=False)
    sed.set_viewing_angles([90.0], [0.0])
    sed.set_aperture_radii(1, lim * 10, lim * 10)
    sed.set_stokes(True)
    m.set_monochromatic(True, wavelengths=[1.0])
    sed.set_wavelength_index_range(0, 0)
    m.set_n_photons(initial=0, imaging_sources=30000, imaging_dust=0)
    m.set_n_initial_iterations(0)
    m.write(str(tmp_path / 'monostokes.rtin'))
    out = m.run()
    I = out.get_sed(inclination=0, aperture=-1, stokes='I').val
    Q = out.get_sed(inclination=0, aperture=-1, stokes='Q').val
    linpol = out.get_sed(inclination=0, aperture=-1, stokes='linpol').val
    assert I.sum() > 0
    # scattering off 90-degree geometry with p_lin=1 must polarize
    assert abs(float(np.sum(Q))) > 0
    assert 0 < float(linpol[0]) <= 1.0
    out.close()


def test_mono_zero_prob(tmp_path):
    """When the per-cell emission probability is zero for one dust at a
    wavelength, the run must not crash (ref test_mono.py:10-36)."""
    from hyperion_tpu.model import Model
    from hyperion_tpu.model.run import run_model
    dust = make_dust()
    m = Model()
    m.set_cartesian_grid([-1., 1.], [-1., 1.], [-1., 1.])
    m.add_density_grid(np.array([[[1.]]]), dust)
    m.add_density_grid(np.array([[[0.5]]]), dust, merge_if_possible=False)
    image = m.add_peeled_images(sed=True, image=True)
    image.set_image_limits(-2., 2., -2., 2.)
    image.set_image_size(20, 20)
    image.set_viewing_angles([45.], [45.])
    m.set_minimum_temperature(10.)
    m.set_monochromatic(True, wavelengths=[0.01, 0.1, 1., 10., 100., 1000.])
    m.set_n_initial_iterations(0)
    m.set_n_photons(imaging_sources=0, imaging_dust=100)
    m.set_copy_input(False)
    rtin = str(tmp_path / 'z.rtin')
    rtout = str(tmp_path / 'z.rtout')
    m.write(rtin)
    run_model(Model.read(rtin), rtout)


def test_mono_check_weighting(tmp_path):
    """Regression (ref test_mono.py:39-95): monochromatic flux weighting
    with multiple dust populations where one has zero mean_prob at a
    frequency — the first population's SED must not change when a second,
    optically-thin population is added."""
    from hyperion_tpu.model import Model
    from hyperion_tpu.model.run import run_model
    from hyperion_tpu.model.model_output import ModelOutput
    d = make_dust()

    def build(two):
        m = Model()
        m.set_cartesian_grid([-1., 1.], [-1., 1.], [-1., 1.])
        m.add_density_grid(np.array([[[1.e-10]]]), d,
                           specific_energy=np.array([[[1.e8]]]))
        if two:
            m.add_density_grid(np.array([[[1.e-10]]]), d,
                               specific_energy=np.array([[[1.e-4]]]),
                               merge_if_possible=False)
        image = m.add_peeled_images(sed=True, image=False)
        image.set_viewing_angles([45.], [45.])
        image.set_track_origin('detailed')
        m.set_monochromatic(True, wavelengths=np.logspace(-1., 4., 10))
        m.set_n_initial_iterations(0)
        m.set_n_photons(imaging_sources=0, imaging_dust=50000)
        m.set_copy_input(False)
        return m

    outs = []
    for i, two in enumerate((True, False)):
        m = build(two)
        rtin = str(tmp_path / ('w%d.rtin' % i))
        rtout = str(tmp_path / ('w%d.rtout' % i))
        m.write(rtin)
        run_model(Model.read(rtin), rtout)
        outs.append(ModelOutput(rtout))
    s1 = outs[0].get_sed(inclination=0, aperture=-1, component='dust_emit',
                         dust_id=0)
    s2 = outs[1].get_sed(inclination=0, aperture=-1, component='dust_emit',
                         dust_id=0)
    v1 = np.squeeze(np.asarray(s1.val))
    v2 = np.squeeze(np.asarray(s2.val))
    sel = (v1 > 0) & (v2 > 0)
    assert sel.sum() >= 5
    ratio = v1[sel] / v2[sel]
    assert np.all((ratio < 1.05) & (1 / ratio < 1.05)), ratio
