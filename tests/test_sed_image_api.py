"""Reader-API surface tests for get_sed/get_image, ported from the
reference's test_sed.py (501 LoC) and test_image.py (915 LoC): dimensions,
inclination/aperture indexing, Stokes selection, unit validation, origin
component selection under 'detailed' and 'scatterings' tracking, distance
scaling, and uncertainty propagation.  Unlike the reference these run
against our own engine (no external binaries needed)."""

import numpy as np
import pytest

from hyperion_tpu.model import Model
from hyperion_tpu.model.run import run_model
from hyperion_tpu.dust import IsotropicDust


def _test_dust():
    nu = np.logspace(np.log10(3e10), np.log10(5e16), 16)
    d = IsotropicDust(nu, np.repeat(0.5, 16), np.repeat(10.0, 16))
    d.set_lte_emissivities(n_temp=20, temp_min=0.1, temp_max=1600.)
    return d


def _base_model(track=None, n_scat=5, image=False, two_sources=False,
                uncertainties=False):
    m = Model()
    m.set_cartesian_grid([-1., 1.], [-1., 1.], [-1., 1.])
    m.add_density_grid(np.array([[[1.e-30]]]), _test_dust())
    s = m.add_point_source()
    s.name = 'first'
    s.luminosity = 1.
    s.temperature = 6000.
    if two_sources:
        s = m.add_point_source()
        s.name = 'second'
        s.luminosity = 1.
        s.temperature = 6000.
    conf = m.add_peeled_images(sed=not image, image=image)
    conf.set_viewing_angles([1., 2.], [1., 2.])
    conf.set_wavelength_range(5, 0.1, 100.)
    if image:
        conf.set_image_size(10, 20)
        conf.set_image_limits(-1., 1., -1., 1.)
    else:
        conf.set_aperture_radii(3, 1., 10.)
    conf.set_stokes(True)
    if track:
        if track == 'scatterings':
            conf.set_track_origin(track, n_scat=n_scat)
        else:
            conf.set_track_origin(track)
    if uncertainties:
        conf.set_uncertainties(True)
    m.set_n_initial_iterations(0)
    m.set_n_photons(imaging=100)
    m.set_copy_input(False)
    return m


def _run(m, tmp_path_factory, name):
    d = tmp_path_factory.mktemp(name)
    rtin = str(d / 'm.rtin')
    rtout = str(d / 'm.rtout')
    m.write(rtin)
    run_model(Model.read(rtin), rtout)
    from hyperion_tpu.model.model_output import ModelOutput
    return ModelOutput(rtout)


@pytest.fixture(scope='module')
def sed_simple(tmp_path_factory):
    return _run(_base_model(), tmp_path_factory, 'sed_simple')


@pytest.fixture(scope='module')
def sed_detailed(tmp_path_factory):
    return _run(_base_model(track='detailed', two_sources=True),
                tmp_path_factory, 'sed_detailed')


@pytest.fixture(scope='module')
def sed_scat(tmp_path_factory):
    return _run(_base_model(track='scatterings', two_sources=True),
                tmp_path_factory, 'sed_scat')


@pytest.fixture(scope='module')
def img_simple(tmp_path_factory):
    return _run(_base_model(image=True), tmp_path_factory, 'img_simple')


@pytest.fixture(scope='module')
def img_detailed(tmp_path_factory):
    return _run(_base_model(image=True, track='detailed', two_sources=True),
                tmp_path_factory, 'img_detailed')


# ---- SED dimensions & indexing (ref test_sed.py:50-133) -------------------

def test_sed_dim(sed_simple):
    sed = sed_simple.get_sed()
    assert sed.val.shape == (2, 3, 5)


def test_sed_dim_incl(sed_simple):
    for i in (0, 1):
        assert sed_simple.get_sed(inclination=i).val.shape == (3, 5)


def test_sed_dim_incl_invalid(sed_simple):
    with pytest.raises(IndexError):
        sed_simple.get_sed(inclination=2)
    with pytest.raises(IndexError):
        sed_simple.get_sed(inclination=-3)


def test_sed_dim_incl_noninteger(sed_simple):
    with pytest.raises(Exception):
        sed_simple.get_sed(inclination=12.3)


def test_sed_dim_aper(sed_simple):
    for a in (0, 2):
        assert sed_simple.get_sed(aperture=a).val.shape == (2, 5)


def test_sed_dim_aper_invalid(sed_simple):
    with pytest.raises(IndexError):
        sed_simple.get_sed(aperture=3)
    with pytest.raises(IndexError):
        sed_simple.get_sed(aperture=-4)


def test_sed_dim_aper_noninteger(sed_simple):
    with pytest.raises(Exception):
        sed_simple.get_sed(aperture=344.3)


def test_sed_group_invalid(sed_simple):
    with pytest.raises(Exception):
        sed_simple.get_sed(group=1)


@pytest.mark.parametrize('stokes', ['I', 'Q', 'U', 'V', 'linpol', 'circpol'])
def test_sed_stokes(sed_simple, stokes):
    assert sed_simple.get_sed(stokes=stokes).val.shape == (2, 3, 5)


@pytest.mark.parametrize('stokes', ['A', 'b', 1, (3,), 'i', 'q', 'u', 'v'])
def test_sed_stokes_invalid(sed_simple, stokes):
    with pytest.raises(ValueError):
        sed_simple.get_sed(stokes=stokes)


def test_sed_nodistance_units(sed_simple):
    sed_simple.get_sed(units='ergs/s')


@pytest.mark.parametrize('units', ['ergs/cm^2/s', 'mJy', 'Jy',
                                   'ergs/cm^2/s/Hz'])
def test_sed_nodistance_units_invalid(sed_simple, units):
    with pytest.raises(ValueError):
        sed_simple.get_sed(units=units)


def test_sed_unit_conversions(sed_simple):
    """Fnu-family units differ from ergs/cm^2/s by exactly 1/nu and the
    Jansky scales (ref test_sed.py:381-401)."""
    ref = sed_simple.get_sed(units='ergs/cm^2/s', distance=100.,
                             inclination=1)
    assert np.sum(ref.val) > 0
    mono = sed_simple.get_sed(units='ergs/cm^2/s/Hz', distance=100.,
                              inclination=1)
    np.testing.assert_allclose(ref.val / ref.nu, mono.val, rtol=1e-10)
    Jy = sed_simple.get_sed(units='Jy', distance=100., inclination=1)
    np.testing.assert_allclose(ref.val / ref.nu, Jy.val * 1.e-23, rtol=1e-10)
    mJy = sed_simple.get_sed(units='mJy', distance=100., inclination=1)
    np.testing.assert_allclose(ref.val / ref.nu, mJy.val * 1.e-26,
                               rtol=1e-10)


def test_sed_iterable(sed_simple):
    wav, nufnu = sed_simple.get_sed()
    assert wav.shape == (5,)
    assert nufnu.shape == (2, 3, 5)


# ---- SED component selection, detailed tracking (ref :179-253) ------------

def test_sed_detailed_source_all(sed_detailed):
    sed_detailed.get_sed(source_id='all', component='source_emit')


@pytest.mark.parametrize('sid', [0, 1])
def test_sed_detailed_source_valid(sed_detailed, sid):
    sed_detailed.get_sed(source_id=sid, component='source_emit')
    sed_detailed.get_sed(source_id=sid, component='source_scat')


@pytest.mark.parametrize('sid', [-1, 2])
def test_sed_detailed_source_invalid(sed_detailed, sid):
    with pytest.raises(ValueError):
        sed_detailed.get_sed(source_id=sid, component='source_emit')


def test_sed_detailed_dust(sed_detailed):
    sed_detailed.get_sed(dust_id='all', component='dust_emit')
    sed_detailed.get_sed(dust_id=0, component='dust_emit')
    for did in (-1, 1):
        with pytest.raises(ValueError):
            sed_detailed.get_sed(dust_id=did, component='dust_emit')


def test_sed_detailed_components_sum(sed_detailed):
    """source_emit+source_scat+dust_emit+dust_scat == total."""
    total = sed_detailed.get_sed().val
    parts = sum(sed_detailed.get_sed(component=c,
                                     source_id='all' if 'source' in c
                                     else None,
                                     dust_id='all' if 'dust' in c
                                     else None).val
                for c in ('source_emit', 'source_scat', 'dust_emit',
                          'dust_scat'))
    np.testing.assert_allclose(parts, total, rtol=1e-6, atol=1e-300)


# ---- SED scatterings tracking (ref :255-320) -------------------------------

def test_sed_scat_invalid_option(sed_scat):
    with pytest.raises(Exception):
        sed_scat.get_sed(source_id='all', component='source_emit')
    with pytest.raises(Exception):
        sed_scat.get_sed(dust_id='all', component='dust_emit')
    for component in ('source_emit', 'source_scat', 'dust_emit',
                      'dust_scat'):
        with pytest.raises(ValueError):
            sed_scat.get_sed(n_scat=1, component=component)


def test_sed_scat_main_components(sed_scat):
    sed_scat.get_sed(component='source')
    sed_scat.get_sed(component='dust')


def test_sed_scat_n_scat_valid(sed_scat):
    for n_scat in range(6):
        sed_scat.get_sed(n_scat=n_scat, component='source')
        sed_scat.get_sed(n_scat=n_scat, component='dust')


def test_sed_scat_n_scat_invalid(sed_scat):
    for n_scat in (-1, 6):
        with pytest.raises(ValueError):
            sed_scat.get_sed(n_scat=n_scat, component='source')


def test_sed_scat_values(sed_scat):
    """With rho=1e-30 everything is direct: only n_scat=0 has flux
    (ref test_sed.py:312-319)."""
    for n_scat in range(6):
        sed = sed_scat.get_sed(n_scat=n_scat, component='source')
        if n_scat == 0:
            assert sed.val.sum() > 0
        else:
            assert sed.val.sum() == 0.


# ---- image dimensions & selection (ref test_image.py:50-233) --------------

def test_image_dim(img_simple):
    img = img_simple.get_image()
    assert img.val.shape == (2, 20, 10, 5)


def test_image_dim_incl(img_simple):
    for i in (0, 1):
        assert img_simple.get_image(inclination=i).val.shape == (20, 10, 5)


def test_image_dim_incl_invalid(img_simple):
    with pytest.raises(IndexError):
        img_simple.get_image(inclination=2)
    with pytest.raises(Exception):
        img_simple.get_image(inclination=12.3)


@pytest.mark.parametrize('stokes', ['I', 'Q', 'U', 'V', 'linpol', 'circpol'])
def test_image_stokes(img_simple, stokes):
    assert img_simple.get_image(stokes=stokes).val.shape == (2, 20, 10, 5)


@pytest.mark.parametrize('stokes', ['A', 2, 'i'])
def test_image_stokes_invalid(img_simple, stokes):
    with pytest.raises(ValueError):
        img_simple.get_image(stokes=stokes)


def test_image_nodistance_units(img_simple):
    img_simple.get_image(units='ergs/s')
    with pytest.raises(ValueError):
        img_simple.get_image(units='Jy')


def test_image_detailed_components(img_detailed):
    img_detailed.get_image(source_id='all', component='source_emit')
    img_detailed.get_image(source_id=1, component='source_scat')
    img_detailed.get_image(dust_id=0, component='dust_emit')
    with pytest.raises(ValueError):
        img_detailed.get_image(source_id=2, component='source_emit')
    with pytest.raises(ValueError):
        img_detailed.get_image(dust_id=1, component='dust_emit')


def test_image_detailed_components_sum(img_detailed):
    total = img_detailed.get_image().val
    parts = sum(img_detailed.get_image(component=c,
                                       source_id='all' if 'source' in c
                                       else None,
                                       dust_id='all' if 'dust' in c
                                       else None).val
                for c in ('source_emit', 'source_scat', 'dust_emit',
                          'dust_scat'))
    np.testing.assert_allclose(parts, total, rtol=1e-6, atol=1e-300)


# ---- SED uncertainties (ref test_sed.py:155-182) ---------------------------

def test_sed_uncertainty_scaling(tmp_path):
    """For N independent photons of equal weight into one bin,
    sigma/flux ~ 1/sqrt(N)."""
    m = _base_model(uncertainties=True)
    m.set_n_photons(imaging=10000)
    rtin = str(tmp_path / 'u.rtin')
    rtout = str(tmp_path / 'u.rtout')
    m.write(rtin)
    run_model(Model.read(rtin), rtout)
    from hyperion_tpu.model.model_output import ModelOutput
    out = ModelOutput(rtout)
    sed = out.get_sed(uncertainties=True, inclination=0, aperture=2)
    flux = sed.val.sum()
    sig = np.sqrt((sed.unc ** 2).sum())
    assert flux > 0
    # all photons land somewhere in the 5 bins; aggregate relative error
    assert sig / flux < 3.0 / np.sqrt(10000)


# ---- spot spectrum regression (ref test_spot_source.py) --------------------

def test_spot_uses_its_own_spectrum(tmp_path):
    """Photons emitted from a spot must use the spot's own spectrum, not
    the parent sphere's (ref test_spot_source.py): disjoint emission bands
    make any flux in the spot band attributable only to the spot."""
    m = Model()
    m.set_cartesian_grid([-1e12, 1e12], [-1e12, 1e12], [-1e12, 1e12])
    m.add_density_grid(np.array([[[1.e-30]]]), _test_dust())

    nu = np.logspace(np.log10(3e12), np.log10(1e15), 300)
    fnu_sphere = np.where((nu > 1e13) & (nu < 2e13), 1., 0.)
    fnu_spot = np.where((nu > 3e14) & (nu < 6e14), 1., 0.)

    s = m.add_spherical_source()
    s.radius = 1e11
    s.position = (0., 0., 0.)
    s.luminosity = 1.
    s.spectrum = (nu, fnu_sphere)

    spot = s.add_spot()
    spot.longitude = 0.
    spot.latitude = 0.
    spot.radius = 90.
    spot.luminosity = 1.
    spot.spectrum = (nu, fnu_spot)

    sed = m.add_peeled_images(sed=True, image=False)
    sed.set_viewing_angles([45.], [45.])
    sed.set_wavelength_range(60, 0.1, 100.)
    sed.set_aperture_radii(1, 1e12, 1e12)

    m.set_n_initial_iterations(0)
    m.set_n_photons(imaging=20000)
    m.set_copy_input(False)

    rtin = str(tmp_path / 's.rtin')
    rtout = str(tmp_path / 's.rtout')
    m.write(rtin)
    run_model(Model.read(rtin), rtout)
    from hyperion_tpu.model.model_output import ModelOutput
    out = ModelOutput(rtout)
    sed_out = out.get_sed(inclination=0, aperture=0)
    wav = np.asarray(sed_out.wav)
    nufnu = np.squeeze(np.asarray(sed_out.val))

    sphere_band = (wav > 10.) & (wav < 40.)
    spot_band = (wav > 0.4) & (wav < 1.2)
    sphere_flux = np.nansum(nufnu[sphere_band])
    spot_flux = np.nansum(nufnu[spot_band])
    assert sphere_flux > 0
    assert spot_flux > 0
    # both carry luminosity 1: comparable energy in both bands
    assert 0.3 < spot_flux / sphere_flux < 3.0
