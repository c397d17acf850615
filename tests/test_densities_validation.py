"""Density-structure parameter validation + mass/rho_0 swap semantics
(ported from the reference's densities/tests/test_densities.py, 912 LoC):
positivity, OptThinRadius acceptance, scalar/type validation, and the
mass <-> rho_0 exclusive-specification invariants for every density
class."""

import numpy as np
import pytest

from hyperion_tpu.densities import (FlaredDisk, AlphaDisk, PowerLawEnvelope,
                                    UlrichEnvelope, BipolarCavity,
                                    AmbientMedium)
from hyperion_tpu.util.convenience import OptThinRadius


DISK_PARAMS = ['mass', 'rmin', 'rmax', 'p', 'beta', 'h_0', 'rho_0', 'r_0']
ALPHA_PARAMS = DISK_PARAMS + ['mdot', 'lvisc']
PLE_PARAMS = ['mass', 'rmin', 'rmax', 'power', 'rho_0', 'r_0']
ULR_PARAMS = ['mdot', 'rmin', 'rmax', 'rho_0', 'rc']


def _signed_ok(parameter):
    # slope-like parameters may be negative
    return parameter in ('p', 'beta', 'power')


@pytest.mark.parametrize('parameter', DISK_PARAMS)
def test_flared_disk_positive(parameter):
    d = FlaredDisk()
    setattr(d, parameter, 1.)


@pytest.mark.parametrize('parameter', DISK_PARAMS)
def test_flared_disk_negative(parameter):
    d = FlaredDisk()
    if _signed_ok(parameter):
        setattr(d, parameter, -1.)
    else:
        with pytest.raises(ValueError):
            setattr(d, parameter, -1.)


@pytest.mark.parametrize('parameter', DISK_PARAMS)
def test_flared_disk_optthin(parameter):
    d = FlaredDisk()
    if parameter in ('rmin', 'rmax'):
        setattr(d, parameter, OptThinRadius(1.))
    else:
        with pytest.raises(ValueError):
            setattr(d, parameter, OptThinRadius(1.))


@pytest.mark.parametrize('parameter', DISK_PARAMS)
def test_flared_disk_invalid_string(parameter):
    d = FlaredDisk()
    with pytest.raises(ValueError):
        setattr(d, parameter, 'a')


@pytest.mark.parametrize('parameter', DISK_PARAMS)
def test_flared_disk_invalid_list(parameter):
    d = FlaredDisk()
    with pytest.raises(ValueError):
        setattr(d, parameter, [1., 2.])


def _disk_geometry(e):
    e.rmin = 1.
    e.rmax = 10.
    e.r_0 = 5.
    e.h_0 = 1.
    e.p = -1.
    e.beta = 1.25


def test_flared_disk_mass_swap():
    e = FlaredDisk()
    e.mass = 1.
    assert e._rho_0 is None and e._mass is not None
    e.rho_0 = 1.
    assert e._rho_0 is not None and e._mass is None
    e.mass = 1.
    assert e._rho_0 is None and e._mass is not None


def test_flared_disk_mass_zero():
    e = FlaredDisk()
    _disk_geometry(e)
    e.mass = 0.
    assert e.rho_0 == 0.
    e.rho_0 = 0.
    assert e.mass == 0.


def test_flared_disk_mass_swap_invertible():
    e = FlaredDisk()
    _disk_geometry(e)
    e.mass = 4.792849
    rho_0 = e.rho_0
    e.mass = 0.
    e.rho_0 = rho_0
    assert np.isclose(e.mass, 4.792849, rtol=1e-10)


@pytest.mark.parametrize('parameter', ALPHA_PARAMS)
def test_alpha_disk_positive(parameter):
    d = AlphaDisk()
    setattr(d, parameter, 1.)


@pytest.mark.parametrize('parameter', ALPHA_PARAMS)
def test_alpha_disk_negative(parameter):
    d = AlphaDisk()
    if _signed_ok(parameter):
        setattr(d, parameter, -1.)
    else:
        with pytest.raises(ValueError):
            setattr(d, parameter, -1.)


@pytest.mark.parametrize('parameter', ALPHA_PARAMS)
def test_alpha_disk_invalid_string(parameter):
    d = AlphaDisk()
    with pytest.raises(ValueError):
        setattr(d, parameter, 'a')


def test_alpha_disk_mdot_lvisc_swap():
    """mdot and lvisc are exclusive specifications (setting one clears the
    other), like mass/rho_0 (ref test_densities.py:234-275)."""
    from hyperion_tpu.util.constants import msun, rsun, au, lsun

    def fresh():
        d = AlphaDisk()
        d.mass = 1.e-2 * msun
        d.rmin = rsun
        d.rmax = 10 * au
        d.r_0 = au
        d.h_0 = 0.1 * au
        d.p = -1.
        d.beta = 1.25
        d.star = type('S', (), {'mass': msun, 'radius': rsun})()
        return d

    d = fresh()
    d.mdot = 1.e-8 * msun
    assert d._lvisc is None and d._mdot is not None
    d.lvisc = 1.e-3 * lsun
    assert d._lvisc is not None and d._mdot is None
    d.mdot = 1.e-8 * msun
    assert d._lvisc is None and d._mdot is not None
    # round trip mdot -> lvisc -> mdot
    lv = d.lvisc
    d2 = fresh()
    d2.lvisc = lv
    assert np.isclose(d2.mdot, 1.e-8 * msun, rtol=1e-8)


@pytest.mark.parametrize('parameter', PLE_PARAMS)
def test_power_law_envelope_positive(parameter):
    e = PowerLawEnvelope()
    setattr(e, parameter, 1.)


@pytest.mark.parametrize('parameter', PLE_PARAMS)
def test_power_law_envelope_negative(parameter):
    e = PowerLawEnvelope()
    if _signed_ok(parameter):
        setattr(e, parameter, -1.)
    else:
        with pytest.raises(ValueError):
            setattr(e, parameter, -1.)


@pytest.mark.parametrize('parameter', PLE_PARAMS)
def test_power_law_envelope_invalid_string(parameter):
    e = PowerLawEnvelope()
    with pytest.raises(ValueError):
        setattr(e, parameter, 'a')


def test_power_law_envelope_rho0_mass():
    """rho_0 <-> mass relation: m = 4 pi rho_0 r_0^-power
    int_rmin^rmax r^(2+power) dr (ref test_densities.py:442-461)."""
    e = PowerLawEnvelope()
    e.rmin = 1.
    e.rmax = 10.
    e.r_0 = 2.
    e.power = -2.
    e.mass = 10.
    rho0 = e.rho_0
    expected = e.mass / (4 * np.pi * e.r_0 ** 2 * (e.rmax - e.rmin))
    assert np.isclose(rho0, expected, rtol=1e-10)
    # invert
    e2 = PowerLawEnvelope()
    e2.rmin = 1.
    e2.rmax = 10.
    e2.r_0 = 2.
    e2.power = -2.
    e2.rho_0 = rho0
    assert np.isclose(e2.mass, 10., rtol=1e-10)


def test_power_law_envelope_cavity():
    e = PowerLawEnvelope()
    e.rmin = 1.
    e.rmax = 10.
    e.r_0 = 2.
    e.power = -2.
    e.mass = 10.
    c = e.add_bipolar_cavity()
    assert c._envelope is e
    c.power = 1.2
    c.theta_0 = 10.
    assert isinstance(c, BipolarCavity)


@pytest.mark.parametrize('parameter', ULR_PARAMS)
def test_ulrich_envelope_positive(parameter):
    e = UlrichEnvelope()
    setattr(e, parameter, 1.)


@pytest.mark.parametrize('parameter', ULR_PARAMS)
def test_ulrich_envelope_negative(parameter):
    e = UlrichEnvelope()
    with pytest.raises(ValueError):
        setattr(e, parameter, -1.)


@pytest.mark.parametrize('parameter', ['theta_0', 'power', 'r_0', 'rho_0'])
def test_bipolar_cavity_positive(parameter):
    c = BipolarCavity()
    if parameter == 'power':
        setattr(c, parameter, 1.)
    else:
        setattr(c, parameter, 1.)


def test_bipolar_cavity_theta_range():
    c = BipolarCavity()
    with pytest.raises(ValueError):
        c.theta_0 = -1.
    with pytest.raises(ValueError):
        c.theta_0 = 95.


def test_ambient_medium_positive():
    a = AmbientMedium()
    a.rho = 1.
    a.rmin = 1.
    a.rmax = 10.
    with pytest.raises(ValueError):
        a.rho = -1.
