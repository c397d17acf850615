import os

import numpy as np
import pytest

from hyperion_tpu.dust import IsotropicDust, HenyeyGreensteinDust, SphericalDust
from hyperion_tpu.util.constants import sigma, c
from hyperion_tpu.util.integrate import integrate_loglog


def make_gray_dust(chi=2.0, albedo=0.3):
    nu = np.logspace(5, 18, 10)
    d = IsotropicDust(nu, np.repeat(albedo, 10), np.repeat(chi, 10))
    return d


def test_gray_dust_mean_opacities():
    chi, albedo = 2.0, 0.3
    d = make_gray_dust(chi, albedo)
    d.mean_opacities.compute(d.optical_properties)
    kappa = chi * (1 - albedo)
    # For gray dust every mean opacity equals the raw value
    assert np.allclose(d.mean_opacities.chi_planck, chi, rtol=1e-6)
    assert np.allclose(d.mean_opacities.kappa_planck, kappa, rtol=1e-6)
    assert np.allclose(d.mean_opacities.chi_rosseland, chi, rtol=1e-6)
    assert np.allclose(d.mean_opacities.kappa_inv_planck, kappa, rtol=1e-6)
    # specific energy relation E = 4 sigma T^4 kappa_planck
    T = d.mean_opacities.temperature
    assert np.allclose(d.mean_opacities.specific_energy,
                       4 * sigma * T ** 4 * kappa, rtol=1e-6)


def test_temperature_specific_energy_roundtrip():
    d = make_gray_dust()
    T = np.array([5.0, 17.0, 300.0, 1500.0])
    E = d.temperature2specific_energy(T)
    T2 = d.specific_energy2temperature(E)
    assert np.allclose(T, T2, rtol=1e-8)


def test_lte_emissivity_peak():
    # LTE emissivities should integrate like kappa*B_nu
    d = make_gray_dust()
    d.mean_opacities.compute(d.optical_properties)
    d.emissivities.set_lte(d.optical_properties, d.mean_opacities)
    assert d.emissivities.is_lte
    assert d.emissivities.var_name == 'specific_energy'
    assert d.emissivities.jnu.shape == (len(d.emissivities.nu),
                                        len(d.emissivities.var))
    # jnu at bin it equals kappa * B_nu(T_it): integral over nu = kappa*sigma*T^4/pi
    it = 600
    T = d.mean_opacities.temperature[it]
    total = integrate_loglog(d.emissivities.nu, d.emissivities.jnu[:, it])
    kappa = 2.0 * (1 - 0.3)
    assert np.isclose(total, kappa * sigma * T ** 4 / np.pi, rtol=1e-2)


def test_dust_file_roundtrip(tmp_path):
    d = make_gray_dust()
    d.set_sublimation_temperature('fast', 1600.0)
    fname = str(tmp_path / 'dust.hdf5')
    d.write(fname)
    d2 = SphericalDust(fname)
    assert np.allclose(d2.optical_properties.nu, d.optical_properties.nu)
    assert np.allclose(d2.optical_properties.chi, d.optical_properties.chi)
    assert np.allclose(d2.optical_properties.albedo, d.optical_properties.albedo)
    assert np.allclose(d2.mean_opacities.kappa_planck,
                       d.mean_opacities.kappa_planck)
    assert np.allclose(d2.emissivities.jnu, d.emissivities.jnu)
    assert d2.sublimation_mode == 'fast'
    assert np.isclose(d2.sublimation_energy, d.sublimation_energy)
    assert d2.hash() == d.hash()


def test_hg_dust_matrix():
    nu = np.logspace(8, 16, 5)
    g = np.repeat(0.6, 5)
    p = np.repeat(0.5, 5)
    d = HenyeyGreensteinDust(nu, np.repeat(0.5, 5), np.repeat(1.0, 5), g, p)
    op = d.optical_properties
    # Phase function integral over solid angle: int P1 dmu = 2 for HG
    from hyperion_tpu.util.integrate import integrate
    val = integrate(op.mu, op.P1[0])
    assert np.isclose(val, 2.0, rtol=5e-3)
    # Forward peak exceeds backward
    assert op.P1[0, -1] > op.P1[0, 0]


def test_extrapolate_nu():
    d = make_gray_dust()
    op = d.optical_properties
    n0 = len(op.nu)
    op.extrapolate_nu(op.nu[0] / 10.0, op.nu[-1] * 10.0)
    assert len(op.nu) == n0 + 2
    assert np.isclose(op.chi[0], 2.0)  # gray extrapolates flat
    assert np.isclose(op.chi[-1], 2.0)
