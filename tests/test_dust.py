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


def test_bhdust_reader(tmp_path):
    from hyperion_tpu.dust import BHDust
    n_wav, n_mu = 5, 7
    wav = np.logspace(1, -1, n_wav)          # descending wavelength
    mu = np.linspace(1.0, -1.0, n_mu)        # descending mu
    albedo = np.linspace(0.1, 0.5, n_wav)
    chi = np.logspace(0, 2, n_wav)
    P1 = np.ones((n_wav, n_mu)) + np.arange(n_mu)
    prefix = str(tmp_path / "bh")
    np.savetxt(prefix + ".wav", wav)
    np.savetxt(prefix + ".mu", mu)
    np.savetxt(prefix + ".alb", albedo)
    np.savetxt(prefix + ".chi", chi)
    for key, arr in (("f11", P1), ("f12", 0.1 * P1), ("f33", 0.2 * P1),
                     ("f34", 0.0 * P1)):
        np.savetxt(prefix + "." + key, arr)
    d = BHDust(prefix)
    op = d.optical_properties
    # stored ascending in nu and mu
    assert np.all(np.diff(op.nu) > 0)
    assert np.all(np.diff(op.mu) > 0)
    # wav descending means nu ascending already -> no flip on nu axis;
    # mu was descending -> flipped
    np.testing.assert_allclose(op.P1[0], P1[0][::-1])
    np.testing.assert_allclose(op.albedo, albedo)
    # roundtrip through the HDF5 dust file
    d.write(str(tmp_path / "bh.hdf5"))
    d2 = SphericalDust(str(tmp_path / "bh.hdf5"))
    np.testing.assert_allclose(d2.optical_properties.chi, chi)


def test_miex_reader(tmp_path):
    from hyperion_tpu.dust import MieXDust
    n_wav, n_mu = 4, 5
    wav = np.logspace(-1, 1, n_wav)
    theta = np.linspace(0.0, 180.0, n_mu)
    albedo = np.full(n_wav, 0.4)
    kabs = np.logspace(1, 0, n_wav)
    prefix = str(tmp_path / "mx")
    np.savetxt(prefix + ".alb", np.c_[wav, albedo])
    np.savetxt(prefix + ".k_abs", np.c_[wav, kabs])
    for key, scale in (("f11", 1.0), ("f12", 0.1), ("f33", 0.2), ("f34", 0.0)):
        with open(prefix + "." + key, "w") as fh:
            fh.write("# header\n")
            for j in range(n_wav):
                fh.write("%g\n" % wav[j])
                for i in range(n_mu):
                    fh.write("%g %g\n" % (theta[i], scale * (1.0 + j + 0.01 * i)))
    d = MieXDust(prefix)
    op = d.optical_properties
    assert op.P1.shape == (n_wav, n_mu)
    np.testing.assert_allclose(op.chi, kabs / (1 - albedo))
    # mu ascending (theta was ascending 0->180 i.e. mu descending, flipped)
    assert np.all(np.diff(op.mu) > 0)
    # P1 at mu= +1 (theta=0) should be the i=0 value
    np.testing.assert_allclose(op.P1[2, -1], 1.0 + 2 + 0.0)


def test_coatsph_multiple_reader(tmp_path):
    from hyperion_tpu.dust import CoatsphMultiple
    n_wav, n_mu = 3, 4
    wav = np.logspace(0, -1, n_wav)
    theta = np.linspace(0, 180, n_mu)
    d = tmp_path / "coat"
    d.mkdir()
    with open(d / "coatsph_forw.dat", "w") as fh:
        fh.write("version 1\n")
        fh.write("a b c d e 2\n")
        for _ in range(7):
            fh.write("# hdr\n")
        for j in range(n_wav):
            fh.write("%g %g %g %g %g %g %g\n"
                     % (wav[j], 2.0, 0.8, 10.0 + j, 0.5, 0.1, 90.0))
    for j in range(n_wav):
        with open(d / ("coatsph_scat.%04i.dat" % (j + 1)), "w") as fh:
            for _ in range(7):
                fh.write("# hdr\n")
            for i in range(n_mu):
                fh.write("%g %g %g %g %g %g\n"
                         % (theta[i], 1.0 + j, 0.0, 0.1, 0.2, 0.0))
    dust = CoatsphMultiple(str(d))
    op = dust.optical_properties
    np.testing.assert_allclose(op.albedo, 0.4)
    np.testing.assert_allclose(op.chi, 10.0 + np.arange(n_wav))
    assert op.P1.shape == (n_wav, n_mu)
