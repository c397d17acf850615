import numpy as np
import pytest

from hyperion_tpu.densities import (FlaredDisk, AlphaDisk, UlrichEnvelope,
                                    PowerLawEnvelope, AmbientMedium)
from hyperion_tpu.densities.ulrich_envelope import solve_mu0
from hyperion_tpu.grid import SphericalPolarGrid, CylindricalPolarGrid
from hyperion_tpu.model import AnalyticalYSOModel
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.util.constants import au, msun, rsun, lsun, yr, pc, G, pi
from hyperion_tpu.util.convenience import OptThinRadius


def sph_grid(rmax=500 * au, n_r=120, n_t=64):
    return SphericalPolarGrid(
        np.hstack([0.0, np.logspace(np.log10(0.05 * au), np.log10(rmax), n_r)]),
        np.linspace(0, np.pi, n_t), np.array([0.0, 2 * np.pi]))


def gray_dust():
    nu = np.logspace(5, 18, 20)
    return IsotropicDust(nu, np.repeat(0.5, 20), np.repeat(4.0, 20))


def test_flared_disk_mass():
    g = sph_grid()
    d = FlaredDisk(mass=0.01 * msun, rmin=0.5 * au, rmax=100 * au,
                   r_0=au, h_0=0.05 * au)
    rho = d.density(g)
    assert np.isclose(np.sum(rho * g.volumes), 0.01 * msun)
    # midplane cumulative density increases monotonically
    col = d.midplane_cumulative_density(np.array([au, 10 * au, 100 * au]))
    assert np.all(np.diff(col) > 0)


def test_flared_disk_mass_rho0_consistency():
    d = FlaredDisk(mass=0.01 * msun, rmin=0.5 * au, rmax=100 * au,
                   r_0=au, h_0=0.05 * au)
    rho_0 = d.rho_0
    d2 = FlaredDisk(rho_0=rho_0, rmin=0.5 * au, rmax=100 * au,
                    r_0=au, h_0=0.05 * au)
    assert np.isclose(d2.mass, 0.01 * msun)


def test_power_law_envelope_mass():
    g = sph_grid()
    e = PowerLawEnvelope(mass=0.1 * msun, rmin=0.5 * au, rmax=400 * au,
                         r_0=au, power=-1.5)
    rho = e.density(g)
    assert np.isclose(np.sum(rho * g.volumes), 0.1 * msun)


def test_ulrich_solve_mu0():
    # At large radius mu0 -> mu
    mu = np.array([0.5, -0.3, 0.9, 0.0])
    mu0 = solve_mu0(np.full(4, 1000.0), mu)
    assert np.allclose(mu0, mu, atol=1e-3)
    # On the polar axis mu0 = 1 for any radius
    mu0 = solve_mu0(np.array([0.5, 2.0]), np.array([1.0, 1.0]))
    assert np.allclose(np.abs(mu0), 1.0, atol=1e-8)


def test_ulrich_envelope_density():
    g = sph_grid()
    star = type('S', (), {'mass': msun, 'radius': rsun})()
    e = UlrichEnvelope(mdot=1e-6 * msun / yr, rc=50 * au, rmin=0.5 * au,
                       rmax=400 * au, star=star)
    rho = e.density(g)
    assert np.all(np.isfinite(rho))
    assert np.all(rho >= 0)
    # infall mass flux relation: rho_0 = mdot / (4 pi sqrt(G M rc^3))
    rho_0 = e.rho_0
    assert np.isclose(rho_0, 1e-6 * msun / yr /
                      (4 * pi * np.sqrt(G * msun * (50 * au) ** 3)))
    # far from rc, density approaches spherical free-fall r^-1.5
    # (checked via the midplane formula)


def test_bipolar_cavity_mask():
    g = sph_grid()
    star = type('S', (), {'mass': msun, 'radius': rsun})()
    e = PowerLawEnvelope(mass=0.1 * msun, rmin=0.5 * au, rmax=400 * au,
                         r_0=au, power=-1.5)
    cav = e.add_bipolar_cavity()
    cav.theta_0 = 20.0
    cav.power = 1.5
    cav.r_0 = 100 * au
    rho = e.density(g)
    # polar cells near the axis should be empty, midplane cells full
    theta_idx_pole = 1
    theta_idx_mid = g.shape[1] // 2
    assert rho[0, theta_idx_pole, 60] == 0.0
    assert rho[0, theta_idx_mid, 60] > 0.0


def test_ambient_medium_subtract():
    g = sph_grid()
    e = PowerLawEnvelope(rho_0=1e-18, rmin=0.5 * au, rmax=400 * au,
                         r_0=au, power=-1.5)
    amb = AmbientMedium(rho=1e-21, rmin=0.5 * au, rmax=400 * au, subtract=[e])
    rho = amb.density(g)
    rho_e = e.density(g)
    total = rho + rho_e
    sel = (g.gr > au) & (g.gr < 300 * au)
    assert np.all(total[sel] >= 1e-21 * (1 - 1e-10))


def test_alpha_disk_lvisc():
    star = type('S', (), {'mass': msun, 'radius': rsun})()
    d = AlphaDisk(mass=0.01 * msun, rmin=5 * rsun, rmax=50 * au, r_0=au,
                  h_0=0.05 * au, mdot=1e-7 * msun / yr, star=star)
    lvisc = d.lvisc
    expected = G * msun * (1e-7 * msun / yr) / 2.0 * (
        3.0 / (5 * rsun) - 3.0 / (50 * au) -
        2.0 * (np.sqrt(rsun / (5 * rsun) ** 3) - np.sqrt(rsun / (50 * au) ** 3)))
    assert np.isclose(lvisc, expected)
    # roundtrip lvisc -> mdot
    d2 = AlphaDisk(mass=0.01 * msun, rmin=5 * rsun, rmax=50 * au, r_0=au,
                   h_0=0.05 * au, lvisc=lvisc, star=star)
    assert np.isclose(d2.mdot, 1e-7 * msun / yr)


def test_yso_model_build_and_grid():
    m = AnalyticalYSOModel()
    m.star.radius = 2 * rsun
    m.star.temperature = 4000.0
    m.star.luminosity = lsun
    m.star.mass = 0.5 * msun
    dust = gray_dust()
    disk = m.add_flared_disk()
    disk.mass = 0.001 * msun
    disk.rmin = OptThinRadius(1600.0)
    disk.rmax = 50 * au
    disk.r_0 = 10 * au
    disk.h_0 = au
    disk.p = -1.0
    disk.beta = 1.25
    disk.dust = dust
    env = m.add_ulrich_envelope()
    env.rc = 50 * au
    env.mdot = 1e-7 * msun / yr
    env.rmin = OptThinRadius(1600.0)
    env.rmax = 500 * au
    env.dust = dust
    cav = env.add_bipolar_cavity()
    cav.theta_0 = 20.0
    cav.power = 1.5
    cav.r_0 = 100 * au
    cav.rho_0 = 1e-22
    cav.dust = dust
    m.set_spherical_polar_grid_auto(100, 32, 1)
    m.set_n_photons(initial=1000, imaging=1000)
    model = m.to_model()
    assert model.grid.shape[2] == 100
    # rmin resolved to a sensible sublimation radius (a few stellar radii+)
    assert disk.rmin > m.star.radius
    assert disk.rmin < au
    # three density components (disk + envelope + cavity), merged: same dust
    # so they merge into fewer grids when merge_if_possible
    assert 1 <= model.grid['density'].n_pop <= 3
    total_mass = sum(np.sum(np.asarray(d) * model.grid.volumes)
                     for d in model.grid.quantities['density'])
    assert total_mass > 0.001 * msun  # disk + envelope


def test_magnetospheric_accretion():
    m = AnalyticalYSOModel()
    m.star.radius = 2 * rsun
    m.star.temperature = 4000.0
    m.star.luminosity = lsun
    m.star.mass = 0.5 * msun
    m.setup_magnetospheric_accretion(1e-8 * msun / yr, 5 * 2 * rsun, 0.05)
    assert 'uv' in m.star.sources
    assert 'xray' in m.star.sources
    # total luminosity = stellar + shock
    lshock = G * 0.5 * msun * 1e-8 * msun / yr * \
        (1 / (2 * rsun) - 1 / (10 * rsun))
    assert np.isclose(m.star.total_luminosity(), lsun + lshock, rtol=1e-10)
