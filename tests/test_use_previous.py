"""Restart/reuse APIs: use_geometry / use_quantities / use_sources and
specific_energy_type='additional'
(ref: hyperion/model/model.py:174-410, grid_physics_3d.f90:213-240,
hyperion/model/tests/test_use_previous.py)."""

import numpy as np
import pytest

from hyperion_tpu.model import Model
from hyperion_tpu.model.helpers import (find_last_iteration, tau_to_radius,
                                        hseq_profile)
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.util.constants import msun, au, G, m_h, k


def _gray_dust():
    nu = np.logspace(5, 18, 16)
    return IsotropicDust(nu, np.repeat(0.4, 16), np.repeat(1.0, 16))


def _basic_model(tmp_path, name):
    m = Model()
    m.set_cartesian_grid(np.linspace(-1, 1, 5), np.linspace(-1, 1, 5),
                         np.linspace(-1, 1, 5))
    m.add_density_grid(np.full(m.grid.shape, 0.3), _gray_dust())
    m.add_point_source(luminosity=1.0, temperature=5000.0)
    m.set_n_photons(initial=2000, imaging=0)
    m.set_n_initial_iterations(2)
    m.set_minimum_temperature(5.0)
    path = str(tmp_path / name)
    m.write(path + '.rtin')
    m.run(path + '.rtout')
    return m, path + '.rtout'


@pytest.mark.smoke
def test_use_geometry_sources_quantities(tmp_path):
    m0, out = _basic_model(tmp_path, 'first')

    m = Model()
    m.use_geometry(out)
    assert m.grid.shape == (4, 4, 4)
    np.testing.assert_allclose(m.grid.x_wall, np.linspace(-1, 1, 5))
    assert 'density' not in m.grid

    m.use_sources(out)
    assert len(m.sources) == 1
    assert m.sources[0].temperature == 5000.0

    # last-iteration quantities: density + specific_energy + dust
    m.use_quantities(out)
    assert 'density' in m.grid and 'specific_energy' in m.grid
    se = m.grid['specific_energy'][0].array
    assert se.shape == (4, 4, 4) and np.all(se > 0)
    assert len(m.dust) == 1
    # minimum specific energy carried over
    assert m._minimum_specific_energy is not None

    # the re-assembled model writes and runs
    m.add_source(m.sources.pop())  # no-op reshuffle keeps the list valid
    m.set_n_photons(initial=500, imaging=0)
    m.set_n_initial_iterations(1)
    p2 = str(tmp_path / 'second')
    m.write(p2 + '.rtin')
    m.run(p2 + '.rtout')


@pytest.mark.smoke
def test_use_quantities_only_initial(tmp_path):
    m0, out = _basic_model(tmp_path, 'first')
    m = Model()
    m.use_geometry(out)
    m.use_quantities(out, only_initial=True)
    # the input had no specific_energy dataset -> only density is read
    assert 'density' in m.grid
    assert 'specific_energy' not in m.grid
    np.testing.assert_allclose(m.grid['density'][0].array,
                               np.full((4, 4, 4), 0.3))


@pytest.mark.smoke
def test_specific_energy_additional(tmp_path):
    """With specific_energy_type='additional' the input field is added on
    top of the MC estimate, so the result is strictly larger than both the
    standalone MC run and the additional field."""
    dust = _gray_dust()

    def run(se0, se_type, name):
        m = Model()
        m.set_cartesian_grid(np.linspace(-1, 1, 4), np.linspace(-1, 1, 4),
                             np.linspace(-1, 1, 4))
        kw = {} if se0 is None else dict(specific_energy=se0)
        m.add_density_grid(np.full(m.grid.shape, 0.2), dust, **kw)
        m.add_point_source(luminosity=1.0, temperature=5000.0)
        m.set_n_photons(initial=3000, imaging=0)
        m.set_n_initial_iterations(1)
        m.set_specific_energy_type(se_type)
        m.set_enforce_energy_range(False)
        p = str(tmp_path / name)
        m.write(p + '.rtin')
        m.run(p + '.rtout')
        import h5py
        with h5py.File(p + '.rtout', 'r') as f:
            return np.array(f['iteration_00001/specific_energy'])

    se_plain = run(None, 'initial', 'plain')
    extra = np.full((3, 3, 3), 10.0 * se_plain.max())
    se_add = run(extra, 'additional', 'added')
    # every cell must exceed the additional floor (MC contribution >= 0)
    assert np.all(se_add >= 10.0 * se_plain.max() * 0.999)
    # and carry MC signal on top: total strictly above the additional field
    assert se_add.sum() > extra.sum() * 1.0001


@pytest.mark.smoke
def test_find_last_iteration(tmp_path):
    m0, out = _basic_model(tmp_path, 'first')
    import h5py
    with h5py.File(out, 'r') as f:
        assert find_last_iteration(f) == 2


@pytest.mark.smoke
def test_tau_to_radius():
    from hyperion_tpu.grid import SphericalPolarGrid
    m = Model()
    m.set_spherical_polar_grid(np.linspace(0, 10 * au, 41),
                               np.linspace(0, np.pi, 5),
                               np.linspace(0, 2 * np.pi, 3))
    rho = np.full(m.grid.shape, 1.0e-18)
    m.add_density_grid(rho, _gray_dust())
    # chi = 1 cm2/g flat => tau(r) = (R - r) * rho * chi
    surf = tau_to_radius(m, 1.0e-6, 0.55)
    R = 10 * au
    expected = R - 1.0e-6 / (1.0e-18 * 1.0)
    assert surf.shape == (2, 4)
    np.testing.assert_allclose(surf, expected, rtol=1e-3)


@pytest.mark.smoke
def test_hseq_profile_isothermal():
    """Isothermal hseq profile is a gaussian with H^2 = k T w^3 / (G M mu m_h)
    in the thin-disk limit z << w."""
    w = 10 * au
    z = np.linspace(-au, au, 4001)
    T = np.full_like(z, 50.0)
    mstar = msun
    rho = hseq_profile(w, z, T, mstar)
    # exact isothermal integral: I(z) = (1/T) (1/w - 1/sqrt(w^2+z^2))
    factor = G * msun * 2.279 * m_h / k / 50.0
    expected = np.exp(-factor * (1.0 / w - 1.0 / np.sqrt(w ** 2 + z ** 2)))
    expected /= np.trapezoid(expected, z) if hasattr(np, 'trapezoid') else \
        np.trapz(expected, z)
    np.testing.assert_allclose(rho, expected, rtol=1e-3)
    # symmetric about the midplane
    np.testing.assert_allclose(rho, rho[::-1], rtol=1e-8)
