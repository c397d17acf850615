"""OpticalProperties validation + extrapolation semantics (ported from the
reference's dust/tests/test_optical_properties.py)."""

import numpy as np
import pytest

from hyperion_tpu.dust.optical_properties import OpticalProperties
from hyperion_tpu.util.constants import c


def _base():
    o = OpticalProperties()
    o.nu = np.logspace(8., 10., 100)
    o.albedo = np.repeat(0.5, 100)
    o.chi = np.ones(100)
    o.mu = [-1., 1.]
    o.initialize_scattering_matrix()
    return o


@pytest.mark.parametrize('attribute', ['nu', 'chi', 'albedo', 'mu'])
def test_set_vector_list(attribute):
    o = OpticalProperties()
    setattr(o, attribute, [0.1, 0.5, 1.0])


@pytest.mark.parametrize('attribute', ['nu', 'chi', 'albedo', 'mu'])
def test_set_vector_array(attribute):
    o = OpticalProperties()
    setattr(o, attribute, np.array([0.1, 0.5, 1.0]))


@pytest.mark.parametrize('attribute', ['nu', 'chi', 'albedo', 'mu'])
def test_set_vector_invalid_scalar(attribute):
    o = OpticalProperties()
    with pytest.raises(Exception):
        setattr(o, attribute, 0.5)


@pytest.mark.parametrize('attribute', ['nu', 'chi', 'albedo', 'mu'])
def test_set_vector_invalid_2d(attribute):
    o = OpticalProperties()
    with pytest.raises(Exception):
        setattr(o, attribute, np.ones((3, 3)))


def test_range_nu_invalid():
    o = OpticalProperties()
    with pytest.raises(Exception):
        o.nu = [-1., 1., 2.]      # negative frequency
    with pytest.raises(Exception):
        o.nu = [2., 1., 3.]       # not monotonic


def test_range_albedo_invalid():
    o = OpticalProperties()
    with pytest.raises(Exception):
        o.albedo = [-0.1, 0.5]
    with pytest.raises(Exception):
        o.albedo = [0.5, 1.5]


def test_range_chi_invalid():
    o = OpticalProperties()
    with pytest.raises(Exception):
        o.chi = [-1., 1.]


def test_range_mu():
    o = OpticalProperties()
    o.mu = [-1., 1.]
    o.mu = [-0.5, 0.5]
    with pytest.raises(Exception):
        o.mu = [-1.5, 1.]
    with pytest.raises(Exception):
        o.mu = [-1., 1.5]


def test_extrapolate_inner_range():
    o = _base()
    o.extrapolate_nu(1e9, 2e9)
    assert o.nu[0] == 1.e8 and o.nu[-1] == 1.e10


def test_extrapolate_upper():
    o = _base()
    o.extrapolate_nu(1e9, 1e11)
    assert o.nu[0] == 1.e8 and o.nu[-1] == 1.e11


def test_extrapolate_lower():
    o = _base()
    o.extrapolate_nu(1e7, 1e9)
    assert o.nu[0] == 1.e7 and o.nu[-1] == 1.e10


def test_extrapolate_both():
    o = _base()
    o.extrapolate_nu(1e7, 1e11)
    assert o.nu[0] == 1.e7 and o.nu[-1] == 1.e11


def test_extrapolate_wav():
    o = _base()
    o.extrapolate_wav(1., 1.e20)
    np.testing.assert_allclose(o.nu[0], c / 1.e16, rtol=1e-12)
    np.testing.assert_allclose(o.nu[-1], c / 1.e-4, rtol=1e-12)


def test_extrapolate_albedo_constant():
    """Extrapolation keeps albedo constant and chi on a power law at the
    table ends (ref extrapolate docstring)."""
    o = _base()
    o.chi = np.logspace(2., 0., 100)   # chi ~ nu^-1 slope in log space
    o.extrapolate_nu(1e7, 1e11)
    assert o.albedo[0] == o.albedo[1]
    assert o.albedo[-1] == o.albedo[-2]
    # power-law continuation: log-log slope at the end persists
    s_end = np.log(o.chi[-1] / o.chi[-2]) / np.log(o.nu[-1] / o.nu[-2])
    s_in = np.log(o.chi[-3] / o.chi[-4]) / np.log(o.nu[-3] / o.nu[-4])
    np.testing.assert_allclose(s_end, s_in, rtol=1e-6)


def test_io_roundtrip(tmp_path):
    import h5py
    o = _base()
    path = str(tmp_path / 'op.h5')
    with h5py.File(path, 'w') as f:
        o.to_hdf5_group(f)
    o2 = OpticalProperties()
    with h5py.File(path, 'r') as f:
        o2.from_hdf5_group(f)
    np.testing.assert_allclose(o.nu, o2.nu)
    np.testing.assert_allclose(o.chi, o2.chi)
    np.testing.assert_allclose(o.albedo, o2.albedo)
    np.testing.assert_allclose(o.mu, o2.mu)
    np.testing.assert_allclose(o.P1, o2.P1)
