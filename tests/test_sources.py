import h5py
import numpy as np
import pytest

from hyperion_tpu.sources import (PointSource, PointSourceCollection,
                                  SphericalSource, ExternalSphericalSource,
                                  ExternalBoxSource, MapSource,
                                  PlaneParallelSource, SpotSource, read_source)
from hyperion_tpu.util.integrate import integrate_loglog


def test_point_source_spectrum_normalization():
    s = PointSource(luminosity=3.846e33, temperature=5778.0)
    nu, fnu = s.get_spectrum(nu_range=(1e10, 1e18))
    assert np.isclose(integrate_loglog(nu, fnu), 3.846e33, rtol=1e-3)


def test_spectrum_resort():
    s = PointSource(luminosity=1.0)
    s.spectrum = (np.array([3.0, 1.0, 2.0]), np.array([30.0, 10.0, 20.0]))
    assert np.allclose(s.spectrum['nu'], [1.0, 2.0, 3.0])
    assert np.allclose(s.spectrum['fnu'], [10.0, 20.0, 30.0])


def test_spectrum_and_temperature_conflict():
    s = PointSource(luminosity=1.0, temperature=100.0)
    with pytest.raises(Exception):
        s.spectrum = (np.array([1.0, 2.0]), np.array([1.0, 1.0]))


def test_validation_errors():
    with pytest.raises(ValueError):
        PointSource(luminosity=-1.0)
    s = PointSource()
    with pytest.raises(ValueError):
        s.position = (1.0, 2.0)
    with pytest.raises(ValueError):
        s.spectrum = (np.array([1.0, 1.0]), np.array([1.0, 1.0]))


@pytest.mark.parametrize("make", [
    lambda: PointSource(luminosity=1.0, temperature=100.0, position=(1., 2., 3.)),
    lambda: SphericalSource(luminosity=2.0, temperature=5000.0, radius=7.0,
                            limb=True, position=(0., 0., 0.)),
    lambda: ExternalSphericalSource(luminosity=1.5, temperature=100.0,
                                    radius=5.0, position=(0., 1., 0.)),
    lambda: ExternalBoxSource(luminosity=1.0, temperature=90.0,
                              bounds=[(-1., 1.), (-2., 2.), (-3., 3.)]),
    lambda: PlaneParallelSource(luminosity=1.0, temperature=100.0,
                                radius=2.0, direction=(30.0, 40.0)),
])
def test_source_io_roundtrip(tmp_path, make):
    s = make()
    fname = str(tmp_path / 'src.h5')
    with h5py.File(fname, 'w') as f:
        s.write(f, 'source_00001')
    with h5py.File(fname, 'r') as f:
        s2 = read_source(f['source_00001'])
    assert type(s2) is type(s)
    assert np.isclose(np.sum(s2.luminosity), np.sum(s.luminosity))
    assert s2.name == s.name


def test_point_collection_roundtrip(tmp_path):
    s = PointSourceCollection(temperature=100.0)
    s.luminosity = np.array([1.0, 2.0, 3.0])
    s.position = np.array([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.]])
    fname = str(tmp_path / 'src.h5')
    with h5py.File(fname, 'w') as f:
        s.write(f, 'source_00001')
    with h5py.File(fname, 'r') as f:
        s2 = read_source(f['source_00001'])
    assert np.allclose(s2.luminosity, s.luminosity)
    assert np.allclose(s2.position, s.position)


def test_map_source_roundtrip(tmp_path):
    s = MapSource(luminosity=1.0)
    s.map = np.ones((2, 3, 4))
    fname = str(tmp_path / 'src.h5')
    with h5py.File(fname, 'w') as f:
        s.write(f, 'source_00001')
    with h5py.File(fname, 'r') as f:
        s2 = read_source(f['source_00001'])
    assert np.allclose(s2.map, 1.0)


def test_spherical_source_spots(tmp_path):
    s = SphericalSource(luminosity=1.0, temperature=5000.0, radius=2.0)
    s.add_spot(luminosity=0.1, temperature=10000.0, longitude=30.0,
               latitude=10.0, radius=20.0)
    fname = str(tmp_path / 'src.h5')
    with h5py.File(fname, 'w') as f:
        s.write(f, 'source_00001')
    with h5py.File(fname, 'r') as f:
        s2 = read_source(f['source_00001'])
    assert len(s2.spots) == 1
    assert np.isclose(s2.spots[0].longitude, 30.0)
