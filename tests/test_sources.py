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


# --- validation battery (ref sources/tests/test_source.py) -----------------

@pytest.mark.parametrize("bad", ['a', [1, 2], (1, 2, 3), object()])
def test_luminosity_rejects_non_scalars(bad):
    s = PointSource()
    with pytest.raises(Exception):
        s.luminosity = bad


@pytest.mark.parametrize("bad", [np.ones((2, 2)), 'xyz', (1.0, 2.0),
                                 [1.0, 2.0, 3.0, 4.0]])
def test_position_rejects_bad_shapes(bad):
    s = PointSource()
    with pytest.raises(Exception):
        s.position = bad


def test_temperature_must_be_positive():
    s = PointSource()
    with pytest.raises(Exception):
        s.temperature = -100.0


def test_spherical_radius_positive():
    s = SphericalSource()
    with pytest.raises(Exception):
        s.radius = -1e10


def test_incomplete_source_rejected_at_emit():
    s = PointSource()
    s.luminosity = 1.0
    # no temperature/spectrum: defaults to LTE, which point sources cannot
    # have (ref source_type.f90:130)
    from hyperion_tpu.transport import build_source_tables
    with pytest.raises(Exception):
        build_source_tables([s])


def test_external_box_bounds_validation():
    s = ExternalBoxSource()
    with pytest.raises(Exception):
        s.bounds = [1, 2, 3]
    s.bounds = [[0., 1.], [0., 2.], [0., 3.]]
    np.testing.assert_allclose(np.asarray(s.bounds),
                               [[0., 1.], [0., 2.], [0., 3.]])


def test_plane_parallel_direction():
    s = PlaneParallelSource()
    s.luminosity = 1.0
    s.temperature = 5000.0
    s.radius = 1e10
    s.position = (0., 0., 0.)
    s.direction = (45., 30.)
    s._check_all_set()


def test_point_collection_shape_consistency():
    s = PointSourceCollection()
    s.position = np.zeros((4, 3))
    with pytest.raises(Exception):
        s.luminosity = np.ones(3)   # mismatched length


def test_all_types_roundtrip_rtin(tmp_path):
    """Model-level write/read keeps every source type intact."""
    import h5py
    from hyperion_tpu.model import Model
    from hyperion_tpu.dust import IsotropicDust
    nu = np.logspace(5, 18, 12)
    dust = IsotropicDust(nu, np.repeat(0.4, 12), np.repeat(1.0, 12))
    m = Model()
    m.set_cartesian_grid(np.linspace(-1, 1, 3), np.linspace(-1, 1, 3),
                         np.linspace(-1, 1, 3))
    m.add_density_grid(np.full((2, 2, 2), 0.1), dust)

    p = m.add_point_source()
    p.luminosity, p.temperature = 1.0, 5000.0
    sp = m.add_spherical_source()
    sp.luminosity, sp.temperature, sp.radius = 2.0, 4000.0, 0.1
    e = m.add_external_spherical_source()
    e.luminosity, e.temperature, e.radius = 3.0, 3000.0, 0.9
    b = m.add_external_box_source()
    b.luminosity, b.temperature = 4.0, 2000.0
    b.bounds = [[-1., 1.], [-1., 1.], [-1., 1.]]
    pp = m.add_plane_parallel_source()
    pp.luminosity, pp.temperature, pp.radius = 5.0, 1000.0, 0.2
    pp.position, pp.direction = (0., 0., 0.9), (180., 0.)
    pc = m.add_point_source_collection()
    pc.position = np.array([[0.1, 0., 0.], [-0.1, 0., 0.]])
    pc.luminosity = np.array([0.5, 0.5])
    pc.temperature = 6000.0
    mp = m.add_map_source()
    mp.luminosity = 6.0
    mp.map = np.ones((2, 2, 2))
    mp.temperature = 500.0

    m.set_n_photons(initial=10, imaging=0)
    fn = str(tmp_path / 'all_sources.rtin')
    m.write(fn)
    m2 = Model.read(fn)
    assert len(m2.sources) == 7
    kinds = sorted(type(s).__name__ for s in m2.sources)
    assert kinds == sorted(['PointSource', 'SphericalSource',
                            'ExternalSphericalSource', 'ExternalBoxSource',
                            'PlaneParallelSource', 'PointSourceCollection',
                            'MapSource'])
    total = sum(np.sum(s.luminosity) for s in m2.sources)
    np.testing.assert_allclose(total, 22.0)
