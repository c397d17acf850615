import h5py
import numpy as np
import pytest

from hyperion_tpu.grid import (CartesianGrid, CylindricalPolarGrid,
                               SphericalPolarGrid)


def test_cartesian_basics():
    g = CartesianGrid([-1., 0., 1.], [-2., 2.], [-3., -1., 1., 3.])
    assert g.shape == (3, 1, 2)
    assert g.n_cells == 6
    # Every cell: dx=1, dy=4, dz=2 -> V=8
    assert np.allclose(g.volumes, 8.0)
    assert np.allclose(g.widths[0], 1.0)
    assert np.allclose(g.widths[1], 4.0)
    assert np.allclose(g.widths[2], 2.0)


def test_cartesian_volume_total():
    x = np.linspace(-1, 1, 7)
    y = np.linspace(-2, 2, 5)
    z = np.logspace(0, 1, 4)
    g = CartesianGrid(x, y, z)
    assert np.isclose(g.volumes.sum(), 2 * 4 * 9)


def test_spherical_volume_total():
    g = SphericalPolarGrid(np.linspace(0, 10, 11), np.linspace(0, np.pi, 7),
                           np.linspace(0, 2 * np.pi, 5))
    assert np.isclose(g.volumes.sum(), 4. / 3. * np.pi * 1000.0)


def test_cylindrical_volume_total():
    g = CylindricalPolarGrid(np.linspace(0, 5, 6), np.linspace(-2, 2, 5),
                             np.linspace(0, 2 * np.pi, 9))
    assert np.isclose(g.volumes.sum(), np.pi * 25 * 4)


def test_wall_validation():
    with pytest.raises(ValueError):
        CartesianGrid([1., 0.], [0., 1.], [0., 1.])
    with pytest.raises(ValueError):
        SphericalPolarGrid([-1., 1.], [0., np.pi], [0., 2 * np.pi])
    with pytest.raises(ValueError):
        SphericalPolarGrid([0., 1.], [0., 4.], [0., 2 * np.pi])


def test_quantity_views():
    g = CartesianGrid([-1., 0., 1.], [-1., 1.], [-1., 1.])
    density = np.ones(g.shape)
    g['density'] = []
    g['density'].append(density)
    g['density'].append(2 * density)
    assert g['density'].n_pop == 2
    assert np.allclose(g['density'][1].array, 2.0)


def test_quantity_shape_check():
    g = CartesianGrid([-1., 0., 1.], [-1., 1.], [-1., 1.])
    g['density'] = []
    with pytest.raises(ValueError):
        g['density'].append(np.ones((4, 4, 4)))


@pytest.mark.parametrize("cls,walls", [
    (CartesianGrid, ([-1., 0., 1.], [-2., 2.], [-3., 0., 3.])),
    (CylindricalPolarGrid, ([0., 1., 2.], [-1., 1.], [0., np.pi, 2 * np.pi])),
    (SphericalPolarGrid, ([0., 1., 2.], [0., 1.5, np.pi], [0., 2 * np.pi])),
])
def test_grid_io_roundtrip(tmp_path, cls, walls):
    g = cls(*walls)
    g['density'] = []
    rho = np.random.RandomState(42).rand(*g.shape)
    g['density'].append(rho)
    fname = str(tmp_path / 'grid.h5')
    with h5py.File(fname, 'w') as f:
        g.write(f.create_group('Grid'))
    g2 = cls()
    with h5py.File(fname, 'r') as f:
        g2.read(f['Grid'])
    assert g2.shape == g.shape
    assert np.allclose(g2.quantities['density'][0], rho)
    assert g2.get_geometry_id() == g.get_geometry_id()
