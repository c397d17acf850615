import h5py
import numpy as np
import pytest

from hyperion_tpu.grid import AMRGrid, VoronoiGrid


def make_amr():
    amr = AMRGrid()
    level = amr.add_level()
    g = level.add_grid()
    g.xmin, g.xmax = -1., 1.
    g.ymin, g.ymax = -1., 1.
    g.zmin, g.zmax = -1., 1.
    g.nx = g.ny = g.nz = 4
    level2 = amr.add_level()
    g2 = level2.add_grid()
    g2.xmin, g2.xmax = -0.5, 0.5
    g2.ymin, g2.ymax = -0.5, 0.5
    g2.zmin, g2.zmax = -0.5, 0.5
    g2.nx = g2.ny = g2.nz = 4
    return amr


def test_amr_io_roundtrip(tmp_path):
    amr = make_amr()
    for level in amr.levels:
        for g in level.grids:
            g.quantities['density'] = [np.random.RandomState(1).rand(*g.shape)]
    with h5py.File(str(tmp_path / 'amr.h5'), 'w') as f:
        amr.write(f.create_group('Grid'))
    amr2 = AMRGrid()
    with h5py.File(str(tmp_path / 'amr.h5'), 'r') as f:
        amr2.read(f['Grid'])
    assert len(amr2.levels) == 2
    assert amr2.levels[1].grids[0].nx == 4
    assert np.allclose(amr2.levels[0].grids[0].quantities['density'][0],
                       amr.levels[0].grids[0].quantities['density'][0])
    assert amr2.get_geometry_id() == amr.get_geometry_id()


def test_voronoi_tessellation_volumes():
    rng = np.random.RandomState(3)
    n = 400
    grid = VoronoiGrid(rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                       rng.uniform(-1, 1, n),
                       xmin=-1, xmax=1, ymin=-1, ymax=1, zmin=-1, zmax=1)
    vols = grid.volumes
    # volumes tile the box exactly (mirror-clipped tessellation)
    assert np.isclose(vols.sum(), 8.0, rtol=1e-6)
    assert np.all(vols > 0)
    sn, si = grid.sparse_neighbors
    assert len(si) == n + 1
    # neighbor relation approximately symmetric for interior cells
    neigh0 = set(v for v in sn[si[0]:si[1]] if v >= 0)
    for j in neigh0:
        neigh_j = set(v for v in sn[si[j]:si[j + 1]] if v >= 0)
        assert 0 in neigh_j


def test_voronoi_io_roundtrip(tmp_path):
    rng = np.random.RandomState(4)
    n = 100
    grid = VoronoiGrid(rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                       rng.uniform(-1, 1, n),
                       xmin=-1, xmax=1, ymin=-1, ymax=1, zmin=-1, zmax=1)
    grid.quantities['density'] = [rng.rand(n)]
    with h5py.File(str(tmp_path / 'vor.h5'), 'w') as f:
        grid.write(f.create_group('Grid'))
    grid2 = VoronoiGrid()
    with h5py.File(str(tmp_path / 'vor.h5'), 'r') as f:
        grid2.read(f['Grid'])
    assert grid2.n_cells == n
    assert np.allclose(grid2.quantities['density'][0],
                       grid.quantities['density'][0])
    assert np.isclose(grid2.volumes.sum(), 8.0, rtol=1e-6)


def test_voronoi_function_average():
    rng = np.random.RandomState(5)
    n = 200
    grid = VoronoiGrid(rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                       rng.uniform(-1, 1, n),
                       xmin=-1, xmax=1, ymin=-1, ymax=1, zmin=-1, zmax=1)
    avg = grid.evaluate_function_average(lambda x, y, z: x * 0 + 2.5,
                                         n_samples=100000)
    assert np.allclose(avg, 2.5)
