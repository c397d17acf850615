"""End-to-end model runs on AMR and Voronoi grids (write .rtin -> engine ->
.rtout layout checks; ref: per-grid runs in hyperion/model/tests/test_model.py
and the AMR on-disk layout in src/grid/grid_io_amr.f90)."""

import h5py
import numpy as np

from hyperion_tpu.model import Model
from hyperion_tpu.grid import AMRGrid
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.util.constants import lsun, au


def make_dust():
    nu = np.logspace(5, 18, 30)
    return IsotropicDust(nu, np.repeat(0.4, 30), np.repeat(2.0, 30))


def test_amr_end_to_end(tmp_path):
    lim = 3 * au
    amr = AMRGrid()
    level1 = amr.add_level()
    g = level1.add_grid()
    g.xmin, g.xmax = -lim, lim
    g.ymin, g.ymax = -lim, lim
    g.zmin, g.zmax = -lim, lim
    g.nx = g.ny = g.nz = 8
    g.quantities['density'] = np.full((8, 8, 8), 1e-16)
    level2 = amr.add_level()
    f = level2.add_grid()
    f.xmin, f.xmax = -lim / 2, lim / 2
    f.ymin, f.ymax = -lim / 2, lim / 2
    f.zmin, f.zmax = -lim / 2, lim / 2
    f.nx = f.ny = f.nz = 8
    f.quantities['density'] = np.full((8, 8, 8), 1e-16)

    m = Model()
    m.set_amr_grid(amr)
    m.add_density_grid(amr['density'], make_dust())
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 6000.0
    s.position = (0.1 * au, 0.0, 0.0)
    m.set_n_photons(initial=20000, imaging=0)
    m.set_n_initial_iterations(1)
    m.write(str(tmp_path / 'amr.rtin'))

    out = m.run()
    with h5py.File(m.filename.replace('.rtin', '.rtout'), 'r') as fh:
        it = fh['iteration_00001']
        se1 = np.array(it['level_00001/grid_00001/specific_energy'])
        se2 = np.array(it['level_00002/grid_00001/specific_energy'])
        assert se1.shape == (1, 8, 8, 8)
        assert se2.shape == (1, 8, 8, 8)
        assert se2.max() > 0
        assert int(it.attrs['killed_photons_geo']) == 0


def test_voronoi_end_to_end(tmp_path):
    lim = 3 * au
    rng = np.random.RandomState(11)
    n = 200
    m = Model()
    m.set_voronoi_grid(rng.uniform(-lim, lim, n), rng.uniform(-lim, lim, n),
                       rng.uniform(-lim, lim, n),
                       xmin=-lim, xmax=lim, ymin=-lim, ymax=lim,
                       zmin=-lim, zmax=lim)
    m.add_density_grid(np.full(n, 1e-16), make_dust())
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 6000.0
    m.set_n_photons(initial=20000, imaging=0)
    m.set_n_initial_iterations(1)
    m.write(str(tmp_path / 'vor.rtin'))

    out = m.run()
    with h5py.File(m.filename.replace('.rtin', '.rtout'), 'r') as fh:
        it = fh['iteration_00001']
        se = np.array(it['specific_energy'])
        assert se.shape == (1, n)
        assert (se > 0).mean() > 0.9
        assert int(it.attrs['killed_photons_geo']) == 0
        assert int(it.attrs['killed_photons_int']) == 0
