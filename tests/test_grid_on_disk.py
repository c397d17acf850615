"""GridOnDisk: reference a pre-written grid file from a model without
loading it (ref grid_on_disk.py + model.py use_grid_from_file)."""

import h5py
import numpy as np
import pytest

from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.grid import CartesianGrid, GridOnDisk
from hyperion_tpu.model import Model
from hyperion_tpu.model.run import run_model


@pytest.fixture
def grid_file(tmp_path):
    """A standalone HDF5 file holding a grid group in rtin layout."""
    grid = CartesianGrid(np.linspace(-1, 1, 5), np.linspace(-1, 1, 5),
                         np.linspace(-1, 1, 5))
    grid.quantities['density'] = [np.full((4, 4, 4), 0.2)]
    fn = str(tmp_path / 'biggrid.h5')
    with h5py.File(fn, 'w') as f:
        grid.write(f.create_group('mygrid'))
    return fn


def _dust():
    nu = np.logspace(5, 18, 16)
    return IsotropicDust(nu, np.repeat(0.4, 16), np.repeat(1.0, 16))


@pytest.mark.smoke
def test_grid_on_disk_handle(grid_file):
    g = GridOnDisk(grid_file, path='/mygrid')
    assert g.grid_type == 'car'
    assert 'density' in g
    assert 'specific_energy' not in g
    assert g['density'].n_pop == 1
    assert g['density'].shape == (1, 4, 4, 4)


def _model_with_disk_grid(grid_file, copy):
    m = Model()
    m.use_grid_from_file(grid_file, path='/mygrid', dust=[_dust()])
    s = m.add_point_source()
    s.luminosity = 1.0
    s.temperature = 5000.0
    m.set_n_photons(initial=1000, imaging=0)
    m.set_n_initial_iterations(1)
    return m


@pytest.mark.parametrize("copy", [True, False])
def test_grid_on_disk_runs_model(grid_file, tmp_path, copy):
    m = _model_with_disk_grid(grid_file, copy)
    rtin = str(tmp_path / 'd.rtin')
    rtout = str(tmp_path / 'd.rtout')
    m.write(rtin, copy=copy)
    with h5py.File(rtin, 'r') as f:
        link = f.get('Grid', getlink=True)
        if copy:
            assert isinstance(link, h5py.HardLink)
        else:
            assert isinstance(link, h5py.ExternalLink)
        assert f['Grid/Geometry'].attrs['grid_type'] == b'car'
    m2 = Model.read(rtin)
    run_model(m2, rtout)
    with h5py.File(rtout, 'r') as f:
        assert 'date_ended' in f.attrs
        se = np.array(f['iteration_00001/specific_energy'])
        assert se.sum() > 0


def test_grid_on_disk_rejects_minimum_energy(grid_file, tmp_path):
    m = _model_with_disk_grid(grid_file, True)
    m.set_minimum_temperature(5.0)
    with pytest.raises(ValueError, match="grid from disk"):
        m.write(str(tmp_path / 'x.rtin'))
