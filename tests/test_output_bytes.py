"""set_output_bytes controls the on-disk float width of physical arrays
(ref: conf_files.py:700 set_output_bytes + grid_io.f90 f4/f8 writes)."""

import h5py
import numpy as np
import pytest

from hyperion_tpu.model import Model
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.model.run import run_model
from hyperion_tpu.util.constants import au, lsun


def _tiny_model(io_bytes):
    nu = np.logspace(np.log10(3e10), np.log10(5e16), 20)
    dust = IsotropicDust(nu, np.full(20, 0.4), np.full(20, 50.0))
    dust.set_lte_emissivities(n_temp=30, temp_min=0.1, temp_max=1600.)
    m = Model()
    x = np.linspace(-au, au, 4)
    m.set_cartesian_grid(x, x, x)
    m.add_density_grid(np.full((3, 3, 3), 1e-18), dust)
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 6000.
    m.set_n_photons(initial=1000, imaging=0)
    m.set_n_initial_iterations(1)
    m.set_copy_input(False)
    m.set_output_bytes(io_bytes)
    m.conf.output.output_density = 'last'
    return m


@pytest.mark.parametrize('io_bytes,expected', [(4, np.float32),
                                               (8, np.float64)])
def test_output_bytes_dtype(tmp_path, io_bytes, expected):
    m = _tiny_model(io_bytes)
    rtin = str(tmp_path / 'm.rtin')
    rtout = str(tmp_path / 'm.rtout')
    m.write(rtin)
    m2 = Model.read(rtin)
    assert m2.physics_io_bytes == io_bytes
    run_model(m2, rtout)
    with h5py.File(rtout, 'r') as f:
        g = f['iteration_00001']
        assert g['specific_energy'].dtype == expected
        assert g['density'].dtype == expected


def test_output_bytes_validation():
    m = Model()
    with pytest.raises(ValueError):
        m.set_output_bytes(2)
