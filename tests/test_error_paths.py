"""Misconfiguration error paths the reference engine aborts on
(ref hyperion/model/tests/test_fortran.py:13-84) — this build fails fast
with the same diagnostics before any photons run."""

import numpy as np
import pytest

from hyperion_tpu.model import Model
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.model.run import run_model
from hyperion_tpu.util.functions import B_nu


def _dust(nu_lo=5, nu_hi=18, n=16):
    nu = np.logspace(nu_lo, nu_hi, n)
    return IsotropicDust(nu, np.repeat(0.4, n), np.repeat(1.0, n))


@pytest.mark.smoke
def test_point_source_outside_grid(tmp_path):
    m = Model()
    m.set_cartesian_grid([-1., 1.], [-1., 1.], [-1., 1.])
    m.add_density_grid(np.array([[[1.]]]), _dust())
    m.set_n_photons(initial=100, imaging=0)
    s = m.add_point_source()
    s.position = (-1.5, 0., 0.)
    s.temperature = 5000.
    s.luminosity = 1.
    rtin = str(tmp_path / 'a.rtin')
    m.write(rtin)
    with pytest.raises(ValueError, match="not emitted inside a cell"):
        run_model(Model.read(rtin), str(tmp_path / 'a.rtout'))


@pytest.mark.smoke
def test_spectrum_dust_nooverlap(tmp_path):
    narrow = IsotropicDust(np.logspace(8., 10., 50), np.repeat(0.5, 50),
                           np.ones(50))
    m = Model()
    s = m.add_point_source()
    s.luminosity = 1.
    nu = np.logspace(5., 12., 200)
    s.spectrum = (nu, B_nu(nu, 6000.))
    m.set_cartesian_grid([-1., 1.], [-1., 1.], [-1., 1.])
    m.add_density_grid(np.array([[[1.]]]), narrow)
    m.set_n_photons(initial=100, imaging=0)
    rtin = str(tmp_path / 'b.rtin')
    m.write(rtin)
    with pytest.raises(ValueError, match="outside the range defined"):
        run_model(Model.read(rtin), str(tmp_path / 'b.rtout'))


def test_valid_model_passes_validation(tmp_path):
    m = Model()
    m.set_cartesian_grid([-1., 1.], [-1., 1.], [-1., 1.])
    m.add_density_grid(np.array([[[0.1]]]), _dust())
    m.set_n_photons(initial=100, imaging=0)
    m.set_n_initial_iterations(1)
    s = m.add_point_source()
    s.temperature = 5000.
    s.luminosity = 1.
    rtin = str(tmp_path / 'c.rtin')
    m.write(rtin)
    run_model(Model.read(rtin), str(tmp_path / 'c.rtout'))
