"""Minimum temperature / specific energy floors (ported from the
reference's test_minimum_energy.py, 547 LoC): floor values applied per
dust population, list/scalar forms, validation, and output temperatures."""

import numpy as np
import pytest

from hyperion_tpu.model import Model
from hyperion_tpu.model.run import run_model
from hyperion_tpu.model.model_output import ModelOutput
from hyperion_tpu.dust import IsotropicDust


def _dust():
    nu = np.logspace(np.log10(3e10), np.log10(5e16), 16)
    d = IsotropicDust(nu, np.repeat(0.5, 16), np.repeat(10.0, 16))
    d.set_lte_emissivities(n_temp=30, temp_min=0.1, temp_max=1600.)
    return d


def _model_noimaging(n_pop=1):
    m = Model()
    m.set_cartesian_grid([-1., 1.], [-1., 1.], [-1., 1.])
    for _ in range(n_pop):
        m.add_density_grid(np.array([[[1.e-30]]]), _dust(),
                           merge_if_possible=False)
    s = m.add_point_source()
    s.luminosity = 1.
    s.temperature = 6000.
    m.set_n_initial_iterations(1)
    m.set_n_photons(initial=500, imaging=0)
    return m


def _run(m, tmp_path):
    rtin = str(tmp_path / 'm.rtin')
    rtout = str(tmp_path / 'm.rtout')
    m.write(rtin)
    m2 = Model.read(rtin)
    m2.filename = rtin
    run_model(m2, rtout)
    return ModelOutput(rtout)


def test_minimum_temperature_scalar(tmp_path):
    m = _model_noimaging()
    m.set_minimum_temperature(10.)
    out = _run(m, tmp_path)
    t = out.get_quantities()['temperature']
    assert np.allclose(np.asarray(t[0].array).min(), 10., rtol=1e-5)


def test_minimum_temperature_scalar_list(tmp_path):
    m = _model_noimaging()
    m.set_minimum_temperature([10.])
    out = _run(m, tmp_path)
    t = out.get_quantities()['temperature']
    assert np.allclose(np.asarray(t[0].array).min(), 10., rtol=1e-5)


def test_minimum_temperature_invalid_negative():
    m = _model_noimaging()
    with pytest.raises(Exception):
        m.set_minimum_temperature(-10.)


def test_minimum_temperature_invalid_string():
    m = _model_noimaging()
    with pytest.raises(Exception):
        m.set_minimum_temperature('a')


def test_minimum_temperature_invalid_list_negative():
    m = _model_noimaging()
    with pytest.raises(Exception):
        m.set_minimum_temperature([-10.])


def test_minimum_temperature_count_mismatch(tmp_path):
    m = _model_noimaging()
    m.set_minimum_temperature([10., 10.])
    with pytest.raises(Exception):
        m.write(str(tmp_path / 'm.rtin'))


def test_minimum_temperature_two_pops(tmp_path):
    m = _model_noimaging(n_pop=2)
    m.set_minimum_temperature([10., 8.])
    out = _run(m, tmp_path)
    t = out.get_quantities()['temperature']
    assert np.allclose(np.asarray(t[0].array).min(), 10., rtol=1e-5)
    assert np.allclose(np.asarray(t[1].array).min(), 8., rtol=1e-5)


def test_minimum_temperature_two_pops_count_mismatch(tmp_path):
    m = _model_noimaging(n_pop=2)
    m.set_minimum_temperature([10., 8., 6.])
    with pytest.raises(Exception):
        m.write(str(tmp_path / 'm.rtin'))


def test_minimum_specific_energy_scalar(tmp_path):
    m = _model_noimaging()
    m.set_minimum_specific_energy(2.)
    out = _run(m, tmp_path)
    se = out.get_quantities()['specific_energy']
    assert np.asarray(se[0].array).min() >= 2. * (1 - 1e-6)


def test_minimum_specific_energy_two_pops(tmp_path):
    m = _model_noimaging(n_pop=2)
    m.set_minimum_specific_energy([2., 3.])
    out = _run(m, tmp_path)
    se = out.get_quantities()['specific_energy']
    assert np.asarray(se[0].array).min() >= 2. * (1 - 1e-6)
    assert np.asarray(se[1].array).min() >= 3. * (1 - 1e-6)


def test_minimum_specific_energy_invalid():
    m = _model_noimaging()
    with pytest.raises(Exception):
        m.set_minimum_specific_energy(-1.)


@pytest.mark.parametrize('output', ['density', 'density_diff', 'n_photons',
                                    'specific_energy'])
def test_output_grids_exist(tmp_path, output):
    """Each OutputConf switch materializes its dataset in the rtout (ref
    test_output_physical.py:12-37; density_diff was previously accepted
    but never written)."""
    m = _model_noimaging()
    m.conf.output.output_density = 'last' if output == 'density' else 'none'
    m.conf.output.output_density_diff = \
        'last' if output == 'density_diff' else 'none'
    m.conf.output.output_n_photons = \
        'last' if output == 'n_photons' else 'none'
    m.conf.output.output_specific_energy = \
        'last' if output == 'specific_energy' else 'none'
    out = _run(m, tmp_path)
    assert output in out.get_available_components()
    out.get_quantities()[output]
    if output == 'specific_energy':
        assert 'temperature' in out.get_available_components()
        out.get_quantities()['temperature']


def test_output_grids_density_roundtrip(tmp_path):
    """The output density equals the input density when nothing sublimates
    (ref test_output_physical.py:40-60)."""
    m = _model_noimaging()
    m.conf.output.output_density = 'last'
    out = _run(m, tmp_path)
    rho = np.asarray(out.get_quantities()['density'][0].array)
    np.testing.assert_allclose(rho, 1.e-30, rtol=1e-6)


def test_output_density_roundtrip_nonunit_extent(tmp_path):
    """Density and density_diff are written in physical units on grids whose
    extent gives a non-unit engine length scale (the engine array carries a
    length_scale factor that must be divided back out; ref grid output is
    always physical, grid_generic.f90:114-120)."""
    from hyperion_tpu.util.constants import au
    m = Model()
    m.set_cartesian_grid([-au, au], [-au, au], [-au, au])
    m.add_density_grid(np.array([[[1.e-16]]]), _dust())
    s = m.add_point_source()
    s.luminosity = 1.
    s.temperature = 6000.
    m.set_n_initial_iterations(1)
    m.set_n_photons(initial=500, imaging=0)
    m.conf.output.output_density = 'last'
    m.conf.output.output_density_diff = 'last'
    out = _run(m, tmp_path)
    q = out.get_quantities()
    rho = np.asarray(q['density'][0].array)
    np.testing.assert_allclose(rho, 1.e-16, rtol=1e-6)
    diff = np.asarray(q['density_diff'][0].array)
    assert np.abs(diff).max() <= 1.e-16 * 1e-6
