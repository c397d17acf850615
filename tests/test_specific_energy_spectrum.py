"""nu-resolved specific-energy spectrum (ref: specific_energy_spectrum
arrays, grid_physics_3d.f90:41-56; deposits at grid_propagate_3d.f90:155,217;
Python test model: hyperion/model/tests/test_specific_energy_spectrum.py)."""

import h5py
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.grid import CartesianGrid
from hyperion_tpu.model import Model
from hyperion_tpu.sources import PointSource
from hyperion_tpu.transport import (build_dust_tables,
                                    build_cartesian_geometry,
                                    build_source_tables, run_lucy)


def _setup(dtype=jnp.float64):
    nu = np.logspace(5, 18, 32)
    dust = IsotropicDust(nu, np.repeat(0.3, 32), np.repeat(1.0, 32))
    grid = CartesianGrid(np.linspace(-1, 1, 7), np.linspace(-1, 1, 7),
                         np.linspace(-1, 1, 7))
    geometry = build_cartesian_geometry(grid, dtype=dtype)
    dt = build_dust_tables([dust], dtype=dtype)
    st = build_source_tables([PointSource(luminosity=1.0, temperature=5000.)],
                             dtype=dtype)
    density = jnp.full((1, grid.n_cells), 0.3, dtype=dtype)
    return grid, geometry, dt, st, density


@pytest.mark.smoke
def test_spectrum_bins_sum_to_specific_energy():
    """With bin edges spanning all absorbed frequencies, the spectrum summed
    over bins equals specific_energy (ref docstring of
    set_specific_energy_spectrum_bins)."""
    grid, geometry, dt, st, density = _setup()
    edges = np.logspace(4, 19, 9)
    res = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(0),
                   n_photons=5000, n_iterations=1, batch_size=2048,
                   spectrum_bins=edges, enforce_energy_range=False,
                   verbose=False)
    spec = res.specific_energy_spectrum
    assert spec is not None and spec.shape == (1, 8, grid.n_cells)
    np.testing.assert_allclose(spec.sum(axis=1), res.specific_energy,
                               rtol=1e-5)
    # more than one bin is populated (source at 5000 K + re-emission)
    assert (spec.sum(axis=(0, 2)) > 0).sum() >= 2


def test_spectrum_narrow_bins_drop_outside_energy():
    """Energy absorbed outside the outer edges is not binned."""
    grid, geometry, dt, st, density = _setup()
    # a single narrow bin far below the stellar peak
    edges = np.array([1e6, 1e8])
    res = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(0),
                   n_photons=5000, n_iterations=1, batch_size=2048,
                   spectrum_bins=edges, enforce_energy_range=False,
                   verbose=False)
    spec = res.specific_energy_spectrum
    assert spec.sum() < res.specific_energy.sum() * 0.5


def test_spectrum_mrw_distributes_by_emissivity():
    """With MRW on, diffusion deposits spread over bins by the local
    emissivity instead of being dropped (ref
    deposit_specific_energy_spectrum)."""
    grid, geometry, dt, st, density = _setup()
    density = density * 2000.0  # optically thick -> MRW fires
    edges = np.logspace(4, 19, 7)
    res = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(2),
                   n_photons=500, n_iterations=1, batch_size=512,
                   spectrum_bins=edges, use_mrw=True, mrw_gamma=1.0,
                   n_mrw_max=100000, enforce_energy_range=False,
                   verbose=False)
    spec = res.specific_energy_spectrum
    np.testing.assert_allclose(spec.sum(axis=1), res.specific_energy,
                               rtol=0.05)


def test_spectrum_through_model_rtout(tmp_path):
    """End-to-end: conf knob -> engine -> rtout dataset, reference rtin
    schema (structured bin-edges table with an 'nu' column)."""
    nu = np.logspace(5, 18, 16)
    dust = IsotropicDust(nu, np.repeat(0.4, 16), np.repeat(1.0, 16))
    m = Model()
    m.set_cartesian_grid(np.linspace(-1, 1, 5), np.linspace(-1, 1, 5),
                         np.linspace(-1, 1, 5))
    m.add_density_grid(np.full((4, 4, 4), 0.1), dust)
    s = m.add_point_source()
    s.luminosity = 1.0
    s.temperature = 5000.0
    m.set_n_photons(initial=2000, imaging=0)
    m.set_n_initial_iterations(1)
    m.set_specific_energy_spectrum_bins(np.logspace(6, 18, 5))
    m.conf.output.output_specific_energy_spectrum = 'last'
    rtin = str(tmp_path / 's.rtin')
    rtout = str(tmp_path / 's.rtout')
    m.write(rtin)
    with h5py.File(rtin, 'r') as f:
        assert 'specific_energy_spectrum_bin_edges' in f
        assert f['specific_energy_spectrum_bin_edges']['nu'].shape == (5,)
    m2 = Model.read(rtin)
    np.testing.assert_allclose(m2.specific_energy_spectrum_bins,
                               np.logspace(6, 18, 5))
    from hyperion_tpu.model.run import run_model
    run_model(m2, rtout)
    with h5py.File(rtout, 'r') as f:
        spec = np.array(f['iteration_00001/specific_energy_spectrum'])
        se = np.array(f['iteration_00001/specific_energy'])
        assert spec.shape == (1, 4, 4, 4, 4)
        assert np.all(spec.sum(axis=1) <= se * (1 + 1e-5))
        assert np.array(
            f['iteration_00001/specific_energy_spectrum_bin_edges']
        ).shape == (5,)
