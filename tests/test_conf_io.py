"""Run/image configuration HDF5 round-trips: every knob written by
write_run_conf / image conf writers must read back identically
(ref: hyperion/conf/tests/test_conf_io.py)."""

import h5py
import numpy as np
import pytest

from hyperion_tpu.conf import (RunConf, PeeledImageConf, BinnedImageConf,
                               OutputConf)


class _Runnable(RunConf):
    def __init__(self):
        self._initialize_run_conf()


def roundtrip_run(conf, tmp_path):
    fn = str(tmp_path / 'conf.h5')
    with h5py.File(fn, 'w') as f:
        conf.write_run_conf(f)
    back = _Runnable()
    with h5py.File(fn, 'r') as f:
        back.read_run_conf(f)
    return back


def test_photon_counts_roundtrip(tmp_path):
    c = _Runnable()
    c.set_n_photons(initial=12345, imaging=678)
    c.set_n_initial_iterations(7)
    b = roundtrip_run(c, tmp_path)
    assert b.n_photons['initial'] == 12345
    assert b.n_photons['last'] == 678
    assert b.n_iterations == 7


def test_monochromatic_photon_counts_roundtrip(tmp_path):
    c = _Runnable()
    c._monochromatic = True
    c.set_n_photons(initial=10, imaging_sources=11, imaging_dust=12)
    b = roundtrip_run(c, tmp_path)
    assert b.n_photons['last_sources'] == 11
    assert b.n_photons['last_dust'] == 12


def test_seed_roundtrip(tmp_path):
    c = _Runnable()
    c.set_seed(-98765)
    assert roundtrip_run(c, tmp_path)._seed == -98765


def test_seed_validation():
    c = _Runnable()
    with pytest.raises(Exception):
        c.set_seed(1.5)


def test_interaction_caps_roundtrip(tmp_path):
    c = _Runnable()
    c.set_n_photons(initial=1, imaging=1)
    c.set_max_interactions(4242)
    c.set_max_reabsorptions(17)
    c.set_kill_on_absorb(True)
    c.set_kill_on_scatter(True)
    b = roundtrip_run(c, tmp_path)
    assert b.n_inter_max == 4242
    assert b.n_reabs_max == 17
    assert b.kill_on_absorb is True
    assert b.kill_on_scatter is True


def test_mrw_roundtrip(tmp_path):
    c = _Runnable()
    c.set_n_photons(initial=1, imaging=1)
    c.set_mrw(True, gamma=2.5, inter_max=777)
    b = roundtrip_run(c, tmp_path)
    assert b.mrw is True
    assert b.mrw_gamma == 2.5
    assert b.n_inter_mrw_max == 777


def test_pda_roundtrip(tmp_path):
    c = _Runnable()
    c.set_n_photons(initial=1, imaging=1)
    c.set_pda(True)
    assert roundtrip_run(c, tmp_path).pda is True


def test_convergence_roundtrip(tmp_path):
    c = _Runnable()
    c.set_n_photons(initial=1, imaging=1)
    c.set_convergence(True, percentile=99.0, absolute=2.0, relative=1.02)
    b = roundtrip_run(c, tmp_path)
    assert b.check_convergence is True
    assert b.convergence_percentile == 99.0
    assert b.convergence_absolute == 2.0
    assert b.convergence_relative == 1.02


@pytest.mark.parametrize("algo,xi", [('wr99', None), ('baes16', 0.3)])
def test_ffi_roundtrip(tmp_path, algo, xi):
    c = _Runnable()
    c.set_n_photons(initial=1, imaging=1)
    if xi is None:
        c.set_forced_first_interaction(True, algorithm=algo)
    else:
        c.set_forced_first_interaction(True, algorithm=algo, baes16_xi=xi)
    b = roundtrip_run(c, tmp_path)
    assert b.forced_first_interaction is True
    assert b.forced_first_interaction_algorithm == algo
    if xi is not None:
        assert b.forced_first_interaction_baes16_xi == xi


def test_spectrum_bins_roundtrip(tmp_path):
    c = _Runnable()
    c.set_n_photons(initial=1, imaging=1)
    edges = np.logspace(8, 16, 5)
    c.set_specific_energy_spectrum_bins(edges)
    b = roundtrip_run(c, tmp_path)
    np.testing.assert_allclose(b.specific_energy_spectrum_bins, edges)


def test_spectrum_bins_validation():
    c = _Runnable()
    with pytest.raises(ValueError):
        c.set_specific_energy_spectrum_bins([3.0, 2.0, 1.0])
    with pytest.raises(ValueError):
        c.set_specific_energy_spectrum_bins([1.0])


def test_sample_sources_evenly_roundtrip(tmp_path):
    c = _Runnable()
    c.set_n_photons(initial=1, imaging=1)
    c.set_sample_sources_evenly(True)
    assert roundtrip_run(c, tmp_path).sample_sources_evenly is True


def test_specific_energy_type_roundtrip(tmp_path):
    c = _Runnable()
    c.set_n_photons(initial=1, imaging=1)
    c.set_specific_energy_type('additional')
    assert roundtrip_run(c, tmp_path).specific_energy_type == 'additional'
    with pytest.raises(ValueError):
        c.set_specific_energy_type('bogus')


def test_check_frequency_roundtrip(tmp_path):
    c = _Runnable()
    c.set_n_photons(initial=1, imaging=1)
    c.set_propagation_check_frequency(0.01)
    assert roundtrip_run(c, tmp_path)._frequency == 0.01


def test_output_bytes_roundtrip(tmp_path):
    c = _Runnable()
    c.set_n_photons(initial=1, imaging=1)
    c.set_output_bytes(4)
    assert roundtrip_run(c, tmp_path).physics_io_bytes == 4


def test_enforce_energy_range_roundtrip(tmp_path):
    c = _Runnable()
    c.set_n_photons(initial=1, imaging=1)
    c.set_enforce_energy_range(False)
    assert roundtrip_run(c, tmp_path).enforce_energy_range is False


def _peel_roundtrip(conf, tmp_path):
    fn = str(tmp_path / 'peel.h5')
    with h5py.File(fn, 'w') as f:
        conf.write(f.create_group('g'))
    back = PeeledImageConf()
    with h5py.File(fn, 'r') as f:
        back.read(f['g'])
    return back


def test_peeled_image_conf_roundtrip(tmp_path):
    c = PeeledImageConf()
    c.set_image_size(32, 48)
    c.set_image_limits(-1e14, 1e14, -2e14, 2e14)
    c.set_viewing_angles([10., 80.], [0., 90.])
    c.set_wavelength_range(17, 0.2, 500.)
    c.set_aperture_radii(3, 1e13, 1e15)
    c.set_track_origin('detailed')
    c.set_uncertainties(True)
    c.set_stokes(True)
    c.set_depth(1e10, 1e16)
    b = _peel_roundtrip(c, tmp_path)
    assert (b.n_x, b.n_y) == (32, 48)
    assert (b.xmin, b.xmax, b.ymin, b.ymax) == (-1e14, 1e14, -2e14, 2e14)
    np.testing.assert_allclose(np.asarray(b.viewing_angles),
                               [[10., 0.], [80., 90.]])
    assert b.n_wav == 17
    assert (b.wav_min, b.wav_max) == (0.2, 500.)
    assert b.n_ap == 3
    assert b.track_origin == 'detailed'
    assert b.uncertainties is True
    assert b.stokes is True
    assert (b.d_min, b.d_max) == (1e10, 1e16)


def test_peeled_inside_observer_roundtrip(tmp_path):
    c = PeeledImageConf()
    c.set_image_size(8, 8)
    c.set_image_limits(170., -170., -85., 85.)
    c.set_inside_observer((1e10, 2e10, 3e10))
    c.set_wavelength_range(4, 1., 100.)
    c.set_aperture_radii(1, 1e13, 1e13)
    b = _peel_roundtrip(c, tmp_path)
    np.testing.assert_allclose(b.inside_observer, (1e10, 2e10, 3e10))


def test_binned_image_conf_roundtrip(tmp_path):
    c = BinnedImageConf()
    c.set_image_size(16, 16)
    c.set_image_limits(-1e15, 1e15, -1e15, 1e15)
    c.set_viewing_bins(5, 7)
    c.set_wavelength_range(9, 0.5, 200.)
    c.set_aperture_radii(2, 1e13, 1e14)
    fn = str(tmp_path / 'binned.h5')
    with h5py.File(fn, 'w') as f:
        c.write(f.create_group('g'))
    b = BinnedImageConf()
    with h5py.File(fn, 'r') as f:
        b.read(f['g'])
    assert (b.n_theta, b.n_phi) == (5, 7)
    assert b.n_wav == 9


def test_output_conf_roundtrip(tmp_path):
    c = OutputConf()
    c.output_density = 'all'
    c.output_specific_energy = 'last'
    c.output_specific_energy_spectrum = 'all'
    c.output_n_photons = 'last'
    fn = str(tmp_path / 'out.h5')
    with h5py.File(fn, 'w') as f:
        c.write(f.create_group('g'))
    with h5py.File(fn, 'r') as f:
        b = OutputConf.read(f['g'])
    assert b.output_density == 'all'
    assert b.output_specific_energy_spectrum == 'all'
    assert b.output_n_photons == 'last'
