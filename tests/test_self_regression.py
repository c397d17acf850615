"""Stored-output self-regression tier (ref: the reference pins its own
outputs with 58 stored files + --generate-reference + nulp comparison,
hyperion/model/tests/test_bit_level.py + testing/pytest_plugin.py).

Our engine is deterministic (threefry counter RNG, fixed seeds) and these
tests run on the CPU/x64 backend (conftest), so a stored run pins every
physical dataset tightly: any silent numerical drift introduced by an
engine refactor fails here in seconds, long before the slow statistical
differentials would notice.  Regenerate after an INTENTIONAL
physics/sampling change with:

    python -m pytest tests/test_self_regression.py --generate-reference

and review the resulting diffs like source code.
"""

import os
import shutil

import h5py
import numpy as np
import pytest

from hyperion_tpu.model import Model
from hyperion_tpu.dust import IsotropicDust, HenyeyGreensteinDust
from hyperion_tpu.model.run import run_model
from hyperion_tpu.util.constants import au, lsun

DATA = os.path.join(os.path.dirname(__file__), 'data', 'selfreg')

# float comparison: XLA:CPU may legitimately re-order reductions between
# versions, so exact-bit equality is too brittle; 1e-8 relative in f64
# still catches any real drift (sampling changes move results at the
# percent level)
RTOL = 1e-8
ATOL = 1e-30


def _generate(request):
    return request.config.getoption("--generate-reference")


def _dust_iso():
    nu = np.logspace(np.log10(3e10), np.log10(5e16), 24)
    d = IsotropicDust(nu, np.full(24, 0.4), np.full(24, 60.0))
    d.set_lte_emissivities(n_temp=40, temp_min=0.1, temp_max=1600.)
    return d


def _dust_hg():
    nu = np.logspace(np.log10(3e10), np.log10(5e16), 24)
    d = HenyeyGreensteinDust(nu, np.full(24, 0.6), np.full(24, 90.0),
                             np.full(24, 0.4), np.full(24, 0.3))
    d.set_lte_emissivities(n_temp=40, temp_min=0.1, temp_max=1600.)
    return d


def model_cartesian_lucy():
    """Mini quickstart: cartesian grid, point source, 2 Lucy iterations."""
    m = Model()
    x = np.linspace(-2 * au, 2 * au, 8)
    m.set_cartesian_grid(x, x, x)
    m.add_density_grid(np.full((7, 7, 7), 2e-18), _dust_iso())
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 5500.
    s.position = (0.1 * au, -0.2 * au, 0.05 * au)
    m.set_n_photons(initial=5000, imaging=0)
    m.set_n_initial_iterations(2)
    m.set_seed(-1234)
    m.set_copy_input(False)
    m.conf.output.output_n_photons = 'last'
    return m


def model_spherical_mrw_pda():
    """Thick spherical shell with MRW + PDA exercised."""
    m = Model()
    rw = np.hstack([0., np.logspace(np.log10(0.1 * au),
                                    np.log10(20 * au), 24)])
    tw = np.linspace(0., np.pi, 9)
    pw = np.array([0., 2 * np.pi])
    m.set_spherical_polar_grid(rw, tw, pw)
    rho = np.zeros((1, 8, 24))
    rho[:, :, 4:] = 3e-15      # tau ~ 60*3e-15*3e14 ~ thick shell
    m.add_density_grid(rho, _dust_iso())
    s = m.add_spherical_source()
    s.luminosity = lsun
    s.radius = 0.05 * au
    s.temperature = 4000.
    m.set_n_photons(initial=4000, imaging=0)
    m.set_n_initial_iterations(2)
    m.set_mrw(True, gamma=2.0)
    m.set_pda(True)
    m.set_seed(-777)
    m.set_copy_input(False)
    return m


def model_imaging_peeloff():
    """Imaging with peeloff (2 views, apertures, Stokes) + binned images."""
    m = Model()
    x = np.linspace(-2 * au, 2 * au, 6)
    m.set_cartesian_grid(x, x, x)
    m.add_density_grid(np.full((5, 5, 5), 1e-18), _dust_hg())
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 6000.
    m.set_n_photons(initial=2000, imaging=4000)
    m.set_n_initial_iterations(1)
    conf = m.add_peeled_images(sed=True, image=True)
    conf.set_viewing_angles([30., 120.], [10., 200.])
    conf.set_wavelength_range(6, 0.1, 1000.)
    conf.set_image_size(5, 5)
    conf.set_image_limits(-2 * au, 2 * au, -2 * au, 2 * au)
    conf.set_aperture_radii(3, 0.5 * au, 2 * au)
    conf.set_stokes(True)
    conf.set_track_origin('basic')
    m.set_seed(-99)
    m.set_copy_input(False)
    return m


CONFIGS = {
    'cartesian_lucy': model_cartesian_lucy,
    'spherical_mrw_pda': model_spherical_mrw_pda,
    'imaging_peeloff': model_imaging_peeloff,
}


def _assert_h5_equal(ours_path, ref_path):
    """Dataset-by-dataset comparison (ref assert_identical_results,
    test_helpers.py:58-144), excluding volatile attributes."""
    skip_attrs = {'cpu_time', 'date_started', 'date_ended',
                  'python_version', 'fortran_version'}
    with h5py.File(ours_path, 'r') as fo, h5py.File(ref_path, 'r') as fr:
        paths_o, paths_r = [], []
        fo.visit(paths_o.append)
        fr.visit(paths_r.append)
        assert sorted(paths_o) == sorted(paths_r), \
            "HDF5 tree mismatch: %s vs %s" % (sorted(paths_o),
                                              sorted(paths_r))
        for p in paths_r:
            o, r = fo[p], fr[p]
            for k, v in r.attrs.items():
                if k in skip_attrs:
                    continue
                ov = o.attrs[k]
                if isinstance(v, (np.floating, float)):
                    np.testing.assert_allclose(ov, v, rtol=RTOL, atol=ATOL,
                                               err_msg='%s@%s' % (p, k))
                else:
                    assert np.array_equal(ov, v), '%s@%s: %r vs %r' % (
                        p, k, ov, v)
            if isinstance(r, h5py.Dataset):
                a, b = np.asarray(o[()]), np.asarray(r[()])
                assert a.shape == b.shape, p
                if a.dtype.kind == 'f':
                    np.testing.assert_allclose(a, b, rtol=RTOL, atol=ATOL,
                                               err_msg=p)
                elif a.dtype.names:
                    for name in a.dtype.names:
                        np.testing.assert_allclose(
                            a[name].astype(float), b[name].astype(float),
                            rtol=RTOL, atol=ATOL, err_msg='%s[%s]' % (p,
                                                                      name))
                else:
                    assert np.array_equal(a, b), p


@pytest.mark.parametrize('name', sorted(CONFIGS))
def test_self_regression(tmp_path, name, request):
    ref_path = os.path.join(DATA, name + '.rtout')
    generate = _generate(request)
    if not generate and not os.path.exists(ref_path):
        pytest.skip("stored reference %s missing — run with "
                    "--generate-reference" % ref_path)

    m = CONFIGS[name]()
    rtin = str(tmp_path / 'm.rtin')
    rtout = str(tmp_path / 'm.rtout')
    m.write(rtin)
    m2 = Model.read(rtin)
    run_model(m2, rtout)

    if generate:
        os.makedirs(DATA, exist_ok=True)
        shutil.copy(rtout, ref_path)
        pytest.skip("generated %s" % ref_path)
    _assert_h5_equal(rtout, ref_path)
