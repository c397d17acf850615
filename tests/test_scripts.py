"""Console entry points: launcher + FITS export (ref scripts/hyperion,
scripts/hyperion2fits) and the dependency-free FITS round-trip."""

import os

import h5py
import numpy as np
import pytest

from hyperion_tpu.util.minifits import writeto, readfrom


@pytest.mark.smoke
def test_minifits_roundtrip(tmp_path):
    for data in (np.arange(24, dtype=np.float64).reshape(2, 3, 4),
                 np.arange(6, dtype=np.float32).reshape(3, 2),
                 np.arange(5, dtype=np.int32)):
        fn = str(tmp_path / 'x.fits')
        writeto(fn, data, header={'EXTRAKEY': 42}, overwrite=True)
        back, hdr = readfrom(fn)
        np.testing.assert_array_equal(back, data)
        assert hdr['EXTRAKEY'] == 42
        assert os.path.getsize(fn) % 2880 == 0


@pytest.mark.smoke
def test_tofits_exports_images_and_physics(tmp_path):
    from hyperion_tpu.scripts.tofits import main
    rtout = str(tmp_path / 'model.rtout')
    img = np.random.rand(1, 4, 5, 3, 1).astype(np.float32)
    sed = np.random.rand(1, 2, 3, 1).astype(np.float32)
    se = np.random.rand(6, 5, 4)
    with h5py.File(rtout, 'w') as f:
        g = f.create_group('Peeled/group_00001')
        g.create_dataset('images', data=img)
        g.create_dataset('seds', data=sed)
        it = f.create_group('iteration_00001')
        it.create_dataset('specific_energy', data=se)
    assert main(['--images', '--physics', rtout]) == 0
    base = str(tmp_path / 'model')
    back, _ = readfrom(base + '_00001_images.fits')
    np.testing.assert_allclose(back, img)
    back, _ = readfrom(base + '_00001_seds.fits')
    np.testing.assert_allclose(back, sed)
    back, _ = readfrom(base + '_specific_energy.fits')
    np.testing.assert_allclose(back, se)


def test_tofits_requires_mode(tmp_path, capsys):
    from hyperion_tpu.scripts.tofits import main
    assert main([str(tmp_path / 'none.rtout')]) == 1


@pytest.mark.smoke
def test_launcher_main_runs_quickstart(tmp_path):
    """End-to-end through the installed-script code path (not the wrapper)."""
    from hyperion_tpu.model import Model
    from hyperion_tpu.dust import IsotropicDust
    from hyperion_tpu.scripts.main import main

    nu = np.logspace(5, 18, 16)
    dust = IsotropicDust(nu, np.repeat(0.4, 16), np.repeat(1.0, 16))
    m = Model()
    m.set_cartesian_grid(np.linspace(-1, 1, 5), np.linspace(-1, 1, 5),
                         np.linspace(-1, 1, 5))
    m.add_density_grid(np.full((4, 4, 4), 0.05), dust)
    s = m.add_point_source()
    s.luminosity = 1.0
    s.temperature = 5000.0
    m.set_n_photons(initial=1000, imaging=0)
    m.set_n_initial_iterations(1)
    rtin = str(tmp_path / 'q.rtin')
    rtout = str(tmp_path / 'q.rtout')
    m.write(rtin)
    assert main(['--cpu', rtin, rtout]) == 0
    with h5py.File(rtout, 'r') as f:
        assert 'date_ended' in f.attrs
