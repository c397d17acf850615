"""Imaging differentials against the reference's stored Fortran outputs.

Validates the ENTIRE imaging stack (peeloff probability, escape-tau,
aperture/pixel binning, origin tracking, raytracing combination,
monochromatic imaging) against the stored Fortran ``.rtout`` files
(ref: hyperion/model/tests/test_bit_level.py:179-237 test_peeloff and
:341-440 Pascucci SEDs).  Same numpy seeds -> identical models; RNG
streams differ, so the gates are statistical: the stored files carry
5000-photon imaging noise, we run OVERSAMPLE x more.
"""

import os

import h5py
import numpy as np
import pytest

from hyperion_tpu.model import Model
from hyperion_tpu.model.run import run_model
from hyperion_tpu.util.constants import pc, au, msun, rsun, sigma, pi, c

from test_reference_diff import (build_reference_grids,
                                 add_reference_sources, REF_DATA)

pytestmark = [pytest.mark.reference,
              pytest.mark.skipif(not os.path.isdir(REF_DATA),
                                 reason="reference data not available")]

OVERSAMPLE = 8


def build_peeloff_model(grid_type, raytracing):
    """The test_peeloff config (ref test_bit_level.py:179-237),
    sample_sources_evenly=False."""
    grids, d1, _, _ = build_reference_grids()
    dust_file = os.path.join(REF_DATA, 'kmh_lite.hdf5')
    m = Model()
    m.set_grid(grids[grid_type])
    m.add_density_grid(d1[grid_type], dust_file)
    add_reference_sources(m)
    m.set_raytracing(raytracing)
    if raytracing:
        m.set_n_photons(initial=1000 * OVERSAMPLE,
                        imaging=5000 * OVERSAMPLE,
                        raytracing_sources=2000 * OVERSAMPLE,
                        raytracing_dust=3000 * OVERSAMPLE)
    else:
        m.set_n_photons(initial=1000 * OVERSAMPLE,
                        imaging=5000 * OVERSAMPLE)

    i_p = m.add_peeled_images()
    i_p.set_wavelength_range(5, 0.05, 200.)
    i_p.set_viewing_angles([33.4, 110.], [65.4, 103.2])
    i_p.set_image_size(4, 5)
    i_p.set_image_limits(-0.8 * pc, 0.8 * pc, -pc, pc)
    i_p.set_aperture_radii(5, 0.1 * pc, pc)
    i_p.set_stokes(True)

    i_p = m.add_peeled_images()
    i_p.set_wavelength_range(4, 0.05, 200.)
    i_p.set_viewing_angles([22.1], [203.2])
    i_p.set_image_size(6, 6)
    i_p.set_image_limits(-pc, pc, -pc, pc)
    i_p.set_aperture_radii(2, 0.5 * pc, pc)
    i_p.set_track_origin('basic')
    i_p.set_stokes(True)

    i_p = m.add_peeled_images()
    i_p.set_wavelength_range(4, 0.05, 200.)
    i_p.set_viewing_angles([22.1], [203.2])
    i_p.set_image_size(6, 6)
    i_p.set_image_limits(-pc, pc, -pc, pc)
    i_p.set_aperture_radii(2, 0.5 * pc, pc)
    i_p.set_track_origin('detailed')
    i_p.set_stokes(True)

    m.set_copy_input(False)
    return m


def _compare_sed_cube(ours, ref, label, total_rtol=0.15, bin_dex=0.35,
                      share_cut=0.05):
    """ours/ref: (n_stokes, n_orig, n_view, n_ap, n_nu) cumulative-aperture
    SED cubes.  Compares Stokes I at the largest aperture: totals, per-view
    and per-frequency-bin ratios for bins carrying > share_cut of the
    total."""
    assert ours.shape == ref.shape, (label, ours.shape, ref.shape)
    o = ours[0, :, :, -1, :]   # (n_orig, n_view, n_nu) Stokes I
    r = ref[0, :, :, -1, :]
    t_o, t_r = o.sum(), r.sum()
    assert t_r > 0
    assert abs(t_o / t_r - 1) < total_rtol, \
        "%s total flux: %.4g vs %.4g (ratio %.3f)" % (label, t_o, t_r,
                                                      t_o / t_r)
    # per (origin, view, nu) bins with meaningful share
    share = r / t_r
    sel = share > share_cut
    if sel.any():
        lr = np.log10(np.maximum(o[sel], 1e-300) / r[sel])
        worst = np.max(np.abs(lr))
        assert worst < bin_dex, \
            "%s worst bright-bin |log10 ratio| = %.3f" % (label, worst)


def _compare_image_total(ours, ref, label, total_rtol=0.15):
    o = ours[0].sum()
    r = ref[0].sum()
    assert r > 0
    assert abs(o / r - 1) < total_rtol, \
        "%s image total: %.4g vs %.4g (ratio %.3f)" % (label, o, r, o / r)


@pytest.mark.parametrize('grid_type', ['car', 'cyl', 'sph', 'amr', 'oct'])
@pytest.mark.parametrize('raytracing', [False, True])
def test_peeloff_vs_fortran(tmp_path, grid_type, raytracing):
    ref_name = ('test_peeloff.grid_type=%s.raytracing=%s.'
                'sample_sources_evenly=False.rtout' % (grid_type, raytracing))
    m = build_peeloff_model(grid_type, raytracing)
    rtin = str(tmp_path / 'p.rtin')
    rtout = str(tmp_path / 'p.rtout')
    m.write(rtin)
    m2 = Model.read(rtin)
    run_model(m2, rtout)

    with h5py.File(os.path.join(REF_DATA, ref_name), 'r') as fr, \
            h5py.File(rtout, 'r') as fo:
        for gi in (1, 2, 3):
            g = 'group_%05i' % gi
            sed_r = np.array(fr['Peeled'][g]['seds'])
            sed_o = np.array(fo['Peeled'][g]['seds'])
            _compare_sed_cube(sed_o, sed_r, '%s/%s' % (ref_name, g))
            img_r = np.array(fr['Peeled'][g]['images'])
            img_o = np.array(fo['Peeled'][g]['images'])
            _compare_image_total(img_o, img_r, '%s/%s img' % (ref_name, g))


@pytest.mark.slow
@pytest.mark.parametrize('tau', [0.1, 10])
def test_pascucci_sed_vs_fortran(tmp_path, tau):
    """The Pascucci benchmark SEDs: monochromatic imaging at 61 exact
    wavelengths x 3 viewing angles + raytracing (ref test_bit_level.py:
    341-440).  The raytraced direct+thermal component is nearly noise-free,
    so this is a much higher-precision physics anchor than the
    specific-energy grids (stored at 1000 photons/iteration)."""
    from test_pascucci_diff import pascucci_dust, pascucci_model

    dust = pascucci_dust()
    m = pascucci_model(tau, dust)

    theta = np.array([12.5, 42.5, 77.5])
    phi = np.array([30.0, 30.0, 30.0])
    image = m.add_peeled_images()
    image.set_viewing_angles(theta, phi)
    image.set_image_size(1, 1)
    image.set_image_limits(-1500. * au, 1500. * au, -1500. * au, 1500. * au)
    image.set_aperture_radii(1, 1500. * au, 1500. * au)
    image.set_wavelength_range(61, 1, 61)
    image.set_stokes(True)
    m.set_raytracing(True)
    wavelengths = [0.12, 0.14, 0.16, 0.18, 0.2, 0.215, 0.22, 0.23, 0.25,
                   0.274, 0.3, 0.344, 0.4, 0.44, 0.55, 0.7, 0.9, 1.1,
                   1.4, 1.65, 2, 2.2, 2.6, 3, 3.2, 3.6, 4, 5, 6, 6.28,
                   6.3, 6.32, 6.5, 8, 9.5, 10, 11.5, 11.515016,
                   11.524977, 11.540016, 12, 14, 16, 18, 20, 24, 27.5,
                   32.5, 37.5, 45, 55, 70, 90, 110, 135, 175, 250, 400,
                   700, 1200, 2000]
    m.set_monochromatic(True, wavelengths=wavelengths)
    ov = 4
    m.set_n_photons(initial=1000 * 8, imaging_sources=1000 * ov,
                    imaging_dust=1000 * ov, raytracing_sources=1000 * ov,
                    raytracing_dust=1000 * ov)

    rtin = str(tmp_path / 'ps.rtin')
    rtout = str(tmp_path / 'ps.rtout')
    m.write(rtin)
    m2 = Model.read(rtin)
    run_model(m2, rtout)

    with h5py.File(os.path.join(REF_DATA,
                                'test_pascucci.tau=%g.rtout' % tau), 'r') \
            as fr, h5py.File(rtout, 'r') as fo:
        sed_r = np.array(fr['Peeled/group_00001/seds'])  # (4,1,3,1,61)
        sed_o = np.array(fo['Peeled/group_00001/seds'])
    assert sed_o.shape == sed_r.shape
    o = sed_o[0, 0, :, 0, :]   # (3 views, 61 nu) Stokes I
    r = sed_r[0, 0, :, 0, :]
    t_ratio = o.sum() / r.sum()
    assert abs(t_ratio - 1) < 0.10, "total SED flux ratio %.3f" % t_ratio
    # per-wavelength agreement where the SED is bright (>1% of its peak,
    # per view)
    for iv in range(3):
        peak = r[iv].max()
        sel = r[iv] > 0.01 * peak
        lr = np.log10(np.maximum(o[iv][sel], 1e-300) / r[iv][sel])
        assert np.percentile(np.abs(lr), 95) < 0.25, \
            "view %d p95 |log ratio| %.3f" % (iv, np.percentile(np.abs(lr),
                                                                95))
