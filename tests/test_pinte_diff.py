"""Pinte et al. (2009) benchmark disk, differential against the reference's
stored Fortran outputs (ref test_bit_level.py:643-702 —
test_pinte_specific_energy.tau=*.rtout).

This is the optically-thick accuracy anchor (BASELINE.md): a flared disk
with midplane visual optical depth 10^3..10^6, real Pinte silicate dust
(pinte_dust_lite.hdf5, read through our SphericalDust file reader), MRW
(gamma=2) + PDA enabled, cylindrical-polar auto grid — exercising the
diffusion-regime machinery end to end. Same numpy-free deterministic setup
as the reference, so grid walls and densities are identical; the RNG
streams differ by design, so the gate is statistical (the stored files
carry their own 50k-photon noise).
"""

import os

import h5py
import numpy as np
import pytest

from hyperion_tpu.model import AnalyticalYSOModel, Model
from hyperion_tpu.dust import SphericalDust
from hyperion_tpu.model.run import run_model
from hyperion_tpu.util.constants import pi, au, msun, rsun, sigma

REF_DATA = '/root/reference/hyperion/model/tests/data'

pytestmark = [pytest.mark.reference,
              pytest.mark.skipif(not os.path.isdir(REF_DATA),
                                 reason="reference data not available")]

OVERSAMPLE = 1


def pinte_model(tau):
    """The Pinte specific-energy benchmark setup
    (ref test_bit_level.py:643-690)."""
    m = AnalyticalYSOModel()
    m.star.radius = 2. * rsun
    m.star.temperature = 4000.
    m.star.luminosity = 4. * pi * (2. * rsun) ** 2 * sigma * 4000. ** 4

    disk = m.add_flared_disk()
    disk.p = -1.5
    disk.beta = 1.125
    disk.mass = 3.e-8 * msun * tau / 1.e3
    disk.rmin = 0.1 * au
    disk.rmax = 400 * au
    disk.h_0 = 10 * au
    disk.r_0 = 100. * au
    disk.cylindrical_inner_rim = True
    disk.cylindrical_outer_rim = True
    disk.dust = SphericalDust(os.path.join(REF_DATA, 'pinte_dust_lite.hdf5'))

    m.set_n_initial_iterations(3)
    m.set_cylindrical_polar_grid_auto(50, 30, 1)
    m.set_mrw(True, gamma=2.)
    m.set_pda(True)
    m.set_n_photons(initial=50000 * OVERSAMPLE, imaging=0)
    m.set_max_interactions(1000, warn=False)
    m.set_copy_input(False)
    return m


@pytest.mark.parametrize('tau', [1000, 10000, 100000])
def test_pinte_specific_energy_vs_fortran(tmp_path, tau):
    ref_file = os.path.join(
        REF_DATA, 'test_pinte_specific_energy.tau=%d.rtout' % tau)
    with h5py.File(ref_file, 'r') as f:
        se_ref = np.array(f['iteration_00003']['specific_energy'])

    m = pinte_model(tau)
    rtin = str(tmp_path / 'pinte.rtin')
    rtout = str(tmp_path / 'pinte.rtout')
    m.write(rtin)
    m2 = Model.read(rtin)
    run_model(m2, rtout)

    with h5py.File(rtout, 'r') as f:
        se = np.array(f['iteration_00003']['specific_energy'])

    assert se.shape == se_ref.shape
    ours = se.ravel()
    ref = se_ref.ravel()
    sel0 = (ours > 0) & (ref > 0)
    # both engines heat the same disk body (PDA fills starved cells)
    assert sel0.sum() > 0.9 * max((ref > 0).sum(), 1)

    # Information mask: the stored run carries its own 50k-photon noise, and
    # cells it never sampled sit at the minimum-specific-energy floor — a
    # "ref at floor vs ours nonzero" cell is a zero-information comparison
    # (rare-event cells where one 50k-photon realization saw nothing).
    # Cells where OURS is at floor but the reference is bright stay in: a
    # transport bug that starves a region must fail this test.
    floor = 6.071e-12  # min specific energy of pinte_dust_lite (T=0.1K)
    sel = sel0 & (ref > 10 * floor)

    logr = np.log10(ours[sel] / ref[sel])
    # energy-weight by the reference field: the midplane diffusion region
    # is what MRW/PDA are for, and it carries the energy
    w = ref[sel]
    bias = np.median(logr)
    total_ratio = (ours[sel] * w).sum() / (ref[sel] * w).sum()
    # Spread gate: ENERGY-WEIGHTED 90th percentile of |log ratio| — cells
    # near the PDA starvation threshold flip between MC values and PDA
    # fills run-to-run (1-2 dex apart in the steep transition zone, in the
    # stored realization as much as in this run), but they carry almost no
    # energy; weighting by the reference field makes the gate stable
    # (measured 0.15 at tau=1e3 vs plain-p95 swinging 0.36-0.54 across
    # platforms/seeds).
    aord = np.argsort(np.abs(logr))
    cw = np.cumsum(w[aord]) / w.sum()
    wp90 = np.abs(logr)[aord][np.searchsorted(cw, 0.90)]
    assert abs(bias) < 0.08, (tau, bias)
    # tau=1e5 resolves the inner rim to dw/w ~ 1e-6 — at the edge of f32
    # wall representability (the reference runs f64); the residual rim
    # misplacement costs ~15% of the energy-weighted total there.  Use
    # run_model(dtype=jnp.float64) on CPU for full agreement at tau=1e5.
    total_gate = 0.25 if tau >= 100000 else 0.15
    assert abs(total_ratio - 1.0) < total_gate, (tau, total_ratio)
    # The spread gate scales with tau: at higher optical depth more of the
    # energy-carrying interior is PDA-filled on BOTH sides, and the two PDA
    # solutions inherit the stored realization's Monte-Carlo anchor noise
    # (measured wp90: 0.15 @1e3, 0.35 @1e4, 0.41 @1e5; round-3's genuine
    # transport bug measured 1.9 dex here).
    wp90_gate = {1000: 0.30, 10000: 0.45, 100000: 0.55}[tau]
    assert wp90 < wp90_gate, (tau, wp90)
