"""End-to-end polarization imaging: scattered-light images of a point
source in a thin Rayleigh-scattering cloud must show the classic
centro-symmetric (tangential) polarization pattern
(ref: hyperion's polarization tutorial physics; images_peeled.f90 Stokes)."""

import numpy as np

from hyperion_tpu.model import Model
from hyperion_tpu.dust import SphericalDust
from hyperion_tpu.util.constants import lsun, au


def rayleigh_dust(albedo=0.99):
    d = SphericalDust()
    op = d.optical_properties
    op.mu = np.linspace(-1.0, 1.0, 201)
    op.nu = np.logspace(5, 18, 8)
    op.albedo = np.repeat(albedo, 8)
    op.chi = np.repeat(2.0, 8)
    op.initialize_scattering_matrix()
    mu = op.mu[None, :]
    op.P1[:, :] = 0.75 * (1.0 + mu ** 2)
    op.P2[:, :] = -0.75 * (1.0 - mu ** 2)
    op.P3[:, :] = 1.5 * mu
    op.P4[:, :] = 0.0
    op._sort()
    return d


def test_polarized_scattered_image(tmp_path):
    m = Model()
    lim = 3 * au
    m.set_cartesian_grid(np.linspace(-lim, lim, 12),
                         np.linspace(-lim, lim, 12),
                         np.linspace(-lim, lim, 12))
    m.add_density_grid(np.full(m.grid.shape, 4e-19), rayleigh_dust())
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 6000.0
    m.set_n_photons(initial=0, imaging=200000)
    m.set_n_initial_iterations(0)
    img = m.add_peeled_images(sed=False, image=True)
    img.set_viewing_angles([0.0], [0.0])      # pole-on (+z)
    img.set_image_size(21, 21)
    img.set_image_limits(-lim, lim, -lim, lim)
    img.set_wavelength_range(1, 0.4, 0.7)
    img.set_stokes(True)
    m.write(str(tmp_path / 'pol.rtin'))
    out = m.run()

    I = out.get_image(stokes='I')
    Q = out.get_image(stokes='Q')
    U = out.get_image(stokes='U')
    P = out.get_image(stokes='linpol')
    vI = I.val[0, :, :, 0]
    vQ = Q.val[0, :, :, 0]
    vU = U.val[0, :, :, 0]
    vP = P.val[0, :, :, 0]

    # central pixel: direct light dominates -> low polarization
    assert vP[10, 10] < 0.05
    # off-center pixels: scattered light at ~90 deg -> strong polarization
    ring = [vP[10, 3], vP[3, 10], vP[10, 17], vP[17, 10]]
    assert min(ring) > 0.3

    # Tangential pattern: on the x-axis of the image the E-vector is
    # tangential (along y); with the (e_l, e_r) meridian convention for a
    # pole-on view the tangential direction flips the sign of Q between
    # the x-axis and the y-axis, and U changes sign between diagonals.
    qx = vQ[10, 3] / max(vI[10, 3], 1e-300)
    qy = vQ[3, 10] / max(vI[3, 10], 1e-300)
    assert qx * qy < 0  # perpendicular orientations
    # |U| small on the axes, larger on the diagonals
    u_axis = abs(vU[10, 3]) / max(vI[10, 3], 1e-300)
    u_diag = abs(vU[4, 4]) / max(vI[4, 4], 1e-300)
    assert u_diag > u_axis

    # V stays ~0 for P4 = 0 dust
    V = out.get_image(stokes='V')
    assert np.abs(V.val).max() <= 1e-10 * np.abs(vI).max()
    out.close()
