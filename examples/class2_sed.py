"""Class II YSO SED (the reference's flagship tutorial, re-expressed):
flared disk around a T Tauri star, spherical-polar auto grid, Lucy
temperature iterations, peeled SEDs at three inclinations."""

import numpy as np

from hyperion_tpu.model import AnalyticalYSOModel, ModelOutput
from hyperion_tpu.dust import HenyeyGreensteinDust
from hyperion_tpu.util.constants import au, lsun, msun, rsun, tsun, pc

# gray-ish HG dust stand-in; swap for a real dust file (e.g. kmh.hdf5)
nu = np.logspace(8, 17, 64)
dust = HenyeyGreensteinDust(nu, np.repeat(0.5, 64), np.repeat(400.0, 64),
                            np.repeat(0.4, 64), np.repeat(0.8, 64))

m = AnalyticalYSOModel()
m.star.luminosity = lsun
m.star.radius = 2.0 * rsun
m.star.temperature = 4300.0

disk = m.add_flared_disk()
disk.mass = 1e-3 * msun
disk.rmin = 0.1 * au
disk.rmax = 200.0 * au
disk.r_0 = 10.0 * au
disk.h_0 = 0.4 * au
disk.p = -1.0
disk.beta = 1.25
disk.dust = dust

m.set_spherical_polar_grid_auto(96, 32, 1)

sed = m.add_peeled_images(sed=True, image=False)
sed.set_viewing_angles([20.0, 45.0, 80.0], [0.0, 0.0, 0.0])
sed.set_wavelength_range(120, 0.3, 2000.0)
sed.set_aperture_radii(1, 400 * au, 400 * au)

m.set_mrw(True, gamma=2.0)
m.set_n_initial_iterations(5)
m.set_convergence(True, percentile=99., absolute=2., relative=1.02)
m.set_n_photons(initial=200_000, imaging=500_000)

m.write('class2.rtin', overwrite=True)
out = m.run('class2.rtout', overwrite=True)

for i, inc in enumerate((20, 45, 80)):
    s = out.get_sed(inclination=i, aperture=-1, distance=140 * pc,
                    units='mJy')
    peak = s.wav[np.argmax(s.val)]
    print('inclination %2d deg: peak %.2f um, F(1mm) = %.3g mJy'
          % (inc, peak, np.interp(1000.0, s.wav[::-1], s.val[::-1])))
