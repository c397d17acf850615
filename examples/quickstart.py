"""Quickstart: point source in a uniform cartesian box — temperatures and
a peeled SED in ~30 lines (mirrors the reference's quickstart tutorial)."""

import numpy as np

from hyperion_tpu.model import Model
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.util.constants import au, lsun, pc

nu = np.logspace(8, 17, 32)
dust = IsotropicDust(nu, np.repeat(0.4, 32), np.repeat(100.0, 32))

m = Model()
lim = 50 * au
m.set_cartesian_grid(np.linspace(-lim, lim, 33),
                     np.linspace(-lim, lim, 33),
                     np.linspace(-lim, lim, 33))
m.add_density_grid(np.full(m.grid.shape, 1e-19), dust)

src = m.add_point_source()
src.luminosity = lsun
src.temperature = 6000.0

sed = m.add_peeled_images(sed=True, image=True)
sed.set_viewing_angles([45.0], [0.0])
sed.set_image_size(128, 128)
sed.set_image_limits(-lim, lim, -lim, lim)
sed.set_wavelength_range(60, 0.3, 1000.0)
sed.set_aperture_radii(1, 2 * lim, 2 * lim)

m.set_n_initial_iterations(4)
m.set_n_photons(initial=500_000, imaging=1_000_000)

m.write('quickstart.rtin', overwrite=True)
out = m.run('quickstart.rtout', overwrite=True)

grid = out.get_quantities()
t = np.asarray(grid['temperature'][0].array)
print('temperature range: %.1f .. %.1f K' % (t[t > 0].min(), t.max()))
s = out.get_sed(inclination=0, aperture=-1, distance=100 * pc, units='Jy')
print('SED peak: %.3g Jy at %.2f um' % (s.val.max(), s.wav[np.argmax(s.val)]))
