import numpy as np
import pytest

from hyperion_tpu.model import Model
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.util.constants import lsun, au


def test_raytraced_sed_energy_conservation(tmp_path):
    """Raytracing replaces the MC direct+thermal: total SED must still
    integrate to ~L, but with far less noise at thermal wavelengths."""
    nu = np.logspace(5, 18, 30)
    dust = IsotropicDust(nu, np.repeat(0.3, 30), np.repeat(2.0, 30))
    m = Model()
    lim = 3 * au
    m.set_cartesian_grid(np.linspace(-lim, lim, 10),
                         np.linspace(-lim, lim, 10),
                         np.linspace(-lim, lim, 10))
    m.add_density_grid(np.full(m.grid.shape, 5e-17), dust)
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 6000.0
    m.set_raytracing(True)
    m.set_n_photons(initial=50000, imaging=50000,
                    raytracing_sources=20000, raytracing_dust=20000)
    m.set_n_initial_iterations(2)
    sed = m.add_peeled_images(sed=True, image=False)
    sed.set_viewing_angles([40.0], [10.0])
    sed.set_wavelength_range(80, 0.1, 1500.0)
    m.write(str(tmp_path / 'ray.rtin'))
    out = m.run()
    s0 = out.get_sed(inclination=0, aperture=0)
    dlognu = np.log(s0.nu[-1] / s0.nu[0]) / (len(s0.nu) - 1)
    total = np.sum(s0.val) * dlognu
    # direct (attenuated) + thermal + scattered should account for ~L
    assert abs(total / lsun - 1.0) < 0.1
    # thermal bump exists at long wavelengths
    lam = s0.wav
    assert np.sum(s0.val[lam > 20]) > 0
    out.close()
