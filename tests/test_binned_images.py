import numpy as np
import pytest

from hyperion_tpu.model import Model
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.util.constants import lsun, au


def test_binned_sed_energy(tmp_path):
    nu = np.logspace(5, 18, 30)
    dust = IsotropicDust(nu, np.repeat(0.3, 30), np.repeat(2.0, 30))
    m = Model()
    lim = 3 * au
    m.set_cartesian_grid(np.linspace(-lim, lim, 10),
                         np.linspace(-lim, lim, 10),
                         np.linspace(-lim, lim, 10))
    m.add_density_grid(np.full(m.grid.shape, 1e-17), dust)
    s = m.add_point_source()
    s.luminosity = lsun
    s.temperature = 6000.0
    m.set_forced_first_interaction(False)  # required for binned images
    m.set_n_photons(initial=30000, imaging=100000)
    m.set_n_initial_iterations(1)
    binned = m.add_binned_images(sed=True, image=False)
    binned.set_viewing_bins(4, 2)
    binned.set_wavelength_range(60, 0.1, 1500.0)
    m.write(str(tmp_path / 'binned.rtin'))
    out = m.run()
    sed = out.get_sed(technique='binned', aperture=0, inclination='all')
    assert sed.val.shape == (8, 60)
    dlognu = np.log(sed.nu[-1] / sed.nu[0]) / (len(sed.nu) - 1)
    # summed over all 8 direction bins, all emitted energy escapes
    total = np.sum(sed.val) * dlognu
    assert abs(total / lsun - 1.0) < 0.05
    # isotropic problem: flux per bin proportional to bin solid angle
    per_bin = np.sum(sed.val, axis=1).reshape(4, 2).sum(axis=1)
    tw = np.linspace(0, np.pi, 5)
    solid = np.cos(tw[:-1]) - np.cos(tw[1:])
    expected = per_bin.sum() * solid / solid.sum()
    assert np.allclose(per_bin, expected, rtol=0.1)
    out.close()
