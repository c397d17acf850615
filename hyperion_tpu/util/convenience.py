"""Convenience helpers (ref: hyperion/util/convenience.py)."""

import numpy as np


class OptThinRadius(object):
    """A lazily evaluated 'radius where the optically thin dust temperature
    equals T' — usable as rmin/rmax in density structures; resolved once the
    star and dust are known (ref convenience.py:5-38)."""

    def __init__(self, temperature, value=1.0, min=0.0):
        self.temperature = temperature
        self.value = value
        self.min = min

    def __mul__(self, value):
        return OptThinRadius(self.temperature, value=self.value * value,
                             min=self.min)

    def __rmul__(self, value):
        return OptThinRadius(self.temperature, value=self.value * value,
                             min=self.min)

    def __str__(self):
        return ("%g times the radius at which the optically thin temperature "
                "would be %gK" % (self.value, self.temperature))

    def evaluate(self, star, dust):
        rstar = star.radius
        tstar = star.effective_temperature()
        nu_min = dust.optical_properties.nu[0]
        nu_max = dust.optical_properties.nu[-1]
        nu, fnu = star.total_spectrum(bnu_range=(nu_min, nu_max))
        x = ((self.temperature / tstar) ** 4.0 *
             dust.kappa_nu_temperature(self.temperature) /
             dust.kappa_nu_spectrum(nu, fnu))
        if x < 0.001:
            r = self.value * rstar / 2.0 / np.sqrt(x)
        else:
            r = self.value * rstar / np.sqrt(1.0 - (1.0 - 2.0 * x) ** 2)
        if np.isnan(r):
            raise Exception("Optically thin radius is NaN")
        return max(r, self.min)
