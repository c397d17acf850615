"""Flared disk density structure (ref: hyperion/densities/flared_disk.py).

rho(R, z) = rho_0 (R_0/R)^(beta - p) exp(-z^2 / 2 h(R)^2),
h(R) = h_0 (R/r_0)^beta, truncated at rmin/rmax (spherical or cylindrical
rims) and normalized to the total disk mass on the discretized grid.
"""

import numpy as np

from ..util.constants import pi
from ..util.integrate import integrate_powerlaw
from ..util.validator import validate_scalar
from .core import Disk


class FlaredDisk(Disk):

    def __init__(self, mass=None, rho_0=None, rmin=None, rmax=None, p=-1,
                 beta=-1.25, h_0=None, r_0=None, cylindrical_inner_rim=True,
                 cylindrical_outer_rim=True, dust=None):
        self._mass = None
        self._rho_0 = None
        Disk.__init__(self)
        self.rmin = rmin
        self.rmax = rmax
        self.p = p
        self.beta = beta
        self.h_0 = h_0
        self.r_0 = r_0
        self.cylindrical_inner_rim = cylindrical_inner_rim
        self.cylindrical_outer_rim = cylindrical_outer_rim
        self.dust = dust
        if mass is not None and rho_0 is not None:
            raise Exception("Cannot specify both mass and rho_0")
        if mass is not None:
            self.mass = mass
        elif rho_0 is not None:
            self.rho_0 = rho_0
        self._freeze()

    @property
    def mass(self):
        """Total disk mass (g)."""
        if self._mass is not None:
            return self._mass
        if self._rho_0 is None:
            return None
        self._check_all_set()
        if self.rmax <= self.rmin:
            return 0.0
        int1 = integrate_powerlaw(self.rmin, self.rmax, 1.0 + self.p)
        int1 *= self.r_0 ** -self.p
        integral = (2.0 * pi) ** 1.5 * self.h_0 * int1
        return self._rho_0 * integral

    @mass.setter
    def mass(self, value):
        if value is not None:
            validate_scalar('mass', value, domain='positive')
            self._rho_0 = None
        self._mass = value

    @property
    def rho_0(self):
        """Density scale factor (g/cm^3)."""
        if self._rho_0 is not None:
            return self._rho_0
        if self._mass is None:
            return None
        self._check_all_set()
        if self.rmax <= self.rmin:
            return 0.0
        int1 = integrate_powerlaw(self.rmin, self.rmax, 1.0 + self.p)
        int1 *= self.r_0 ** -self.p
        integral = (2.0 * pi) ** 1.5 * self.h_0 * int1
        return self._mass / integral

    @rho_0.setter
    def rho_0(self, value):
        if value is not None:
            validate_scalar('rho_0', value, domain='positive')
            self._mass = None
        self._rho_0 = value

    def _check_all_set(self):
        for attr in ('rmin', 'rmax', 'h_0', 'r_0'):
            v = getattr(self, attr)
            if v is None:
                raise Exception("%s is not set" % attr)
        if self._mass is None and self._rho_0 is None:
            raise Exception("mass or rho_0 is not set")

    def density(self, grid):
        """Evaluate the density on a spherical/cylindrical polar grid."""
        self._check_all_set()
        if self.rmax <= self.rmin:
            return np.zeros(grid.shape)
        if self.mass == 0:
            return np.zeros(grid.shape)

        h = self.h_0 * (grid.gw / self.r_0) ** self.beta
        rho = (self.r_0 / grid.gw) ** (self.beta - self.p) * \
            np.exp(-0.5 * (grid.gz / h) ** 2)
        gr = np.hypot(grid.gw, grid.gz)
        if self.cylindrical_inner_rim:
            rho[grid.gw < self.rmin] = 0.0
        else:
            rho[gr < self.rmin] = 0.0
        if self.cylindrical_outer_rim:
            rho[grid.gw > self.rmax] = 0.0
        else:
            rho[gr > self.rmax] = 0.0
        rho = rho * self.rho_0

        if np.sum(rho * grid.volumes) == 0.0 and self.mass > 0:
            raise Exception("Discretized disk mass is zero, suggesting that "
                            "the grid is too coarse")
        norm = self.mass / np.sum(rho * grid.volumes)
        return rho * norm

    def midplane_cumulative_density(self, r):
        """Cumulative column density along the midplane from rmin to r."""
        self._check_all_set()
        int1 = integrate_powerlaw(self.rmin, np.asarray(r, float),
                                  self.p - self.beta)
        return self.rho_0 * self.r_0 ** (self.beta - self.p) * int1

    def vertical_cumulative_density(self, r, theta):
        """Approximate column from the midplane along theta at radius r."""
        from scipy.special import erf
        self._check_all_set()
        h = self.scale_height_at(r)
        z = r * np.cos(theta)
        rho_mid = self.rho_0 * (self.r_0 / r) ** (self.beta - self.p)
        return rho_mid * h * np.sqrt(np.pi / 2.0) * erf(np.abs(z) / h / np.sqrt(2))
