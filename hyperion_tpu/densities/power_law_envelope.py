"""Power-law spherical envelope (ref: hyperion/densities/power_law_envelope.py):
rho(r) = rho_0 (r/r_0)^power between rmin and rmax."""

import numpy as np

from ..util.constants import pi
from ..util.integrate import integrate_powerlaw
from ..util.validator import validate_scalar
from .core import Envelope


class PowerLawEnvelope(Envelope):

    def __init__(self, mass=None, rho_0=None, rmin=None, rmax=None, r_0=None,
                 power=None, dust=None):
        self._mass = None
        self._rho_0 = None
        Envelope.__init__(self)
        self.rmin = rmin
        self.rmax = rmax
        self.r_0 = r_0
        self.power = power
        self.dust = dust
        if mass is not None and rho_0 is not None:
            raise Exception("Cannot specify both mass and rho_0")
        if mass is not None:
            self.mass = mass
        elif rho_0 is not None:
            self.rho_0 = rho_0
        self._freeze()

    def _integral(self):
        return 4.0 * pi * self.r_0 ** -self.power * \
            integrate_powerlaw(self.rmin, self.rmax, 2.0 + self.power)

    @property
    def mass(self):
        """Total envelope mass (g)."""
        if self._mass is not None:
            return self._mass
        if self._rho_0 is None:
            return None
        self._check_all_set()
        return self._rho_0 * self._integral()

    @mass.setter
    def mass(self, value):
        if value is not None:
            validate_scalar('mass', value, domain='positive')
            self._rho_0 = None
        self._mass = value

    @property
    def rho_0(self):
        """Density at r_0 (g/cm^3)."""
        if self._rho_0 is not None:
            return self._rho_0
        if self._mass is None:
            return None
        self._check_all_set()
        return self._mass / self._integral()

    @rho_0.setter
    def rho_0(self, value):
        if value is not None:
            validate_scalar('rho_0', value, domain='positive')
            self._mass = None
        self._rho_0 = value

    def _check_all_set(self):
        for attr in ('rmin', 'rmax', 'r_0', 'power'):
            if getattr(self, attr) is None:
                raise Exception("%s is not set" % attr)
        if self._mass is None and self._rho_0 is None:
            raise Exception("mass or rho_0 is not set")

    def exists(self):
        return self.rho_0 > 0.0

    def density(self, grid, ignore_cavity=False):
        from ..grid import SphericalPolarGrid, CylindricalPolarGrid
        if isinstance(grid, SphericalPolarGrid):
            r = grid.gr
        elif isinstance(grid, CylindricalPolarGrid):
            r = np.hypot(grid.gw, grid.gz)
        else:
            raise TypeError("grid should be a SphericalPolarGrid or "
                            "CylindricalPolarGrid instance")
        self._check_all_set()
        if self.rmax <= self.rmin:
            return np.zeros(grid.shape)
        rho = self.rho_0 * (r / self.r_0) ** self.power
        rho[r < self.rmin] = 0.0
        rho[r > self.rmax] = 0.0
        if self._rho_0 is None:
            norm = self.mass / np.sum(rho * grid.volumes)
            rho = rho * norm
        if not ignore_cavity and self.cavity is not None:
            mask = self.cavity.mask(grid)
            rho[~mask] = 0.0
        return rho

    def outermost_radius(self, rho):
        """Radius where the density drops to rho."""
        return self.r_0 * (rho / self.rho_0) ** (1.0 / self.power)

    def midplane_cumulative_density(self, r):
        """Cumulative column density from rmin to r along the midplane."""
        self._check_all_set()
        return self.rho_0 * self.r_0 ** -self.power * \
            integrate_powerlaw(self.rmin, np.asarray(r, float), self.power)
