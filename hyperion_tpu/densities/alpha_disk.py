"""Alpha accretion disk (Whitney et al. 2003)
(ref: hyperion/densities/alpha_disk.py).

Density is the flared-disk profile times (1 - sqrt(R_star/R)); the viscous
accretion luminosity follows L_acc = G M Mdot / 2 * [3(1/Rmin - 1/Rmax) -
2(sqrt(R*/Rmin^3) - sqrt(R*/Rmax^3))].
"""

import numpy as np

from ..util.constants import pi, G
from ..util.integrate import integrate_powerlaw
from ..util.validator import validate_scalar
from .core import Disk


class AlphaDisk(Disk):

    def __init__(self, mass=None, rho_0=None, rmin=None, rmax=None, p=-1,
                 beta=-1.25, h_0=None, r_0=None, cylindrical_inner_rim=True,
                 cylindrical_outer_rim=True, mdot=None, lvisc=None, star=None,
                 dust=None):
        self._mass = None
        self._rho_0 = None
        self._mdot = None
        self._lvisc = None
        Disk.__init__(self)
        self.rmin = rmin
        self.rmax = rmax
        self.p = p
        self.beta = beta
        self.h_0 = h_0
        self.r_0 = r_0
        self.cylindrical_inner_rim = cylindrical_inner_rim
        self.cylindrical_outer_rim = cylindrical_outer_rim
        self.star = star
        self.dust = dust
        if mass is not None and rho_0 is not None:
            raise Exception("Cannot specify both mass and rho_0")
        if mass is not None:
            self.mass = mass
        elif rho_0 is not None:
            self.rho_0 = rho_0
        if mdot is not None and lvisc is not None:
            raise Exception("Cannot specify both mdot and lvisc")
        if mdot is not None:
            self.mdot = mdot
        elif lvisc is not None:
            self.lvisc = lvisc
        self._freeze()

    # -- mass / rho_0 (same integral as FlaredDisk; the geometric factor is
    #    absorbed into the grid-discretized normalization) ---------------------

    @property
    def mass(self):
        if self._mass is not None:
            return self._mass
        if self._rho_0 is None:
            return None
        return self._rho_0 * self._mass_integral()

    @mass.setter
    def mass(self, value):
        if value is not None:
            validate_scalar('mass', value, domain='positive')
            self._rho_0 = None
        self._mass = value

    def _mass_integral(self):
        int1 = integrate_powerlaw(self.rmin, self.rmax, 1.0 + self.p)
        int1 *= self.r_0 ** -self.p
        return (2.0 * pi) ** 1.5 * self.h_0 * int1

    @property
    def rho_0(self):
        if self._rho_0 is not None:
            return self._rho_0
        if self._mass is None:
            return None
        self._check_all_set()
        if self.rmax <= self.rmin:
            return 0.0
        return self._mass / self._mass_integral()

    @rho_0.setter
    def rho_0(self, value):
        if value is not None:
            validate_scalar('rho_0', value, domain='positive')
            self._mass = None
        self._rho_0 = value

    # -- accretion ------------------------------------------------------------

    def _lacc_factor(self):
        """G M/2 [3(1/rmin - 1/rmax) - 2(sqrt(R*/rmin^3)-sqrt(R*/rmax^3))]."""
        if self.star is None or self.star.mass is None:
            raise Exception("Stellar mass is required to relate mdot and lvisc")
        rs = self.star.radius
        return G * self.star.mass / 2.0 * (
            3.0 * (1.0 / self.rmin - 1.0 / self.rmax) -
            2.0 * (np.sqrt(rs / self.rmin ** 3) - np.sqrt(rs / self.rmax ** 3)))

    @property
    def mdot(self):
        """Accretion rate (g/s)."""
        if self._mdot is not None:
            return self._mdot
        if self._lvisc is None:
            return None
        return self._lvisc / self._lacc_factor()

    @mdot.setter
    def mdot(self, value):
        if value is not None:
            validate_scalar('mdot', value, domain='positive')
            self._lvisc = None
        self._mdot = value

    @property
    def lvisc(self):
        """Viscous accretion luminosity (erg/s)."""
        if self._lvisc is not None:
            return self._lvisc
        if self._mdot is None:
            return None
        return self._mdot * self._lacc_factor()

    @lvisc.setter
    def lvisc(self, value):
        if value is not None:
            validate_scalar('lvisc', value, domain='positive')
            self._mdot = None
        self._lvisc = value

    @property
    def accretion_luminosity(self):
        return self.lvisc

    def _check_all_set(self):
        for attr in ('rmin', 'rmax', 'h_0', 'r_0'):
            v = getattr(self, attr)
            if v is None:
                raise Exception("%s is not set" % attr)
        if self._mass is None and self._rho_0 is None:
            raise Exception("mass or rho_0 is not set")
        if self.star is None:
            raise Exception("star is not set")

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
        with np.errstate(invalid='ignore'):
            rho *= np.maximum(1.0 - np.sqrt(self.star.radius / grid.gw), 0.0)
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

    def accretion_luminosity_grid(self, grid):
        """Per-cell viscous energy release (erg/s), eq. 4 of Whitney+03,
        normalized to the total lvisc on the discretized grid."""
        self._check_all_set()
        if self.lvisc is None or self.lvisc == 0.0:
            return np.zeros(grid.shape)
        h = self.h_0 * (grid.gw / self.r_0) ** self.beta
        with np.errstate(invalid='ignore', divide='ignore'):
            dedv = (1.0 / (grid.gw ** 3 * h) *
                    np.maximum(1.0 - np.sqrt(self.star.radius / grid.gw), 0.0) *
                    np.exp(-0.5 * (grid.gz / h) ** 2))
        gr = np.hypot(grid.gw, grid.gz)
        if self.cylindrical_inner_rim:
            dedv[grid.gw < self.rmin] = 0.0
        else:
            dedv[gr < self.rmin] = 0.0
        if self.cylindrical_outer_rim:
            dedv[grid.gw > self.rmax] = 0.0
        else:
            dedv[gr > self.rmax] = 0.0
        lum = dedv * grid.volumes
        total = np.sum(lum)
        if total == 0.0:
            return np.zeros(grid.shape)
        return lum / total * self.lvisc

    def midplane_cumulative_density(self, r):
        self._check_all_set()
        int1 = integrate_powerlaw(self.rmin, np.asarray(r, float),
                                  self.p - self.beta)
        return self.rho_0 * self.r_0 ** (self.beta - self.p) * int1
