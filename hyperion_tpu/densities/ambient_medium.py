"""Constant-density ambient medium (ref: hyperion/densities/ambient_medium.py):
density rho between rmin and rmax, with other components subtracted so the
total density never falls below the ambient value."""

import numpy as np

from ..util.validator import validate_scalar
from .core import Density


class AmbientMedium(Density):

    def __init__(self, rho=None, rmin=None, rmax=None, subtract=None,
                 dust=None):
        self._init_radii()
        self.dust = dust
        self.rho = rho
        self.rmin = rmin
        self.rmax = rmax
        self.subtract = subtract if subtract is not None else []
        self._freeze()

    @property
    def rho(self):
        """Ambient density (g/cm^3)."""
        return self._rho

    @rho.setter
    def rho(self, value):
        if value is not None:
            validate_scalar('rho', value, domain='positive')
        self._rho = value

    def _check_all_set(self):
        for attr in ('rho', 'rmin', 'rmax'):
            if getattr(self, attr) is None:
                raise Exception("%s is not set" % attr)

    def density(self, grid):
        from ..grid import SphericalPolarGrid
        if not isinstance(grid, SphericalPolarGrid):
            raise TypeError("grid should be a SphericalPolarGrid instance")
        self._check_all_set()
        rho = np.ones(grid.gr.shape) * self.rho
        rho[grid.gr < self.rmin] = 0.0
        rho[grid.gr > self.rmax] = 0.0
        for component in self.subtract:
            rho = rho - component.density(grid)
        rho[rho < 0] = 0.0
        return rho
