"""Base classes for analytic density structures
(ref: hyperion/densities/core.py + the rmin/rmax OptThinRadius handling in
each density class, e.g. flared_disk.py:145-170)."""

import numpy as np

from ..util.functions import FreezableClass
from ..util.convenience import OptThinRadius


class Density(FreezableClass):
    """Common machinery: rmin/rmax that may be OptThinRadius instances,
    lazily evaluated against the component's star and dust."""

    def _init_radii(self):
        self._rmin = None
        self._rmax = None
        self.star = None

    def _eval_radius(self, value, name):
        if isinstance(value, OptThinRadius):
            if self.star is None or self.dust is None:
                raise Exception("%s is an OptThinRadius but star/dust are "
                                "not set" % name)
            return value.evaluate(self.star, self.dust)
        return value

    @property
    def rmin(self):
        """Inner radius (cm)."""
        return self._eval_radius(self._rmin, 'rmin')

    @rmin.setter
    def rmin(self, value):
        if value is not None and not isinstance(value, OptThinRadius):
            from ..util.validator import validate_scalar
            validate_scalar('rmin', value, domain='positive',
                            extra=' or an OptThinRadius instance')
        self._rmin = value

    @property
    def rmax(self):
        """Outer radius (cm)."""
        return self._eval_radius(self._rmax, 'rmax')

    @rmax.setter
    def rmax(self, value):
        if value is not None and not isinstance(value, OptThinRadius):
            from ..util.validator import validate_scalar
            validate_scalar('rmax', value, domain='positive',
                            extra=' or an OptThinRadius instance')
        self._rmax = value

    def exists(self):
        return True


class Disk(Density):

    def __init__(self):
        self._init_radii()
        self.mass = None
        self.rho_0 = None
        self.p = -1.0
        self.beta = -1.25
        self.h_0 = None
        self.r_0 = None
        self.cylindrical_inner_rim = True
        self.cylindrical_outer_rim = True
        self.dust = None

    def scale_height_at(self, r):
        """Disk scale height h(r) = h_0 (r/r_0)^beta."""
        return self.h_0 * (r / self.r_0) ** self.beta


class Envelope(Density):

    def __init__(self):
        self._init_radii()
        self.cavity = None
        self.dust = None

    def add_bipolar_cavity(self):
        from .bipolar_cavity import BipolarCavity
        if self.cavity is not None:
            raise Exception("Envelope already has a bipolar cavity")
        self.cavity = BipolarCavity()
        self.cavity._envelope = self
        return self.cavity
