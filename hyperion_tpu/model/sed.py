"""SED value class (ref: hyperion/model/sed.py)."""

import numpy as np

from ..util.constants import c
from ..util.functions import FreezableClass


class SED(FreezableClass):
    """An SED data product: values on a frequency grid plus metadata."""

    def __init__(self, nu=None, val=None, unc=None, units=None):
        self.nu = nu
        self.val = val
        self.unc = unc
        self.units = units
        self.ap_min = None
        self.ap_max = None
        self.d_min = None
        self.d_max = None
        self.distance = None
        self.inside_observer = None
        self._freeze()

    @property
    def wav(self):
        """Wavelengths (microns), descending for ascending nu."""
        return c / np.asarray(self.nu) / 1.e-4

    @property
    def flux(self):
        return self.val

    @property
    def unit(self):
        return self.units

    def __iter__(self):
        # Backward-compatible (wav, nufnu) unpacking
        if self.unc is None:
            return iter((self.wav, self.val))
        return iter((self.wav, self.val, self.unc))
