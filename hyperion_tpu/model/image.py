"""Image value class (ref: hyperion/model/image.py)."""

import numpy as np

from ..util.constants import c
from ..util.functions import FreezableClass


class Image(FreezableClass):
    """An image data product: pixel values plus metadata."""

    def __init__(self, nu=None, val=None, unc=None, units=None):
        self.nu = nu
        self.val = val
        self.unc = unc
        self.units = units
        self.x_min = None
        self.x_max = None
        self.y_min = None
        self.y_max = None
        self.lon_min = None
        self.lon_max = None
        self.lat_min = None
        self.lat_max = None
        self.d_min = None
        self.d_max = None
        self.distance = None
        self.inside_observer = None
        self.pix_area_sr = None
        self._freeze()

    @property
    def wav(self):
        return c / np.asarray(self.nu) / 1.e-4

    @property
    def flux(self):
        return self.val

    @property
    def unit(self):
        return self.units

    def __iter__(self):
        if self.unc is None:
            return iter((self.wav, self.val))
        return iter((self.wav, self.val, self.unc))
