"""Spectral transmission filters for convolved imaging
(ref: hyperion/filter/filter.py — ours takes plain Hz arrays instead of
astropy Quantities, which are not available in this environment)."""

import numpy as np

from ..util.integrate import integrate
from ..util.validator import validate_scalar, validate_array
from ..util.functions import asstr


class Filter(object):
    """A spectral transmission curve.

    Parameters
    ----------
    name : str
    nu : array
        Frequencies (Hz) at which the transmission is defined.
    transmission : array
        Fractional transmission (0-1) at each frequency.
    """

    def __init__(self, name=None, nu=None, transmission=None):
        self.name = name
        self.nu = nu
        self.transmission = transmission
        self._alpha = None
        self._beta = None
        self.central_nu = None

    @property
    def name(self):
        return self._name

    @name.setter
    def name(self, value):
        if value is None or isinstance(value, str):
            self._name = value
        else:
            raise TypeError("name should be given as a string")

    @property
    def nu(self):
        return self._nu

    @nu.setter
    def nu(self, value):
        if value is None:
            self._nu = None
        else:
            self._nu = validate_array('nu', np.asarray(value, float),
                                      domain='strictly-positive', ndim=1)

    @property
    def transmission(self):
        return self._transmission

    @transmission.setter
    def transmission(self, value):
        if value is None:
            self._transmission = None
        else:
            self._transmission = validate_array(
                'transmission', np.asarray(value, float), domain='positive',
                ndim=1, shape=None if self.nu is None else (len(self.nu),))

    @property
    def detector_type(self):
        """'energy' or 'photons' — sets the beta normalization exponent."""
        if self._beta is None:
            return None
        return "energy" if self._beta == -1 else "photons"

    @detector_type.setter
    def detector_type(self, value):
        if value == 'energy':
            self._beta = -1
        elif value == 'photons':
            self._beta = 0
        else:
            raise ValueError("detector_type should be one of energy/photons")

    @property
    def alpha(self):
        """Exponent of the nu^alpha reference spectral shape."""
        return self._alpha

    @alpha.setter
    def alpha(self, value):
        self._alpha = value

    @property
    def central_nu(self):
        return self._central_nu

    @central_nu.setter
    def central_nu(self, value):
        if value is None:
            self._central_nu = None
        else:
            self._central_nu = validate_scalar('central_nu', value,
                                               domain='strictly-positive')

    def check_all_set(self):
        for attr in ['nu', 'transmission', 'name', 'alpha', 'detector_type',
                     'central_nu']:
            if getattr(self, attr) is None:
                raise ValueError("{0} has not been set".format(attr))

    def to_hdf5_group(self, group, name):
        self.check_all_set()
        nu = self.nu
        tr = self.transmission
        order = np.argsort(nu)
        nu, tr = nu[order], tr[order]
        nu0 = self.central_nu
        alpha = self.alpha
        beta = self._beta
        # Normalized response used for convolved binning, then x nu so the
        # engine returns nu*Fnu (ref: filter.py:105-115)
        tr_norm = (tr / nu ** (1 + beta) / nu0 ** alpha /
                   integrate(nu, tr / nu ** (1.0 + alpha + beta)))
        tr_norm = tr_norm * nu
        dset = group.create_dataset(
            name, data=np.array(list(zip(nu, tr, tr_norm)),
                                dtype=[('nu', float), ('tr', float),
                                       ('tn', float)]))
        dset.attrs['name'] = np.bytes_(self.name)
        dset.attrs['alpha'] = self.alpha
        dset.attrs['beta'] = self._beta
        dset.attrs['nu0'] = nu0

    @classmethod
    def from_hdf5_group(cls, group, name):
        self = cls()
        self.nu = np.array(group[name]['nu'])
        self.transmission = np.array(group[name]['tr'])
        self.name = asstr(group[name].attrs['name'])
        self.alpha = group[name].attrs['alpha']
        self._beta = group[name].attrs['beta']
        self.central_nu = float(group[name].attrs['nu0'])
        return self

    @property
    def normalized_response(self):
        """The tn column: normalized response times nu."""
        nu = self.nu
        tr = self.transmission
        order = np.argsort(nu)
        nu, tr = nu[order], tr[order]
        tr_norm = (tr / nu ** (1 + self._beta) / self.central_nu ** self._alpha /
                   integrate(nu, tr / nu ** (1.0 + self._alpha + self._beta)))
        return nu, tr_norm * nu
