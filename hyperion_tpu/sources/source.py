"""Luminosity sources: the 8 source types of the reference framework.

Parity target: hyperion/sources/source.py:38-1025 (base ``Source`` with
spectrum/temperature/LTE emission, and Point / PointCollection / Spherical
(+Spot) / ExternalSpherical / ExternalBox / Map / PlaneParallel sources).
HDF5 group attributes and spectrum-table layout match the reference's
``.rtin`` schema so models are interchangeable.
"""

import random
import string

import numpy as np

from ..util.functions import (FreezableClass, is_numpy_array,
                              monotonically_increasing, bool2str, str2bool,
                              asstr, B_nu)
from ..util.hdf5_tables import read_table, write_table
from ..util.integrate import integrate_loglog
from ..util.validator import validate_scalar


def random_id(length=8):
    return ''.join(random.sample(string.ascii_letters + string.digits, length))


def read_source(handle):
    source_type = asstr(handle.attrs['type'])
    types = {'spot': SpotSource, 'point': PointSource,
             'point_collection': PointSourceCollection,
             'sphere': SphericalSource, 'extern_sph': ExternalSphericalSource,
             'extern_box': ExternalBoxSource, 'map': MapSource,
             'plane_parallel': PlaneParallelSource}
    if source_type not in types:
        raise ValueError("Unexpected source type: {0}".format(source_type))
    return types[source_type].read(handle)


class Source(FreezableClass):
    """Base class for all source types.

    A source has a bolometric luminosity and one of three emission spectra:
    a tabulated (nu, fnu) spectrum, a blackbody at ``temperature``, or the
    local dust emissivity (LTE) when neither is set.
    """

    def __init__(self, name=None, peeloff=True, **kwargs):
        self.name = name if name else random_id(length=8)
        self.peeloff = peeloff
        self.luminosity = None
        self.spectrum = None
        self.temperature = None
        self._freeze()
        for kwarg in kwargs:
            setattr(self, kwarg, kwargs[kwarg])

    @property
    def name(self):
        return self._name

    @name.setter
    def name(self, value):
        self._name = value

    @property
    def luminosity(self):
        """Bolometric luminosity (erg/s)."""
        return self._luminosity

    @luminosity.setter
    def luminosity(self, value):
        if value is not None:
            validate_scalar('luminosity', value, domain='positive')
        self._luminosity = value

    def _read_luminosity(self, handle):
        self.luminosity = handle.attrs['luminosity']

    def _write_luminosity(self, handle):
        handle.attrs['luminosity'] = self.luminosity

    @property
    def temperature(self):
        """Blackbody temperature (K)."""
        return self._temperature

    @temperature.setter
    def temperature(self, value):
        if value is not None:
            if getattr(self, '_spectrum', None) is not None:
                raise Exception("A spectrum has already been set, so cannot "
                                "set a temperature")
            validate_scalar('temperature', value, domain='positive')
        self._temperature = value

    @property
    def spectrum(self):
        """Tabulated spectrum, set as a (nu, fnu) tuple (nu in Hz ascending)."""
        return self._spectrum

    @spectrum.setter
    def spectrum(self, value):
        if value is None:
            self._spectrum = None
            return
        if getattr(self, '_temperature', None) is not None:
            raise Exception("A temperature has already been set, so cannot "
                            "set a spectrum")
        if isinstance(value, dict):
            nu, fnu = value['nu'], value['fnu']
        elif type(value) in (tuple, list):
            if len(value) != 2:
                raise TypeError("spectrum tuple or list should contain two elements")
            nu, fnu = value
        else:
            raise TypeError("spectrum should be specified as a (nu, fnu) pair "
                            "of 1-D arrays")
        nu = np.asarray(nu, dtype=float)
        fnu = np.asarray(fnu, dtype=float)
        if nu.ndim != 1 or fnu.ndim != 1:
            raise TypeError("nu and fnu should be 1-D sequences")
        if nu.shape != fnu.shape:
            raise TypeError("nu and fnu should have the same shape")
        if len(np.unique(nu)) != len(nu):
            raise ValueError("nu sequence contains duplicate values")
        if np.any(nu <= 0.0):
            raise ValueError("nu should be strictly positive")
        if np.any(fnu < 0.0):
            raise ValueError("fnu should be positive")
        if np.any(np.isnan(nu) | np.isinf(nu)) or np.any(np.isnan(fnu) | np.isinf(fnu)):
            raise ValueError("nu/fnu contains NaN/Inf values")
        if not monotonically_increasing(nu):
            order = np.argsort(nu)
            nu, fnu = nu[order], fnu[order]
        self._spectrum = {'nu': nu, 'fnu': fnu}

    def _check_all_set(self):
        if self.luminosity is None:
            raise ValueError("luminosity is not set")

    def get_spectrum(self, nu_range=None):
        """Return (nu, fnu) normalized so the integral equals the luminosity."""
        self._check_all_set()
        if self.spectrum is not None:
            nu, fnu = self.spectrum['nu'], self.spectrum['fnu']
            if nu_range is not None:
                raise NotImplementedError("nu_range not yet implemented for spectrum")
        elif self.temperature is not None:
            if nu_range is None:
                raise ValueError("nu_range is needed for sources with Planck spectra")
            nu = np.logspace(np.log10(nu_range[0]), np.log10(nu_range[1]))
            nu[0], nu[-1] = nu_range
            fnu = B_nu(nu, self.temperature)
        else:
            raise Exception("Cannot compute spectrum for LTE emission sources")
        norm = integrate_loglog(nu, fnu)
        return nu, fnu / norm * self.luminosity

    def has_lte_spectrum(self):
        return self.spectrum is None and self.temperature is None

    def _read_base(self, handle):
        self.name = asstr(handle.attrs['name'])
        self._read_luminosity(handle)
        self.peeloff = str2bool(handle.attrs['peeloff'])
        spectrum = asstr(handle.attrs['spectrum'])
        if spectrum == 'spectrum':
            t = read_table(handle, 'spectrum')
            self.spectrum = (t['nu'], t['fnu'])
        elif spectrum == 'temperature':
            self.temperature = handle.attrs['temperature']
        elif spectrum == 'lte':
            pass
        else:
            raise ValueError('Unexpected value for `spectrum`: %s' % spectrum)

    def _write_base(self, handle):
        self._check_all_set()
        self._write_luminosity(handle)
        handle.attrs['name'] = np.bytes_(self.name.encode('utf-8'))
        handle.attrs['peeloff'] = bool2str(self.peeloff)
        if self.spectrum is not None:
            handle.attrs['spectrum'] = np.bytes_('spectrum')
            write_table(handle, 'spectrum',
                        {'nu': self.spectrum['nu'], 'fnu': self.spectrum['fnu']})
        elif self.temperature is not None:
            handle.attrs['spectrum'] = np.bytes_('temperature')
            handle.attrs['temperature'] = self.temperature
        else:
            handle.attrs['spectrum'] = np.bytes_('lte')


class PointSource(Source):
    """Isotropic point source at ``position`` (ref type 'point')."""

    def __init__(self, name=None, peeloff=True, **kwargs):
        self.position = (0.0, 0.0, 0.0)
        Source.__init__(self, name=name, peeloff=peeloff, **kwargs)

    @property
    def position(self):
        """Cartesian position (x, y, z) in cm."""
        return self._position

    @position.setter
    def position(self, value):
        if value is not None:
            if type(value) in [tuple, list]:
                if len(value) != 3:
                    raise ValueError("position should be a sequence of 3 values")
            elif is_numpy_array(value):
                if value.ndim != 1 or len(value) != 3:
                    raise ValueError("position should be a 1-D sequence of 3 values")
            else:
                raise ValueError("position should be a tuple, list, or array")
        self._position = value

    def _check_all_set(self):
        Source._check_all_set(self)
        if self.position is None:
            raise ValueError("position is not set")
        if self.has_lte_spectrum():
            raise ValueError("Point source cannot have LTE spectrum")

    @classmethod
    def read(cls, handle):
        if not handle.attrs['type'] == b'point':
            raise ValueError("Source is not a PointSource")
        self = cls()
        self._read_base(handle)
        self.position = (handle.attrs['x'], handle.attrs['y'], handle.attrs['z'])
        return self

    def write(self, handle, name):
        g = handle.create_group(name)
        self._write_base(g)
        g.attrs['type'] = np.bytes_('point')
        g.attrs['x'] = self.position[0]
        g.attrs['y'] = self.position[1]
        g.attrs['z'] = self.position[2]


class PointSourceCollection(Source):
    """N point sources sharing a spectrum; luminosity is an (N,) array and
    position an (N, 3) array (ref type 'point_collection')."""

    def __init__(self, name=None, peeloff=True, **kwargs):
        self.position = None
        Source.__init__(self, name=name, peeloff=peeloff, **kwargs)

    @property
    def luminosity(self):
        """Luminosity array (N,) in erg/s."""
        return self._luminosity

    @luminosity.setter
    def luminosity(self, value):
        if value is not None:
            if is_numpy_array(value):
                if value.ndim != 1:
                    raise ValueError("luminosity should be a 1-D array")
                if not np.all(value > 0.0):
                    raise ValueError("luminosity should be positive")
                if self.position is not None and value.shape[0] != self.position.shape[0]:
                    raise ValueError("luminosity should be a 1-D array with the "
                                     "same number of rows as position")
            else:
                raise ValueError("luminosity should be a Numpy array")
        self._luminosity = value

    def _read_luminosity(self, handle):
        self.luminosity = np.array(handle['luminosity'])

    def _write_luminosity(self, handle):
        handle.create_dataset('luminosity', data=self.luminosity,
                              compression='gzip')

    @property
    def position(self):
        """Positions (N, 3) in cm."""
        return self._position

    @position.setter
    def position(self, value):
        if value is not None:
            if is_numpy_array(value):
                if value.ndim != 2 or value.shape[1] != 3:
                    raise ValueError("position should be a 2-D array with 3 columns")
                if self.luminosity is not None and value.shape[0] != self.luminosity.shape[0]:
                    raise ValueError("position should be a 2-D array with the "
                                     "same number of rows as luminosity")
            else:
                raise ValueError("position should be a Numpy array")
        self._position = value

    def _check_all_set(self):
        Source._check_all_set(self)
        if self.position is None:
            raise ValueError("position is not set")
        if self.has_lte_spectrum():
            raise ValueError("Point source collection cannot have LTE spectrum")

    @classmethod
    def read(cls, handle):
        if not handle.attrs['type'] == b'point_collection':
            raise ValueError("Source is not a PointSourceCollection")
        self = cls()
        self._read_base(handle)
        self.position = np.array(handle['position'])
        return self

    def write(self, handle, name):
        g = handle.create_group(name)
        self._write_base(g)
        g.attrs['type'] = np.bytes_('point_collection')
        g.create_dataset('position', data=self.position, compression='gzip')


class SpotSource(Source):
    """A hot spot on a spherical source (ref type 'spot')."""

    def __init__(self, name=None, peeloff=True, **kwargs):
        self.longitude = None
        self.latitude = None
        self.radius = None
        Source.__init__(self, name=name, peeloff=peeloff, **kwargs)

    @property
    def longitude(self):
        """Longitude of the spot (degrees)."""
        return self._longitude

    @longitude.setter
    def longitude(self, value):
        if value is not None:
            validate_scalar('longitude', value, domain=[0, 360])
        self._longitude = value

    @property
    def latitude(self):
        """Latitude of the spot (degrees)."""
        return self._latitude

    @latitude.setter
    def latitude(self, value):
        if value is not None:
            validate_scalar('latitude', value, domain=[-90, 90])
        self._latitude = value

    @property
    def radius(self):
        """Radius of the parent spherical source (cm)."""
        return self._radius

    @radius.setter
    def radius(self, value):
        if value is not None:
            validate_scalar('radius', value, domain='positive')
        self._radius = value

    def _check_all_set(self):
        Source._check_all_set(self)
        if self.longitude is None:
            raise ValueError("longitude is not set")
        if self.latitude is None:
            raise ValueError("latitude is not set")
        if self.radius is None:
            raise ValueError("radius is not set")
        if self.has_lte_spectrum():
            raise ValueError("Spot source cannot have LTE spectrum")

    @classmethod
    def read(cls, handle):
        if not handle.attrs['type'] == b'spot':
            raise ValueError("Source is not a SpotSource")
        self = cls()
        self._read_base(handle)
        self.longitude = handle.attrs['longitude']
        self.latitude = handle.attrs['latitude']
        self.radius = handle.attrs['radius']
        return self

    def write(self, handle, name):
        g = handle.create_group(name)
        self._write_base(g)
        g.attrs['type'] = np.bytes_('spot')
        g.attrs['longitude'] = self.longitude
        g.attrs['latitude'] = self.latitude
        g.attrs['radius'] = self.radius


class SphericalSource(Source):
    """Sphere with optional limb darkening and spots (ref type 'sphere')."""

    def __init__(self, name=None, peeloff=True, **kwargs):
        self.position = (0.0, 0.0, 0.0)
        self.radius = None
        self.limb = False
        self.spots = []
        Source.__init__(self, name=name, peeloff=peeloff, **kwargs)

    @property
    def radius(self):
        """Radius (cm)."""
        return self._radius

    @radius.setter
    def radius(self, value):
        if value is not None:
            validate_scalar('radius', value, domain='positive')
        self._radius = value

    @property
    def position(self):
        """Cartesian position (x, y, z) in cm."""
        return self._position

    @position.setter
    def position(self, value):
        if value is not None:
            if type(value) in [tuple, list]:
                if len(value) != 3:
                    raise ValueError("position should be a sequence of 3 values")
            elif is_numpy_array(value):
                if value.ndim != 1 or len(value) != 3:
                    raise ValueError("position should be a 1-D sequence of 3 values")
            else:
                raise ValueError("position should be a tuple, list, or array")
        self._position = value

    @property
    def limb(self):
        """Whether to include limb darkening."""
        return self._limb

    @limb.setter
    def limb(self, value):
        if value is not None and not isinstance(value, bool):
            raise ValueError("limb should be a boolean value (True/False)")
        self._limb = value

    def _check_all_set(self):
        Source._check_all_set(self)
        if self.position is None:
            raise ValueError("position is not set")
        if self.radius is None:
            raise ValueError("radius is not set")
        if self.limb is None:
            raise ValueError("limb is not set")
        if self.has_lte_spectrum():
            raise ValueError("Spherical source cannot have LTE spectrum")

    def add_spot(self, *args, **kwargs):
        """Add a ``SpotSource`` on this sphere."""
        spot = SpotSource(*args, **kwargs)
        self.spots.append(spot)
        return spot

    @classmethod
    def read(cls, handle):
        if not handle.attrs['type'] == b'sphere':
            raise ValueError("Source is not a SphericalSource")
        self = cls()
        self._read_base(handle)
        self.position = (handle.attrs['x'], handle.attrs['y'], handle.attrs['z'])
        self.radius = handle.attrs['r']
        self.limb = str2bool(handle.attrs['limb'])
        for group in handle:
            if 'Spot' in group:
                self.spots.append(SpotSource.read(handle[group]))
        return self

    def write(self, handle, name):
        g = handle.create_group(name)
        self._write_base(g)
        g.attrs['type'] = np.bytes_('sphere')
        g.attrs['x'] = self.position[0]
        g.attrs['y'] = self.position[1]
        g.attrs['z'] = self.position[2]
        g.attrs['r'] = self.radius
        g.attrs['limb'] = bool2str(self.limb)
        for i, spot in enumerate(self.spots):
            spot.write(g, 'Spot %i' % i)


class ExternalSphericalSource(Source):
    """Inward-emitting sphere modelling an external radiation field
    (ref type 'extern_sph')."""

    def __init__(self, name=None, peeloff=True, **kwargs):
        self.position = (0.0, 0.0, 0.0)
        self.radius = None
        Source.__init__(self, name=name, peeloff=peeloff, **kwargs)

    @property
    def radius(self):
        """Radius (cm)."""
        return self._radius

    @radius.setter
    def radius(self, value):
        if value is not None:
            validate_scalar('radius', value, domain='positive')
        self._radius = value

    @property
    def position(self):
        """Cartesian position (x, y, z) in cm."""
        return self._position

    @position.setter
    def position(self, value):
        if value is not None:
            if type(value) in [tuple, list]:
                if len(value) != 3:
                    raise ValueError("position should be a sequence of 3 values")
            elif is_numpy_array(value):
                if value.ndim != 1 or len(value) != 3:
                    raise ValueError("position should be a 1-D sequence of 3 values")
            else:
                raise ValueError("position should be a tuple, list, or array")
        self._position = value

    def _check_all_set(self):
        Source._check_all_set(self)
        if self.position is None:
            raise ValueError("position is not set")
        if self.radius is None:
            raise ValueError("radius is not set")
        if self.has_lte_spectrum():
            raise ValueError("External spherical source cannot have LTE spectrum")

    @classmethod
    def read(cls, handle):
        if not handle.attrs['type'] == b'extern_sph':
            raise ValueError("Source is not an ExternalSphericalSource")
        self = cls()
        self._read_base(handle)
        self.position = (handle.attrs['x'], handle.attrs['y'], handle.attrs['z'])
        self.radius = handle.attrs['r']
        return self

    def write(self, handle, name):
        g = handle.create_group(name)
        self._write_base(g)
        g.attrs['type'] = np.bytes_('extern_sph')
        g.attrs['x'] = self.position[0]
        g.attrs['y'] = self.position[1]
        g.attrs['z'] = self.position[2]
        g.attrs['r'] = self.radius


class ExternalBoxSource(Source):
    """Inward-emitting box modelling an external radiation field
    (ref type 'extern_box')."""

    def __init__(self, name=None, peeloff=True, **kwargs):
        self.bounds = None
        Source.__init__(self, name=name, peeloff=peeloff, **kwargs)

    @property
    def bounds(self):
        """Bounds [[xmin, xmax], [ymin, ymax], [zmin, zmax]] in cm."""
        return self._bounds

    @bounds.setter
    def bounds(self, value):
        if value is not None:
            if type(value) in [tuple, list]:
                if np.shape(value) != (3, 2):
                    raise ValueError("bounds should be a sequence of 3 pairs of values")
            elif is_numpy_array(value):
                if value.ndim != 2 or value.shape != (3, 2):
                    raise ValueError("bounds should be a 3x2 array")
            else:
                raise ValueError("bounds should be a tuple, list, or array")
        self._bounds = value

    def _check_all_set(self):
        Source._check_all_set(self)
        if self.bounds is None:
            raise ValueError("bounds are not set")
        if self.has_lte_spectrum():
            raise ValueError("External box source cannot have LTE spectrum")

    @classmethod
    def read(cls, handle):
        if not handle.attrs['type'] == b'extern_box':
            raise ValueError("Source is not an ExternalBoxSource")
        self = cls()
        self._read_base(handle)
        self.bounds = [(handle.attrs['xmin'], handle.attrs['xmax']),
                       (handle.attrs['ymin'], handle.attrs['ymax']),
                       (handle.attrs['zmin'], handle.attrs['zmax'])]
        return self

    def write(self, handle, name):
        g = handle.create_group(name)
        self._write_base(g)
        g.attrs['type'] = np.bytes_('extern_box')
        g.attrs['xmin'] = self.bounds[0][0]
        g.attrs['xmax'] = self.bounds[0][1]
        g.attrs['ymin'] = self.bounds[1][0]
        g.attrs['ymax'] = self.bounds[1][1]
        g.attrs['zmin'] = self.bounds[2][0]
        g.attrs['zmax'] = self.bounds[2][1]


class MapSource(Source):
    """Diffuse source with per-cell relative luminosities (ref type 'map')."""

    def __init__(self, name=None, peeloff=True, **kwargs):
        self.map = None
        Source.__init__(self, name=name, peeloff=peeloff, **kwargs)

    @property
    def map(self):
        """Relative luminosity per cell (grid-shaped array)."""
        return self._map

    @map.setter
    def map(self, value):
        if value is not None:
            if not is_numpy_array(value):
                raise ValueError("map should be a Numpy array")
            if np.all(value == 0.0):
                raise ValueError("Luminosity map is zero everywhere")
        self._map = value

    def _check_all_set(self):
        Source._check_all_set(self)
        if self.map is None:
            raise ValueError("map is not set")

    @classmethod
    def read(cls, handle):
        if not handle.attrs['type'] == b'map':
            raise ValueError("Source is not a MapSource")
        self = cls()
        self._read_base(handle)
        self.map = np.array(handle['Luminosity map'])
        return self

    def write(self, handle, name, grid=None, compression=True,
              map_dtype=float):
        g = handle.create_group(name)
        self._write_base(g)
        g.attrs['type'] = np.bytes_('map')
        if grid is not None:
            grid.write_single_array(g, 'Luminosity map', self.map,
                                    compression=compression,
                                    physics_dtype=map_dtype)
        else:
            g.create_dataset('Luminosity map', data=self.map,
                             compression='gzip' if compression else None)


class PlaneParallelSource(Source):
    """Circular beam emitting in one direction (ref type 'plane_parallel')."""

    def __init__(self, name=None, peeloff=False, **kwargs):
        self.position = (0.0, 0.0, 0.0)
        self.radius = None
        self.direction = None
        Source.__init__(self, name=name, peeloff=peeloff, **kwargs)

    @property
    def radius(self):
        """Radius of the beam (cm)."""
        return self._radius

    @radius.setter
    def radius(self, value):
        if value is not None:
            validate_scalar('radius', value, domain='positive')
        self._radius = value

    @property
    def position(self):
        """Cartesian position (x, y, z) in cm."""
        return self._position

    @position.setter
    def position(self, value):
        if value is not None:
            if type(value) in [tuple, list]:
                if len(value) != 3:
                    raise ValueError("position should be a sequence of 3 values")
            elif is_numpy_array(value):
                if value.ndim != 1 or len(value) != 3:
                    raise ValueError("position should be a 1-D sequence of 3 values")
            else:
                raise ValueError("position should be a tuple, list, or array")
        self._position = value

    @property
    def direction(self):
        """Direction of emission as (theta, phi) in degrees."""
        return self._direction

    @direction.setter
    def direction(self, value):
        if value is not None:
            if type(value) in [tuple, list]:
                if len(value) != 2:
                    raise ValueError("direction should be a sequence of 2 values")
            elif is_numpy_array(value):
                if value.ndim != 1 or len(value) != 2:
                    raise ValueError("direction should be a 1-D sequence of 2 values")
            else:
                raise ValueError("direction should be a tuple, list, or array")
        self._direction = value

    def _check_all_set(self):
        Source._check_all_set(self)
        if self.position is None:
            raise ValueError("position is not set")
        if self.radius is None:
            raise ValueError("radius is not set")
        if self.direction is None:
            raise ValueError("direction is not set")
        if self.has_lte_spectrum():
            raise ValueError("Plane parallel source cannot have LTE spectrum")

    @classmethod
    def read(cls, handle):
        if not handle.attrs['type'] == b'plane_parallel':
            raise ValueError("Source is not a PlaneParallelSource")
        self = cls()
        self._read_base(handle)
        self.position = (handle.attrs['x'], handle.attrs['y'], handle.attrs['z'])
        self.radius = handle.attrs['r']
        self.direction = (handle.attrs['theta'], handle.attrs['phi'])
        return self

    def write(self, handle, name):
        g = handle.create_group(name)
        self._write_base(g)
        g.attrs['type'] = np.bytes_('plane_parallel')
        g.attrs['x'] = self.position[0]
        g.attrs['y'] = self.position[1]
        g.attrs['z'] = self.position[2]
        g.attrs['r'] = self.radius
        g.attrs['theta'] = self.direction[0]
        g.attrs['phi'] = self.direction[1]
