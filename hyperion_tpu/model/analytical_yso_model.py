"""Analytical YSO convenience model
(ref: hyperion/model/analytical_yso_model.py:34-869): a Star plus analytic
disks/envelopes/ambient media evaluated onto an automatically refined polar
grid, with magnetospheric accretion and midplane optical-depth diagnostics.
"""

from copy import deepcopy

import numpy as np

from ..util.constants import pi, sigma, G, c
from ..util.functions import FreezableClass
from ..util.interpolate import interp1d_fast_loglog
from ..densities import (FlaredDisk, AlphaDisk, UlrichEnvelope,
                         PowerLawEnvelope, AmbientMedium)
from ..grid import SphericalPolarGrid, CylindricalPolarGrid
from ..sources import SphericalSource, SpotSource, MapSource
from .model import Model


def _min_none(*args):
    values = [a for a in args if a is not None]
    return min(values) if values else None


def _max_none(*args):
    values = [a for a in args if a is not None]
    return max(values) if values else None


class Star(FreezableClass):
    """The central star: a SphericalSource plus optional accretion
    components ('uv', 'xray') that share its radius."""

    def __init__(self):
        self.sources = {}
        self.sources['star'] = SphericalSource(name='star')
        self.mass = None
        self.radius = None
        self.limb = False
        self._freeze()

    def add_spot(self, *args, **kwargs):
        self.sources['star'].spots.append(SpotSource(*args, **kwargs))

    def __setattr__(self, attribute, value):
        if attribute in ['luminosity', 'temperature', 'spectrum']:
            setattr(self.sources['star'], attribute, value)
            return
        elif attribute in ['radius', 'limb']:
            for source in self.sources:
                setattr(self.sources[source], attribute, value)
        FreezableClass.__setattr__(self, attribute, value)

    def __getattr__(self, attribute):
        if attribute in ['luminosity', 'temperature', 'spectrum', 'radius',
                         'limb']:
            return getattr(self.__dict__['sources']['star'], attribute)
        raise AttributeError(attribute)

    def total_luminosity(self):
        """Total luminosity including accretion components (erg/s)."""
        ltot = 0.0
        for source in self.sources:
            if self.sources[source].luminosity is not None:
                ltot += self.sources[source].luminosity
        return ltot

    def effective_temperature(self):
        """Effective temperature including accretion (K)."""
        return (self.total_luminosity() /
                (4.0 * pi * self.radius ** 2 * sigma)) ** 0.25

    def total_spectrum(self, bnu_range=None):
        """Combined (nu, fnu) spectrum of all stellar components."""
        nu_all, fnu_all = [], []
        for source in self.sources:
            if self.sources[source].temperature is not None:
                if bnu_range is None:
                    raise ValueError("bnu_range is needed for sources with "
                                     "Planck spectra")
                nu, fnu = self.sources[source].get_spectrum(nu_range=bnu_range)
            else:
                nu, fnu = self.sources[source].get_spectrum()
            nu_all.append(nu)
            fnu_all.append(fnu)
        nu_min = np.min([nu.min() for nu in nu_all])
        nu_max = np.max([nu.max() for nu in nu_all])
        nu_common = np.unique(np.sort(np.hstack(nu_all)))
        nu_common = nu_common[(nu_common >= nu_min) & (nu_common <= nu_max)]
        fnu_total = np.zeros(nu_common.shape)
        for nu, fnu in zip(nu_all, fnu_all):
            in_range = (nu_common >= nu.min()) & (nu_common <= nu.max())
            fnu_total[in_range] += interp1d_fast_loglog(nu, fnu,
                                                        nu_common[in_range])
        return nu_common, fnu_total


class AnalyticalYSOModel(Model):

    def __init__(self, name=None):
        self.star = Star()
        self.disks = []
        self.envelopes = []
        self.ambients = []
        self._evaluated_model = None
        Model.__init__(self, name=name)

    def add_density_grid(self, *args, **kwargs):
        raise NotImplementedError("add_density_grid cannot be used for "
                                  "AnalyticalYSOModel")

    # -- density components ---------------------------------------------------

    def add_ambient_medium(self, subtract=[]):
        """Add a constant-density ambient medium (optionally subtracting
        other components so the total never drops below rho)."""
        ambient = AmbientMedium()
        ambient.star = self.star
        ambient.subtract = subtract
        self.ambients.append(ambient)
        return ambient

    def add_flared_disk(self):
        disk = FlaredDisk()
        disk.star = self.star
        self.disks.append(disk)
        return disk

    def add_alpha_disk(self):
        disk = AlphaDisk()
        disk.star = self.star
        self.disks.append(disk)
        return disk

    def add_settled_disks(self, reference_disk, reference_size, eta=0.0,
                          sizes=[], dust_files=[]):
        """Automatically create disks with varying degrees of settling
        (ref analytical_yso_model.py:197-222)."""
        exists = False
        for disk in self.disks:
            if disk is reference_disk:
                exists = True
        if not exists:
            raise Exception("Reference disk not found in disk list")
        for size, dust in zip(sizes, dust_files):
            disk = deepcopy(reference_disk)
            disk.star = self.star
            disk.h_0 *= (size / reference_size) ** (-eta)
            disk.dust = dust
            self.disks.append(disk)

    def add_ulrich_envelope(self):
        envelope = UlrichEnvelope()
        envelope.star = self.star
        self.envelopes.append(envelope)
        return envelope

    def add_power_law_envelope(self):
        envelope = PowerLawEnvelope()
        envelope.star = self.star
        self.envelopes.append(envelope)
        return envelope

    def _check_all_set(self):
        for disk in self.disks:
            disk._check_all_set()
        for envelope in self.envelopes:
            envelope._check_all_set()
        for ambient in self.ambients:
            ambient._check_all_set()

    # -- midplane optical depth diagnostics -----------------------------------

    def print_midplane_tau(self, wavelength):
        for i, disk in enumerate(self.disks):
            if disk.mass > 0.0:
                tau = (disk.midplane_cumulative_density(np.array([disk.rmax]))
                       * disk.dust.optical_properties.interp_chi_wav(wavelength))
                print("Disk %i: %.5e" % (i + 1, tau))

    def get_midplane_tau(self, r):
        """Combined midplane Planck-mean optical depth out to radii r."""
        self._check_all_set()
        tau_midplane = np.zeros(np.asarray(r).shape)
        for disk in self.disks:
            if disk.mass > 0.0:
                nu_min = disk.dust.optical_properties.nu[0]
                nu_max = disk.dust.optical_properties.nu[-1]
                nu, fnu = self.star.total_spectrum(bnu_range=[nu_min, nu_max])
                tau_midplane += (disk.midplane_cumulative_density(r) *
                                 disk.dust.chi_nu_spectrum(nu, fnu))
        for envelope in self.envelopes:
            if envelope.exists():
                nu_min = envelope.dust.optical_properties.nu[0]
                nu_max = envelope.dust.optical_properties.nu[-1]
                nu, fnu = self.star.total_spectrum(bnu_range=[nu_min, nu_max])
                tau_midplane += (envelope.midplane_cumulative_density(r) *
                                 envelope.dust.chi_nu_spectrum(nu, fnu))
        return tau_midplane

    def radial_range(self):
        """(rmin, rmax) covered by all the density components."""
        if len(self.disks) == 0 and len(self.envelopes) == 0 and \
                len(self.ambients) == 0:
            rmin = rmax = self.star.radius
        else:
            rmin_values = ([d.rmin for d in self.disks] +
                           [e.rmin for e in self.envelopes] +
                           [a.rmin for a in self.ambients])
            rmax_values = ([d.rmax for d in self.disks] +
                           [e.rmax for e in self.envelopes] +
                           [a.rmax for a in self.ambients])
            rmin = _min_none(*rmin_values)
            rmax = _max_none(*rmax_values)
        return rmin, rmax

    # -- automated grids ------------------------------------------------------

    def set_cylindrical_polar_grid_auto(self, n_w, n_z, n_phi, wmin=None,
                                        wmax=None, zmin=None, zmax=None,
                                        min_spacing=1.e-8):
        self.grid = {'grid_type': 'cylindrical', 'n1': n_w, 'n2': n_z,
                     'n3': n_phi, 'rmin': wmin, 'rmax': wmax, 'zmin': zmin,
                     'zmax': zmax, 'min_spacing': min_spacing}

    def set_spherical_polar_grid_auto(self, n_r, n_theta, n_phi, rmax=None,
                                      min_spacing=1.e-8):
        self.grid = {'grid_type': 'spherical', 'n1': n_r, 'n2': n_theta,
                     'n3': n_phi, 'rmax': rmax, 'min_spacing': min_spacing}

    def _set_polar_grid_auto(self, n1=None, n2=None, n3=None, grid_type=None,
                             zmin=None, zmax=None, rmin=None, rmax=None,
                             min_spacing=1.e-8):
        """Construct the refined polar grid (ref analytical_yso_model.py:
        516-625): inner radial spacing resolves the tau=0.1 surface, theta
        walls crowd toward the midplane, z walls resolve the disk scale
        height."""
        if self.star.radius is None:
            raise Exception("The central source radius need to be defined "
                            "before the grid can be set up")
        if grid_type == 'spherical':
            n_r, n_theta, n_phi = n1, n2, n3
        elif grid_type == 'cylindrical':
            n_r, n_z, n_phi = n1, n2, n3
        else:
            raise Exception("Unknown grid type: %s" % grid_type)

        if rmin is None:
            if len(self.disks) == 0 and len(self.envelopes) == 0:
                rmin = self.star.radius
            else:
                rmin = _min_none(*([d.rmin for d in self.disks] +
                                   [e.rmin for e in self.envelopes] +
                                   [a.rmin for a in self.ambients]))
        if rmax is None:
            rmax = _max_none(*([2.0 * self.star.radius] +
                               [d.rmax for d in self.disks] +
                               [e.rmax for e in self.envelopes] +
                               [a.rmax for a in self.ambients]))

        if rmax < rmin:
            rmin = self.star.radius
            rmax = 2.0 * self.star.radius
        if np.isnan(rmin) or np.isnan(rmax):
            raise Exception("R_min or R_max is NaN")
        if rmin == 0:
            raise ValueError("R_min is 0, so cannot set up the grid cell "
                             "walls automatically")

        # Radial walls: resolve the tau=0.1 surface at the inner edge
        r = np.logspace(-20.0, np.log10((rmax - rmin) / rmin), 100000) * rmin + rmin
        r[0] = rmin
        tau_midplane = self.get_midplane_tau(r)
        r_next_real = rmin * ((rmax / rmin) ** (1.0 / n_r) - 1.0)
        if tau_midplane[-1] <= 0.1:
            r_next_tau = rmax - rmin
        else:
            r_next_tau = np.interp(0.1, tau_midplane, r) - rmin
        rnext = min(r_next_real, r_next_tau)
        if rmin * (1.0 + min_spacing) > rnext + rmin:
            rnext = rmin * min_spacing
        r_wall = np.hstack([0.0, np.logspace(np.log10(rnext / rmin),
                                             np.log10((rmax - rmin) / rmin),
                                             n_r - 1)]) * rmin + rmin
        r_wall = np.hstack([0.0, r_wall])

        p_wall = np.linspace(0.0, 2.0 * pi, n_phi + 1)

        if grid_type == 'spherical':
            # Theta walls crowd toward the midplane
            t_wall = np.linspace(0, pi, n_theta + 1)
            t_wall = t_wall + np.sin(2 * t_wall) / 6.0
            return SphericalPolarGrid(r_wall, t_wall, p_wall)

        # cylindrical
        if not zmax:
            zmax = rmax
        if zmin is None and len(self.disks) > 0:
            zmin = np.inf
            for disk in self.disks:
                zmin = min(zmin, disk.scale_height_at(rmin))
        if zmin is not None:
            if n_z % 2 == 0:
                n_zn = n_z // 2
                z_wall1 = np.linspace(zmin * 0.1, zmin * 0.9, 10)
                z_wall2 = np.logspace(np.log10(zmin), np.log10(zmax), n_zn - 10)
                z_wall = np.hstack([z_wall1, z_wall2])
                z_wall = np.hstack([-z_wall[::-1], z_wall])
            else:
                n_zn = (n_z - 1) // 2
                z_wall1 = np.linspace(zmin * 0.1, zmin * 0.9, 10)
                z_wall2 = np.logspace(np.log10(zmin), np.log10(zmax), n_zn - 10)
                z_wall = np.hstack([z_wall1, z_wall2])
                z_wall = np.hstack([-z_wall[::-1], 0.0, z_wall])
        else:
            z_wall = np.linspace(-zmax, zmax, n_z + 1)
        return CylindricalPolarGrid(r_wall, z_wall, p_wall)

    # -- accretion ------------------------------------------------------------

    def setup_magnetospheric_accretion(self, mdot, rtrunc, fspot,
                                       xwav_min=0.001, xwav_max=0.01):
        """Add hot-spot + X-ray emission from magnetospheric accretion
        (ref analytical_yso_model.py:627-688)."""
        lstar = self.star.sources['star'].luminosity
        if self.star.mass is None:
            raise Exception("Stellar mass is not set")
        lshock = G * self.star.mass * mdot * (1 / self.star.radius - 1 / rtrunc)
        fluxratio = 0.5 * lshock / lstar / fspot
        teff = (lstar / (4.0 * pi * self.star.radius ** 2 * sigma)) ** 0.25
        tshock = teff * (1 + fluxratio) ** 0.25

        self.star.sources['uv'] = SphericalSource(name='uv',
                                                  radius=self.star.radius)
        self.star.sources['uv'].luminosity = lshock / 2.0 + lstar * fspot
        self.star.sources['uv'].temperature = tshock

        wav = np.logspace(np.log10(xwav_min), np.log10(xwav_max), 100)[::-1]
        nu = c * 1.e4 / wav
        fnu = np.repeat(1.0, nu.shape)
        self.star.sources['xray'] = SphericalSource(name='xray',
                                                    radius=self.star.radius)
        self.star.sources['xray'].luminosity = lshock / 2.0
        self.star.sources['xray'].spectrum = (nu, fnu)

        self.star.sources['star'].luminosity *= 1 - fspot

    # -- output ---------------------------------------------------------------

    def evaluate_optically_thin_radii(self):
        """Freeze all OptThinRadius rmin/rmax into concrete values."""
        from ..util.convenience import OptThinRadius
        for component in self.disks + self.envelopes + self.ambients:
            if isinstance(component._rmin, OptThinRadius):
                component.rmin = component.rmin
            if isinstance(component._rmax, OptThinRadius):
                component.rmax = component.rmax

    def to_model(self, merge_if_possible=True):
        """Evaluate the analytic structure onto the grid and return a plain
        Model (ref analytical_yso_model.py:689-832)."""
        if self.grid is None:
            raise Exception("The coordinate grid needs to be defined")

        m = Model()
        if isinstance(self.grid, dict):
            m.grid = self._set_polar_grid_auto(**self.grid)
        else:
            m.grid = deepcopy(self.grid)

        m.name = self.name
        m.conf = deepcopy(self.conf)
        m.sources = deepcopy(self.sources)
        m.binned_output = deepcopy(self.binned_output)
        m.peeled_output = deepcopy(self.peeled_output)
        m._minimum_temperature = deepcopy(self._minimum_temperature)
        m._minimum_specific_energy = deepcopy(self._minimum_specific_energy)
        m._monochromatic = self._monochromatic
        m._frequencies = self._frequencies

        # copy run configuration through the HDF5 schema
        import io as _io
        import h5py
        buf = h5py.File(_io.BytesIO(), 'w')
        self.write_run_conf(buf)
        m.read_run_conf(buf)
        buf.close()

        for i, disk in enumerate(self.disks):
            if disk.rmin >= disk.rmax:
                pass
            elif disk.mass == 0.0:
                pass
            else:
                if not disk.dust:
                    raise Exception("Disk %i dust not set" % (i + 1))
                m.add_density_grid(disk.density(m.grid), disk.dust,
                                   merge_if_possible=merge_if_possible)

        for i, envelope in enumerate(self.envelopes):
            if envelope.rmin >= envelope.rmax:
                continue
            if isinstance(envelope, UlrichEnvelope) and envelope.rho_0 == 0.0:
                continue
            if isinstance(envelope, PowerLawEnvelope) and envelope.mass == 0.0:
                continue
            if not envelope.dust:
                raise Exception("Envelope dust not set")
            m.add_density_grid(envelope.density(m.grid), envelope.dust,
                               merge_if_possible=merge_if_possible)
            if envelope.cavity is not None:
                if envelope.cavity.theta_0 == 0.0:
                    pass
                elif envelope.cavity.rho_0 is None or \
                        envelope.cavity.rho_0 == 0.0:
                    pass
                else:
                    if not envelope.cavity.dust:
                        raise Exception("Cavity dust not set")
                    m.add_density_grid(envelope.cavity.density(m.grid),
                                       envelope.cavity.dust,
                                       merge_if_possible=merge_if_possible)

        for ambient in self.ambients:
            if ambient.rho == 0.0:
                continue
            if not ambient.dust:
                raise Exception("Ambient medium dust not set")
            m.add_density_grid(ambient.density(m.grid), ambient.dust,
                               merge_if_possible=merge_if_possible)

        # sources
        if self.star.sources['star'].luminosity > 0:
            if self.star.sources['star'] not in self.sources:
                m.add_source(self.star.sources['star'])
        for key in ('uv', 'xray'):
            if key in self.star.sources and \
                    self.star.sources[key].luminosity > 0.0:
                if self.star.sources[key] not in self.sources:
                    m.add_source(self.star.sources[key])

        for i, disk in enumerate(self.disks):
            if isinstance(disk, AlphaDisk) and disk.rmin < disk.rmax and \
                    disk.mass != 0.0 and disk.lvisc:
                m.add_map_source(luminosity=disk.lvisc,
                                 map=disk.accretion_luminosity_grid(m.grid),
                                 name='accdisk%i' % i)

        return m

    def write(self, filename=None, compression=True, copy=True,
              absolute_paths=False, wall_dtype=float, physics_dtype=float,
              overwrite=True, merge_if_possible=True):
        """Evaluate to a Model and write it; the evaluated model is kept in
        ``self.filename``'s file and also returned."""
        self.evaluate_optically_thin_radii()
        m = self.to_model(merge_if_possible=merge_if_possible)
        m.write(filename=filename, compression=compression, copy=copy,
                absolute_paths=absolute_paths, wall_dtype=wall_dtype,
                physics_dtype=physics_dtype, overwrite=overwrite)
        self.filename = m.filename
        self._evaluated_model = m
        return m

    def run(self, *args, **kwargs):
        if not hasattr(self, '_evaluated_model') or \
                self._evaluated_model is None:
            raise Exception("Model has not been written yet - call write() "
                            "first")
        return self._evaluated_model.run(*args, **kwargs)
