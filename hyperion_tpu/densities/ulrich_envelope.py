"""Ulrich (1976) rotationally flattened infalling envelope
(ref: hyperion/densities/ulrich_envelope.py).

rho = rho_0 (r/rc)^-3/2 (1 + mu/mu0)^-1/2 (mu/mu0 + 2 mu0^2 rc/r)^-1,
with mu0 the streamline root of mu0^3 + mu0 (r/rc - 1) - mu (r/rc) = 0.
The solver here is a vectorized trigonometric/Cardano cubic picking the
physical root (same sign as mu, |mu0| <= 1), replacing the reference's
per-branch complex-root bookkeeping (ulrich_envelope.py:18-115).
"""

import numpy as np

from ..util.constants import pi, G
from ..util.validator import validate_scalar
from .core import Envelope


def solve_mu0(ratio, mu):
    """Solve mu0^3 + (ratio - 1) mu0 - mu*ratio = 0 for the physical root."""
    p = np.asarray(ratio, float) - 1.0
    q = -np.asarray(mu, float) * np.asarray(ratio, float)
    # roots of x^3 + p x + q = 0
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3
    mu0 = np.zeros(np.broadcast(p, q).shape)

    pos = disc >= 0.0
    if np.any(pos):
        sq = np.sqrt(disc[pos])
        u = np.cbrt(-q[pos] / 2.0 + sq)
        v = np.cbrt(-q[pos] / 2.0 - sq)
        mu0[pos] = u + v

    neg = ~pos
    if np.any(neg):
        # three real roots; pick the one matching sign(mu) with |mu0|<=1
        pn = p[neg]
        qn = q[neg]
        mn = np.asarray(np.broadcast_to(mu, mu0.shape), float)[neg]
        rr = np.sqrt(-pn ** 3 / 27.0)
        theta = np.arccos(np.clip(-qn / (2.0 * rr), -1.0, 1.0))
        m = 2.0 * np.sqrt(-pn / 3.0)
        roots = np.stack([m * np.cos((theta + 2.0 * np.pi * k) / 3.0)
                          for k in range(3)])
        # physical root: same sign as mu (or >= 0 for mu = 0), magnitude
        # in [|mu|, 1]
        sign_ok = np.where(mn[None, :] >= 0, roots >= -1e-10, roots <= 1e-10)
        mag_ok = np.abs(roots) <= 1.0 + 1e-8
        good = sign_ok & mag_ok
        # among valid roots pick the one with the largest magnitude (the
        # streamline root; the others correspond to other branches)
        score = np.where(good, np.abs(roots), -1.0)
        pick = np.argmax(score, axis=0)
        mu0[neg] = roots[pick, np.arange(roots.shape[1])]

    return mu0


class UlrichEnvelope(Envelope):

    def __init__(self, mdot=None, rho_0=None, rmin=None, rmax=None, rc=None,
                 ambient_density=0.0, star=None):
        self._mdot = None
        self._rho_0 = None
        Envelope.__init__(self)
        self.rmin = rmin
        self.rmax = rmax
        self.rc = rc
        if mdot is not None and rho_0 is not None:
            raise Exception("Cannot specify both mdot and rho_0")
        self.mdot = mdot
        if rho_0 is not None:
            self.rho_0 = rho_0
        self.star = star
        self._freeze()

    @property
    def mdot(self):
        """Infall rate (g/s)."""
        if self._mdot is not None:
            return self._mdot
        if self._rho_0 is None:
            return None
        self._check_all_set()
        if self.star is None or self.star.mass is None:
            raise Exception("Stellar mass is undefined - cannot compute "
                            "infall rate")
        return self._rho_0 * (4.0 * pi *
                              np.sqrt(G * self.star.mass * self.rc ** 3))

    @mdot.setter
    def mdot(self, value):
        if value is not None:
            validate_scalar('mdot', value, domain='positive')
            self._rho_0 = None
        self._mdot = value

    @property
    def rho_0(self):
        """Density factor (g/cm^3)."""
        if self._rho_0 is not None:
            return self._rho_0
        if self._mdot is None:
            return None
        self._check_all_set()
        if self.star is None or self.star.mass is None:
            raise Exception("Stellar mass is undefined - cannot compute "
                            "density scaling")
        return self._mdot / (4.0 * pi *
                             np.sqrt(G * self.star.mass * self.rc ** 3))

    @rho_0.setter
    def rho_0(self, value):
        if value is not None:
            validate_scalar('rho_0', value, domain='positive')
            self._mdot = None
        self._rho_0 = value

    def _check_all_set(self):
        for attr in ('rmin', 'rmax', 'rc'):
            v = getattr(self, attr)
            if v is None:
                raise Exception("%s is not set" % attr)
        if self._mdot is None and self._rho_0 is None:
            raise Exception("mdot or rho_0 is not set")

    def exists(self):
        return self.rho_0 > 0.0

    def density(self, grid, ignore_cavity=False):
        """Evaluate the density on a spherical/cylindrical polar grid."""
        from ..grid import SphericalPolarGrid, CylindricalPolarGrid
        if isinstance(grid, SphericalPolarGrid):
            r = grid.gr
            mu = np.cos(grid.gt)
        elif isinstance(grid, CylindricalPolarGrid):
            r = np.hypot(grid.gw, grid.gz)
            mu = grid.gz / r
        else:
            raise TypeError("grid should be a SphericalPolarGrid or "
                            "CylindricalPolarGrid instance")
        self._check_all_set()
        if self.rmax <= self.rmin:
            return np.zeros(grid.shape)

        mu0 = solve_mu0(r / self.rc, mu)
        with np.errstate(divide='ignore', invalid='ignore'):
            rho = (self.rho_0 * (r / self.rc) ** -1.5 *
                   (1.0 + mu / mu0) ** -0.5 *
                   (mu / mu0 + 2.0 * mu0 ** 2 * self.rc / r) ** -1.0)

        mid1 = (np.abs(mu) < 1.e-10) & (r < self.rc)
        rho[mid1] = (self.rho_0 / np.sqrt(r[mid1] / self.rc) /
                     (1.0 - r[mid1] / self.rc) / 2.0)
        mid2 = (np.abs(mu) < 1.e-10) & (r > self.rc)
        rho[mid2] = (self.rho_0 / np.sqrt(2.0 * r[mid2] / self.rc - 1.0) /
                     (r[mid2] / self.rc - 1.0))
        if np.any((np.abs(mu) < 1.e-10) & (r == self.rc)):
            raise Exception("Grid point too close to Ulrich singularity")

        rho[r < self.rmin] = 0.0
        rho[r > self.rmax] = 0.0

        if not ignore_cavity and self.cavity is not None:
            mask = self.cavity.mask(grid)
            rho[~mask] = 0.0
        return rho

    def outermost_radius(self, rho):
        """Radius where the midplane density drops to rho."""
        # midplane (r >> rc): rho ~ rho_0 (rc/r) sqrt(rc/2r)
        r = self.rc
        for _ in range(100):
            r_new = self.rc * (self.rho_0 / rho) ** (2.0 / 3.0) / \
                (2.0 * r / self.rc) ** (1.0 / 3.0) if r > 0 else self.rc
            if abs(r_new - r) / max(r_new, 1e-300) < 1e-10:
                break
            r = r_new
        return r

    def midplane_cumulative_density(self, r):
        """Cumulative column along the midplane from rmin to r (numeric)."""
        self._check_all_set()
        r = np.asarray(r, float)
        out = np.zeros(r.shape)
        for i, rr in enumerate(r.flat):
            rs = np.logspace(np.log10(self.rmin), np.log10(max(rr, self.rmin * (1 + 1e-10))), 200)
            ratio = rs / self.rc
            with np.errstate(divide='ignore'):
                rho = np.where(ratio < 1.0,
                               self.rho_0 / np.sqrt(ratio) / (1.0 - ratio) / 2.0,
                               self.rho_0 / np.sqrt(np.maximum(2 * ratio - 1, 1e-10)) /
                               np.maximum(ratio - 1.0, 1e-10))
            rho[~np.isfinite(rho)] = 0.0
            out.flat[i] = np.trapezoid(rho, rs)
        return out
