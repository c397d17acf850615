"""Cylindrical polar grid traversal (ref:
src/grid/grid_geometry_cylindrical_3d.f90:592-821): cylinder-shell
quadratics + z planes + meridional half-planes, with the same engine-unit /
radius-scaled-epsilon robustness scheme as the spherical module.

Flat cell = (i_phi * n_z + i_z) * n_w + i_w. Escape happens through the outer
cylinder wall or either z face (matching the reference's escaped_cell for
cylindrical grids).
"""

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp
from jax.tree_util import register_dataclass

from .gtable import ESCAPED
from .sampling import searchsorted_small


@register_dataclass
@dataclass(frozen=True)
class CylindricalGeometry:
    ww: jnp.ndarray        # (n1+1,) cylindrical-radius walls (engine units)
    ww2: jnp.ndarray
    zw: jnp.ndarray        # (n2+1,)
    sin_pw: jnp.ndarray    # (n3+1,)
    cos_pw: jnp.ndarray
    phi_w: jnp.ndarray     # (n3+1,) wall angles in [0, 2pi]
    volumes: jnp.ndarray
    t_eps: jnp.ndarray
    eps_floor: jnp.ndarray  # absolute epsilon floor (see _eps)
    n1: int = field(metadata=dict(static=True))
    n2: int = field(metadata=dict(static=True))
    n3: int = field(metadata=dict(static=True))
    length_scale: float = field(metadata=dict(static=True))

    @property
    def n_cells(self):
        return self.n1 * self.n2 * self.n3

    def decode(self, cell):
        i1 = cell % self.n1
        i2 = (cell // self.n1) % self.n2
        i3 = cell // (self.n1 * self.n2)
        return i1, i2, i3

    def encode(self, i1, i2, i3):
        return (i3 * self.n2 + i2) * self.n1 + i1

    def _eps(self, w0, z):
        """On-wall exclusion / disambiguation-nudge distance, scaled to the
        LOCAL position magnitude (f32 roundoff is ~ulp(coordinate), which
        shrinks toward the origin).  Auto grids resolve disk rims with
        micro-cells 1e-4x smaller than the grid (set_cylindrical_polar_
        grid_auto), so a grid-scaled epsilon would leapfrog them — this was
        exactly the round-3 Pinte failure mode: eps(t_eps*ww[-1]) was ~100x
        the rim cell width and stellar packets skipped the first ~15 rim
        cells.  The absolute floor only matters for positions at the exact
        origin."""
        return self.t_eps * (w0 + jnp.abs(z)) + self.eps_floor

    def find_cell(self, x, y, z, kx, ky, kz):
        w0 = jnp.sqrt(x * x + y * y)
        eps = self._eps(w0, z)
        xn = x + eps * kx
        yn = y + eps * ky
        zn = z + eps * kz
        w2 = xn * xn + yn * yn
        i1 = searchsorted_small(self.ww2, w2, side='right') - 1
        i1 = jnp.maximum(i1, 0)  # on-axis points belong to the first shell
        i2 = searchsorted_small(self.zw, zn, side='right') - 1
        phi = jnp.arctan2(yn, xn)
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        if self.n3 == 1:
            i3 = jnp.zeros_like(i1)
        else:
            i3 = searchsorted_small(self.phi_w, phi, side='right') - 1
            i3 = jnp.clip(i3, 0, self.n3 - 1)
        inside = (i1 < self.n1) & (i2 >= 0) & (i2 < self.n2) & \
            (w2 >= self.ww2[0])
        return jnp.where(inside, self.encode(i1, i2, i3), ESCAPED)

    def find_wall(self, cell, x, y, z, kx, ky, kz):
        i1, i2, i3 = self.decode(cell)
        dtype = x.dtype
        big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype=dtype)
        ww0 = jnp.sqrt(x * x + y * y)
        eps = self._eps(ww0, z)

        a = kx * kx + ky * ky
        b = x * kx + y * ky
        pp = x * x + y * y

        def cyl_crossing(ww2):
            c = pp - ww2
            disc = b * b - a * c
            ok = (disc >= 0.0) & (a > 1e-300)
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            safe_a = jnp.where(a > 1e-300, a, 1.0)
            t1 = (-b - sq) / safe_a
            t2 = (-b + sq) / safe_a
            t1 = jnp.where(t1 > eps, t1, big)
            t2 = jnp.where(t2 > eps, t2, big)
            return jnp.where(ok, jnp.minimum(t1, t2), big)

        t_w_in = jnp.where(self.ww2[i1] > 0.0, cyl_crossing(self.ww2[i1]), big)
        t_w_out = cyl_crossing(self.ww2[i1 + 1])

        def z_crossing(iw):
            zwall = self.zw[iw]
            t = jnp.where(jnp.abs(kz) > 1e-300, (zwall - z) / kz, big)
            return jnp.where(t > eps, t, big)

        t_z_lo = z_crossing(i2)
        t_z_up = z_crossing(i2 + 1)

        def phi_crossing(iw):
            sw = self.sin_pw[iw]
            cw = self.cos_pw[iw]
            np_ = -sw * x + cw * y
            nv = -sw * kx + cw * ky
            t = jnp.where(jnp.abs(nv) > 1e-300, -np_ / nv, big)
            xi = x + t * kx
            yi = y + t * ky
            on_half = (xi * cw + yi * sw) >= 0.0
            return jnp.where((t > eps) & on_half, t, big)

        if self.n3 > 1:
            t_p_lo = phi_crossing(i3)
            t_p_up = phi_crossing(i3 + 1)
        else:
            t_p_lo = jnp.full_like(x, big)
            t_p_up = jnp.full_like(x, big)

        ts = jnp.stack([t_w_in, t_w_out, t_z_lo, t_z_up, t_p_lo, t_p_up],
                       axis=0)
        which = jnp.argmin(ts, axis=0).astype(jnp.int32)
        t = jnp.min(ts, axis=0)

        # Direction-nudged relocation at the landing point (see the
        # spherical module for the rationale): rays that graze the curved
        # cylinder walls or ride a phi half-plane re-cross within the
        # on-wall exclusion and would keep a stale index under plain
        # +/-1 index arithmetic.
        next_cell = self.find_cell(x + t * kx, y + t * ky, z + t * kz,
                                   kx, ky, kz)
        bad = t >= big
        t = jnp.where(bad, 0.0, t)
        next_cell = jnp.where(bad, ESCAPED, next_cell)
        return t, next_cell, which, t

    def closest_wall_distance(self, cell, x, y, z):
        i1, i2, i3 = self.decode(cell)
        w = jnp.sqrt(x * x + y * y)
        d = jnp.minimum(jnp.maximum(w - self.ww[i1], 0.0),
                        jnp.maximum(self.ww[i1 + 1] - w, 0.0))
        d = jnp.minimum(d, jnp.minimum(z - self.zw[i2], self.zw[i2 + 1] - z))
        if self.n3 > 1:
            phi = jnp.arctan2(y, x) % (2.0 * jnp.pi)
            d_p1 = w * jnp.abs(jnp.sin(phi - self.phi_w[i3]))
            d_p2 = w * jnp.abs(jnp.sin(self.phi_w[i3 + 1] - phi))
            d = jnp.minimum(d, jnp.minimum(d_p1, d_p2))
        return jnp.maximum(d, 0.0)

    def in_cell_tol(self, cell, x, y, z, tol=0.01):
        """Bounds-with-tolerance membership (geometry self-check oracle;
        ref in_correct_cell, grid_geometry_cylindrical_3d.f90)."""
        i1, i2, i3 = self.decode(cell)
        w = jnp.sqrt(x * x + y * y)
        w_lo = self.ww[i1]
        w_hi = self.ww[i1 + 1]
        m_w = tol * (w_hi - w_lo)
        ok = (w >= w_lo - m_w) & (w <= w_hi + m_w)
        z_lo = self.zw[i2]
        z_hi = self.zw[i2 + 1]
        m_z = tol * (z_hi - z_lo)
        ok &= (z >= z_lo - m_z) & (z <= z_hi + m_z)
        if self.n3 > 1:
            two_pi = 2.0 * jnp.pi
            phi = jnp.arctan2(y, x) % two_pi
            p_lo = self.phi_w[i3]
            width = self.phi_w[i3 + 1] - p_lo
            m_p = tol * width
            dphi = (phi - p_lo) % two_pi
            on_axis = w <= tol * self.ww[1]
            ok &= on_axis | (dphi <= width + m_p) | (dphi >= two_pi - m_p)
        return ok

    def snap(self, x, y, z, ax, wall_coord, crossed):
        return x, y, z


def build_cylindrical_geometry(grid, dtype=jnp.float32):
    """Build device tables from a CylindricalPolarGrid."""
    ww = np.asarray(grid.w_wall, float)
    zw = np.asarray(grid.z_wall, float)
    pw = np.asarray(grid.p_wall, float)
    L = float(max(ww.max(), np.abs(zw).max()))
    t_eps = 3e-6 if dtype == jnp.float32 else 1e-12
    # absolute floor: a fraction of the smallest wall spacing so on-wall
    # disambiguation still works for packets at the exact origin without
    # ever jumping a whole (micro-)cell
    spacings = np.concatenate([np.diff(ww), np.diff(zw)]) / L
    eps_floor = 0.01 * float(spacings[spacings > 0].min())
    return CylindricalGeometry(
        ww=jnp.asarray(ww / L, dtype=dtype),
        ww2=jnp.asarray((ww / L) ** 2, dtype=dtype),
        zw=jnp.asarray(zw / L, dtype=dtype),
        sin_pw=jnp.asarray(np.sin(pw), dtype=dtype),
        cos_pw=jnp.asarray(np.cos(pw), dtype=dtype),
        phi_w=jnp.asarray(pw, dtype=dtype),
        volumes=jnp.asarray(grid.volumes.reshape(-1) / L ** 3, dtype=dtype),
        t_eps=jnp.asarray(t_eps, dtype=dtype),
        eps_floor=jnp.asarray(eps_floor, dtype=dtype),
        n1=len(ww) - 1, n2=len(zw) - 1, n3=len(pw) - 1,
        length_scale=L,
    )
