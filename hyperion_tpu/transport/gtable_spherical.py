"""Spherical polar grid traversal tables + vectorized ray ops.

Re-design of the reference's spherical geometry module
(ref: src/grid/grid_geometry_spherical_3d.f90:92-1124): wall intersections
are sphere / cone / meridional-half-plane quadratics evaluated branchlessly
for the whole lane batch. Instead of the reference's on-wall bookkeeping and
epsilon wall tolerances (ew1/ew2/ew3, :196-203), robustness comes from
(a) engine-unit lengths (O(1) values, see gtable.py), (b) a per-lane minimum
crossing distance that excludes the degenerate on-wall root, and (c) the cell
index being authoritative — positions are never used to re-derive the cell.

Conventions: flat cell = (i_phi * n_t + i_t) * n_r + i_r; crossing beyond the
outer radial wall OR inward of a non-zero inner wall escapes the grid,
matching the reference (escaped_cell checks only i1, :493-500).
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
class SphericalGeometry:
    rw: jnp.ndarray        # (n1+1,) radial walls (engine units)
    rw2: jnp.ndarray       # rw^2
    cos_tw: jnp.ndarray    # (n2+1,) cos(theta walls)
    cos2_tw: jnp.ndarray   # cos^2(theta walls)
    theta_kind: jnp.ndarray  # (n2+1,) 0=pole(skip) 1=cone 2=midplane
    sin_pw: jnp.ndarray    # (n3+1,) sin(phi walls)
    cos_pw: jnp.ndarray    # (n3+1,)
    phi_w: jnp.ndarray     # (n3+1,) wall angles in [0, 2pi]
    volumes: jnp.ndarray   # (n_cells,) / L^3
    t_eps: jnp.ndarray     # relative on-wall exclusion (scaled by radius)
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

    # -- cell location --------------------------------------------------------

    def find_cell(self, x, y, z, kx, ky, kz):
        """Locate packets (ref find_cell, grid_geometry_spherical_3d.f90 —
        binary search in r, cos(theta), phi). On-wall ambiguities are
        resolved by nudging the position a tiny step along the direction
        (equivalent to the reference's direction-aware adjust_wall)."""
        r0 = jnp.sqrt(x * x + y * y + z * z)
        eps = self.t_eps * (r0 + self.rw[1])
        xn = x + eps * kx
        yn = y + eps * ky
        zn = z + eps * kz
        r2 = xn * xn + yn * yn + zn * zn
        i1 = searchsorted_small(self.rw2, r2, side='right') - 1
        # theta walls ascend in theta => cos(theta) DESCENDS; search on -cos
        r = jnp.sqrt(jnp.maximum(r2, 1e-300))
        cost = jnp.clip(zn / r, -1.0, 1.0)
        i2 = searchsorted_small(-self.cos_tw, -cost, side='right') - 1
        i2 = jnp.clip(i2, 0, self.n2 - 1)
        phi = jnp.arctan2(yn, xn)
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        if self.n3 == 1:
            i3 = jnp.zeros_like(i1)
        else:
            i3 = searchsorted_small(self.phi_w, phi, side='right') - 1
            i3 = jnp.clip(i3, 0, self.n3 - 1)
        inside = (i1 >= 0) & (i1 < self.n1)
        return jnp.where(inside, self.encode(i1, i2, i3), ESCAPED)

    # -- wall crossing --------------------------------------------------------

    def find_wall(self, cell, x, y, z, kx, ky, kz):
        """Distance to the closest bounding wall along the ray.

        Returns (t, next_cell, ax, wall_coord); ax/wall_coord are unused by
        spherical snap (see ``snap``) but keep the geometry interface shared
        with the cartesian engine.
        """
        i1, i2, i3 = self.decode(cell)
        dtype = x.dtype
        big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype=dtype)
        eps = self.t_eps

        b = x * kx + y * ky + z * kz          # p . v (|v| = 1)
        pp = x * x + y * y + z * z
        # Per-lane on-wall exclusion distance, scaled to the local radius:
        # f32 coordinate noise is relative, and log-spaced cells shrink
        # toward the origin, so a fixed epsilon would either skip legitimate
        # crossings in tiny inner cells or admit the degenerate on-wall root
        # in outer ones.
        eps = self.t_eps * (jnp.sqrt(pp) + self.rw[1])

        def sphere_crossing(rw2):
            """Smallest crossing distance > eps with the sphere r^2 = rw2."""
            c = pp - rw2
            disc = b * b - c
            ok = disc >= 0.0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = -b - sq
            t2 = -b + sq
            t1 = jnp.where(t1 > eps, t1, big)
            t2 = jnp.where(t2 > eps, t2, big)
            return jnp.where(ok, jnp.minimum(t1, t2), big)

        t_r_in = sphere_crossing(self.rw2[i1])
        # inner wall at r=0 is a point, never a crossing
        t_r_in = jnp.where(self.rw2[i1] > 0.0, t_r_in, big)
        t_r_out = sphere_crossing(self.rw2[i1 + 1])

        def cone_crossing(iw):
            """Crossing with theta wall iw (cone/midplane/pole)."""
            kind = self.theta_kind[iw]
            cw = self.cos_tw[iw]
            c2 = self.cos2_tw[iw]
            # cone: (c2 - vz^2) t^2 + 2 (c2 b - z kz) t + (c2 pp - z^2) = 0
            a_q = c2 - kz * kz
            b_q = c2 * b - z * kz
            c_q = c2 * pp - z * z
            disc = b_q * b_q - a_q * c_q
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            safe_a = jnp.where(jnp.abs(a_q) > 1e-12, a_q, 1.0)
            tq1 = (-b_q - sq) / safe_a
            tq2 = (-b_q + sq) / safe_a
            # linear fallback when a ~ 0 (ray parallel to cone surface)
            t_lin = jnp.where(jnp.abs(b_q) > 1e-300, -0.5 * c_q / b_q, big)
            lin = jnp.abs(a_q) <= 1e-12
            tq1 = jnp.where(lin, t_lin, tq1)
            tq2 = jnp.where(lin, big, tq2)
            # nappe check: intersection z must match the cone's hemisphere
            z1 = z + tq1 * kz
            z2 = z + tq2 * kz
            ok1 = (disc >= 0.0) & (tq1 > eps) & (z1 * cw >= 0.0)
            ok2 = (disc >= 0.0) & (tq2 > eps) & (z2 * cw >= 0.0)
            t_cone = jnp.minimum(jnp.where(ok1, tq1, big),
                                 jnp.where(ok2, tq2, big))
            # midplane: z = 0 plane
            t_mid = jnp.where(kz != 0.0, -z / kz, big)
            t_mid = jnp.where(t_mid > eps, t_mid, big)
            t = jnp.where(kind == 2, t_mid, jnp.where(kind == 1, t_cone, big))
            return t

        t_t_lo = cone_crossing(i2)
        t_t_up = cone_crossing(i2 + 1)

        def phi_crossing(iw):
            """Crossing with the meridional half-plane at phi wall iw."""
            sw = self.sin_pw[iw]
            cw = self.cos_pw[iw]
            # plane normal n = (-sin, cos, 0); t = -(n.p)/(n.v)
            np_ = -sw * x + cw * y
            nv = -sw * kx + cw * ky
            t = jnp.where(jnp.abs(nv) > 1e-300, -np_ / nv, big)
            # crossing must land on the positive half-plane
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

        ts = jnp.stack([t_r_in, t_r_out, t_t_lo, t_t_up, t_p_lo, t_p_up],
                       axis=0)
        which = jnp.argmin(ts, axis=0).astype(jnp.int32)
        t = jnp.min(ts, axis=0)

        # Next cell by direction-nudged relocation at the landing point
        # rather than index arithmetic: a ray that grazes a curved wall
        # (crossing + re-crossing within the on-wall exclusion eps) would
        # otherwise keep a stale index — the re-crossing root is swallowed
        # by the t > eps cut and the claimed cell drifts away from the
        # position (the reference prevents this with photon%on_wall
        # bookkeeping + adjust_wall, grid_geometry_spherical_3d.f90).
        # find_cell's eps nudge jumps over any sub-eps dip, so the landing
        # side is decided by where the ray actually goes.
        next_cell = self.find_cell(x + t * kx, y + t * ky, z + t * kz,
                                   kx, ky, kz)
        # no-wall-found safety: t==big means the traversal failed; report a
        # zero-distance escape so the packet is dropped (counts as killed_geo
        # at the engine level via next_cell == ESCAPED)
        bad = t >= big
        t = jnp.where(bad, 0.0, t)
        next_cell = jnp.where(bad, ESCAPED, next_cell)
        return t, next_cell, which, t  # ax/wall_coord unused

    def closest_wall_distance(self, cell, x, y, z):
        """Perpendicular distance to the nearest cell wall: radial shells
        are exact; cones through the origin have perpendicular distance
        r sin|theta - theta_w| in the meridian plane; phi half-planes have
        w |sin(phi - phi_w)|."""
        i1, i2, i3 = self.decode(cell)
        r = jnp.sqrt(x * x + y * y + z * z)
        big = jnp.asarray(jnp.finfo(x.dtype).max / 8, dtype=x.dtype)
        d = jnp.minimum(jnp.maximum(r - self.rw[i1], 0.0),
                        jnp.maximum(self.rw[i1 + 1] - r, 0.0))
        cost = jnp.clip(z / jnp.maximum(r, 1e-300), -1.0, 1.0)
        theta = jnp.arccos(cost)
        tw_lo = jnp.arccos(jnp.clip(self.cos_tw[i2], -1.0, 1.0))
        tw_up = jnp.arccos(jnp.clip(self.cos_tw[i2 + 1], -1.0, 1.0))
        d_lo = jnp.where(self.theta_kind[i2] != 0,
                         r * jnp.abs(jnp.sin(theta - tw_lo)), big)
        d_up = jnp.where(self.theta_kind[i2 + 1] != 0,
                         r * jnp.abs(jnp.sin(theta - tw_up)), big)
        d = jnp.minimum(d, jnp.minimum(d_lo, d_up))
        if self.n3 > 1:
            w = jnp.sqrt(x * x + y * y)
            phi = jnp.arctan2(y, x) % (2.0 * jnp.pi)
            d_p1 = w * jnp.abs(jnp.sin(phi - self.phi_w[i3]))
            d_p2 = w * jnp.abs(jnp.sin(self.phi_w[i3 + 1] - phi))
            d = jnp.minimum(d, jnp.minimum(d_p1, d_p2))
        return jnp.maximum(d, 0.0)

    def in_cell_tol(self, cell, x, y, z, tol=0.01):
        """Bounds-with-tolerance membership (geometry self-check oracle;
        ref in_correct_cell, grid_geometry_spherical_3d.f90). tol is a
        fraction of the cell extent in each natural coordinate."""
        i1, i2, i3 = self.decode(cell)
        r = jnp.sqrt(x * x + y * y + z * z)
        r_lo = self.rw[i1]
        r_hi = self.rw[i1 + 1]
        m_r = tol * (r_hi - r_lo)
        ok = (r >= r_lo - m_r) & (r <= r_hi + m_r)
        # near the origin every angle is degenerate
        at_origin = r <= tol * self.rw[1]
        mu = z / jnp.maximum(r, jnp.asarray(1e-300, dtype=x.dtype))
        mu_hi = self.cos_tw[i2]
        mu_lo = self.cos_tw[i2 + 1]
        m_mu = tol * (mu_hi - mu_lo)
        ok &= at_origin | ((mu >= mu_lo - m_mu) & (mu <= mu_hi + m_mu))
        if self.n3 > 1:
            two_pi = 2.0 * jnp.pi
            phi = jnp.arctan2(y, x) % two_pi
            p_lo = self.phi_w[i3]
            width = self.phi_w[i3 + 1] - p_lo
            m_p = tol * width
            dphi = (phi - p_lo) % two_pi
            on_axis = jnp.sqrt(x * x + y * y) <= tol * self.rw[1]
            ok &= on_axis | (dphi <= width + m_p) | (dphi >= two_pi - m_p)
        return ok

    def snap(self, x, y, z, ax, wall_coord, crossed):
        """No positional snapping for curved walls: the t_eps minimum
        crossing distance + authoritative cell index provide robustness."""
        return x, y, z

    # ---- packed-row fast path (see gtable.py) ---------------------------
    # One row gather replaces the ~12 scalar wall-table gathers per step
    # that TPU would otherwise serialize per lane.
    # Columns: 0 r_lo, 1 r_hi, 2 r2_lo, 3 r2_hi,
    #          4 cos_lo, 5 cos2_lo, 6 kind_lo, 7 cos_up, 8 cos2_up,
    #          9 kind_up, 10 theta_lo, 11 theta_up,
    #          12 sin_plo, 13 cos_plo, 14 sin_pup, 15 cos_pup

    def wall_columns(self):
        n = self.n_cells
        cells = jnp.arange(n, dtype=jnp.int32)
        i1, i2, i3 = self.decode(cells)
        theta_w = jnp.arccos(jnp.clip(self.cos_tw, -1.0, 1.0))
        dtype = self.rw.dtype
        cols = [self.rw[i1], self.rw[i1 + 1],
                self.rw2[i1], self.rw2[i1 + 1],
                self.cos_tw[i2], self.cos2_tw[i2],
                self.theta_kind[i2].astype(dtype),
                self.cos_tw[i2 + 1], self.cos2_tw[i2 + 1],
                self.theta_kind[i2 + 1].astype(dtype),
                theta_w[i2], theta_w[i2 + 1],
                self.sin_pw[i3], self.cos_pw[i3],
                self.sin_pw[i3 + 1], self.cos_pw[i3 + 1]]
        return jnp.stack(cols, axis=1)

    def find_wall_rows(self, rows, cell, x, y, z, kx, ky, kz):
        """find_wall with per-cell wall parameters from the packed rows —
        identical math to find_wall, zero wall-table gathers (the landing
        relocation still binary-searches, which is cheap)."""
        i1, i2, i3 = self.decode(cell)
        dtype = x.dtype
        big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype=dtype)

        b = x * kx + y * ky + z * kz
        pp = x * x + y * y + z * z
        eps = self.t_eps * (jnp.sqrt(pp) + self.rw[1])

        def sphere_crossing(rw2):
            c = pp - rw2
            disc = b * b - c
            ok = disc >= 0.0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = -b - sq
            t2 = -b + sq
            t1 = jnp.where(t1 > eps, t1, big)
            t2 = jnp.where(t2 > eps, t2, big)
            return jnp.where(ok, jnp.minimum(t1, t2), big)

        t_r_in = jnp.where(rows[:, 2] > 0.0, sphere_crossing(rows[:, 2]), big)
        t_r_out = sphere_crossing(rows[:, 3])

        def cone_crossing(cw, c2, kind):
            a_q = c2 - kz * kz
            b_q = c2 * b - z * kz
            c_q = c2 * pp - z * z
            disc = b_q * b_q - a_q * c_q
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            safe_a = jnp.where(jnp.abs(a_q) > 1e-12, a_q, 1.0)
            tq1 = (-b_q - sq) / safe_a
            tq2 = (-b_q + sq) / safe_a
            t_lin = jnp.where(jnp.abs(b_q) > 1e-300, -0.5 * c_q / b_q, big)
            lin = jnp.abs(a_q) <= 1e-12
            tq1 = jnp.where(lin, t_lin, tq1)
            tq2 = jnp.where(lin, big, tq2)
            z1 = z + tq1 * kz
            z2 = z + tq2 * kz
            ok1 = (disc >= 0.0) & (tq1 > eps) & (z1 * cw >= 0.0)
            ok2 = (disc >= 0.0) & (tq2 > eps) & (z2 * cw >= 0.0)
            t_cone = jnp.minimum(jnp.where(ok1, tq1, big),
                                 jnp.where(ok2, tq2, big))
            t_mid = jnp.where(kz != 0.0, -z / kz, big)
            t_mid = jnp.where(t_mid > eps, t_mid, big)
            return jnp.where(kind == 2, t_mid,
                             jnp.where(kind == 1, t_cone, big))

        t_t_lo = cone_crossing(rows[:, 4], rows[:, 5], rows[:, 6])
        t_t_up = cone_crossing(rows[:, 7], rows[:, 8], rows[:, 9])

        def phi_crossing(sw, cw):
            np_ = -sw * x + cw * y
            nv = -sw * kx + cw * ky
            t = jnp.where(jnp.abs(nv) > 1e-300, -np_ / nv, big)
            xi = x + t * kx
            yi = y + t * ky
            on_half = (xi * cw + yi * sw) >= 0.0
            return jnp.where((t > eps) & on_half, t, big)

        if self.n3 > 1:
            t_p_lo = phi_crossing(rows[:, 12], rows[:, 13])
            t_p_up = phi_crossing(rows[:, 14], rows[:, 15])
        else:
            t_p_lo = jnp.full_like(x, big)
            t_p_up = jnp.full_like(x, big)

        ts = jnp.stack([t_r_in, t_r_out, t_t_lo, t_t_up, t_p_lo, t_p_up],
                       axis=0)
        which = jnp.argmin(ts, axis=0).astype(jnp.int32)
        t = jnp.min(ts, axis=0)
        next_cell = self.find_cell(x + t * kx, y + t * ky, z + t * kz,
                                   kx, ky, kz)
        bad = t >= big
        t = jnp.where(bad, 0.0, t)
        next_cell = jnp.where(bad, ESCAPED, next_cell)
        return t, next_cell, which, t

    def relocate_rows(self, rows, cell, x, y, z, kx, ky, kz):
        """Interaction-point relocation: curved-wall grids re-locate from
        scratch (the direction nudge in find_cell is the on-wall
        disambiguation; bounds arithmetic can't reproduce it exactly)."""
        return self.find_cell(x, y, z, kx, ky, kz)

    def closest_wall_distance_rows(self, rows, cell, x, y, z):
        r = jnp.sqrt(x * x + y * y + z * z)
        big = jnp.asarray(jnp.finfo(x.dtype).max / 8, dtype=x.dtype)
        d = jnp.minimum(jnp.maximum(r - rows[:, 0], 0.0),
                        jnp.maximum(rows[:, 1] - r, 0.0))
        cost = jnp.clip(z / jnp.maximum(r, 1e-300), -1.0, 1.0)
        theta = jnp.arccos(cost)
        d_lo = jnp.where(rows[:, 6] != 0,
                         r * jnp.abs(jnp.sin(theta - rows[:, 10])), big)
        d_up = jnp.where(rows[:, 9] != 0,
                         r * jnp.abs(jnp.sin(theta - rows[:, 11])), big)
        d = jnp.minimum(d, jnp.minimum(d_lo, d_up))
        if self.n3 > 1:
            w = jnp.sqrt(x * x + y * y)
            # perpendicular distance to the phi half-planes via the packed
            # sin/cos: |w sin(phi - phi_w)| = |y cos_w - x sin_w|
            d_p1 = jnp.abs(y * rows[:, 13] - x * rows[:, 12])
            d_p2 = jnp.abs(y * rows[:, 15] - x * rows[:, 14])
            d = jnp.minimum(d, jnp.minimum(d_p1, d_p2))
        return jnp.maximum(d, 0.0)


def build_spherical_geometry(grid, dtype=jnp.float32):
    """Build device tables from a SphericalPolarGrid."""
    rw = np.asarray(grid.r_wall, float)
    tw = np.asarray(grid.t_wall, float)
    pw = np.asarray(grid.p_wall, float)
    L = float(rw.max())

    rw_n = rw / L
    cos_tw = np.cos(tw)
    theta_kind = np.ones(len(tw), dtype=np.int32)
    # poles: sin(theta) == 0 -> degenerate wall, never crossed
    theta_kind[np.abs(np.sin(tw)) < 1e-12] = 0
    # midplane: cos(theta) == 0 -> plane z=0
    theta_kind[np.abs(cos_tw) < 1e-12] = 2
    cos_tw[np.abs(cos_tw) < 1e-12] = 0.0

    # f32 needs a slightly larger exclusion than f64
    t_eps = 3e-6 if dtype == jnp.float32 else 1e-12

    return SphericalGeometry(
        rw=jnp.asarray(rw_n, dtype=dtype),
        rw2=jnp.asarray(rw_n ** 2, dtype=dtype),
        cos_tw=jnp.asarray(cos_tw, dtype=dtype),
        cos2_tw=jnp.asarray(cos_tw ** 2, dtype=dtype),
        theta_kind=jnp.asarray(theta_kind),
        sin_pw=jnp.asarray(np.sin(pw), dtype=dtype),
        cos_pw=jnp.asarray(np.cos(pw), dtype=dtype),
        phi_w=jnp.asarray(pw, dtype=dtype),
        volumes=jnp.asarray(grid.volumes.reshape(-1) / L ** 3, dtype=dtype),
        t_eps=jnp.asarray(t_eps, dtype=dtype),
        n1=len(rw) - 1, n2=len(tw) - 1, n3=len(pw) - 1,
        length_scale=L,
    )
