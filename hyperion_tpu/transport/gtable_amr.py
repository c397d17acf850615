"""AMR grid traversal: flattened fab tables + AABB walks with relocation.

TPU-native re-design of the reference's AMR module
(ref: src/grid/grid_geometry_amr.f90:98-873): the levels->grids(fabs)->cells
hierarchy flattens to per-fab arrays (bounds, cell counts, cell sizes, flat
cell offsets, level). Cell location is a vectorized point-in-fab test over
every fab with "finest level wins" — exactly the semantics of the
reference's per-level locate_grid/find_position_in_grid recursion
(grid_geometry_amr.f90:98-135, 521-545) — and wall crossing exits the
current cell's AABB, nudges past the wall and relocates from scratch, which
replaces the reference's cross-fab/cross-level transition logic
(next_cell_int, grid_geometry_amr.f90:599-655) with a branchless per-lane
reduction. Coarse cells covered by finer fabs are never entered (the finest
fab always wins), matching the reference.

Flat cell index: fab_offset + (k * ny + j) * nx + i, fabs ordered
level-major (level 1 first), matching the on-disk level_*/grid_* layout.
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
class AMRGeometry:
    fab_lo: jnp.ndarray     # (F, 3) engine units
    fab_hi: jnp.ndarray     # (F, 3)
    fab_n: jnp.ndarray      # (F, 3) int32 cells per axis
    fab_dx: jnp.ndarray     # (F, 3) cell sizes
    fab_level: jnp.ndarray  # (F,) int32
    fab_offset: jnp.ndarray  # (F + 1,) int32 flat cell offsets
    volumes: jnp.ndarray    # (n_cells,) / L^3
    min_dx: jnp.ndarray     # (3,) finest cell size per axis (probe scale)
    n_fabs: int = field(metadata=dict(static=True))
    n_cells_total: int = field(metadata=dict(static=True))
    length_scale: float = field(metadata=dict(static=True))

    @property
    def n_cells(self):
        return self.n_cells_total

    def _locate(self, x, y, z, kx, ky, kz):
        """Find the finest fab containing each point and the flat cell id.

        Direction-aware on every axis (the reference's adjust_wall,
        grid_geometry_cartesian_3d.f90:169-230 generalized across fabs): a
        coordinate exactly on a cell wall belongs to the lower cell when
        the ray moves in -k. Wall positions are computed as
        ``lo + i * dx`` — the SAME expression _cell_bounds and snap use —
        so the exact-equality test holds after a snap, which is what makes
        corner crossings cycle-free.
        """
        def axis_index(p, k, a):
            lo = self.fab_lo[None, :, a]
            dx = self.fab_dx[None, :, a]
            i = jnp.floor((p[:, None] - lo) / dx).astype(jnp.int32)
            on_wall = (lo + i * dx) == p[:, None]
            i = jnp.where(on_wall & (k[:, None] < 0), i - 1, i)
            ok = (i >= 0) & (i < self.fab_n[None, :, a])
            return i, ok

        ix, okx = axis_index(x, kx, 0)
        iy, oky = axis_index(y, ky, 1)
        iz, okz = axis_index(z, kz, 2)
        inside = okx & oky & okz
        score = jnp.where(inside, self.fab_level[None, :], -1)
        fab = jnp.argmax(score, axis=-1).astype(jnp.int32)
        found = jnp.max(score, axis=-1) >= 0

        pick = lambda arr: jnp.take_along_axis(arr, fab[:, None],
                                               axis=-1)[:, 0]
        i = jnp.clip(pick(ix), 0, self.fab_n[fab][:, 0] - 1)
        j = jnp.clip(pick(iy), 0, self.fab_n[fab][:, 1] - 1)
        k = jnp.clip(pick(iz), 0, self.fab_n[fab][:, 2] - 1)
        nf = self.fab_n[fab]
        cell = self.fab_offset[fab] + (k * nf[:, 1] + j) * nf[:, 0] + i
        return jnp.where(found, cell, ESCAPED), fab, i, j, k

    def decode(self, cell):
        """Flat cell id -> (fab, i, j, k)."""
        fab = (searchsorted_small(self.fab_offset, cell, side='right') - 1)
        fab = jnp.clip(fab, 0, self.n_fabs - 1).astype(jnp.int32)
        local = cell - self.fab_offset[fab]
        nf = self.fab_n[fab]
        i = local % nf[:, 0]
        j = (local // nf[:, 0]) % nf[:, 1]
        k = local // (nf[:, 0] * nf[:, 1])
        return fab, i, j, k

    def _cell_bounds(self, cell):
        fab, i, j, k = self.decode(cell)
        lo = self.fab_lo[fab]
        dx = self.fab_dx[fab]
        # walls as lo + index * dx — matching _locate's on-wall test exactly
        x0 = lo[:, 0] + i * dx[:, 0]
        x1 = lo[:, 0] + (i + 1) * dx[:, 0]
        y0 = lo[:, 1] + j * dx[:, 1]
        y1 = lo[:, 1] + (j + 1) * dx[:, 1]
        z0 = lo[:, 2] + k * dx[:, 2]
        z1 = lo[:, 2] + (k + 1) * dx[:, 2]
        return x0, x1, y0, y1, z0, z1, dx

    def find_cell(self, x, y, z, kx, ky, kz):
        cell, _, _, _, _ = self._locate(x, y, z, kx, ky, kz)
        return cell

    def find_wall(self, cell, x, y, z, kx, ky, kz):
        """AABB exit of the current cell + relocation probe.

        The probe point sits half a *finest-level* cell past the crossed
        wall along the crossing axis. This is (a) small enough never to
        skip a neighboring cell of any level, and (b) large enough that
        the (p - lo)/dx division in _locate resolves it in f32 — a tiny
        epsilon would round away inside fabs with many cells.
        """
        dtype = x.dtype
        big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype=dtype)
        x0, x1, y0, y1, z0, z1, dx = self._cell_bounds(cell)

        def axis(p, k, lo, hi):
            wall = jnp.where(k > 0, hi, lo)
            t = jnp.where(k != 0.0, jnp.maximum((wall - p) / k, 0.0), big)
            return t, wall

        t1, w1 = axis(x, kx, x0, x1)
        t2, w2 = axis(y, ky, y0, y1)
        t3, w3 = axis(z, kz, z0, z1)
        t = jnp.minimum(jnp.minimum(t1, t2), t3)
        ax = jnp.where(t == t1, 0, jnp.where(t == t2, 1, 2))

        xe = x + t * kx
        ye = y + t * ky
        ze = z + t * kz
        # snap the crossing axis exactly onto the wall, then probe half a
        # finest cell into the neighbor
        sgn = lambda k: jnp.where(k > 0, 1.0, -1.0).astype(dtype)
        xp = jnp.where(ax == 0, w1 + 0.5 * self.min_dx[0] * sgn(kx), xe)
        yp = jnp.where(ax == 1, w2 + 0.5 * self.min_dx[1] * sgn(ky), ye)
        zp = jnp.where(ax == 2, w3 + 0.5 * self.min_dx[2] * sgn(kz), ze)
        next_cell, _, _, _, _ = self._locate(xp, yp, zp, kx, ky, kz)
        next_cell = jnp.where(next_cell == cell, ESCAPED, next_cell)
        wall_coord = jnp.where(ax == 0, w1, jnp.where(ax == 1, w2, w3))
        return t, next_cell, ax, wall_coord

    def closest_wall_distance(self, cell, x, y, z):
        x0, x1, y0, y1, z0, z1, _ = self._cell_bounds(cell)
        d = jnp.minimum(jnp.minimum(jnp.minimum(x - x0, x1 - x),
                                    jnp.minimum(y - y0, y1 - y)),
                        jnp.minimum(z - z0, z1 - z))
        return jnp.maximum(d, 0.0)

    def snap(self, x, y, z, ax, wall_coord, crossed):
        x = jnp.where(crossed & (ax == 0), wall_coord, x)
        y = jnp.where(crossed & (ax == 1), wall_coord, y)
        z = jnp.where(crossed & (ax == 2), wall_coord, z)
        return x, y, z

    def in_cell_tol(self, cell, x, y, z, tol=0.01):
        """Bounds-with-tolerance membership (geometry self-check oracle;
        ref in_correct_cell, grid_geometry_amr.f90)."""
        x0, x1, y0, y1, z0, z1, dx = self._cell_bounds(cell)
        return (x >= x0 - tol * dx[:, 0]) & (x <= x1 + tol * dx[:, 0]) & \
               (y >= y0 - tol * dx[:, 1]) & (y <= y1 + tol * dx[:, 1]) & \
               (z >= z0 - tol * dx[:, 2]) & (z <= z1 + tol * dx[:, 2])

    def random_position_in_cell(self, cell, key, dtype):
        x0, x1, y0, y1, z0, z1, _ = self._cell_bounds(cell)
        u = jax.random.uniform(key, (3,) + cell.shape, dtype=dtype)
        return (x0 + u[0] * (x1 - x0), y0 + u[1] * (y1 - y0),
                z0 + u[2] * (z1 - z0))


def build_amr_geometry(grid, dtype=jnp.float32):
    """Build device tables from an AMRGrid (levels -> fabs)."""
    fab_lo, fab_hi, fab_n, fab_level = [], [], [], []
    for ilevel, level in enumerate(grid.levels):
        for g in level.grids:
            fab_lo.append([g.xmin, g.ymin, g.zmin])
            fab_hi.append([g.xmax, g.ymax, g.zmax])
            fab_n.append([g.nx, g.ny, g.nz])
            fab_level.append(ilevel)
    fab_lo = np.asarray(fab_lo, float)
    fab_hi = np.asarray(fab_hi, float)
    fab_n = np.asarray(fab_n, np.int32)
    fab_level = np.asarray(fab_level, np.int32)
    fab_dx = (fab_hi - fab_lo) / fab_n
    counts = fab_n.prod(axis=1)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)

    L = float(np.abs(np.concatenate([fab_lo, fab_hi])).max())
    volumes = np.concatenate([
        np.full(int(c), float(d.prod()))
        for c, d in zip(counts, fab_dx)]) / L ** 3

    return AMRGeometry(
        fab_lo=jnp.asarray(fab_lo / L, dtype=dtype),
        fab_hi=jnp.asarray(fab_hi / L, dtype=dtype),
        fab_n=jnp.asarray(fab_n),
        fab_dx=jnp.asarray(fab_dx / L, dtype=dtype),
        fab_level=jnp.asarray(fab_level),
        fab_offset=jnp.asarray(offsets),
        volumes=jnp.asarray(volumes, dtype=dtype),
        min_dx=jnp.asarray(fab_dx.min(axis=0) / L, dtype=dtype),
        n_fabs=len(fab_lo), n_cells_total=int(counts.sum()),
        length_scale=L,
    )
