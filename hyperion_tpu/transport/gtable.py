"""Device-side grid geometry: SoA traversal tables + vectorized ray ops.

Each geometry provides three batched operations over packet lanes:

- ``find_cell(pos, dir) -> flat cell index`` (direction-aware on walls),
- ``find_wall(cell, pos, dir) -> (distance, next_cell, snap info)``,
- plus static metadata (cell count, volumes).

This replaces the reference's per-photon geometry modules
(ref: src/grid/grid_geometry_cartesian_3d.f90:143-523 and friends) with
branchless per-lane arithmetic. The key robustness trick differs from the
reference's epsilon bookkeeping (``adjust_wall``/``ew`` tolerances): on a wall
crossing we *snap* the along-axis coordinate exactly onto the crossed wall and
step the cell index directly, so the cell index — not the floating position —
is the source of truth for which cell a packet is in. This keeps f32 traversal
watertight on TPU.

Flat cell index convention: ic = (i3 * n2 + i2) * n1 + i1 where axis 1 is the
fastest-varying (x / r / w), matching the (n3, n2, n1) on-disk quantity layout.
Escaped packets have cell == -1.
"""

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from .sampling import searchsorted_small
from jax.tree_util import register_dataclass

ESCAPED = -1


@register_dataclass
@dataclass(frozen=True)
class CartesianGeometry:
    # ENGINE UNITS: all geometry lengths are stored divided by length_scale
    # (the grid's max extent). Astrophysical cgs lengths (1e11..1e18 cm)
    # would overflow/underflow f32 squares and TPU reciprocals; in engine
    # units positions are O(1) and f32 precision follows the log-spaced cell
    # structure. Densities are pre-multiplied by length_scale so optical
    # depths are scale-free, and the host-side energy normalization divides
    # by length_scale^2 (see lucy.run_lucy).
    xw: jnp.ndarray
    yw: jnp.ndarray
    zw: jnp.ndarray
    volumes: jnp.ndarray  # (n_cells,), = volumes_cgs / length_scale^3
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

    def find_cell(self, x, y, z, kx, ky, kz):
        """Locate packets, resolving exactly-on-wall cases by direction
        (ref: adjust_wall, grid_geometry_cartesian_3d.f90:169-230)."""
        def axis(w, p, k, n):
            i = searchsorted_small(w, p, side='right') - 1
            # Exactly on a wall moving in -ve direction -> lower cell
            on_wall = (p == w[jnp.clip(i, 0, n)])
            i = jnp.where(on_wall & (k < 0), i - 1, i)
            inside = (i >= 0) & (i < n)
            return i, inside

        i1, in1 = axis(self.xw, x, kx, self.n1)
        i2, in2 = axis(self.yw, y, ky, self.n2)
        i3, in3 = axis(self.zw, z, kz, self.n3)
        inside = in1 & in2 & in3
        return jnp.where(inside, self.encode(i1, i2, i3), ESCAPED)

    def find_wall(self, cell, x, y, z, kx, ky, kz):
        """Distance to the next wall along the ray for each lane.

        Returns (t, next_cell, axis, wall_coord): the distance, the flat
        index of the neighbouring cell (ESCAPED if the ray leaves the grid),
        the crossing axis (0/1/2) and the wall coordinate to snap onto.
        """
        i1, i2, i3 = self.decode(cell)
        big = jnp.asarray(jnp.finfo(x.dtype).max, dtype=x.dtype)

        def axis(w, p, k, i):
            target = i + (k > 0)
            wall = w[jnp.clip(target, 0, w.shape[0] - 1)]
            # Rounding can leave p a hair past the target wall after a
            # diagonal move; clamp to an immediate zero-distance crossing so
            # the cell index can never drift from the position.
            t = jnp.where(k != 0.0, jnp.maximum((wall - p) / k, 0.0), big)
            return t, wall

        t1, w1 = axis(self.xw, x, kx, i1)
        t2, w2 = axis(self.yw, y, ky, i2)
        t3, w3 = axis(self.zw, z, kz, i3)

        t = jnp.minimum(jnp.minimum(t1, t2), t3)
        ax = jnp.where(t == t1, 0, jnp.where(t == t2, 1, 2))

        step1 = jnp.where(kx > 0, 1, -1).astype(jnp.int32)
        step2 = jnp.where(ky > 0, 1, -1).astype(jnp.int32)
        step3 = jnp.where(kz > 0, 1, -1).astype(jnp.int32)
        j1 = jnp.where(ax == 0, i1 + step1, i1)
        j2 = jnp.where(ax == 1, i2 + step2, i2)
        j3 = jnp.where(ax == 2, i3 + step3, i3)
        inside = (j1 >= 0) & (j1 < self.n1) & (j2 >= 0) & (j2 < self.n2) & \
                 (j3 >= 0) & (j3 < self.n3)
        next_cell = jnp.where(inside, self.encode(j1, j2, j3), ESCAPED)
        wall_coord = jnp.where(ax == 0, w1, jnp.where(ax == 1, w2, w3))
        return t, next_cell, ax, wall_coord

    def closest_wall_distance(self, cell, x, y, z):
        """Perpendicular distance to the nearest cell wall (MRW trigger,
        ref distance_to_closest_wall in each geometry module)."""
        i1, i2, i3 = self.decode(cell)
        d1 = jnp.minimum(x - self.xw[i1], self.xw[i1 + 1] - x)
        d2 = jnp.minimum(y - self.yw[i2], self.yw[i2 + 1] - y)
        d3 = jnp.minimum(z - self.zw[i3], self.zw[i3 + 1] - z)
        return jnp.maximum(jnp.minimum(jnp.minimum(d1, d2), d3), 0.0)

    def in_cell_tol(self, cell, x, y, z, tol=0.01):
        """Is the position inside the cell's bounds within a tol fraction
        of the cell extent? The geometry self-check oracle (ref
        in_correct_cell, grid_geometry_cartesian_3d.f90) — bounds-based, not
        a from-scratch relocate, so exactly-on-wall positions always pass."""
        i1, i2, i3 = self.decode(cell)

        def ax(w, i, p):
            lo = w[i]
            hi = w[i + 1]
            m = tol * (hi - lo)
            return (p >= lo - m) & (p <= hi + m)

        return ax(self.xw, i1, x) & ax(self.yw, i2, y) & ax(self.zw, i3, z)

    def snap(self, x, y, z, ax, wall_coord, crossed):
        """Place crossed packets exactly on the crossed wall coordinate."""
        x = jnp.where(crossed & (ax == 0), wall_coord, x)
        y = jnp.where(crossed & (ax == 1), wall_coord, y)
        z = jnp.where(crossed & (ax == 2), wall_coord, z)
        return x, y, z

    # ---- packed-row fast path -------------------------------------------
    # TPU gathers serialize per lane, so the transport step packs each
    # cell's six wall bounds into its packed-cell-table row (one row gather
    # replaces the six scalar wall gathers above). The *_rows variants
    # reproduce find_wall / relocation / closest-wall-distance from those
    # bounds with pure elementwise arithmetic.

    def wall_columns(self):
        """(n_cells, 6) [xlo, xhi, ylo, yhi, zlo, zhi] per flat cell."""
        n1, n2, n3 = self.n1, self.n2, self.n3
        i1 = jnp.arange(n1 * n2 * n3, dtype=jnp.int32) % n1
        i2 = (jnp.arange(n1 * n2 * n3, dtype=jnp.int32) // n1) % n2
        i3 = jnp.arange(n1 * n2 * n3, dtype=jnp.int32) // (n1 * n2)
        return jnp.stack([self.xw[i1], self.xw[i1 + 1],
                          self.yw[i2], self.yw[i2 + 1],
                          self.zw[i3], self.zw[i3 + 1]], axis=1)

    def find_wall_rows(self, rows, cell, x, y, z, kx, ky, kz):
        """find_wall using the packed (B, 6) wall-bound rows — no gathers."""
        i1, i2, i3 = self.decode(cell)
        big = jnp.asarray(jnp.finfo(x.dtype).max, dtype=x.dtype)

        def axis(lo, hi, p, k):
            wall = jnp.where(k > 0, hi, lo)
            t = jnp.where(k != 0.0, jnp.maximum((wall - p) / k, 0.0), big)
            return t, wall

        t1, w1 = axis(rows[:, 0], rows[:, 1], x, kx)
        t2, w2 = axis(rows[:, 2], rows[:, 3], y, ky)
        t3, w3 = axis(rows[:, 4], rows[:, 5], z, kz)
        t = jnp.minimum(jnp.minimum(t1, t2), t3)
        ax = jnp.where(t == t1, 0, jnp.where(t == t2, 1, 2))
        step1 = jnp.where(kx > 0, 1, -1).astype(jnp.int32)
        step2 = jnp.where(ky > 0, 1, -1).astype(jnp.int32)
        step3 = jnp.where(kz > 0, 1, -1).astype(jnp.int32)
        j1 = jnp.where(ax == 0, i1 + step1, i1)
        j2 = jnp.where(ax == 1, i2 + step2, i2)
        j3 = jnp.where(ax == 2, i3 + step3, i3)
        inside = (j1 >= 0) & (j1 < self.n1) & (j2 >= 0) & (j2 < self.n2) & \
                 (j3 >= 0) & (j3 < self.n3)
        next_cell = jnp.where(inside, self.encode(j1, j2, j3), ESCAPED)
        wall_coord = jnp.where(ax == 0, w1, jnp.where(ax == 1, w2, w3))
        return t, next_cell, ax, wall_coord

    def relocate_rows(self, rows, cell, x, y, z, kx, ky, kz):
        """Direction-aware on-wall re-disambiguation after a direction
        change, from the packed bounds (replaces a full find_cell: a packet
        that interacted is inside its cell, except exactly on a bound where
        the new direction may select the neighbour — ref adjust_wall).

        Only EXACT bound equality re-disambiguates: a position fp-drifted
        strictly past its bound keeps the stale cell.  That is safe because
        the next find_wall's t >= 0 clamp then produces a zero-distance
        corrective crossing into the true cell — a deliberate reliance on
        the self-correcting crossing, not an oversight."""
        i1, i2, i3 = self.decode(cell)

        def axis(i, lo, hi, p, k, n):
            i = jnp.where((p == hi) & (k > 0), i + 1, i)
            i = jnp.where((p == lo) & (k < 0), i - 1, i)
            return i, (i >= 0) & (i < n)

        j1, in1 = axis(i1, rows[:, 0], rows[:, 1], x, kx, self.n1)
        j2, in2 = axis(i2, rows[:, 2], rows[:, 3], y, ky, self.n2)
        j3, in3 = axis(i3, rows[:, 4], rows[:, 5], z, kz, self.n3)
        inside = in1 & in2 & in3
        return jnp.where(inside, self.encode(j1, j2, j3), ESCAPED)

    def closest_wall_distance_rows(self, rows, cell, x, y, z):
        d1 = jnp.minimum(x - rows[:, 0], rows[:, 1] - x)
        d2 = jnp.minimum(y - rows[:, 2], rows[:, 3] - y)
        d3 = jnp.minimum(z - rows[:, 4], rows[:, 5] - z)
        return jnp.maximum(jnp.minimum(jnp.minimum(d1, d2), d3), 0.0)


def build_cartesian_geometry(grid, dtype=jnp.float32):
    """Build device tables from a CartesianGrid."""
    xw = np.asarray(grid.x_wall, float)
    yw = np.asarray(grid.y_wall, float)
    zw = np.asarray(grid.z_wall, float)
    L = float(max(np.abs(xw).max(), np.abs(yw).max(), np.abs(zw).max()))
    volumes = grid.volumes.reshape(-1)
    return CartesianGeometry(
        xw=jnp.asarray(xw / L, dtype=dtype),
        yw=jnp.asarray(yw / L, dtype=dtype),
        zw=jnp.asarray(zw / L, dtype=dtype),
        volumes=jnp.asarray(volumes / L ** 3, dtype=dtype),
        n1=len(xw) - 1, n2=len(yw) - 1, n3=len(zw) - 1,
        length_scale=L,
    )
