"""Voronoi grid traversal: padded neighbor tables + bisector-plane walks.

TPU-native re-design of the reference's Voronoi module
(ref: src/grid/grid_geometry_voronoi.f90:150-453 + kdtree2): the sparse
CSR neighbor lists become a dense (n_cells, max_neighbors) table padded
with -1, so the per-lane wall search is one gather + a vectorized
plane-intersection reduction instead of a variable-length loop. The
reference's kd-tree nearest-site query (find_cell) becomes a host-built
uniform lookup lattice (nearest site per lattice cell) followed by a
fixed-trip-count descent walk over the neighbor graph — each step moves
to whichever neighbor is closest to the query point, which provably
terminates at the owning cell for a Voronoi diagram.

Domain walls (the reference encodes them as neighbor ids 0..-5,
grid_geometry_voronoi.f90:356-379) are handled as the six planes of the
bounding box: a ray whose nearest intersection is a box plane escapes.
"""

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp
from jax.tree_util import register_dataclass

from .gtable import ESCAPED


@register_dataclass
@dataclass(frozen=True)
class VoronoiGeometry:
    sites: jnp.ndarray      # (n, 3) engine units
    neigh: jnp.ndarray      # (n, K) int32, -1 padded
    volumes: jnp.ndarray    # (n,) / L^3
    box_lo: jnp.ndarray     # (3,)
    box_hi: jnp.ndarray     # (3,)
    bbox_lo: jnp.ndarray    # (n, 3) per-cell bounding boxes (sampling)
    bbox_hi: jnp.ndarray    # (n, 3)
    lookup: jnp.ndarray     # (m*m*m,) int32 nearest-site lattice
    lookup_n: int = field(metadata=dict(static=True))
    walk_steps: int = field(metadata=dict(static=True))
    n_sites: int = field(metadata=dict(static=True))
    length_scale: float = field(metadata=dict(static=True))

    @property
    def n_cells(self):
        return self.n_sites

    def _owner_walk(self, start, x, y, z):
        """Descend the neighbor graph to the cell owning (x, y, z)."""
        d2_own = (self.sites[start, 0] - x) ** 2 + \
                 (self.sites[start, 1] - y) ** 2 + \
                 (self.sites[start, 2] - z) ** 2

        def body(_, state):
            cur, d2c = state
            nb = self.neigh[cur]                       # (B, K)
            valid = nb >= 0
            nb_safe = jnp.where(valid, nb, 0)
            s = self.sites[nb_safe]                    # (B, K, 3)
            d2 = (s[..., 0] - x[:, None]) ** 2 + \
                 (s[..., 1] - y[:, None]) ** 2 + \
                 (s[..., 2] - z[:, None]) ** 2
            d2 = jnp.where(valid, d2, jnp.inf)
            j = jnp.argmin(d2, axis=-1)
            d2_best = jnp.take_along_axis(d2, j[:, None], axis=-1)[:, 0]
            better = d2_best < d2c
            nxt = jnp.take_along_axis(nb_safe, j[:, None], axis=-1)[:, 0]
            return (jnp.where(better, nxt, cur),
                    jnp.where(better, d2_best, d2c))

        cur, _ = jax.lax.fori_loop(0, self.walk_steps, body, (start, d2_own))
        return cur

    def _lattice_start(self, x, y, z):
        m = self.lookup_n
        f = lambda p, lo, hi: jnp.clip(
            ((p - lo) / (hi - lo) * m).astype(jnp.int32), 0, m - 1)
        i = f(x, self.box_lo[0], self.box_hi[0])
        j = f(y, self.box_lo[1], self.box_hi[1])
        k = f(z, self.box_lo[2], self.box_hi[2])
        return self.lookup[(k * m + j) * m + i]

    def find_cell(self, x, y, z, kx, ky, kz):
        inside = (x >= self.box_lo[0]) & (x <= self.box_hi[0]) & \
                 (y >= self.box_lo[1]) & (y <= self.box_hi[1]) & \
                 (z >= self.box_lo[2]) & (z <= self.box_hi[2])
        start = self._lattice_start(x, y, z)
        owner = self._owner_walk(start, x, y, z)
        return jnp.where(inside, owner, ESCAPED)

    def find_wall(self, cell, x, y, z, kx, ky, kz):
        """Nearest bisector-plane or box-plane intersection per lane
        (ref find_wall, grid_geometry_voronoi.f90:322-397)."""
        dtype = x.dtype
        big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype=dtype)
        si = self.sites[cell]                          # (B, 3)
        nb = self.neigh[cell]                          # (B, K)
        valid = nb >= 0
        nb_safe = jnp.where(valid, nb, 0)
        sj = self.sites[nb_safe]                       # (B, K, 3)

        # bisector plane of (i, j): passes through the midpoint with
        # normal s_j - s_i; crossing requires k . n > 0
        nvx = sj[..., 0] - si[:, None, 0]
        nvy = sj[..., 1] - si[:, None, 1]
        nvz = sj[..., 2] - si[:, None, 2]
        mx = 0.5 * (sj[..., 0] + si[:, None, 0])
        my = 0.5 * (sj[..., 1] + si[:, None, 1])
        mz = 0.5 * (sj[..., 2] + si[:, None, 2])
        denom = kx[:, None] * nvx + ky[:, None] * nvy + kz[:, None] * nvz
        numer = (mx - x[:, None]) * nvx + (my - y[:, None]) * nvy + \
                (mz - z[:, None]) * nvz
        # On-wall numerics: a lane exactly on the shared wall of its own
        # cell sees numer ~ 0 for that neighbor; clamp t >= 0 so the cell
        # index can never drift backwards (cell index is authoritative).
        t_nb = jnp.where(valid & (denom > 0.0),
                         jnp.maximum(numer / denom, 0.0), big)
        j = jnp.argmin(t_nb, axis=-1)
        t_best = jnp.take_along_axis(t_nb, j[:, None], axis=-1)[:, 0]
        nb_best = jnp.take_along_axis(nb_safe, j[:, None], axis=-1)[:, 0]

        # box planes (domain walls -> escape)
        def axis(p, k, lo, hi):
            wall = jnp.where(k > 0, hi, lo)
            return jnp.where(k != 0.0, jnp.maximum((wall - p) / k, 0.0), big)

        tb = jnp.minimum(jnp.minimum(
            axis(x, kx, self.box_lo[0], self.box_hi[0]),
            axis(y, ky, self.box_lo[1], self.box_hi[1])),
            axis(z, kz, self.box_lo[2], self.box_hi[2]))

        escapes = tb <= t_best
        t = jnp.where(escapes, tb, t_best)
        next_cell = jnp.where(escapes, ESCAPED, nb_best)
        return t, next_cell, jnp.zeros_like(cell), t

    def closest_wall_distance(self, cell, x, y, z):
        si = self.sites[cell]
        nb = self.neigh[cell]
        valid = nb >= 0
        nb_safe = jnp.where(valid, nb, 0)
        sj = self.sites[nb_safe]
        nvx = sj[..., 0] - si[:, None, 0]
        nvy = sj[..., 1] - si[:, None, 1]
        nvz = sj[..., 2] - si[:, None, 2]
        mx = 0.5 * (sj[..., 0] + si[:, None, 0])
        my = 0.5 * (sj[..., 1] + si[:, None, 1])
        mz = 0.5 * (sj[..., 2] + si[:, None, 2])
        numer = (mx - x[:, None]) * nvx + (my - y[:, None]) * nvy + \
                (mz - z[:, None]) * nvz
        norm = jnp.sqrt(nvx ** 2 + nvy ** 2 + nvz ** 2)
        d = jnp.where(valid, numer / jnp.maximum(norm, 1e-300), jnp.inf)
        d_nb = jnp.min(d, axis=-1)
        d_box = jnp.minimum(
            jnp.minimum(jnp.minimum(x - self.box_lo[0], self.box_hi[0] - x),
                        jnp.minimum(y - self.box_lo[1], self.box_hi[1] - y)),
            jnp.minimum(z - self.box_lo[2], self.box_hi[2] - z))
        return jnp.maximum(jnp.minimum(d_nb, d_box), 0.0)

    def in_cell_tol(self, cell, x, y, z, tol=0.01):
        """Membership oracle: the point must not sit beyond any neighbor's
        bisector plane by more than tol of the half site separation (the
        definition of a Voronoi cell, with tolerance)."""
        si = self.sites[cell]
        nb = self.neigh[cell]
        valid = nb >= 0
        nb_safe = jnp.where(valid, nb, 0)
        sj = self.sites[nb_safe]
        nvx = sj[..., 0] - si[:, None, 0]
        nvy = sj[..., 1] - si[:, None, 1]
        nvz = sj[..., 2] - si[:, None, 2]
        mx = 0.5 * (sj[..., 0] + si[:, None, 0])
        my = 0.5 * (sj[..., 1] + si[:, None, 1])
        mz = 0.5 * (sj[..., 2] + si[:, None, 2])
        numer = (mx - x[:, None]) * nvx + (my - y[:, None]) * nvy + \
                (mz - z[:, None]) * nvz
        norm = jnp.sqrt(nvx ** 2 + nvy ** 2 + nvz ** 2)
        # signed distance to each bisector (positive = own side)
        d = jnp.where(valid, numer / jnp.maximum(norm, 1e-300), jnp.inf)
        margin = tol * 0.5 * jnp.min(jnp.where(valid, norm, jnp.inf),
                                     axis=-1)
        return jnp.min(d, axis=-1) >= -margin

    def snap(self, x, y, z, ax, wall_coord, crossed):
        return x, y, z

    def random_position_in_cell(self, cell, key, dtype):
        """Sample positions inside cells: bbox rejection with a fixed trial
        count, falling back to the site position (always interior)
        (ref random_position_cell, grid_geometry_voronoi.f90:132-148)."""
        si = self.sites[cell]
        x = si[:, 0]
        y = si[:, 1]
        z = si[:, 2]
        lo = self.bbox_lo[cell]
        hi = self.bbox_hi[cell]
        accepted = jnp.zeros(cell.shape, dtype=bool)
        for trial in range(4):
            k = jax.random.fold_in(key, trial)
            u = jax.random.uniform(k, (3,) + cell.shape, dtype=dtype)
            cx = lo[:, 0] + u[0] * (hi[:, 0] - lo[:, 0])
            cy = lo[:, 1] + u[1] * (hi[:, 1] - lo[:, 1])
            cz = lo[:, 2] + u[2] * (hi[:, 2] - lo[:, 2])
            owner = self._owner_walk(cell, cx, cy, cz)
            ok = ~accepted & (owner == cell)
            x = jnp.where(ok, cx, x)
            y = jnp.where(ok, cy, y)
            z = jnp.where(ok, cz, z)
            accepted = accepted | ok
        return x, y, z


def build_voronoi_geometry(grid, dtype=jnp.float32, lookup_n=None):
    """Build device tables from a VoronoiGrid (host-side tessellation)."""
    from scipy.spatial import cKDTree

    n = grid.n_cells
    sparse, idx = grid.sparse_neighbors
    volumes = np.asarray(grid.volumes, float)
    lo = np.array([grid.xmin, grid.ymin, grid.zmin], float)
    hi = np.array([grid.xmax, grid.ymax, grid.zmax], float)
    L = float(np.abs(np.concatenate([lo, hi])).max())

    # dense neighbor table (domain-wall sentinels dropped: box planes
    # handle escape directly)
    neighbors = [sparse[idx[i]:idx[i + 1]] for i in range(n)]
    neighbors = [nb[nb >= 0] for nb in neighbors]
    K = max(1, max(len(nb) for nb in neighbors))
    neigh = np.full((n, K), -1, dtype=np.int32)
    for i, nb in enumerate(neighbors):
        neigh[i, :len(nb)] = nb

    sites = np.stack([grid.x, grid.y, grid.z], axis=1)

    # per-cell bounding boxes for position sampling: the cell is contained
    # in the bbox of the midpoints to all neighbors reflected about the
    # site (conservative; exact bboxes would need the region vertices)
    bbox_lo = np.empty((n, 3))
    bbox_hi = np.empty((n, 3))
    for i, nb in enumerate(neighbors):
        if len(nb):
            mids = 0.5 * (sites[i] + sites[nb])
            lo_i = np.minimum(mids.min(axis=0), sites[i])
            hi_i = np.maximum(mids.max(axis=0), sites[i])
            span = np.maximum(hi_i - sites[i], sites[i] - lo_i)
            bbox_lo[i] = np.maximum(sites[i] - span, lo)
            bbox_hi[i] = np.minimum(sites[i] + span, hi)
        else:
            bbox_lo[i] = lo
            bbox_hi[i] = hi

    # nearest-site lookup lattice: seeds the descent walk
    if lookup_n is None:
        lookup_n = int(min(64, max(4, round(n ** (1.0 / 3.0) * 2))))
    m = lookup_n
    ax = [np.linspace(lo[d], hi[d], m + 1) for d in range(3)]
    cx = [(a[:-1] + a[1:]) / 2 for a in ax]
    gx, gy, gz = np.meshgrid(cx[0], cx[1], cx[2], indexing='ij')
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)
    tree = cKDTree(sites)
    _, owner = tree.query(pts)
    # lattice flat order is (k * m + j) * m + i
    lookup = owner.reshape(m, m, m).transpose(2, 1, 0).reshape(-1)

    # walk steps: enough to cross the lattice cell diagonal through the
    # neighbor graph; ~ cells per lattice cell plus margin
    walk_steps = int(min(64, max(8, 4 * round(n ** (1.0 / 3.0) / m) + 12)))

    return VoronoiGeometry(
        sites=jnp.asarray(sites / L, dtype=dtype),
        neigh=jnp.asarray(neigh),
        volumes=jnp.asarray(np.maximum(volumes, 0.0) / L ** 3, dtype=dtype),
        box_lo=jnp.asarray(lo / L, dtype=dtype),
        box_hi=jnp.asarray(hi / L, dtype=dtype),
        bbox_lo=jnp.asarray(bbox_lo / L, dtype=dtype),
        bbox_hi=jnp.asarray(bbox_hi / L, dtype=dtype),
        lookup=jnp.asarray(lookup.astype(np.int32)),
        lookup_n=m, walk_steps=walk_steps, n_sites=n, length_scale=L,
    )
