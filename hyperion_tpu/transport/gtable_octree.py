"""Octree grid traversal: flattened child-index tables + AABB walks.

Re-design of the reference's recursive octree module
(ref: src/grid/grid_geometry_octree.f90:98-539): the preorder 'refined'
array becomes explicit (centers, half-widths, children) tables built on
host; cell location is an iterative descend with a fixed trip count
(max depth), and next_cell re-locates from the ROOT at the (nudged) exit
point instead of walking up/down the tree — O(depth) either way, but
branchless and identical for every lane, which is what the TPU wants.

'Cells' are preorder node ids (leaves are physical); density/energy arrays
are indexed by node id, matching the reference's flat ic indexing.
"""

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp
from jax.tree_util import register_dataclass

from .gtable import ESCAPED


@register_dataclass
@dataclass(frozen=True)
class OctreeGeometry:
    centers: jnp.ndarray    # (n_nodes, 3) engine units
    halves: jnp.ndarray     # (n_nodes, 3)
    children: jnp.ndarray   # (n_nodes, 8) int32, -1 for leaves
    refined: jnp.ndarray    # (n_nodes,) bool
    volumes: jnp.ndarray    # (n_nodes,) / L^3 (leaf values physical)
    t_eps: jnp.ndarray
    max_depth: int = field(metadata=dict(static=True))
    n_nodes: int = field(metadata=dict(static=True))
    length_scale: float = field(metadata=dict(static=True))

    @property
    def n_cells(self):
        return self.n_nodes

    def _descend(self, x, y, z):
        """Walk from the root to the leaf containing each point."""
        node = jnp.zeros(x.shape, dtype=jnp.int32)

        def body(_, node):
            is_ref = self.refined[node]
            cx = self.centers[node, 0]
            cy = self.centers[node, 1]
            cz = self.centers[node, 2]
            octant = ((x >= cx).astype(jnp.int32) +
                      2 * (y >= cy).astype(jnp.int32) +
                      4 * (z >= cz).astype(jnp.int32))
            child = self.children[node, octant]
            return jnp.where(is_ref, child, node)

        return jax.lax.fori_loop(0, self.max_depth, body, node)

    def find_cell(self, x, y, z, kx, ky, kz):
        hx = self.halves[0, 0]
        hy = self.halves[0, 1]
        hz = self.halves[0, 2]
        eps = self.t_eps * jnp.maximum(hx, jnp.maximum(hy, hz))
        xn = x + eps * kx
        yn = y + eps * ky
        zn = z + eps * kz
        inside = (jnp.abs(xn - self.centers[0, 0]) <= hx) & \
                 (jnp.abs(yn - self.centers[0, 1]) <= hy) & \
                 (jnp.abs(zn - self.centers[0, 2]) <= hz)
        leaf = self._descend(xn, yn, zn)
        return jnp.where(inside, leaf, ESCAPED)

    def find_wall(self, cell, x, y, z, kx, ky, kz):
        """AABB exit of the current leaf + root-descend relocation
        (ref find_wall, grid_geometry_octree.f90:438-539)."""
        dtype = x.dtype
        big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype=dtype)
        c = self.centers[cell]
        h = self.halves[cell]

        def axis(p, k, cc, hh):
            lo = cc - hh
            hi = cc + hh
            wall = jnp.where(k > 0, hi, lo)
            t = jnp.where(k != 0.0, jnp.maximum((wall - p) / k, 0.0), big)
            return t

        t1 = axis(x, kx, c[:, 0], h[:, 0])
        t2 = axis(y, ky, c[:, 1], h[:, 1])
        t3 = axis(z, kz, c[:, 2], h[:, 2])
        t = jnp.minimum(jnp.minimum(t1, t2), t3)

        # exit point nudged slightly into the neighbour, then relocate
        eps = self.t_eps * jnp.maximum(h[:, 0],
                                       jnp.maximum(h[:, 1], h[:, 2]))
        xe = x + (t + eps) * kx
        ye = y + (t + eps) * ky
        ze = z + (t + eps) * kz
        root_c = self.centers[0]
        root_h = self.halves[0]
        inside = (jnp.abs(xe - root_c[0]) <= root_h[0]) & \
                 (jnp.abs(ye - root_c[1]) <= root_h[1]) & \
                 (jnp.abs(ze - root_c[2]) <= root_h[2])
        next_cell = jnp.where(inside, self._descend(xe, ye, ze), ESCAPED)
        # A failed relocation into the same leaf would stall the walk; nudge
        # handles it in practice, and the engine's step bound is the backstop.
        return t, next_cell, jnp.zeros_like(cell), t

    def closest_wall_distance(self, cell, x, y, z):
        c = self.centers[cell]
        h = self.halves[cell]
        d1 = h[:, 0] - jnp.abs(x - c[:, 0])
        d2 = h[:, 1] - jnp.abs(y - c[:, 1])
        d3 = h[:, 2] - jnp.abs(z - c[:, 2])
        return jnp.maximum(jnp.minimum(jnp.minimum(d1, d2), d3), 0.0)

    def snap(self, x, y, z, ax, wall_coord, crossed):
        return x, y, z

    def in_cell_tol(self, cell, x, y, z, tol=0.01):
        """Bounds-with-tolerance membership (geometry self-check oracle;
        ref in_correct_cell, grid_geometry_octree.f90)."""
        c = self.centers[cell]
        h = self.halves[cell]
        return (jnp.abs(x - c[:, 0]) <= h[:, 0] * (1.0 + tol)) & \
               (jnp.abs(y - c[:, 1]) <= h[:, 1] * (1.0 + tol)) & \
               (jnp.abs(z - c[:, 2]) <= h[:, 2] * (1.0 + tol))

    def random_position_in_cell(self, cell, key, dtype):
        u = jax.random.uniform(key, (3,) + cell.shape, dtype=dtype,
                               minval=-1.0, maxval=1.0)
        c = self.centers[cell]
        h = self.halves[cell]
        return (c[:, 0] + u[0] * h[:, 0], c[:, 1] + u[1] * h[:, 1],
                c[:, 2] + u[2] * h[:, 2])


def build_octree_geometry(grid, dtype=jnp.float32):
    """Build device tables from an OctreeGrid."""
    centers, halves, children = grid.tree_tables()
    L = float(max(grid.dx, grid.dy, grid.dz) * 2.0)
    refined = np.asarray(grid.refined, dtype=bool)

    # depth of the tree
    depth = 1
    hmin = halves.min()
    h0 = halves[0].min()
    while h0 / (2 ** (depth - 1)) > hmin * 1.001:
        depth += 1
    depth = max(depth + 1, 4)

    volumes = 8.0 * halves[:, 0] * halves[:, 1] * halves[:, 2] / L ** 3
    # refined (non-leaf) nodes have no physical volume for deposition
    # normalization purposes; keep their geometric volume (the reference also
    # stores values for all nodes) — energy is only deposited in leaves.

    t_eps = 3e-6 if dtype == jnp.float32 else 1e-12
    return OctreeGeometry(
        centers=jnp.asarray(centers / L, dtype=dtype),
        halves=jnp.asarray(halves / L, dtype=dtype),
        children=jnp.asarray(children),
        refined=jnp.asarray(refined),
        volumes=jnp.asarray(volumes, dtype=dtype),
        t_eps=jnp.asarray(t_eps, dtype=dtype),
        max_depth=int(depth), n_nodes=len(refined), length_scale=L,
    )
