"""Modified Random Walk (Min et al. 2009) diffusion acceleration
(ref: src/grid/grid_mrw_3d.f90:29-204).

When a packet sits deeper than gamma Rosseland-ish optical depths from the
nearest wall (trigger: alpha_inv_planck * d_closest_wall > gamma), one MRW
step replaces many scattering steps: the packet jumps to a random point on
the sphere of radius R0 = d_closest_wall, deposits the diffusion path-length
energy ct * kappa_planck * E, and re-emerges with an isotropic direction and
a frequency drawn from the local reciprocal-Planck-weighted emissivity b_nu.

The cumulative of Min+09 eq. (6), P(t) = 2 sum_n (-1)^(n+1) y^(n^2), is
pre-tabulated on host (ref initialize_cumulative, grid_mrw_3d.f90:158-196)
and inverted per lane with a shared-table interp.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .sampling import interp_loglog


class MRWTables(NamedTuple):
    # Per-cell reciprocal-Planck extinction (engine units, 1/length)
    alpha_inv_planck: jnp.ndarray   # (n_cells,)
    # Per-(dust, cell) Planck-mean absorption opacity at the cell temperature
    kappa_planck: jnp.ndarray       # (n_dust, n_cells)
    # Inverse-CDF table for the Min+09 diffusion time distribution
    y_grid: jnp.ndarray             # (n,) P values ascending 0..1
    x_grid: jnp.ndarray             # (n,) corresponding y arguments
    x_rows: jnp.ndarray             # (n/16, 17) overlapping row layout
    gamma: jnp.ndarray              # trigger threshold (scalar)


def _min09_cumulative(n=10000):
    """Tabulate P(y) = 2 sum_{n>=1} (-1)^(n+1) y^(n^2) on y in [0, 1]."""
    x = np.linspace(0.0, 1.0, n)
    P = np.zeros(n)
    for i, y in enumerate(x):
        if y >= 1.0:
            P[i] = 0.5
            continue
        total, j = 0.0, 0
        while True:
            j += 1
            term = y ** (j * j)
            if term == 0.0 or j > 10000:
                break
            total += term if j % 2 == 1 else -term
        P[i] = total
    P *= 2.0
    P[-1] = 1.0
    # The alternating series leaves ~1e-15 noise near y=1; enforce a clean
    # monotone CDF for the interpolation-based inversion.
    P = np.maximum.accumulate(np.clip(P, 0.0, 1.0))
    return x, P


_CUMULATIVE_CACHE = None


def min09_cumulative():
    global _CUMULATIVE_CACHE
    if _CUMULATIVE_CACHE is None:
        _CUMULATIVE_CACHE = _min09_cumulative()
    return _CUMULATIVE_CACHE


def prepare_mrw_tables(dt, density, specific_energy, gamma, dtype):
    """Build per-cell MRW tables from the current specific energy
    (ref: prepare_mrw + update_alpha_inv_planck, grid_mrw_3d.f90:29-54)."""
    n_dust = dt.n_dust
    alphas = []
    kps = []
    for d in range(n_dust):
        e = jnp.clip(specific_energy[d], dt.me_specific_energy[d, 0],
                     dt.me_specific_energy[d, -1])
        chi_ip = interp_loglog(dt.me_specific_energy[d],
                               dt.me_chi_inv_planck[d], e)
        kp = interp_loglog(dt.me_specific_energy[d],
                           dt.me_kappa_planck[d], e)
        alphas.append(density[d] * chi_ip)
        kps.append(kp)
    x, P = min09_cumulative()
    # Pre-invert onto a UNIFORM u grid: sampling is then a direct index +
    # lerp with no search.  (jnp.interp's searchsorted lowers to a
    # serialized per-lane binary search on TPU — ~4 ms per call at
    # B=65536, in the MRW branch of every step of a thick run.)
    n_inv = 4096
    u_grid = np.linspace(0.0, 1.0, n_inv)
    x_of_u = np.interp(u_grid, P, x)
    # overlapping (n_inv/16, 17) row layout: one MXU row fetch brings both
    # bracketing knots of any index into the lane, so the inversion costs
    # one one-hot matmul + a 17-wide compare-sum instead of two serialized
    # per-lane gathers from the 4096-entry table (~45 us/step in the MRW
    # branch of a thick run)
    xr = np.empty((n_inv // 16, 17))
    xr[:, :16] = x_of_u.reshape(-1, 16)
    xr[:-1, 16] = xr[1:, 0]
    xr[-1, 16] = x_of_u[-1]
    return MRWTables(
        alpha_inv_planck=sum(alphas),
        kappa_planck=jnp.stack(kps),
        y_grid=jnp.asarray(u_grid, dtype=dtype),
        x_grid=jnp.asarray(x_of_u, dtype=dtype),
        x_rows=jnp.asarray(xr, dtype=dtype),
        gamma=jnp.asarray(gamma, dtype=dtype))


def sample_min09(tables, key, shape, dtype):
    """Draw y from the Min+09 distribution: direct inverse-CDF lookup on the
    uniform u grid (index arithmetic + lerp, no binary search).  The two
    bracketing knots come from ONE one-hot MXU row fetch against the
    overlapping (n/16, 17) layout — bit-exact (values in [0,1])."""
    from .sampling import gather_rows_matmul
    u = jax.random.uniform(key, shape, dtype=dtype)
    n = tables.x_grid.shape[0]
    pos = u * (n - 1)
    j = jnp.clip(pos.astype(jnp.int32), 0, n - 2)
    frac = pos - j.astype(dtype)
    row = gather_rows_matmul(tables.x_rows, j // 16)      # (B, 17)
    cols = jnp.arange(17, dtype=jnp.int32)[None, :]
    jf = (j % 16)[:, None]
    x0 = jnp.sum(jnp.where(cols == jf, row, 0), axis=-1)
    x1 = jnp.sum(jnp.where(cols == jf + 1, row, 0), axis=-1)
    return x0 + frac * (x1 - x0)
