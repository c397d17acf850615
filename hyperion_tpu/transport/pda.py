"""Partial Diffusion Approximation (PDA) for photon-starved cells.

Re-design of the reference's PDA solver (ref: src/grid/grid_pda_3d.f90:84-327
+ per-geometry factors in grid_pda_{cartesian,spherical,cylindrical}_3d.f90):
cells visited by fewer than max(30, 0.005 * mean) photons get their specific
energy replaced by the solution of a Rosseland-mean diffusion equation whose
boundary values are the Monte-Carlo energies of the well-sampled neighbors.

TPU-native re-expression: the reference's cell-at-a-time Gauss elimination /
Gauss-Seidel becomes one fully vectorized Jacobi relaxation over ALL PDA
cells simultaneously (the coupling matrix is diagonally dominant, so Jacobi
converges to the same fixed point), with the same outer loop re-evaluating
the temperature-dependent opacities. Runs host-side between Lucy iterations
(numpy float64), mirroring the reference's rank-0 placement
(iter_lucy.f90:228).
"""

import numpy as np

THRESHOLD_PDA = 0.005
TOL_ITER = 1.e-4
TOL_EXACT = 1.e-5


class PDATables:
    """Per-geometry neighbor/width/factor tables for structured grids.

    walls: list of (neighbor_index (n_cells,), width (n_cells,),
    gfactor (n_cells,), direction) — one entry per active wall.
    allowed: cells where the PDA may be applied (ref check_allowed_pda).
    """

    def __init__(self, walls, allowed, n_cells):
        self.walls = walls
        self.allowed = allowed
        self.n_cells = n_cells


def build_pda_tables(grid):
    """Build PDATables from a structured grid (physical/cgs units)."""
    from ..grid import (CartesianGrid, SphericalPolarGrid,
                        CylindricalPolarGrid)

    if isinstance(grid, CartesianGrid):
        w1, w2, w3 = (np.asarray(grid.x_wall, float),
                      np.asarray(grid.y_wall, float),
                      np.asarray(grid.z_wall, float))
        kind = 'car'
    elif isinstance(grid, SphericalPolarGrid):
        w1, w2, w3 = (np.asarray(grid.r_wall, float),
                      np.asarray(grid.t_wall, float),
                      np.asarray(grid.p_wall, float))
        kind = 'sph'
    elif isinstance(grid, CylindricalPolarGrid):
        w1, w2, w3 = (np.asarray(grid.w_wall, float),
                      np.asarray(grid.z_wall, float),
                      np.asarray(grid.p_wall, float))
        kind = 'cyl'
    else:
        raise NotImplementedError("PDA supports regular structured grids "
                                  "only (matching the reference)")

    n1, n2, n3 = len(w1) - 1, len(w2) - 1, len(w3) - 1
    n_cells = n1 * n2 * n3
    i1, i2, i3 = np.meshgrid(np.arange(n1), np.arange(n2), np.arange(n3),
                             indexing='ij')
    # flat index matching the transport tables: ic = (i3*n2 + i2)*n1 + i1
    enc = lambda a, b, c: ((c * n2 + b) * n1 + a).ravel()
    i1f, i2f, i3f = i1.ravel(), i2.ravel(), i3.ravel()
    order = np.argsort(enc(i1f, i2f, i3f))
    i1f, i2f, i3f = i1f[order], i2f[order], i3f[order]

    d1 = np.diff(w1)
    d2 = np.diff(w2)
    d3 = np.diff(w3)
    c1 = 0.5 * (w1[:-1] + w1[1:])
    c2 = 0.5 * (w2[:-1] + w2[1:])

    if kind == 'car':
        widths = [d1[i1f], d2[i2f], d3[i3f]]
    elif kind == 'sph':
        # ref cell_width spherical: dr; r dtheta; r sin(theta) dphi
        widths = [d1[i1f], c1[i1f] * d2[i2f],
                  c1[i1f] * np.sin(c2[i2f]) * d3[i3f]]
    else:
        widths = [d1[i1f], d2[i2f], c1[i1f] * d3[i3f]]

    ones = np.ones(n_cells)
    if kind == 'sph':
        # ref grid_pda_spherical_3d.f90 geometrical_factor
        rsum2 = (w1[i1f] + w1[i1f + 1]) ** 2
        g1m = 4.0 * w1[i1f] ** 2 / rsum2
        g1p = 4.0 * w1[i1f + 1] ** 2 / rsum2
        wsint = np.sin(w2)
        ssum = wsint[i2f] + wsint[i2f + 1]
        with np.errstate(divide='ignore', invalid='ignore'):
            g2m = np.where(ssum > 0, 2.0 * wsint[i2f] / ssum, 1.0)
            g2p = np.where(ssum > 0, 2.0 * wsint[i2f + 1] / ssum, 1.0)
        gf = [g1m, g1p, g2m, g2p, ones, ones]
    elif kind == 'cyl':
        wsum = w1[i1f] + w1[i1f + 1]
        g1m = 2.0 * w1[i1f] / np.maximum(wsum, 1e-300)
        g1p = 2.0 * w1[i1f + 1] / np.maximum(wsum, 1e-300)
        gf = [g1m, g1p, ones, ones, ones, ones]
    else:
        gf = [ones] * 6

    periodic3 = kind in ('sph', 'cyl') and \
        abs((w3[-1] - w3[0]) - 2 * np.pi) < 1e-8

    walls = []
    axes = [(i1f, n1, 0), (i2f, n2, 1), (i3f, n3, 2)]
    for a, (idx, n, direction) in enumerate(axes):
        if n == 1:
            continue
        for side in (0, 1):
            nb = idx + (1 if side else -1)
            if direction == 2 and periodic3:
                nb = nb % n
            valid = (nb >= 0) & (nb < n)
            nb_c = np.clip(nb, 0, n - 1)
            parts = [i1f, i2f, i3f]
            parts[direction] = nb_c
            nb_flat = enc(*parts)
            nb_flat = np.where(valid, nb_flat, -1)
            walls.append((nb_flat, widths[direction], gf[2 * direction + side],
                          direction, valid))

    # allowed cells: exclude grid-boundary cells on non-periodic axes
    # (ref check_allowed_pda in each geometry module)
    allowed = np.ones(n_cells, dtype=bool)
    if n1 > 1:
        allowed &= (i1f != 0) & (i1f != n1 - 1)
    if n2 > 1:
        allowed &= (i2f != 0) & (i2f != n2 - 1)
    if n3 > 1 and not periodic3:
        allowed &= (i3f != 0) & (i3f != n3 - 1)
    return PDATables(walls, allowed, n_cells)


def _interp_loglog(x_t, y_t, x):
    lx = np.log10(np.maximum(x, 1e-300))
    return 10.0 ** np.interp(lx, np.log10(x_t), np.log10(np.maximum(y_t,
                                                                    1e-300)))


class DustMeanOpacities:
    """Host-side kappa_planck / chi_rosseland lookups per dust."""

    def __init__(self, dt):
        self.se = np.asarray(dt.me_specific_energy, float)
        self.kp = np.asarray(dt.me_kappa_planck, float)
        self.cr = np.asarray(dt.me_chi_rosseland, float)
        self.n_dust = self.se.shape[0]

    def kappa_planck(self, d, s):
        return _interp_loglog(self.se[d], self.kp[d], s)

    def chi_rosseland(self, d, s):
        return _interp_loglog(self.se[d], self.cr[d], s)


def solve_pda(tables, dt, density, specific_energy, n_photons_cell,
              verbose=False):
    """Solve the PDA and return the corrected specific energy.

    density/specific_energy: (n_dust, n_cells) PHYSICAL (cgs) arrays.
    n_photons_cell: (n_cells,) photon visit counts from the MC pass.
    """
    ops = DustMeanOpacities(dt)
    density = np.asarray(density, float)
    se = np.array(specific_energy, float)
    n_phot = np.asarray(n_photons_cell, float)
    n_dust, n_cells = density.shape

    rho_tot = density.sum(axis=0)
    mean_n = n_phot.mean()
    do_pda = (n_phot < max(30, int(np.ceil(THRESHOLD_PDA * mean_n)))) & \
        (rho_tot > 0) & tables.allowed
    if not do_pda.any():
        return se, 0

    n_pda = int(do_pda.sum())
    tol = TOL_EXACT if n_pda < 10000 else TOL_ITER
    pda = np.where(do_pda)[0]

    def e_mean_of(se_):
        """Mean radiation-field energy density proxy per cell
        (ref update_e_mean: sum rho_d se_d / kappa_planck_d / sum rho)."""
        num = np.zeros(n_cells)
        for d in range(n_dust):
            kp = ops.kappa_planck(d, np.maximum(se_[d], 1e-300))
            num += density[d] * se_[d] / np.maximum(kp, 1e-300)
        return np.where(rho_tot > 0, num / np.maximum(rho_tot, 1e-300), 0.0)

    def dtau_of(se_):
        """(3, n_cells) Rosseland optical depth across the cell per dir."""
        alpha = np.zeros(n_cells)
        for d in range(n_dust):
            alpha += density[d] * ops.chi_rosseland(d, np.maximum(se_[d],
                                                                  1e-300))
        return alpha

    for outer in range(100):
        se_prev = se.copy()
        e_mean = e_mean_of(se)
        alpha = dtau_of(se)

        # Jacobi relaxation over all PDA cells simultaneously
        e = e_mean.copy()
        for inner in range(10000):
            num = np.zeros(n_pda)
            den = np.zeros(n_pda)
            for nb_flat, width, gfac, direction, valid in tables.walls:
                nb = nb_flat[pda]
                ok = valid[pda]
                nb_c = np.maximum(nb, 0)
                dtau = (alpha[pda] * width[pda] +
                        alpha[nb_c] * width[nb_c])
                dtau = np.maximum(dtau, 1e-100)
                coeff = np.where(ok, gfac[pda] / (dtau * width[pda]), 0.0)
                num += coeff * e[nb_c]
                den += coeff
            e_new = num / np.maximum(den, 1e-300)
            diff = np.max(np.abs(e_new - e[pda]) /
                          np.maximum(np.abs(e[pda]), 1e-300))
            e[pda] = e_new
            if diff < TOL_ITER:
                break

        # specific energy from e_mean: fixed point s = e * kappa_planck(s)
        # (ref update_specific_energy)
        for d in range(n_dust):
            s = np.maximum(se[d, pda], 1e-300)
            smin, smax = ops.se[d, 0], ops.se[d, -1]
            target = e[pda]
            for _ in range(50):
                s = np.clip(target * np.maximum(
                    ops.kappa_planck(d, s), 1e-300), smin, smax)
            se[d, pda] = s

        md_prev = np.maximum(np.abs(se_prev[:, pda]), 1e-300)
        maxdiff = np.max(np.abs(se[:, pda] - se_prev[:, pda]) / md_prev)
        if verbose:
            print("[pda] outer %d: maxdiff %.2e" % (outer + 1, maxdiff))
        if maxdiff < tol:
            break

    return se, n_pda
