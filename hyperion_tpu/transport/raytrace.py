"""Raytracing iteration: noise-free direct + thermal emission imaging
(ref: src/main/iter_raytracing.f90:31-143 + the polychromatic peeloff path
in src/images/images_peeled.f90:228-258 and image_bin_raytraced,
src/images/image_type.f90:526-580).

Photons are emitted from sources and from the grid's thermal emission and
immediately peeled off: instead of a single frequency, each event bins its
ENTIRE spectrum attenuated by exp(-sum_d N_d chi_d(nu)) where N_d is the
per-dust column density along the ray to the observer. One batched
column-density walk per view replaces the reference's per-photon
grid_escape_column_density.
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .gtable import ESCAPED
from .sampling import isotropic_direction, interp_loglog


def escape_column_walk(geometry, density, x, y, z, kx, ky, kz, cell, active,
                       max_steps=100000):
    """Per-dust column densities (engine units) along fixed rays to escape
    (ref: grid_escape_column_density, grid_propagate_3d.f90:482-584)."""
    n_dust = density.shape[0]

    def cond(c):
        return jnp.any(c['active']) & (c['i'] < max_steps)

    def body(c):
        cell_safe = jnp.where(c['cell'] >= 0, c['cell'], 0)
        t_wall, next_cell, ax, wall_coord = geometry.find_wall(
            cell_safe, c['x'], c['y'], c['z'], kx, ky, kz)
        rho_rows = density[:, cell_safe].T          # (B, n_dust)
        col = c['col'] + jnp.where(c['active'][:, None],
                                   rho_rows * t_wall[:, None], 0.0)
        x2 = c['x'] + t_wall * kx
        y2 = c['y'] + t_wall * ky
        z2 = c['z'] + t_wall * kz
        x2, y2, z2 = geometry.snap(x2, y2, z2, ax, wall_coord, c['active'])
        cell2 = jnp.where(c['active'], next_cell, c['cell'])
        return dict(x=jnp.where(c['active'], x2, c['x']),
                    y=jnp.where(c['active'], y2, c['y']),
                    z=jnp.where(c['active'], z2, c['z']),
                    cell=cell2, col=col,
                    active=c['active'] & (cell2 != ESCAPED), i=c['i'] + 1)

    init = dict(x=x, y=y, z=z, cell=cell,
                col=jnp.zeros(x.shape + (n_dust,), dtype=x.dtype),
                active=active, i=jnp.asarray(0, dtype=jnp.int32))
    out = jax.lax.while_loop(cond, body, init)
    return out['col']


class RaytraceTables(NamedTuple):
    # Source spectra binned onto the image frequency grid, normalized so
    # sum_j s_ij = 1 per source: (n_sources, n_nu)
    source_spec: jnp.ndarray
    # Dust emissivity spectra binned onto the image grid per (dust, var bin),
    # normalized per row: (n_dust * n_var, n_nu)
    dust_spec: jnp.ndarray
    # Per-dust extinction on the image grid: (n_dust, n_nu)
    chi_nu: jnp.ndarray
    # Grid thermal emission: cell luminosities + CDF
    cell_lum: jnp.ndarray     # (n_emit_cells,) == (n_dust * n_cells,)
    cell_cdf: jnp.ndarray
    total_grid_luminosity: jnp.ndarray


def _bin_spectrum(nu_src, f_src, nu_edges):
    """Integrate a (nu, fnu) spectrum into image frequency bins (energy per
    bin, matching the MC estimator's F_nu dnu bin contents)."""
    from ..util.integrate import integrate_loglog_subset
    out = np.zeros(len(nu_edges) - 1)
    for j in range(len(out)):
        lo = max(nu_edges[j], nu_src[0])
        hi = min(nu_edges[j + 1], nu_src[-1])
        if hi > lo:
            out[j] = integrate_loglog_subset(nu_src, f_src, lo, hi)
    return out


def build_raytrace_tables(dusts, sources, dt, st, group, specific_energy,
                          density, volumes, dtype, length_scale=1.0):
    """Host-side construction of the binned-spectrum tables for one peel
    group's frequency grid."""
    n_nu = group.n_nu
    lo = float(group.log10_nu_min)
    hi = float(group.log10_nu_max)
    nu_edges = np.logspace(lo, hi, n_nu + 1)
    nu_c = np.sqrt(nu_edges[:-1] * nu_edges[1:])

    # sources
    source_spec = []
    for s in sources:
        nu_s, fnu_s = s.get_spectrum(nu_range=(10.0 ** lo, 10.0 ** hi))
        spec = _bin_spectrum(nu_s, fnu_s, nu_edges)
        total = spec.sum()
        source_spec.append(spec / total if total > 0 else spec)
    source_spec = np.array(source_spec)

    # dust emissivities per var bin, binned
    n_var_eff = 60  # coarse var-grid resampling keeps the table small
    dust_spec = []
    var_grids = []
    for d in dusts:
        em = d.emissivities
        var = np.asarray(em.var, float)
        idx = np.unique(np.linspace(0, len(var) - 1, n_var_eff).astype(int))
        var_grids.append(var[idx])
        for i in idx:
            spec = _bin_spectrum(np.asarray(em.nu, float),
                                 np.maximum(np.asarray(em.jnu[:, i], float),
                                            0.0), nu_edges)
            total = spec.sum()
            dust_spec.append(spec / total if total > 0 else spec)
    dust_spec = np.array(dust_spec)

    # per-dust extinction at bin centers
    chi_nu = np.array([d.optical_properties.interp_chi_nu(nu_c) for d in dusts])

    # grid thermal luminosity per (dust, cell): L = 4 pi j_int * rho * V
    # where the Lucy relation gives emitted power per unit mass = absorbed
    # power per unit mass = specific_energy. So L_cell_d = E_d rho_d V.
    se = np.asarray(specific_energy, float)
    rho = np.asarray(density, float)      # engine units (x L)
    vol = np.asarray(volumes, float)      # engine units (/ L^3)
    # E rho_eng V_eng = physical/L^2 -> scale back to erg/s
    lum = (se * rho * vol[None, :]).reshape(-1) * length_scale ** 2
    total = lum.sum()
    cdf = np.cumsum(lum) / total if total > 0 else \
        np.linspace(0, 1, lum.size)
    f = lambda a: jnp.asarray(a, dtype=dtype)
    return RaytraceTables(
        source_spec=f(source_spec), dust_spec=f(dust_spec),
        chi_nu=f(chi_nu), cell_lum=f(lum), cell_cdf=f(cdf),
        total_grid_luminosity=f(total)), var_grids, nu_edges


def build_raytrace_tables_mono(dusts, sources, dt, st, frequencies,
                               specific_energy, density, volumes, dtype,
                               length_scale=1.0):
    """Exact-frequency raytrace tables for monochromatic mode
    (ref: do_raytracing after do_final_mono with use_exact_nu images,
    image_bin_raytraced at image_type.f90:526-580).

    Spectra are per-Hz probability DENSITIES at the mono frequencies —
    fnu/int(fnu dnu) for sources and jnu/int(jnu dnu) per dust state —
    matching the monochromatic MC photon weights (mono.py
    source_mono_energies / dust_mono_cell_pdfs), so the raytraced flux adds
    to the MC accumulators in the same units.
    """
    from .mono import source_mono_energies
    from ..util.integrate import integrate_loglog

    frequencies = np.asarray(frequencies, float)
    source_spec = source_mono_energies(sources, frequencies)

    n_var_eff = 60
    dust_spec = []
    var_grids = []
    for d in dusts:
        em = d.emissivities
        var = np.asarray(em.var, float)
        enu = np.asarray(em.nu, float)
        idx = np.unique(np.linspace(0, len(var) - 1, n_var_eff).astype(int))
        var_grids.append(var[idx])
        for i in idx:
            jnu = np.maximum(np.asarray(em.jnu[:, i], float), 0.0)
            norm = integrate_loglog(enu, jnu)
            if norm > 0:
                dust_spec.append(np.interp(frequencies, enu, jnu / norm,
                                           left=0.0, right=0.0))
            else:
                dust_spec.append(np.zeros_like(frequencies))
    dust_spec = np.array(dust_spec)

    chi_nu = np.array([d.optical_properties.interp_chi_nu(frequencies)
                       for d in dusts])

    se = np.asarray(specific_energy, float)
    rho = np.asarray(density, float)
    vol = np.asarray(volumes, float)
    lum = (se * rho * vol[None, :]).reshape(-1) * length_scale ** 2
    total = lum.sum()
    cdf = np.cumsum(lum) / total if total > 0 else \
        np.linspace(0, 1, lum.size)
    f = lambda a: jnp.asarray(a, dtype=dtype)
    return RaytraceTables(
        source_spec=f(source_spec), dust_spec=f(dust_spec),
        chi_nu=f(chi_nu), cell_lum=f(lum), cell_cdf=f(cdf),
        total_grid_luminosity=f(total)), var_grids


def run_raytracing(geometry, dt, st, rt, var_grids, groups, density, key,
                   n_ray_sources, n_ray_dust, batch_size, dtype,
                   specific_energy=None, jnu_var_id=None, mesh=None):
    """Run the raytracing iteration for all peel groups; returns per-group
    (sed_extra, img_extra) arrays to add to the accumulators.

    Unlike the MC iterations this is a single pass: emit a batch, do one
    column walk per view, bin the attenuated spectra, repeat until the
    photon budgets are spent.
    """
    sed_out = [np.zeros((g.n_view, g.n_ap, g.n_nu, g.n_orig)) for g in groups]
    img_out = [np.zeros((g.n_view, g.n_y, g.n_x, g.n_nu, g.n_orig))
               for g in groups]

    if mesh is not None:
        from ..parallel.mesh import (run_raytrace_source_sharded,
                                     run_raytrace_dust_sharded)
        n_dev = mesh.devices.size
    else:
        n_dev = 1
    per_trip = batch_size * n_dev

    # --- source photons: each carries L_total_sources / n ---------------------
    if n_ray_sources > 0:
        src_scale = float(st.energy_total) / n_ray_sources
        n_done = 0
        while n_done < n_ray_sources:
            b = min(per_trip, n_ray_sources - n_done)
            key, k_e = jax.random.split(key)
            if mesh is not None:
                contribs = run_raytrace_source_sharded(
                    mesh, geometry, dt, st, rt, groups, density, k_e,
                    batch_size, b)
            else:
                contribs = _raytrace_source_batch(geometry, dt, st, rt,
                                                  groups, density, k_e,
                                                  batch_size, b)
            for gi, (sed_c, img_c) in enumerate(contribs):
                sed_out[gi] += np.asarray(sed_c, dtype=np.float64) * src_scale
                img_out[gi] += np.asarray(img_c, dtype=np.float64) * src_scale
            n_done += b

    # --- dust (thermal) photons: each carries L_grid / n ----------------------
    if n_ray_dust > 0 and float(rt.total_grid_luminosity) > 0:
        dust_scale = float(rt.total_grid_luminosity) / n_ray_dust
        n_done = 0
        while n_done < n_ray_dust:
            b = min(per_trip, n_ray_dust - n_done)
            key, k_e = jax.random.split(key)
            if mesh is not None:
                contribs = run_raytrace_dust_sharded(
                    mesh, geometry, dt, rt, var_grids, groups, density,
                    specific_energy, k_e, batch_size, b)
            else:
                contribs = _raytrace_dust_batch(geometry, dt, rt, var_grids,
                                                groups, density,
                                                specific_energy, k_e,
                                                batch_size, b)
            for gi, (sed_c, img_c) in enumerate(contribs):
                sed_out[gi] += np.asarray(sed_c, dtype=np.float64) * dust_scale
                img_out[gi] += np.asarray(img_c, dtype=np.float64) * dust_scale
            n_done += b

    return sed_out, img_out


def raytrace_source_batch_impl(geometry, dt, st, rt, groups, density, key,
                               batch_size, n_active):
    """One batch of source photons: emit, per-view column walk, bin.
    ``n_active`` is traced (no recompile for partial batches; also the
    per-device function under shard_map for multi-chip runs)."""
    from .stable import emit_packets
    B = batch_size
    dtype = density.dtype
    new = emit_packets(st, key, B, dtype, geometry=geometry)
    lane = jnp.arange(B)
    active = lane < n_active
    cell = geometry.find_cell(new['x'], new['y'], new['z'],
                              new['kx'], new['ky'], new['kz'])
    active = active & (cell != ESCAPED)
    src = new['source']
    # each photon carries its source's luminosity / n via the caller's
    # normalization; here weight = L_total/n_batch handled externally:
    # we bin the NORMALIZED source spectrum * L_src_share where the
    # luminosity-weighted source pick already accounts for L_src/L_tot.
    spec = rt.source_spec[src]  # (B, n_nu)

    out = []
    for group in groups:
        sed = jnp.zeros((group.n_view, group.n_ap, group.n_nu, group.n_orig),
                        dtype=dtype)
        img = jnp.zeros((group.n_view, group.n_y, group.n_x, group.n_nu,
                         group.n_orig), dtype=dtype)
        for iv in range(group.n_view):
            vd = group.view_dir[iv]
            col = escape_column_walk(geometry, density, new['x'], new['y'],
                                     new['z'], vd[0], vd[1], vd[2], cell,
                                     active)
            # attenuation: exp(-sum_d col_d * chi_d(nu))
            tau_nu = jnp.einsum('bd,dn->bn', col, rt.chi_nu)
            # stellar-surface cosine-law peel weight (4*mu, or the
            # limb-darkened variant; ref emit_from_sphere_peeloff)
            mu_s = jnp.maximum(new['snx'] * vd[0] + new['sny'] * vd[1] +
                               new['snz'] * vd[2], 0.0)
            w_surf = jnp.where(new['limb'],
                               2.0 * (1.5 * mu_s * mu_s + mu_s), 4.0 * mu_s)
            w = jnp.where(new['surf'], w_surf, 1.0)
            flux = spec * jnp.exp(-tau_nu) * w[:, None]
            flux = jnp.where(active[:, None], flux, 0.0)
            sed, img = _bin_vector(group, sed, img, iv, new['x'], new['y'],
                                   new['z'], flux, 0)
        out.append((sed, img))
    return out


_raytrace_source_batch = partial(jax.jit, static_argnames=('batch_size',))(
    raytrace_source_batch_impl)


def raytrace_dust_batch_impl(geometry, dt, rt, var_grids, groups, density,
                             specific_energy, key, batch_size, n_active):
    """One batch of grid thermal photons: sample cells by luminosity,
    uniform position inside cell (approximated by the cell 'center' via a
    random point: we sample a random position on the cell's bounding sphere
    center — see sample_position_in_cell), column walk, bin emissivity."""
    B = batch_size
    dtype = density.dtype
    k_cell, k_pos, k_u = jax.random.split(key, 3)
    lane = jnp.arange(B)
    active = lane < n_active
    u = jax.random.uniform(k_cell, (B,), dtype=dtype)
    flat = jnp.clip(jnp.searchsorted(rt.cell_cdf, u, side='left'), 0,
                    rt.cell_lum.shape[0] - 1).astype(jnp.int32)
    n_cells = density.shape[1]
    d_sel = flat // n_cells
    cell = flat % n_cells
    x, y, z = sample_position_in_cell(geometry, cell, k_pos, dtype)

    # emissivity spectrum row: (dust, var bin) resampled grid
    n_var_eff = rt.dust_spec.shape[0] // density.shape[0]
    e = specific_energy[d_sel, cell]
    # locate var bin in the coarse grid (shared log-spaced approximation):
    var0 = var_grids[0]
    log_lo = jnp.log10(var0[0])
    log_hi = jnp.log10(var0[-1])
    frac = (jnp.log10(jnp.clip(e, 10.0 ** log_lo, 10.0 ** log_hi)) - log_lo) \
        / (log_hi - log_lo)
    ivar = jnp.clip((frac * (n_var_eff - 1)).astype(jnp.int32), 0,
                    n_var_eff - 1)
    spec = rt.dust_spec[d_sel * n_var_eff + ivar]  # (B, n_nu)

    out = []
    for group in groups:
        sed = jnp.zeros((group.n_view, group.n_ap, group.n_nu, group.n_orig),
                        dtype=dtype)
        img = jnp.zeros((group.n_view, group.n_y, group.n_x, group.n_nu,
                         group.n_orig), dtype=dtype)
        for iv in range(group.n_view):
            vd = group.view_dir[iv]
            col = escape_column_walk(geometry, density, x, y, z,
                                     vd[0], vd[1], vd[2], cell, active)
            tau_nu = jnp.einsum('bd,dn->bn', col, rt.chi_nu)
            flux = spec * jnp.exp(-tau_nu)
            flux = jnp.where(active[:, None], flux, 0.0)
            orig = 1 if group.n_orig > 1 else 0
            sed, img = _bin_vector(group, sed, img, iv, x, y, z, flux, orig)
        out.append((sed, img))
    return out


_raytrace_dust_batch = partial(jax.jit, static_argnames=('batch_size',))(
    raytrace_dust_batch_impl)


def sample_position_in_cell(geometry, cell, key, dtype):
    """Random position inside a cell (ref random_position_cell).

    Cartesian grids sample exactly; curvilinear grids sample within the
    bounding box of the cell in their natural coordinates.
    """
    from .gtable import CartesianGeometry
    from .gtable_spherical import SphericalGeometry
    from .gtable_cylindrical import CylindricalGeometry
    if hasattr(geometry, 'random_position_in_cell'):
        return geometry.random_position_in_cell(cell, key, dtype)
    u = jax.random.uniform(key, (3,) + cell.shape, dtype=dtype)
    if isinstance(geometry, CartesianGeometry):
        i1, i2, i3 = geometry.decode(cell)
        x = geometry.xw[i1] + u[0] * (geometry.xw[i1 + 1] - geometry.xw[i1])
        y = geometry.yw[i2] + u[1] * (geometry.yw[i2 + 1] - geometry.yw[i2])
        z = geometry.zw[i3] + u[2] * (geometry.zw[i3 + 1] - geometry.zw[i3])
        return x, y, z
    if isinstance(geometry, SphericalGeometry):
        i1, i2, i3 = geometry.decode(cell)
        r3_lo = geometry.rw[i1] ** 3
        r3_hi = geometry.rw[i1 + 1] ** 3
        r = (r3_lo + u[0] * (r3_hi - r3_lo)) ** (1.0 / 3.0)
        mu_hi = geometry.cos_tw[i2]
        mu_lo = geometry.cos_tw[i2 + 1]
        mu = mu_lo + u[1] * (mu_hi - mu_lo)
        phi = geometry.phi_w[i3] + u[2] * (geometry.phi_w[i3 + 1] -
                                           geometry.phi_w[i3])
        st_ = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
        return r * st_ * jnp.cos(phi), r * st_ * jnp.sin(phi), r * mu
    if isinstance(geometry, CylindricalGeometry):
        i1, i2, i3 = geometry.decode(cell)
        w2_lo = geometry.ww[i1] ** 2
        w2_hi = geometry.ww[i1 + 1] ** 2
        w = jnp.sqrt(w2_lo + u[0] * (w2_hi - w2_lo))
        zc = geometry.zw[i2] + u[1] * (geometry.zw[i2 + 1] - geometry.zw[i2])
        phi = geometry.phi_w[i3] + u[2] * (geometry.phi_w[i3 + 1] -
                                           geometry.phi_w[i3])
        return w * jnp.cos(phi), w * jnp.sin(phi), zc
    raise NotImplementedError(type(geometry))


def _bin_vector(group, sed, img, iv, x, y, z, flux, orig):
    """Bin whole-spectrum vectors into the SED/image cubes."""
    dx = x - group.origin[0]
    dy = y - group.origin[1]
    dz = z - group.origin[2]
    e, n = group.east[iv], group.north[iv]
    x_img = dx * e[0] + dy * e[1] + dz * e[2]
    y_img = dx * n[0] + dy * n[1] + dz * n[2]

    if group.compute_sed:
        r_img = jnp.sqrt(x_img ** 2 + y_img ** 2)
        logr = jnp.log10(jnp.maximum(r_img, 1e-300))
        if group.n_ap == 1:
            ir = jnp.zeros_like(x, dtype=jnp.int32)
            ok = jnp.ones(x.shape, dtype=bool)
        else:
            fr = (logr - group.log10_ap_min) / \
                 (group.log10_ap_max - group.log10_ap_min)
            ir = jnp.floor(fr * (group.n_ap - 1)).astype(jnp.int32) + 1
            ir = jnp.where(logr < group.log10_ap_min, 0, ir)
            ok = ir < group.n_ap
            ir = jnp.clip(ir, 0, group.n_ap - 1)
        contrib = jnp.where(ok[:, None], flux, 0.0)
        sed = sed.at[iv, ir, :, orig].add(contrib)
    if group.compute_image:
        fx = (x_img - group.xmin) / (group.xmax - group.xmin)
        fy = (y_img - group.ymin) / (group.ymax - group.ymin)
        ix = jnp.floor(fx * group.n_x).astype(jnp.int32)
        iy = jnp.floor(fy * group.n_y).astype(jnp.int32)
        ok = (ix >= 0) & (ix < group.n_x) & (iy >= 0) & (iy < group.n_y)
        ix = jnp.clip(ix, 0, group.n_x - 1)
        iy = jnp.clip(iy, 0, group.n_y - 1)
        contrib = jnp.where(ok[:, None], flux, 0.0)
        img = img.at[iv, iy, ix, :, orig].add(contrib)
    return sed, img
