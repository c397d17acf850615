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
                       max_steps=100000, t_max=None):
    """Per-dust column densities (engine units) along fixed rays to escape
    (ref: grid_escape_column_density, grid_propagate_3d.f90:482-584).

    t_max: optional (B,) distance limit — integration stops there instead of
    at the grid edge (inside observers, ref images_peeled.f90:158-161)."""
    n_dust = density.shape[0]
    limited = t_max is not None

    def cond(c):
        return jnp.any(c['active']) & (c['i'] < max_steps)

    def body(c):
        cell_safe = jnp.where(c['cell'] >= 0, c['cell'], 0)
        t_wall, next_cell, ax, wall_coord = geometry.find_wall(
            cell_safe, c['x'], c['y'], c['z'], kx, ky, kz)
        rho_rows = density[:, cell_safe].T          # (B, n_dust)
        if limited:
            seg = jnp.minimum(t_wall, c['remaining'])
            remaining = c['remaining'] - t_wall
        else:
            seg = t_wall
            remaining = c['remaining']
        col = c['col'] + jnp.where(c['active'][:, None],
                                   rho_rows * seg[:, None], 0.0)
        x2 = c['x'] + t_wall * kx
        y2 = c['y'] + t_wall * ky
        z2 = c['z'] + t_wall * kz
        x2, y2, z2 = geometry.snap(x2, y2, z2, ax, wall_coord, c['active'])
        cell2 = jnp.where(c['active'], next_cell, c['cell'])
        active2 = c['active'] & (cell2 != ESCAPED)
        if limited:
            active2 = active2 & (remaining > 0.0)
        return dict(x=jnp.where(c['active'], x2, c['x']),
                    y=jnp.where(c['active'], y2, c['y']),
                    z=jnp.where(c['active'], z2, c['z']),
                    cell=cell2, col=col,
                    active=active2, remaining=remaining, i=c['i'] + 1)

    init = dict(x=x, y=y, z=z, cell=cell,
                col=jnp.zeros(x.shape + (n_dust,), dtype=x.dtype),
                active=active,
                remaining=t_max if limited else jnp.zeros_like(x),
                i=jnp.asarray(0, dtype=jnp.int32))
    out = jax.lax.while_loop(cond, body, init)
    return out['col']


class RaytraceTables(NamedTuple):
    # Source spectra binned onto the internal frequency grid, normalized so
    # sum_j s_ij = 1 per source: (n_sources, n_int)
    source_spec: jnp.ndarray
    # Dust emissivity spectra binned onto the internal grid per
    # (dust, var bin), normalized per row: (n_dust * n_var, n_int)
    dust_spec: jnp.ndarray
    # Per-dust extinction on the internal grid: (n_dust, n_int)
    chi_nu: jnp.ndarray
    # Grid thermal emission: cell luminosities + CDF
    cell_lum: jnp.ndarray     # (n_emit_cells,) == (n_dust * n_cells,)
    cell_cdf: jnp.ndarray
    total_grid_luminosity: jnp.ndarray
    # Filter folding matrix (n_int, n_chan) mapping the internal spectral
    # grid onto the group's filter channels (ref images_peeled.f90:264-282);
    # None for plain log-binned groups, where the internal grid IS the
    # group's frequency axis.
    fold: jnp.ndarray = None


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
    group's frequency grid.

    For filter groups (group.use_filters) the internal spectral grid is the
    shared filter sampling grid (group.filter_lognu); the attenuated spectra
    are folded through the transmission table into the n_filt channels at
    bin time (ref images_peeled.f90:264-282)."""
    fold = None
    if group.use_filters:
        lognu = np.asarray(group.filter_lognu, float)
        d = lognu[1] - lognu[0]
        nu_edges = 10.0 ** np.concatenate([[lognu[0] - 0.5 * d],
                                           lognu + 0.5 * d])
        nu_c = 10.0 ** lognu
        lo, hi = np.log10(nu_edges[0]), np.log10(nu_edges[-1])
        # (n_samp, n_filt): channel = attenuated spectrum @ fold
        fold = np.asarray(group.filter_tn, float).T
    else:
        n_nu = group.n_nu
        lo = float(group.log10_nu_min)
        hi = float(group.log10_nu_max)
        nu_edges = np.logspace(lo, hi, n_nu + 1)
        nu_c = np.sqrt(nu_edges[:-1] * nu_edges[1:])

    # sources: binned in-range, normalized by the FULL-spectrum energy so a
    # photon's out-of-range energy is dropped, matching the MC estimator (an
    # MC photon whose sampled nu falls outside the image range never bins) —
    # essential for narrow filter bands
    from ..util.integrate import integrate_loglog
    from ..util.functions import planck_nu_range
    source_spec = []
    for s in sources:
        if getattr(s, 'temperature', None) is not None and \
                getattr(s, 'spectrum', None) is None:
            # Planck sources need an explicit range: span the whole Planck
            # function (negligible tails outside planck_nu_range)
            prange = planck_nu_range(s.temperature)
            nu_s, fnu_s = s.get_spectrum(nu_range=(prange[0], prange[-1]))
        else:
            nu_s, fnu_s = s.get_spectrum()
        spec = _bin_spectrum(nu_s, fnu_s, nu_edges)
        total = integrate_loglog(np.asarray(nu_s, float),
                                 np.asarray(fnu_s, float))
        source_spec.append(spec / total if total > 0 else spec)
    source_spec = np.array(source_spec)

    # dust emissivities per var bin, binned (full-range normalization, same
    # reasoning as the sources)
    n_var_eff = 60  # coarse var-grid resampling keeps the table small
    dust_spec = []
    var_grids = []
    for d in dusts:
        em = d.emissivities
        var = np.asarray(em.var, float)
        # exactly n_var_eff rows per dust (duplicates ok) so the flat
        # (n_dust * n_var_eff, n_nu) table indexes uniformly
        idx = np.linspace(0, len(var) - 1, n_var_eff).astype(int)
        var_grids.append(var[idx])
        for i in idx:
            enu = np.asarray(em.nu, float)
            jnu = np.maximum(np.asarray(em.jnu[:, i], float), 0.0)
            spec = _bin_spectrum(enu, jnu, nu_edges)
            total = integrate_loglog(enu, jnu)
            dust_spec.append(spec / total if total > 0 else spec)
    dust_spec = np.array(dust_spec)

    # per-dust extinction: the BIN-AVERAGED chi over each image bin,
    # integral(chi dnu)/(numax-numin) — NOT chi at the bin center (ref
    # get_chi_nu_binned, dust_type_4elem.f90:793-818; image bins are up to
    # a decade wide, and chi varies steeply across them).  Filter groups
    # use the fine filter sampling grid, where the same average applies.
    chi_nu = []
    for d in dusts:
        op = d.optical_properties
        dnu = np.asarray(op.nu, float)
        dchi = np.asarray(op.chi, float)
        row = np.empty(len(nu_edges) - 1)
        for j in range(len(row)):
            lo_e, hi_e = nu_edges[j], nu_edges[j + 1]
            clo = max(lo_e, dnu[0])
            chi_ = min(hi_e, dnu[-1])
            if chi_ > clo:
                from ..util.integrate import integrate_loglog_subset
                row[j] = integrate_loglog_subset(dnu, dchi, clo, chi_) / \
                    (hi_e - lo_e)
            else:
                row[j] = op.interp_chi_nu(np.array([nu_c[j]]))[0]
        chi_nu.append(row)
    chi_nu = np.array(chi_nu)

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
        total_grid_luminosity=f(total),
        fold=None if fold is None else f(fold)), var_grids, nu_edges


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
        # exactly n_var_eff rows per dust (duplicates ok) so the flat
        # (n_dust * n_var_eff, n_nu) table indexes uniformly
        idx = np.linspace(0, len(var) - 1, n_var_eff).astype(int)
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

    def surf_weight(vdx, vdy, vdz):
        # stellar-surface cosine-law peel weight (4*mu, or the
        # limb-darkened variant; ref emit_from_sphere_peeloff)
        mu_s = jnp.maximum(new['snx'] * vdx + new['sny'] * vdy +
                           new['snz'] * vdz, 0.0)
        w_surf = jnp.where(new['limb'],
                           2.0 * (1.5 * mu_s * mu_s + mu_s), 4.0 * mu_s)
        return jnp.where(new['surf'], w_surf, 1.0)

    out = []
    from .imaging import Provenance, origin_index
    zi = jnp.zeros_like(src)
    zb = jnp.zeros(src.shape, dtype=bool)
    prov = Provenance(scattered=zb, reprocessed=zb, source_id=src,
                      dust_id=zi, n_scat=zi)
    for group in groups:
        sed = jnp.zeros((group.n_view, group.n_ap, group.n_nu, group.n_orig),
                        dtype=dtype)
        img = jnp.zeros((group.n_view, group.n_y, group.n_x, group.n_nu,
                         group.n_orig), dtype=dtype)
        io = jnp.clip(origin_index(group, prov), 0, group.n_orig - 1)
        for iv in range(group.n_view):
            sed, img = _peel_view_bin(
                geometry, density, rt, group, iv, new['x'], new['y'],
                new['z'], cell, active, spec, sed, img, io,
                weight_fn=surf_weight)
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

    # emissivity spectrum: locate the cell's state on the (resampled) var
    # grid and interpolate the binned spectra in LOG10 between the two
    # bracketing var rows (ref get_dust_emissivity,
    # images_peeled.f90:454-500: log10_j_nu linear interpolation in
    # jnu_var_frac)
    n_var_eff = rt.dust_spec.shape[0] // density.shape[0]
    e = specific_energy[d_sel, cell]
    var_log = jnp.log10(jnp.stack([jnp.asarray(v, dtype=dtype)
                                   for v in var_grids]))
    vrows = var_log[d_sel]                        # (B, n_var_eff)
    le = jnp.log10(jnp.maximum(e, 1e-300))
    j = jnp.clip(jnp.sum((vrows < le[:, None]).astype(jnp.int32), axis=1),
                 1, n_var_eff - 1)
    v0 = jnp.take_along_axis(vrows, (j - 1)[:, None], axis=1)[:, 0]
    v1 = jnp.take_along_axis(vrows, j[:, None], axis=1)[:, 0]
    frac = jnp.clip(jnp.where(v1 > v0, (le - v0) / jnp.maximum(v1 - v0,
                                                               1e-30), 0.0),
                    0.0, 1.0)
    ls0 = jnp.log10(jnp.maximum(rt.dust_spec[d_sel * n_var_eff + j - 1],
                                1e-300))
    ls1 = jnp.log10(jnp.maximum(rt.dust_spec[d_sel * n_var_eff + j],
                                1e-300))
    spec = 10.0 ** (ls0 * (1.0 - frac[:, None]) + ls1 * frac[:, None])
    spec = jnp.where(spec > 1e-290, spec, 0.0)    # (B, n_nu)

    out = []
    from .imaging import Provenance, origin_index
    zi = jnp.zeros_like(d_sel)
    zb = jnp.zeros(d_sel.shape, dtype=bool)
    prov = Provenance(scattered=zb, reprocessed=jnp.ones_like(zb),
                      source_id=zi, dust_id=d_sel, n_scat=zi)
    for group in groups:
        sed = jnp.zeros((group.n_view, group.n_ap, group.n_nu, group.n_orig),
                        dtype=dtype)
        img = jnp.zeros((group.n_view, group.n_y, group.n_x, group.n_nu,
                         group.n_orig), dtype=dtype)
        io = jnp.clip(origin_index(group, prov), 0, group.n_orig - 1)
        for iv in range(group.n_view):
            sed, img = _peel_view_bin(geometry, density, rt, group, iv,
                                      x, y, z, cell, active, spec, sed, img,
                                      io)
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


def _peel_view_bin(geometry, density, rt, group, iv, x, y, z, cell, active,
                   spec, sed, img, orig, weight_fn=None):
    """One (group, view) raytrace peel: column walk, spectral attenuation,
    optional filter fold, projection, and binning.

    Plane observers project event positions onto the view's image plane;
    inside observers peel along per-photon directions toward the observer
    with the column walk cut at the observer distance, apply the
    1/(4 pi d^2) dilution, and bin by sky angles (ref
    images_peeled.f90:158-213, 228-282)."""
    if group.inside:
        ddx = group.origin[0] - x
        ddy = group.origin[1] - y
        ddz = group.origin[2] - z
        d_obs = jnp.sqrt(ddx ** 2 + ddy ** 2 + ddz ** 2)
        d_safe = jnp.maximum(d_obs, 1e-30)
        vdx, vdy, vdz = ddx / d_safe, ddy / d_safe, ddz / d_safe
        t_max = d_obs
    else:
        vd = group.view_dir[iv]
        vdx = jnp.full_like(x, vd[0])
        vdy = jnp.full_like(x, vd[1])
        vdz = jnp.full_like(x, vd[2])
        t_max = None

    col = escape_column_walk(geometry, density, x, y, z, vdx, vdy, vdz,
                             cell, active, t_max=t_max)
    tau_nu = jnp.einsum('bd,dn->bn', col, rt.chi_nu)
    flux = spec * jnp.exp(-tau_nu)
    if weight_fn is not None:
        flux = flux * weight_fn(vdx, vdy, vdz)[:, None]
    if group.inside:
        dil = group.inv_area / (4.0 * jnp.pi * d_safe ** 2)
        flux = flux * dil[:, None]
    if rt.fold is not None:
        # fold the internal spectral grid into the filter channels
        flux = flux @ rt.fold
    flux = jnp.where(active[:, None], flux, 0.0)

    if group.inside:
        # sky projection of the (toward-observer) peel direction
        # (ref images_peeled.f90:176-206; same math as imaging.peel_and_bin)
        r_hat, e, n = group.view_dir[iv], group.east[iv], group.north[iv]
        vs_x = vdx * r_hat[0] + vdy * r_hat[1] + vdz * r_hat[2]
        vs_y = vdx * e[0] + vdy * e[1] + vdz * e[2]
        vs_z = vdx * n[0] + vdy * n[1] + vdz * n[2]
        rad2deg = 180.0 / jnp.pi
        x_img = jnp.arctan2(vs_y, vs_x) * rad2deg
        y_img = jnp.arctan2(jnp.sqrt(vs_x ** 2 + vs_y ** 2),
                            vs_z) * rad2deg - 90.0
        if group.compute_image:
            x_img = group.xmax + jnp.mod(x_img - group.xmax, 360.0)
            y_img = group.ymin + jnp.mod(y_img - group.ymin, 360.0)
    else:
        dx = x - group.origin[0]
        dy = y - group.origin[1]
        dz = z - group.origin[2]
        e, n = group.east[iv], group.north[iv]
        x_img = dx * e[0] + dy * e[1] + dz * e[2]
        y_img = dx * n[0] + dy * n[1] + dz * n[2]
    return _bin_vector_xy(group, sed, img, iv, x_img, y_img, flux, orig)


def _bin_vector_xy(group, sed, img, iv, x_img, y_img, flux, orig):
    """Bin whole-spectrum vectors into the SED/image cubes by image-plane
    (or sky-angle) coordinates."""
    if group.compute_sed:
        r_img = jnp.sqrt(x_img ** 2 + y_img ** 2)
        logr = jnp.log10(jnp.maximum(r_img, 1e-300))
        if group.n_ap == 1:
            ir = jnp.zeros_like(x_img, dtype=jnp.int32)
            ok = jnp.ones(x_img.shape, dtype=bool)
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
