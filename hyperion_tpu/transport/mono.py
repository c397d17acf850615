"""Monochromatic (exact-frequency) imaging iteration.

TPU-native re-design of the reference's monochromatic algorithm
(ref: src/main/iter_final_mono.f90:58-343 + src/grid/grid_monochromatic.f90:
50-176): for each requested frequency, two passes run —

1. **Source photons**: emitted from the sources with the usual position/
   direction recipes but at the exact frequency; the packet energy is the
   source's normalized spectral PDF at that frequency times the total
   luminosity (ref source_emit, source_type.f90:441-476 and the
   ``p%energy = p%energy * energy_total`` scaling in source.f90:162).
2. **Dust photons**: cells are sampled from a per-dust discrete PDF
   proportional to j_nu(nu; E_cell) * E_abs(cell) (ref
   setup_monochromatic_grid_pdfs) and photons leave isotropically from a
   random position in the cell.

Both passes propagate with *forced scattering*: every interaction scatters
and multiplies the energy by the albedo; packets die when their energy
drops below ``monochromatic_energy_threshold`` of the initial value
(ref iter_final_mono.f90:335-338). Peeloff happens at emission and at every
scattering, binning into the frequency-INDEX axis of the image cubes.

The device kernel is compiled once; the host loops over frequencies feeding
(nu, per-row source energies | per-cell CDFs) as traced arguments.
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .gtable import ESCAPED
from .sampling import searchsorted_small
from .sampling import (isotropic_direction, random_exp, rotate_direction,
                       sample_cdf_rows2)
from .engine import select_dust, sample_scattering_mu
from .imaging import (peel_and_bin, escape_tau_walk, init_peel_accum,
                      Provenance,
                      ORIG_SOURCE_EMIT, ORIG_DUST_EMIT, ORIG_SOURCE_SCAT,
                      ORIG_DUST_SCAT)


# ---------------------------------------------------------------------------
# Host-side per-frequency setup
# ---------------------------------------------------------------------------

def source_mono_energies(sources, frequencies):
    """(n_rows, n_freq) spectral-PDF values per expanded source row
    (rows match build_source_tables' PointSourceCollection expansion).

    Tabulated spectra: fnu / integral(fnu dnu) interpolated at nu, 0 outside
    (ref interpolate_pdf with fill_value=0). Blackbodies:
    pi * B_nu / (sigma T^4) (ref normalized_B_nu, source_type.f90:1088).
    """
    from ..util.constants import sigma, pi
    from ..util.functions import B_nu
    from ..util.integrate import integrate_loglog
    from ..sources import PointSourceCollection

    frequencies = np.asarray(frequencies, float)

    def one(s):
        if s.spectrum is not None:
            nu = np.asarray(s.spectrum['nu'], float)
            fnu = np.asarray(s.spectrum['fnu'], float)
            norm = integrate_loglog(nu, fnu)
            pdf = np.interp(frequencies, nu, fnu / norm, left=0.0, right=0.0)
            return pdf
        elif s.temperature is not None:
            return pi * B_nu(frequencies, s.temperature) / \
                (sigma * s.temperature ** 4)
        raise ValueError("LTE-spectrum sources are not supported in "
                         "monochromatic mode")

    rows = []
    for s in sources:
        p = one(s)
        if isinstance(s, PointSourceCollection):
            rows.extend([p] * s.position.shape[0])
        else:
            rows.append(p)
    return np.asarray(rows)


def dust_mono_cell_pdfs(dusts, density, volumes, specific_energy,
                        frequencies):
    """Per-(dust, frequency) discrete cell CDFs for thermal emission.

    weight(cell) = prob_nu(cell) * E_abs(cell), with prob_nu the normalized
    j_nu PDF value at nu, log10-interpolated between the cell's bracketing
    specific-energy bins (ref dust_sample_emit_probability,
    dust_type_4elem.f90:356-375; setup_monochromatic_grid_pdfs).

    Returns (cell_cdf (n_freq, n_dust, n_cells), mean_prob (n_freq, n_dust),
    energy_abs_tot (n_dust,)). All numpy float64 host arrays.
    """
    from ..util.integrate import integrate_loglog

    frequencies = np.asarray(frequencies, float)
    density = np.asarray(density, float)
    volumes = np.asarray(volumes, float)
    specific_energy = np.asarray(specific_energy, float)
    n_dust, n_cells = density.shape
    n_freq = len(frequencies)

    cell_cdf = np.zeros((n_freq, n_dust, n_cells))
    mean_prob = np.zeros((n_freq, n_dust))
    energy_abs_tot = np.zeros(n_dust)

    for d_id, d in enumerate(dusts):
        em = d.emissivities
        enu = np.asarray(em.nu, float)
        jnu = np.asarray(em.jnu, float)          # (n_enu, n_var)
        var = np.asarray(em.var, float)
        # normalized PDF per var bin
        norms = np.array([integrate_loglog(enu, jnu[:, i])
                          for i in range(jnu.shape[1])])
        pdf = jnu / np.maximum(norms[None, :], 1e-300)

        e = specific_energy[d_id]
        E_abs = e * density[d_id] * volumes
        energy_abs_tot[d_id] = E_abs.sum()
        if energy_abs_tot[d_id] <= 0:
            continue

        # locate var bins (same rule as compute_jnu_var)
        i = np.clip(np.searchsorted(var, e, side='right') - 1, 0,
                    len(var) - 2)
        with np.errstate(divide='ignore', invalid='ignore'):
            frac = (np.log10(np.maximum(e, 1e-300)) - np.log10(var[i])) / \
                   (np.log10(var[i + 1]) - np.log10(var[i]))
        below, above = e < var[0], e > var[-1]
        i = np.where(below, 0, np.where(above, len(var) - 2, i))
        frac = np.clip(np.where(below, 0.0, np.where(above, 1.0, frac)),
                       0.0, 1.0)

        for f_id, nu in enumerate(frequencies):
            # PDF value at nu per var bin, then per-cell log interp
            pdf_at_nu = np.array([np.interp(nu, enu, pdf[:, v],
                                            left=0.0, right=0.0)
                                  for v in range(pdf.shape[1])])
            prob1 = pdf_at_nu[i]
            prob2 = pdf_at_nu[np.minimum(i + 1, pdf.shape[1] - 1)]
            with np.errstate(divide='ignore'):
                prob = np.where(
                    (prob1 > 0) & (prob2 > 0),
                    10.0 ** (np.log10(np.maximum(prob1, 1e-300)) + frac *
                             (np.log10(np.maximum(prob2, 1e-300)) -
                              np.log10(np.maximum(prob1, 1e-300)))),
                    0.0)
            w = prob * E_abs
            mean_prob[f_id, d_id] = w.mean() * n_cells / \
                max(energy_abs_tot[d_id], 1e-300)
            tot = w.sum()
            if tot > 0:
                cell_cdf[f_id, d_id] = np.cumsum(w) / tot
                cell_cdf[f_id, d_id, -1] = 1.0
    return cell_cdf, mean_prob, energy_abs_tot


# ---------------------------------------------------------------------------
# Device kernel (compiled once; looped over frequencies on host)
# ---------------------------------------------------------------------------

class MonoPacketState(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    kx: jnp.ndarray
    ky: jnp.ndarray
    kz: jnp.ndarray
    energy: jnp.ndarray
    energy_initial: jnp.ndarray
    cell: jnp.ndarray
    tau: jnp.ndarray
    n_inter: jnp.ndarray
    n_reabs: jnp.ndarray       # successive source re-absorption count
    reemit_src: jnp.ndarray    # source row to re-emit from (-1 = none)
    alive: jnp.ndarray
    reprocessed: jnp.ndarray
    scattered: jnp.ndarray
    # full provenance for track_origin='detailed'/'scatterings'
    source_id: jnp.ndarray
    dust_id: jnp.ndarray
    n_scat: jnp.ndarray
    # Stokes polarization fractions (ref scatter_stokes; mono scattering
    # rotates/polarizes exactly like the final iteration)
    q: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray


def _make_mono_step(geometry, dt, st, density, groups, config, mode,
                    nu_value, inu_global, chi_vec, albedo_vec, src_energy,
                    cell_cdf, mean_prob):
    """mode: 'source' | 'dust' (static). All lanes share one frequency, so
    per-dust chi/albedo are scalars (chi_vec/albedo_vec: (n_dust,))."""
    dtype = density.dtype
    n_dust = density.shape[0]
    n_cells = density.shape[1]
    ffi = config['forced_first_interaction']
    threshold = config['energy_threshold']
    peeloff_scattering_only = config['peeloff_scattering_only']
    reabs_on = bool(config.get('source_intersect', False))
    n_reabs_max = int(config.get('n_reabs_max', 0))

    from .stable import emit_packets, nearest_source_intersection
    from .raytrace import sample_position_in_cell

    def chi_rows_of(B):
        return jnp.broadcast_to(chi_vec[None, :], (B, n_dust))

    def step(carry):
        p = carry['packets']
        key, k_e, k_tau, k_ffi, k_dust, k_mu, k_phi, k_tau2, k_pos, k_dir, \
            k_cell, k_s = jax.random.split(carry['key'], 12)
        B = p.x.shape[0]

        # ---- refill ---------------------------------------------------------
        dead = ~p.alive
        if reabs_on:
            pending = p.reemit_src >= 0
            dead = dead & ~pending
        rank = jnp.cumsum(dead.astype(carry['budget'].dtype))
        can_fresh = dead & (rank <= carry['budget'])
        n_new = jnp.sum(can_fresh.astype(carry['budget'].dtype))

        killed_reabs = jnp.asarray(0, dtype=carry['killed_int'].dtype)
        if reabs_on:
            # re-emit at the SAME frequency, keeping the photon's energy
            # (ref iter_final_mono.f90:289-295: emit(reemit, inu=p%inu))
            reabs_kill = pending & (p.n_reabs + 1 > n_reabs_max)
            reemit_ok = pending & ~reabs_kill
            killed_reabs = jnp.sum(reabs_kill.astype(killed_reabs.dtype))
        else:
            reemit_ok = jnp.zeros_like(can_fresh)

        if mode == 'source':
            if reabs_on:
                u = jax.random.uniform(k_s, (B,), dtype=dtype)
                src_fresh = jnp.clip(
                    searchsorted_small(st.lum_cdf, u, side='left'),
                    0, st.n_sources - 1).astype(jnp.int32)
                src = jnp.where(reemit_ok, p.reemit_src, src_fresh)
                new = emit_packets(st, k_e, B, dtype, src=src,
                                   geometry=geometry)
            else:
                new = emit_packets(st, k_e, B, dtype, geometry=geometry)
            can = can_fresh | reemit_ok
            nx, ny, nz = new['x'], new['y'], new['z']
            nkx, nky, nkz = new['kx'], new['ky'], new['kz']
            e_new = jnp.where(reemit_ok, p.energy,
                              src_energy[new['source']] *
                              st.energy_weight[new['source']])
            orig_emit_rows = jnp.full((B,), ORIG_SOURCE_EMIT, dtype=jnp.int32)
            reproc_new = jnp.zeros((B,), dtype=bool)
            source_id_new = new['source'].astype(jnp.int32)
            dust_id_new = jnp.zeros((B,), dtype=jnp.int32)
            cell_new = geometry.find_cell(nx, ny, nz, nkx, nky, nkz)
        else:
            # uniform dust pick, cell from the per-dust CDF
            ud = jax.random.uniform(k_dust, (B,), dtype=dtype)
            d_pick = jnp.clip((ud * n_dust).astype(jnp.int32), 0, n_dust - 1)
            uc = jax.random.uniform(k_cell, (B,), dtype=dtype)
            # per-dust searchsorted (n_dust is small and static; avoids a
            # (B, n_cells) gather of CDF rows)
            cell_pick = jnp.zeros((B,), dtype=jnp.int32)
            for d in range(cell_cdf.shape[0]):
                idx_d = searchsorted_small(cell_cdf[d], uc,
                                         side='left').astype(jnp.int32)
                cell_pick = jnp.where(d_pick == d, idx_d, cell_pick)
            cell_pick = jnp.clip(cell_pick, 0, n_cells - 1)
            nx, ny, nz = sample_position_in_cell(geometry, cell_pick, k_pos,
                                                 dtype)
            nkx, nky, nkz = isotropic_direction(k_dir, (B,), dtype)
            e_new = mean_prob[d_pick]
            orig_emit_rows = jnp.full((B,), ORIG_DUST_EMIT, dtype=jnp.int32)
            reproc_new = jnp.ones((B,), dtype=bool)
            source_id_new = jnp.zeros((B,), dtype=jnp.int32)
            dust_id_new = d_pick.astype(jnp.int32)
            cell_new = cell_pick
            can = can_fresh
            if reabs_on:
                # dust-emitted photons re-absorbed by a source re-emit
                # FROM that source (surface position + outward direction)
                new = emit_packets(st, k_e, B, dtype,
                                   src=jnp.maximum(p.reemit_src, 0),
                                   geometry=geometry)
                nx = jnp.where(reemit_ok, new['x'], nx)
                ny = jnp.where(reemit_ok, new['y'], ny)
                nz = jnp.where(reemit_ok, new['z'], nz)
                nkx = jnp.where(reemit_ok, new['kx'], nkx)
                nky = jnp.where(reemit_ok, new['ky'], nky)
                nkz = jnp.where(reemit_ok, new['kz'], nkz)
                e_new = jnp.where(reemit_ok, p.energy, e_new)
                orig_emit_rows = jnp.where(reemit_ok, ORIG_SOURCE_EMIT,
                                           orig_emit_rows)
                reproc_new = jnp.where(reemit_ok, False, reproc_new)
                source_id_new = jnp.where(reemit_ok, jnp.maximum(
                    p.reemit_src, 0), source_id_new)
                cell_new = jnp.where(
                    reemit_ok,
                    geometry.find_cell(nx, ny, nz, nkx, nky, nkz), cell_new)
                can = can_fresh | reemit_ok

        emitted = can & (cell_new != ESCAPED) & (e_new > 0.0)

        m = lambda old, new_: jnp.where(can, new_, old)
        chi_rows = chi_rows_of(B)

        # WR99/Baes16 FFI for new lanes (ref iter_final_mono.f90:253-270);
        # re-emits from re-absorption always use a plain exponential
        if ffi:
            from .ffi import sample_first_interaction
            tau_esc = escape_tau_walk(geometry, density, chi_rows,
                                      nx, ny, nz, nkx, nky, nkz,
                                      cell_new, emitted & ~reemit_ok)
            applies = (tau_esc > 1e-10) & ~reemit_ok
            tau_new, w_ffi = sample_first_interaction(
                k_ffi, tau_esc, applies, config['ffi_algorithm'],
                config['ffi_baes16_xi'], dtype)
            e_ffi = e_new * w_ffi
        else:
            e_ffi = e_new
            tau_new = random_exp(k_tau, (B,), dtype)

        packets = MonoPacketState(
            x=m(p.x, nx), y=m(p.y, ny), z=m(p.z, nz),
            kx=m(p.kx, nkx), ky=m(p.ky, nky), kz=m(p.kz, nkz),
            energy=m(p.energy, e_ffi),
            energy_initial=jnp.where(can_fresh, e_new, p.energy_initial),
            cell=jnp.where(can, cell_new, p.cell),
            tau=m(p.tau, tau_new),
            n_inter=jnp.where(can_fresh, 0, p.n_inter),
            n_reabs=(jnp.where(can_fresh, 0,
                               jnp.where(reemit_ok, p.n_reabs + 1, p.n_reabs))
                     if reabs_on else p.n_reabs),
            reemit_src=(jnp.where(pending, -1, p.reemit_src)
                        if reabs_on else p.reemit_src),
            alive=p.alive | emitted,
            reprocessed=jnp.where(can, reproc_new, p.reprocessed),
            scattered=jnp.where(can, False, p.scattered),
            source_id=jnp.where(can, source_id_new, p.source_id),
            dust_id=jnp.where(can, dust_id_new, p.dust_id),
            n_scat=jnp.where(can, 0, p.n_scat),
            q=jnp.where(can, 0.0, p.q),
            u=jnp.where(can, 0.0, p.u),
            v=jnp.where(can, 0.0, p.v))

        accums = carry['accums']
        # emission peeloff with the PRE-FFI energy (ref peels before the
        # forced interaction reweight); re-emits peel even in
        # scattering-only mode (ref iter_final_mono.f90:292-295)
        peel_emit = (emitted & reemit_ok) if peeloff_scattering_only \
            else emitted
        if (not peeloff_scattering_only) or reabs_on:
            accums = peel_and_bin(
                geometry, dt, density, groups, accums,
                packets.x, packets.y, packets.z, chi_rows, packets.cell,
                jnp.full((B,), nu_value, dtype=dtype),
                jnp.where(peel_emit, e_new, 0.0),
                jnp.ones((B,), dtype=dtype), jnp.zeros((B,), dtype=bool),
                jnp.zeros((B,), dtype=jnp.int32),
                packets.kx, packets.ky, packets.kz,
                Provenance(
                    scattered=jnp.zeros((B,), bool),
                    reprocessed=packets.reprocessed,
                    source_id=packets.source_id,
                    dust_id=packets.dust_id,
                    n_scat=jnp.zeros((B,), jnp.int32)),
                peel_emit, dtype, inu_global=inu_global,
                stokes_in=(packets.q, packets.u, packets.v))

        p = packets
        budget = carry['budget'] - n_new

        # ---- propagate ------------------------------------------------------
        active = p.alive
        cell_safe = jnp.where(p.cell >= 0, p.cell, 0)
        t_wall, next_cell, ax, wall_coord = geometry.find_wall(
            cell_safe, p.x, p.y, p.z, p.kx, p.ky, p.kz)
        rho_rows = density[:, cell_safe].T
        chi_rho = jnp.sum(chi_rows * rho_rows, axis=-1)
        tau_wall = chi_rho * t_wall
        hits_wall = (tau_wall < p.tau) | (chi_rho <= 0.0)
        t_int = jnp.where(chi_rho > 0.0, p.tau / jnp.maximum(chi_rho, 1e-300),
                          t_wall)
        d_move = jnp.where(hits_wall, t_wall, t_int)

        # ---- source re-absorption: segment crosses an intersecting source's
        # surface -> absorbed, re-emitted at the SAME frequency on the next
        # refill (ref iter_final_mono.f90:278-295) ----
        if reabs_on:
            t_src, src_row = nearest_source_intersection(
                st, p.x, p.y, p.z, p.kx, p.ky, p.kz)
            hits_src = active & (d_move > t_src)
            hits_wall = hits_wall & ~hits_src
            moving = active & ~hits_src
        else:
            hits_src = jnp.zeros_like(active)
            moving = active

        x = jnp.where(moving, p.x + d_move * p.kx, p.x)
        y = jnp.where(moving, p.y + d_move * p.ky, p.y)
        z = jnp.where(moving, p.z + d_move * p.kz, p.z)
        x, y, z = geometry.snap(x, y, z, ax, wall_coord, moving & hits_wall)
        tau = jnp.where(moving,
                        jnp.where(hits_wall, p.tau - tau_wall,
                                  jnp.zeros_like(p.tau)),
                        p.tau)
        cell = jnp.where(moving & hits_wall, next_cell, p.cell)
        escaped_now = moving & hits_wall & (cell == ESCAPED)

        # ---- forced scattering (ref interact(force_scatter=.true.)) --------
        interacting = moving & ~hits_wall
        d_sel = select_dust(k_dust, chi_rows, rho_rows)
        energy = jnp.where(interacting, p.energy * albedo_vec[d_sel],
                           p.energy)
        from .stokes import sample_scatter_stokes
        sx, sy, sz, q_s, u_s, v_s = sample_scatter_stokes(
            dt, d_sel, jnp.full_like(p.x, nu_value), k_mu,
            p.kx, p.ky, p.kz, p.q, p.u, p.v)
        kx = jnp.where(interacting, sx, p.kx)
        ky = jnp.where(interacting, sy, p.ky)
        kz = jnp.where(interacting, sz, p.kz)
        q_new = jnp.where(interacting, q_s, p.q)
        u_new = jnp.where(interacting, u_s, p.u)
        v_new = jnp.where(interacting, v_s, p.v)

        n_inter = p.n_inter + interacting.astype(jnp.int32)
        killed_now = interacting & (
            (n_inter > config['n_inter_max']) |
            bool(config['kill_on_scatter']) |
            (energy < p.energy_initial * threshold))
        alive = active & ~escaped_now & ~killed_now & ~hits_src

        if reabs_on:
            reemit_src = jnp.where(hits_src, src_row, p.reemit_src)
            n_reabs = jnp.where(interacting, 0, p.n_reabs)
        else:
            reemit_src = p.reemit_src
            n_reabs = p.n_reabs

        # ---- scattering peeloff --------------------------------------------
        peel_events = interacting & ~killed_now
        n_scat_new = p.n_scat + interacting.astype(jnp.int32)
        accums = peel_and_bin(
            geometry, dt, density, groups, accums,
            x, y, z, chi_rows, cell,
            jnp.full((B,), nu_value, dtype=dtype), energy,
            jnp.ones((B,), dtype=dtype), jnp.ones((B,), dtype=bool),
            d_sel, p.kx, p.ky, p.kz,
            Provenance(scattered=jnp.ones((B,), bool),
                       reprocessed=p.reprocessed,
                       source_id=p.source_id,
                       dust_id=jnp.where(interacting, d_sel.astype(jnp.int32),
                                         p.dust_id),
                       n_scat=n_scat_new),
            peel_events, dtype, inu_global=inu_global,
            stokes_in=(p.q, p.u, p.v))

        tau = jnp.where(interacting, random_exp(k_tau2, (B,), dtype), tau)
        packets = MonoPacketState(
            x=x, y=y, z=z, kx=kx, ky=ky, kz=kz, energy=energy,
            energy_initial=p.energy_initial, cell=cell, tau=tau,
            n_inter=n_inter, n_reabs=n_reabs, reemit_src=reemit_src,
            alive=alive, reprocessed=p.reprocessed,
            scattered=p.scattered | interacting,
            source_id=p.source_id,
            dust_id=jnp.where(interacting, d_sel.astype(jnp.int32),
                              p.dust_id),
            n_scat=n_scat_new,
            q=q_new, u=u_new, v=v_new)

        return dict(packets=packets, key=key, budget=budget, accums=accums,
                    killed_int=carry['killed_int'] +
                    jnp.sum((interacting & (n_inter > config['n_inter_max']))
                            .astype(carry['killed_int'].dtype)),
                    n_steps=carry['n_steps'] + 1)

    return step


def mono_pass_impl(geometry, dt, st, density, groups, accums, key, n_photons,
                   batch_size, config_tuple, mode, nu_value, inu_global,
                   chi_vec, albedo_vec, src_energy, cell_cdf, mean_prob):
    """Un-jitted single-device mono pass (also the per-device function under
    shard_map for multi-chip runs)."""
    config = dict(config_tuple)
    dtype = density.dtype
    B = batch_size
    itype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32

    zeros = lambda *s: jnp.zeros(s, dtype=dtype)
    packets = MonoPacketState(
        x=zeros(B), y=zeros(B), z=zeros(B),
        kx=zeros(B), ky=zeros(B), kz=jnp.ones((B,), dtype=dtype),
        energy=zeros(B), energy_initial=zeros(B),
        cell=jnp.zeros((B,), dtype=jnp.int32),
        tau=zeros(B), n_inter=jnp.zeros((B,), dtype=jnp.int32),
        n_reabs=jnp.zeros((B,), dtype=jnp.int32),
        reemit_src=jnp.full((B,), -1, dtype=jnp.int32),
        alive=jnp.zeros((B,), dtype=bool),
        reprocessed=jnp.zeros((B,), dtype=bool),
        scattered=jnp.zeros((B,), dtype=bool),
        source_id=jnp.zeros((B,), dtype=jnp.int32),
        dust_id=jnp.zeros((B,), dtype=jnp.int32),
        n_scat=jnp.zeros((B,), dtype=jnp.int32),
        q=zeros(B), u=zeros(B), v=zeros(B))

    carry = dict(packets=packets, key=key,
                 budget=jnp.asarray(n_photons, dtype=itype),
                 accums=list(accums),
                 killed_int=jnp.asarray(0, dtype=itype),
                 n_steps=jnp.asarray(0, dtype=itype))

    step = _make_mono_step(geometry, dt, st, density, groups, config, mode,
                           nu_value, inu_global, chi_vec, albedo_vec,
                           src_energy, cell_cdf, mean_prob)
    max_steps = config['max_steps']
    reabs_on = bool(config.get('source_intersect', False))

    def cond(c):
        live = jnp.any(c['packets'].alive)
        if reabs_on:
            live = live | jnp.any(c['packets'].reemit_src >= 0)
        return ((c['budget'] > 0) | live) & (c['n_steps'] < max_steps)

    carry = jax.lax.while_loop(cond, step, carry)
    return carry['accums'], carry['killed_int'], carry['n_steps']


_run_mono_pass = partial(jax.jit, static_argnames=('batch_size',
                                                   'config_tuple', 'mode'))(
    mono_pass_impl)


def run_mono(geometry, dt, st, density, specific_energy, groups, key,
             frequencies, n_photons_sources, n_photons_dust, sources, dusts,
             batch_size=65536, n_inter_max=1000000, kill_on_scatter=False,
             forced_first_interaction=True, peeloff_scattering_only=False,
             energy_threshold=1e-10, max_steps=100000000, verbose=False,
             ffi_algorithm='wr99', ffi_baes16_xi=0.5, n_reabs_max=0,
             mesh=None):
    """Full monochromatic iteration over all frequencies.

    Returns (accums, stats). Flux normalization: source photons are scaled
    by energy_total/n_photons_sources (host side, after the kernel), dust
    photons by energy_abs_tot * n_dust / n_photons_dust — matching
    iter_final_mono.f90:115,185. Because the per-pass scale differs, each
    (frequency, pass) runs with raw energies and the bins are rescaled
    before summation.
    """
    from .engine import update_optical_constants

    dtype = density.dtype
    frequencies = np.asarray(frequencies, float)
    n_freq = len(frequencies)
    n_dust = dt.n_dust
    itype = np.int64

    config_tuple = (('n_inter_max', int(n_inter_max)),
                    ('kill_on_scatter', bool(kill_on_scatter)),
                    ('forced_first_interaction', bool(forced_first_interaction)),
                    ('peeloff_scattering_only', bool(peeloff_scattering_only)),
                    ('energy_threshold', float(energy_threshold)),
                    ('ffi_algorithm', str(ffi_algorithm)),
                    ('ffi_baes16_xi', float(ffi_baes16_xi)),
                    ('source_intersect', bool(st.any_intersect)),
                    ('n_reabs_max', int(n_reabs_max)),
                    ('max_steps', int(max_steps)))

    # per-frequency opacities (host -> device scalars)
    nu_dev = jnp.asarray(frequencies, dtype=dtype)
    chi_all, _, albedo_all = update_optical_constants(
        dt, nu_dev)                               # (n_freq, n_dust)

    src_e = source_mono_energies(sources, frequencies) if \
        n_photons_sources else np.zeros((st.n_sources, n_freq))

    if n_photons_dust and specific_energy is not None:
        cell_cdf, mean_prob, energy_abs_tot = dust_mono_cell_pdfs(
            dusts, np.asarray(density) / geometry.length_scale,
            np.asarray(geometry.volumes) * geometry.length_scale ** 3,
            np.asarray(specific_energy), frequencies)
    else:
        n_cells = density.shape[1]
        cell_cdf = np.zeros((n_freq, n_dust, n_cells))
        mean_prob = np.zeros((n_freq, n_dust))
        energy_abs_tot = np.zeros(n_dust)

    final_accums = [init_peel_accum(g, dtype) for g in groups]
    total_killed = 0
    total_steps = 0

    if mesh is not None:
        from ..parallel.mesh import run_mono_pass_sharded

    def one_pass(accums, k, n_phot, mode, f_id, chi_f, alb_f, src_e_f,
                 cell_cdf_f, mean_prob_f):
        if mesh is not None:
            return run_mono_pass_sharded(
                mesh, geometry, dt, st, density, list(groups), accums, k,
                n_phot, batch_size, config_tuple, mode,
                jnp.asarray(frequencies[f_id], dtype=dtype),
                jnp.asarray(f_id, dtype=jnp.int32), chi_f, alb_f, src_e_f,
                cell_cdf_f, mean_prob_f)
        return _run_mono_pass(
            geometry, dt, st, density, list(groups), accums, k, n_phot,
            batch_size, config_tuple, mode,
            jnp.asarray(frequencies[f_id], dtype=dtype),
            jnp.asarray(f_id, dtype=jnp.int32), chi_f, alb_f, src_e_f,
            cell_cdf_f, mean_prob_f)

    for f_id in range(n_freq):
        key, k_s, k_d = jax.random.split(key, 3)
        zero_cdf = jnp.zeros((1, density.shape[1]), dtype=dtype)

        if n_photons_sources > 0:
            accums = [init_peel_accum(g, dtype) for g in groups]
            accums, killed, steps = one_pass(
                accums, k_s, n_photons_sources, 'source', f_id,
                chi_all[f_id], albedo_all[f_id],
                jnp.asarray(src_e[:, f_id], dtype=dtype),
                zero_cdf, jnp.zeros((1,), dtype=dtype))
            scale = float(st.energy_total) / n_photons_sources
            final_accums = [a._replace(
                sed=a.sed + b.sed * scale, sed2=a.sed2 + b.sed2 * scale ** 2,
                sedn=a.sedn + b.sedn,
                img=a.img + b.img * scale, img2=a.img2 + b.img2 * scale ** 2,
                imgn=a.imgn + b.imgn)
                for a, b in zip(final_accums, accums)]
            total_killed += int(killed)
            total_steps += int(steps)

        if n_photons_dust > 0 and mean_prob[f_id].sum() > 0:
            accums = [init_peel_accum(g, dtype) for g in groups]
            accums, killed, steps = one_pass(
                accums, k_d, n_photons_dust, 'dust', f_id,
                chi_all[f_id], albedo_all[f_id],
                jnp.zeros((st.n_sources,), dtype=dtype),
                jnp.asarray(cell_cdf[f_id], dtype=dtype),
                jnp.asarray(mean_prob[f_id] * energy_abs_tot * n_dust /
                            n_photons_dust, dtype=dtype))
            final_accums = [a._replace(
                sed=a.sed + b.sed, sed2=a.sed2 + b.sed2, sedn=a.sedn + b.sedn,
                img=a.img + b.img, img2=a.img2 + b.img2, imgn=a.imgn + b.imgn)
                for a, b in zip(final_accums, accums)]
            total_killed += int(killed)
            total_steps += int(steps)

        if verbose:
            print("[mono] nu = %.4e Hz done" % frequencies[f_id])

    return final_accums, dict(killed_int=total_killed, n_steps=total_steps)
