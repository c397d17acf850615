"""The fused Monte-Carlo transport kernel: one ``while_loop`` over the batch.

TPU-native re-design of the reference's photon-at-a-time recursion
(ref: src/main/iter_lucy.f90:122-210 + src/grid/grid_propagate_3d.f90:35-233
+ src/dust/dust_interact.f90:22-79): the whole batch advances in lockstep,
one cell-event (wall crossing OR interaction OR emission refill) per lane per
step. Dead lanes are refilled from the remaining photon budget *inside* the
loop, which replaces the reference's MPI master-worker chunk scheduler
(src/mpi/mpi_routines.f90:62-264) — lanes never idle while budget remains.

Energy deposition is a masked scatter-add into the per-(dust, cell)
specific-energy accumulator, replacing the serial `specific_energy_sum(...)
+=` updates.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gtable import ESCAPED
from .sampling import searchsorted_small, scatter_add_matmul
from .sampling import (isotropic_direction, random_exp, rotate_direction,
                       sample_quantile_rows, searchsorted_rows, interp_loglog)
from .mrw import sample_min09


class PacketState(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    kx: jnp.ndarray
    ky: jnp.ndarray
    kz: jnp.ndarray
    nu: jnp.ndarray
    energy: jnp.ndarray
    cell: jnp.ndarray          # flat cell index, ESCAPED when outside
    tau: jnp.ndarray           # optical depth remaining to next interaction
    n_inter: jnp.ndarray       # interaction count
    n_mrw: jnp.ndarray         # MRW step count since emission
    n_reabs: jnp.ndarray       # successive source re-absorption count
    reemit_src: jnp.ndarray    # source row to re-emit from (-1 = none)
    uid: jnp.ndarray           # photon id for per-cell visit dedup
    alive: jnp.ndarray         # bool
    chi: jnp.ndarray           # (B, n_dust) cached extinction at nu
    kappa: jnp.ndarray         # (B, n_dust) cached absorption at nu
    albedo: jnp.ndarray        # (B, n_dust)


class LucyCarry(NamedTuple):
    packets: PacketState
    key: jnp.ndarray
    budget: jnp.ndarray        # photons still to emit (int64-ish)
    energy_current: jnp.ndarray
    energy_sum: jnp.ndarray    # (n_dust, n_cells) path-length deposits
    # (n_dust, n_bins, n_cells) nu-resolved deposits, (n_dust, 0, n_cells)
    # when the spectrum is not requested (ref grid_physics_3d.f90:41-56)
    energy_sum_spec: jnp.ndarray
    # (n_cells,) unique-photon visit counts: a cell's count only grows when
    # a DIFFERENT photon enters it (ref last_photon_id dedup,
    # grid_propagate_3d.f90:91-97) — it feeds the PDA starvation statistic
    n_photons_cell: jnp.ndarray
    last_uid_cell: jnp.ndarray   # (n_cells+1,) uid of the last visitor
    uid_counter: jnp.ndarray     # next fresh photon id
    killed_int: jnp.ndarray
    killed_geo: jnp.ndarray
    n_steps: jnp.ndarray
    # transport-event counter: lanes that did real work this step (a cell
    # crossing/interaction move or an MRW jump).  n_events/(n_steps*B) is
    # the alive-lane occupancy — the batch-drain waste metric (ref
    # performance.f90's photons/s is the analogous figure of merit)
    n_events: jnp.ndarray


def update_optical_constants(dt, nu):
    """Interpolate chi/kappa/albedo for every dust at each lane's frequency.
    Matches the reference's semantics exactly (update_optconsts,
    src/dust/dust.f90:74-76): chi and albedo are each log-log interpolated
    and kappa is DERIVED as chi * (1 - albedo) — with albedos near 1 the
    derived kappa is ~8x more sensitive to the albedo interpolation than to
    kappa's own, so interpolating a pre-tabulated kappa is not equivalent.
    Returns (B, n_dust) each."""
    chis, kappas, albedos = [], [], []
    for d in range(dt.n_dust):
        chi = interp_loglog(dt.nu[d], dt.chi[d], nu)
        albedo = jnp.clip(interp_loglog(dt.nu[d], dt.albedo[d], nu),
                          0.0, 1.0)
        chis.append(chi)
        albedos.append(albedo)
        kappas.append(chi * (1.0 - albedo))
    return (jnp.stack(chis, axis=-1), jnp.stack(kappas, axis=-1),
            jnp.stack(albedos, axis=-1))


def sample_emission_nu(dt, dust_id, var_id, var_frac, key, use_bnu=False):
    """Sample a re-emission frequency from the emissivity tables.

    The bracketing specific-energy bin is chosen by a Bernoulli draw on
    var_frac (the reference picks PDF var_id or var_id+1 the same way,
    dust_type_4elem.f90 dust_emit/dust_sample_j_nu), then the frequency
    comes from one O(1) quantile-table inversion — two gathers instead of a
    per-lane binary search, which XLA would serialize inside the transport
    loop on TPU."""
    k_bin, k_xi = jax.random.split(key)
    shape = dust_id.shape
    dtype = dt.jnu_q.dtype
    u_bin = jax.random.uniform(k_bin, shape, dtype=dtype)
    v = var_id + (u_bin < var_frac).astype(var_id.dtype)
    rows = dust_id * dt.n_var + jnp.minimum(v, dt.n_var - 1)
    xi = jax.random.uniform(k_xi, shape, dtype=dtype)
    q = dt.bnu_q if use_bnu else dt.jnu_q
    return sample_quantile_rows(q, rows, xi, exp2=True)


def sample_scattering_mu(dt, dust_id, nu, key):
    """Sample cos(scattering angle) from the P1 CDF at the lane's frequency
    bin (ref: dust_scatter, dust_type_4elem.f90:504-545 — nearest nu bin,
    matching the reference's behaviour); O(1) quantile-table inversion."""
    n_nu = dt.nu.shape[1]
    inu = searchsorted_rows(dt.nu, dust_id, nu) - 1
    inu = jnp.clip(inu, 0, n_nu - 1)
    rows = dust_id * n_nu + inu
    xi = jax.random.uniform(key, dust_id.shape, dtype=nu.dtype)
    return sample_quantile_rows(dt.mu_q, rows, xi)


def _select_col(mat, sel):
    """mat[i, sel[i]] for a (B, n) matrix with small n.

    TPU gathers serialize per element (~10 ns/lane even from tiny tables);
    for the per-dust axis (n <= 8) a compare-and-sum over the columns is a
    pure VPU fusion and costs a few hundred elementwise ops instead."""
    n = mat.shape[-1]
    if n == 1:
        return mat[:, 0]
    if n <= 8:
        cols = jnp.arange(n, dtype=sel.dtype)
        return jnp.sum(jnp.where(sel[:, None] == cols[None, :], mat, 0),
                       axis=-1)
    return jnp.take_along_axis(mat, sel[:, None], axis=-1)[:, 0]


def select_dust(key, chi, density_rows):
    """Pick the interacting dust population with probability ∝ chi_d * rho_d
    (ref: select_dust_chi_rho, grid_physics_3d.f90:87-109)."""
    w = chi * density_rows  # (B, n_dust)
    total = jnp.sum(w, axis=-1)
    u = jax.random.uniform(key, total.shape, dtype=chi.dtype) * total
    csum = jnp.cumsum(w, axis=-1)
    sel = jnp.sum((csum < u[:, None]).astype(jnp.int32), axis=-1)
    return jnp.clip(sel, 0, w.shape[-1] - 1)


def interaction_update(dt, keys, interacting, nu, kx, ky, kz, chi, albedo,
                       rho_rows, vid_rows, vfrac_rows, dtype,
                       fused_sampler=None):
    """Shared single-event interaction physics (ref interact,
    dust_interact.f90:22-76): dust pick ∝ chi*rho, albedo coin, absorption →
    re-emission at a frequency from the local emissivity with an isotropic
    direction, scattering → deflection by a sampled mu, and the cached
    opacity refresh.  Used by BOTH the replicated engine step and the
    spatially-sharded step so the event physics exists exactly once.

    ``keys``: (k_dust, k_coin, k_nu, k_dir, k_mu, k_phi).
    ``fused_sampler``: optional closure (scatter, d_sel, var_id, var_frac,
    nu, k_nu) -> (nu_em, mu_s) — the engine's combined quantile table.

    Returns a dict of the post-event lane values (masked by
    ``interacting``) plus the absorbed/scattered masks and d_sel."""
    k_dust, k_coin, k_nu, k_dir, k_mu, k_phi = keys
    d_sel = select_dust(k_dust, chi, rho_rows)
    alb = _select_col(albedo, d_sel)
    coin = jax.random.uniform(k_coin, alb.shape, dtype=dtype)
    scatter = coin <= alb

    var_id = _select_col(vid_rows, d_sel).astype(jnp.int32)
    var_frac = _select_col(vfrac_rows, d_sel)
    if fused_sampler is not None:
        nu_em, mu_s = fused_sampler(scatter, d_sel, var_id, var_frac, nu,
                                    k_nu)
    else:
        nu_em = sample_emission_nu(dt, d_sel, var_id, var_frac, k_nu)
        mu_s = sample_scattering_mu(dt, d_sel, nu, k_mu)
    ex, ey, ez = isotropic_direction(k_dir, nu.shape, dtype)
    phi_s = jax.random.uniform(k_phi, nu.shape, dtype=dtype,
                               maxval=2 * jnp.pi)
    sx, sy, sz = rotate_direction(kx, ky, kz, mu_s, phi_s)

    absorbed = interacting & ~scatter
    scattered = interacting & scatter
    nu_new = jnp.where(absorbed, nu_em, nu)
    kx_new = jnp.where(absorbed, ex, jnp.where(scattered, sx, kx))
    ky_new = jnp.where(absorbed, ey, jnp.where(scattered, sy, ky))
    kz_new = jnp.where(absorbed, ez, jnp.where(scattered, sz, kz))

    chi_n, kappa_n, alb_n = update_optical_constants(dt, nu_new)
    return dict(nu=nu_new, kx=kx_new, ky=ky_new, kz=kz_new,
                chi=jnp.where(absorbed[:, None], chi_n, chi),
                kappa_abs=kappa_n, albedo_abs=alb_n,
                absorbed=absorbed, scattered=scattered, d_sel=d_sel)


def mrw_jump_update(dt, mrw, keys, mrw_now, x, y, z, energy, chi, d_close,
                    alpha_inv, kappa_p_rows, rho_rows, vid_rows, vfrac_rows,
                    dtype):
    """Shared Min+09 Modified-Random-Walk move (ref grid_do_mrw,
    grid_mrw_3d.f90:56-111): sample the diffusion time from eq. (8),
    compute the per-dust Lucy deposit ct*kappa_planck*E (eq. 9), jump to
    the R0 sphere surface with a fresh isotropic direction, and resample
    the frequency from the local b_nu.  Used by both the replicated and
    the spatially-sharded steps.

    ``keys``: 5 PRNG keys.  Returns (deps [(B,) per dust], x_m, y_m, z_m,
    (nkx, nky, nkz), nu_m, chi_m, kappa_m, alb_m)."""
    k1, k2, k3, k4, k5 = keys
    y_s = sample_min09(mrw, k1, x.shape, dtype)
    ct = -jnp.log(jnp.maximum(y_s, 1e-30)) * 3.0 * \
        alpha_inv * (d_close / jnp.pi) ** 2
    deps = []
    for d in range(rho_rows.shape[1]):
        deps.append(jnp.where(mrw_now & (rho_rows[:, d] > 0.0),
                              ct * kappa_p_rows[:, d] * energy, 0.0))
    jx, jy, jz = isotropic_direction(k2, x.shape, dtype)
    nk = isotropic_direction(k3, x.shape, dtype)
    x_m = x + d_close * jx
    y_m = y + d_close * jy
    z_m = z + d_close * jz
    d_sel_m = select_dust(k4, chi, rho_rows)
    nu_m = sample_emission_nu(dt, d_sel_m,
                              _select_col(vid_rows, d_sel_m)
                              .astype(jnp.int32),
                              _select_col(vfrac_rows, d_sel_m),
                              k5, use_bnu=True)
    chi_m, kappa_m, alb_m = update_optical_constants(dt, nu_m)
    return deps, x_m, y_m, z_m, nk, nu_m, chi_m, kappa_m, alb_m


def visit_update(last_uid_cell, n_photons_cell, idx, uid, use_matmul):
    """Unique-photon visit accounting (ref last_photon_id dedup,
    grid_propagate_3d.f90:91-97): count a cell visit only when a DIFFERENT
    photon enters; record the entrant's uid.  ``idx`` uses n_cells as the
    drop slot.  The matmul/compare-sum path replaces three serialized
    scatter/gather ops with broadcast reductions (winner = max uid instead
    of scatter-order-arbitrary — both are valid dedup tie-breaks)."""
    n_cells = n_photons_cell.shape[0]
    if use_matmul:
        # the last-uid table may be padded past n_cells+1 (the pallas
        # deposit_visit layout); only the head participates
        head = last_uid_cell[:n_cells + 1]
        cols = jnp.arange(n_cells + 1, dtype=jnp.int32)[None, :]
        oh = idx[:, None] == cols
        prev = jnp.sum(jnp.where(oh, head[None, :], 0), axis=1)
        fresh = prev != uid
        counts = jnp.sum((oh & fresh[:, None]).astype(n_photons_cell.dtype),
                         axis=0)[:n_cells]
        n_photons_cell = n_photons_cell + counts
        sentinel = jnp.asarray(jnp.iinfo(jnp.int32).min, jnp.int32)
        newuid = jnp.max(jnp.where(oh, uid[:, None], sentinel), axis=0)
        head = jnp.where(newuid > sentinel, newuid, head)
        last_uid_cell = jnp.concatenate([head,
                                         last_uid_cell[n_cells + 1:]])
        return last_uid_cell, n_photons_cell
    fresh = last_uid_cell[idx] != uid
    n_photons_cell = n_photons_cell.at[
        jnp.where(fresh, idx, n_cells)].add(1, mode='drop')
    last_uid_cell = last_uid_cell.at[idx].set(uid, mode='drop')
    return last_uid_cell, n_photons_cell


def make_lucy_step(geometry, dt, st, density, jnu_var_id, jnu_var_frac,
                   config, mrw=None, se_rho=None, spec_bins=None,
                   spec_bin_frac=None):
    """Build the while_loop body for one Lucy iteration.

    density: (n_dust, n_cells); jnu_var_id/frac: (n_dust, n_cells) emissivity
    locator from the previous iteration's specific energy
    (ref: precompute_jnu_var, grid_physics_3d.f90:613-635).

    ``spec_bins``: optional (n_bins+1,) log2-frequency bin edges — deposits
    are then additionally binned by the packet frequency into
    carry.energy_sum_spec (ref: deposit in grid_propagate_3d.f90:155,217,
    idx = locate(log_nu_bin_edges, log10(p%nu))). ``spec_bin_frac``
    ((n_dust*n_var, n_bins)) distributes MRW deposits over the bins by the
    local emissivity (ref: deposit_specific_energy_spectrum,
    grid_physics_3d.f90:367-415 — the MRW radiation field is Planckian so
    no frequency sampling is involved).
    """
    n_dust = dt.n_dust
    dtype = density.dtype
    n_cells = density.shape[1]
    spec_on = spec_bins is not None
    n_bins = int(spec_bins.shape[0]) - 1 if spec_on else 0
    # One-hot-matmul deposits/visit-stats materialize a (B, n_cells)
    # mask per step: a clear win for small grids (the MXU replaces the
    # serialized per-lane scatter), a bandwidth loss for big ones.
    use_matmul_stats = n_cells <= 8192
    # Pallas fused deposit+visit kernel: the one-hot masks stay in VMEM in
    # a factored (128 x n_cells/128) form, so it wins for any grid that
    # fits the in-kernel row loop budget (see transport/pallas_ops.py)
    from . import pallas_ops
    # (128, B) and (n_cells/128, B) masks must fit VMEM: gate on both the
    # grid size (kernel row loop) and the batch width (checked per call
    # site against the actual lane count)
    pallas_stats_ok = (pallas_ops.is_available() and not spec_on and
                       n_cells <= 8192 and dtype == jnp.float32)

    # ---- packed per-cell lookup table -----------------------------------
    # TPU gathers serialize per lane (~10 ns each) no matter how little data
    # they move, and a row gather of K contiguous floats costs *less* than a
    # single scalar gather (measured on v5e: 0.67 ms scalar vs 0.24 ms for
    # 8-wide rows at B=65536). Every per-cell quantity the step body needs
    # is packed into one (n_cells, K) table read by ONE row gather per step.
    # jnu_var_id values are < n_var << 2^24, so they round-trip exactly
    # through the f32 table.
    _cols = [density.T, jnu_var_id.T.astype(dtype),
             jnu_var_frac.T.astype(dtype)]
    if mrw is not None:
        _cols.append(mrw.alpha_inv_planck[:, None].astype(dtype))
        _cols.append(mrw.kappa_planck.T.astype(dtype))
    # Geometries that can express their per-cell wall bounds as packed
    # columns ride in the same row gather (saves ~6 scalar gathers/step)
    use_rows = hasattr(geometry, 'wall_columns')
    wall_off = sum(c.shape[1] for c in _cols)
    if use_rows:
        _cols.append(geometry.wall_columns().astype(dtype))
    cell_tab = jnp.concatenate(_cols, axis=1)

    # ---- combined interaction quantile table ----------------------------
    # A lane either absorbs (needs an emission-nu draw from jnu_q) or
    # scatters (needs a mu draw from mu_q) — never both, so both inversions
    # share ONE table lookup per step (quantile gathers are ~1 ms each at
    # B=131072; this halves them). The cosine-warp knot grids nest when
    # (K_em-1) is a multiple of (K_mu-1) (257/129 by default), and index-
    # linear refinement reproduces the runtime piecewise-linear inversion
    # EXACTLY, so merging changes no sampled value.
    K_em = int(dt.jnu_q.shape[1])
    K_mu = int(dt.mu_q.shape[1])
    n_em_rows = int(dt.jnu_q.shape[0])
    comb_q = None
    # K_em > K_mu guards the degenerate single-knot emission table
    # (K_em == 1 would make f_up == 0 and divide by zero below)
    if K_mu >= 2 and K_em > K_mu and (K_em - 1) % (K_mu - 1) == 0:
        f_up = (K_em - 1) // (K_mu - 1)
        pos = jnp.arange(K_em, dtype=dtype) / f_up
        j_up = jnp.clip(pos.astype(jnp.int32), 0, K_mu - 2)
        fr_up = pos - j_up.astype(dtype)
        mu_up = dt.mu_q[:, j_up] * (1.0 - fr_up)[None, :] + \
            dt.mu_q[:, j_up + 1] * fr_up[None, :]
        comb_q = jnp.concatenate([dt.jnu_q, mu_up], axis=0)

    if comb_q is not None:
        def fused_sampler(scatter, d_sel, var_id, var_frac, nu, k_nu):
            # one shared quantile inversion: emission-nu row for absorbing
            # lanes, scattering-mu row for scattering lanes
            k_bin, k_xi = jax.random.split(k_nu)
            u_bin = jax.random.uniform(k_bin, d_sel.shape,
                                       dtype=comb_q.dtype)
            v_bin = var_id + (u_bin < var_frac).astype(var_id.dtype)
            em_rows = d_sel * dt.n_var + jnp.minimum(v_bin, dt.n_var - 1)
            n_nu_tab = dt.nu.shape[1]
            inu = jnp.clip(searchsorted_rows(dt.nu, d_sel, nu) - 1,
                           0, n_nu_tab - 1)
            mu_rows = n_em_rows + d_sel * n_nu_tab + inu
            rows_c = jnp.where(scatter, mu_rows, em_rows)
            xi_c = jax.random.uniform(k_xi, d_sel.shape, dtype=comb_q.dtype)
            val_c = sample_quantile_rows(comb_q, rows_c, xi_c)
            return jnp.exp2(val_c), val_c
    else:
        fused_sampler = None

    from .stable import emit_packets, nearest_source_intersection

    # Source re-absorption is compiled in only when the model actually has
    # intersecting (finite-radius spherical) sources — static host decision
    # (ref: find_nearest_source is a no-op when no source has intersect set,
    # source.f90:206-227).
    reabs_on = bool(config.get('source_intersect', False))
    n_reabs_max = int(config.get('n_reabs_max', 0))

    # MapSource / LTE-spectrum emission context (host-static: compiled in
    # only when the model has such sources)
    emit_kw = {}
    if st.has_map:
        emit_kw['geometry'] = geometry
    if st.has_lte:
        emit_kw['lte_ctx'] = (dt, jnu_var_id, jnu_var_frac,
                              se_rho if se_rho is not None
                              else jnp.zeros_like(density))

    def refill(carry):
        """Re-emit packets into dead lanes while budget remains (replaces
        mp_n_photons chunk scheduling), and re-emit source-re-absorbed
        packets from their absorbing source (ref iter_lucy.f90:158-183:
        emit(reemit=.true.) keeps the photon's energy; after n_reabs_max
        successive re-absorptions the photon is killed)."""
        p = carry.packets
        key, k_e, k_tau, k_s = jax.random.split(carry.key, 4)
        dead = ~p.alive
        if reabs_on:
            pending = p.reemit_src >= 0
            dead = dead & ~pending
        rank = jnp.cumsum(dead.astype(carry.budget.dtype))
        can_fresh = dead & (rank <= carry.budget)
        n_new = jnp.sum(can_fresh.astype(carry.budget.dtype))
        # fresh packets carry the per-source energy weight (1 unless
        # sample_sources_evenly); energy_current sums actual energies
        # (ref source.f90:162-163)

        if reabs_on:
            u = jax.random.uniform(k_s, p.x.shape, dtype=dtype)
            src_fresh = jnp.clip(
                searchsorted_small(st.lum_cdf, u, side='left'),
                0, st.n_sources - 1).astype(jnp.int32)
            reabs_kill = pending & (p.n_reabs + 1 > n_reabs_max)
            reemit_ok = pending & ~reabs_kill
            src = jnp.where(reemit_ok, p.reemit_src, src_fresh)
            can = can_fresh | reemit_ok
            new = emit_packets(st, k_e, p.x.shape[0], dtype, src=src,
                               **emit_kw)
        else:
            can = can_fresh
            new = emit_packets(st, k_e, p.x.shape[0], dtype, **emit_kw)

        cell_new = geometry.find_cell(new['x'], new['y'], new['z'],
                                      new['kx'], new['ky'], new['kz'])
        chi_n, kappa_n, alb_n = update_optical_constants(dt, new['nu'])
        tau_new = random_exp(k_tau, p.tau.shape, dtype)
        # fresh photons get ids from the consumed-budget counter (re-emitted
        # re-absorbed photons keep theirs — same physical photon)
        uid_base = carry.uid_counter
        # wrap uids below 2^22 so they stay exactly representable in f32
        # inside the pallas visit kernel; dedup only needs local-in-time
        # distinctness, so collisions 4M photons apart are harmless
        uid_new = ((uid_base + rank) % (1 << 22)).astype(jnp.int32)

        def m(old, new_):
            return jnp.where(can, new_, old) if old.ndim == 1 else \
                jnp.where(can[:, None], new_, old)

        packets = PacketState(
            x=m(p.x, new['x']), y=m(p.y, new['y']), z=m(p.z, new['z']),
            kx=m(p.kx, new['kx']), ky=m(p.ky, new['ky']), kz=m(p.kz, new['kz']),
            nu=m(p.nu, new['nu']),
            energy=jnp.where(can_fresh, new['energy'], p.energy),
            cell=jnp.where(can, cell_new, p.cell),
            tau=m(p.tau, tau_new),
            n_inter=jnp.where(can_fresh, 0, p.n_inter),
            n_mrw=jnp.where(can, 0, p.n_mrw),
            n_reabs=(jnp.where(can_fresh, 0,
                               jnp.where(reemit_ok, p.n_reabs + 1, p.n_reabs))
                     if reabs_on else p.n_reabs),
            reemit_src=(jnp.where(pending, -1, p.reemit_src)
                        if reabs_on else p.reemit_src),
            uid=jnp.where(can_fresh, uid_new, p.uid),
            alive=p.alive | (can & (cell_new != ESCAPED)),
            chi=m(p.chi, chi_n), kappa=m(p.kappa, kappa_n),
            albedo=m(p.albedo, alb_n),
        )
        # Photons emitted outside the grid simply escape (the reference
        # errors out; the model layer validates sources are inside the grid)
        emit_idx = jnp.where(can_fresh & (cell_new != ESCAPED), cell_new,
                             n_cells)
        last_uid_cell, n_photons_cell = visit_update(
            carry.last_uid_cell, carry.n_photons_cell, emit_idx, packets.uid,
            use_matmul_stats)
        killed_int = carry.killed_int
        if reabs_on:
            killed_int = killed_int + jnp.sum(
                reabs_kill.astype(killed_int.dtype))
        e_new = jnp.sum(jnp.where(can_fresh, new['energy'], 0.0))
        return carry._replace(
            packets=packets, key=key, budget=carry.budget - n_new,
            energy_current=carry.energy_current + e_new.astype(dtype),
            killed_int=killed_int, n_photons_cell=n_photons_cell,
            last_uid_cell=last_uid_cell,
            uid_counter=uid_base + n_new.astype(uid_base.dtype))

    def step(carry):
        # Refill is gated: it costs a full emission pass (spectrum sampling,
        # find_cell, opacity interpolation) over ALL lanes, so it only runs
        # when >= 1/4 of the batch is refillable (or nothing is alive, or a
        # re-absorbed photon waits for its source re-emission). lax.cond
        # executes one branch on TPU, so skipped steps pay nothing.
        p0 = carry.packets
        n_lanes = p0.alive.shape[0]
        n_alive = jnp.sum(p0.alive.astype(jnp.int32))
        need = (carry.budget > 0) & \
            ((n_alive * 4 <= 3 * n_lanes) | (n_alive == 0))
        if reabs_on:
            need = need | jnp.any(p0.reemit_src >= 0)
        carry = jax.lax.cond(need, refill, lambda c: c, carry)

        p = carry.packets
        key, k_check, k_dust, k_coin, k_nu, k_dir, k_mu, k_phi, k_tau = \
            jax.random.split(carry.key, 9)

        active = p.alive
        cell_safe = jnp.where(p.cell >= 0, p.cell, 0)
        # ONE row gather serves every per-cell lookup below. All consumers
        # (deposit, interaction, MRW trigger) exclude lanes whose cell
        # changes within this step, so the row cannot go stale.
        row = cell_tab[cell_safe]
        rho_rows = row[:, 0:n_dust]
        vid_rows = row[:, n_dust:2 * n_dust]
        vfrac_rows = row[:, 2 * n_dust:3 * n_dust]
        wrows = row[:, wall_off:] if use_rows else None

        # --- Modified Random Walk (ref iter_lucy.f90:138-152) ---
        if mrw is not None:
            k_mrw1, k_mrw2, k_mrw3, k_mrw4, k_mrw5 = jax.random.split(
                jax.random.fold_in(key, 17), 5)
            alpha_inv = row[:, 3 * n_dust]
            kappa_p_rows = row[:, 3 * n_dust + 1:3 * n_dust + 1 + n_dust]
            if use_rows:
                d_close = geometry.closest_wall_distance_rows(
                    wrows, cell_safe, p.x, p.y, p.z)
            else:
                d_close = geometry.closest_wall_distance(
                    cell_safe, p.x, p.y, p.z)
            tau_close = alpha_inv * d_close
            mrw_now = active & (p.n_inter >= 1) & (tau_close > mrw.gamma)

            def mrw_branch(ops):
                carry, p, _ = ops
                # shared Min+09 move (also used by the spatial step)
                deps, x_m, y_m, z_m, (nkx, nky, nkz), nu_m, chi_m, \
                    kappa_m, alb_m = mrw_jump_update(
                        dt, mrw, (k_mrw1, k_mrw2, k_mrw3, k_mrw4, k_mrw5),
                        mrw_now, p.x, p.y, p.z, p.energy, p.chi, d_close,
                        alpha_inv, kappa_p_rows, rho_rows, vid_rows,
                        vfrac_rows, dtype)
                # the Lucy deposits ride the shared end-of-step deposit
                # (the MRW lanes are disjoint from the moving lanes)
                dep_idx_m = jnp.where(mrw_now, cell_safe, n_cells)
                energy_spec_m = carry.energy_sum_spec
                for d in range(n_dust):
                    dep = deps[d]
                    if spec_on and spec_bin_frac is not None:
                        # distribute over bins by local emissivity, linearly
                        # interpolated between the two bracketing states
                        vid = vid_rows[:, d].astype(jnp.int32)
                        vf = vfrac_rows[:, d]
                        row0 = (d * dt.n_var + vid) * n_bins
                        row1 = (d * dt.n_var +
                                jnp.minimum(vid + 1, dt.n_var - 1)) * n_bins
                        fr_flat = spec_bin_frac.reshape(-1)
                        for b in range(n_bins):
                            fb = (1.0 - vf) * fr_flat[row0 + b] + \
                                vf * fr_flat[row1 + b]
                            energy_spec_m = energy_spec_m.at[
                                d, b, dep_idx_m].add(dep * fb, mode='drop')
                carry = carry._replace(energy_sum_spec=energy_spec_m)
                n_mrw_new = p.n_mrw + mrw_now.astype(jnp.int32)
                killed_mrw = mrw_now & (n_mrw_new > config['n_mrw_max'])
                # the jump sphere touches the nearest wall: relocate with
                # the fresh direction so tangent landings pick the right
                # side
                cell_rm = geometry.find_cell(x_m, y_m, z_m, nkx, nky, nkz)
                cell_m = jnp.where(mrw_now & (cell_rm != ESCAPED), cell_rm,
                                   p.cell)
                p = p._replace(
                    cell=cell_m,
                    x=jnp.where(mrw_now, x_m, p.x),
                    y=jnp.where(mrw_now, y_m, p.y),
                    z=jnp.where(mrw_now, z_m, p.z),
                    kx=jnp.where(mrw_now, nkx, p.kx),
                    ky=jnp.where(mrw_now, nky, p.ky),
                    kz=jnp.where(mrw_now, nkz, p.kz),
                    nu=jnp.where(mrw_now, nu_m, p.nu),
                    chi=jnp.where(mrw_now[:, None], chi_m, p.chi),
                    kappa=jnp.where(mrw_now[:, None], kappa_m, p.kappa),
                    albedo=jnp.where(mrw_now[:, None], alb_m, p.albedo),
                    n_mrw=n_mrw_new,
                    alive=p.alive & ~killed_mrw)
                carry = carry._replace(
                    killed_int=carry.killed_int +
                    jnp.sum(killed_mrw.astype(carry.killed_int.dtype)))
                return carry, p, jnp.stack(deps)

            # the whole diffusion move is gated on any lane triggering it —
            # optically thin stretches of an iteration pay nothing for MRW
            carry, p, mrw_deps = jax.lax.cond(
                jnp.any(mrw_now), mrw_branch, lambda ops: ops,
                (carry, p, jnp.zeros((n_dust,) + p.x.shape, dtype)))
            # lanes that just did an MRW step skip normal propagation
            active = p.alive & ~mrw_now

        # --- distance to next wall ---
        if use_rows:
            t_wall, next_cell, ax, wall_coord = geometry.find_wall_rows(
                wrows, cell_safe, p.x, p.y, p.z, p.kx, p.ky, p.kz)
        else:
            t_wall, next_cell, ax, wall_coord = geometry.find_wall(
                cell_safe, p.x, p.y, p.z, p.kx, p.ky, p.kz)

        # --- optical depth through the cell ---
        chi_rho = jnp.sum(p.chi * rho_rows, axis=-1)  # (B,)
        tau_wall = chi_rho * t_wall
        hits_wall = (tau_wall < p.tau) | (chi_rho <= 0.0)
        t_int = jnp.where(chi_rho > 0.0, p.tau / jnp.maximum(chi_rho, 1e-300),
                          t_wall)
        d_move = jnp.where(hits_wall, t_wall, t_int)

        # --- source re-absorption: if the segment passes through an
        # intersecting source's surface, the photon is absorbed by it —
        # no deposit, no move; flagged for re-emission at the next refill
        # (ref: grid_propagate_3d.f90:101,142-145,190-193 — the reference
        # also skips the segment's deposit on re-absorption) ---
        if reabs_on:
            t_src, src_row = nearest_source_intersection(
                st, p.x, p.y, p.z, p.kx, p.ky, p.kz)
            hits_src = active & (d_move > t_src)
            hits_wall = hits_wall & ~hits_src
            moving = active & ~hits_src
        else:
            hits_src = jnp.zeros_like(active)
            moving = active

        # --- deposit energy: specific_energy_sum += ds * kappa_d * E
        # (ref: grid_propagate_3d.f90:153-154, 205-206) ---
        energy_sum = carry.energy_sum
        energy_sum_spec = carry.energy_sum_spec
        dep_idx = jnp.where(moving, cell_safe, n_cells)
        if spec_on:
            # frequency bin of the packet (constant within a flight; ref
            # grid_propagate_3d.f90:71); packets outside the edges don't bin
            log2nu = jnp.log2(jnp.maximum(p.nu, 1e-30))
            ibin = searchsorted_small(spec_bins, log2nu,
                                      side='right') - 1
            bin_ok = (ibin >= 0) & (ibin < n_bins)
            ibin_safe = jnp.clip(ibin, 0, n_bins - 1)
        dep_rows = []
        for d in range(n_dust):
            dep = jnp.where(moving & (rho_rows[:, d] > 0.0),
                            d_move * p.kappa[:, d] * p.energy, 0.0)
            # the MRW branch's Lucy deposits (disjoint lanes, same cell)
            # ride this one shared deposit
            dep_rows.append((dep + mrw_deps[d]) if mrw is not None else dep)
            if spec_on:
                energy_sum_spec = energy_sum_spec.at[
                    d, ibin_safe, jnp.where(bin_ok, dep_idx, n_cells)
                ].add(dep, mode='drop')
        if not (pallas_stats_ok and cell_safe.shape[0] <= 16384):
            if use_matmul_stats:
                # masked lanes carry dep == 0, so depositing at cell_safe
                # is a numerical no-op for them — no drop slot needed
                energy_sum = scatter_add_matmul(energy_sum, cell_safe,
                                                jnp.stack(dep_rows))
            else:
                for d in range(n_dust):
                    energy_sum = energy_sum.at[d, cell_safe].add(
                        dep_rows[d], mode='drop')

        # --- move (masked: MRW-jumped lanes already moved this step) ---
        x = jnp.where(moving, p.x + d_move * p.kx, p.x)
        y = jnp.where(moving, p.y + d_move * p.ky, p.y)
        z = jnp.where(moving, p.z + d_move * p.kz, p.z)
        x, y, z = geometry.snap(x, y, z, ax, wall_coord, moving & hits_wall)
        tau = jnp.where(moving,
                        jnp.where(hits_wall, p.tau - tau_wall,
                                  jnp.zeros_like(p.tau)),
                        p.tau)

        # --- wall crossing ---
        cell = jnp.where(moving & hits_wall, next_cell, p.cell)
        escaped = moving & hits_wall & (cell == ESCAPED)
        # unique-photon visit counting (ref last_photon_id dedup,
        # grid_propagate_3d.f90:91-97): only count when a different photon
        # enters the cell than the one recorded there
        enter_idx = jnp.where(moving & hits_wall & (cell != ESCAPED), cell,
                              n_cells)
        use_pallas_stats = pallas_stats_ok and cell_safe.shape[0] <= 16384
        if use_pallas_stats:
            # one fused MXU kernel: deposits + unique-visit counts + the
            # last-uid winner update (pallas_ops.deposit_visit)
            energy_sum, n_photons_cell, last_uid_cell = \
                pallas_ops.deposit_visit(
                    energy_sum, carry.n_photons_cell, carry.last_uid_cell,
                    cell_safe, jnp.stack(dep_rows), enter_idx, p.uid)
        else:
            last_uid_cell, n_photons_cell = visit_update(
                carry.last_uid_cell, carry.n_photons_cell, enter_idx, p.uid,
                use_matmul_stats)

        # --- interaction (absorb+re-emit or scatter): shared physics ---
        interacting = moving & ~hits_wall
        evt = interaction_update(
            dt, (k_dust, k_coin, k_nu, k_dir, k_mu, k_phi), interacting,
            p.nu, p.kx, p.ky, p.kz, p.chi, p.albedo, rho_rows, vid_rows,
            vfrac_rows, dtype,
            fused_sampler=fused_sampler)
        absorbed = evt['absorbed']
        scattered = evt['scattered']
        nu, kx, ky, kz, chi = (evt['nu'], evt['kx'], evt['ky'], evt['kz'],
                               evt['chi'])
        kappa = jnp.where(absorbed[:, None], evt['kappa_abs'], p.kappa)
        albedo = jnp.where(absorbed[:, None], evt['albedo_abs'], p.albedo)

        # Direction-aware relocation after the direction changed: a packet
        # whose tau ran out exactly ON a wall it just crossed now points in
        # a new direction that may select the other side of that wall. The
        # reference tracks this with photon%on_wall + adjust_wall
        # (grid_geometry_*:adjust_wall); here the direction-aware find_cell
        # IS the on-wall disambiguation, so one relocation per interaction
        # restores the invariant cell == cell_containing(x, direction).
        # Geometries with packed wall rows do this from the cell's own
        # bounds (an interacting packet is inside its cell, at worst exactly
        # on a bound) instead of a from-scratch locate.
        if use_rows:
            cell_re = geometry.relocate_rows(wrows, cell_safe, x, y, z,
                                             kx, ky, kz)
        else:
            cell_re = geometry.find_cell(x, y, z, kx, ky, kz)
        cell = jnp.where(interacting & (cell_re != ESCAPED), cell_re, cell)

        # new optical depth for lanes that interacted
        tau = jnp.where(interacting, random_exp(k_tau, tau.shape, dtype), tau)
        n_inter = p.n_inter + interacting.astype(jnp.int32)
        # the MRW step cap applies per diffusion burst: reset at interactions
        # (ref iter_lucy.f90:141 do mrw_steps=1,n_mrw_max inside one pass)
        n_mrw = jnp.where(interacting, 0, p.n_mrw)

        killed_now = interacting & (n_inter > config['n_inter_max'])
        kill_flag = (config['kill_on_scatter'] & scattered) | \
                    (config['kill_on_absorb'] & absorbed)
        killed_now = killed_now | (interacting & kill_flag)

        # escaped/killed_now are subsets of the propagating lanes, so lanes
        # that did an MRW jump this step stay alive through here.
        # Source-hit lanes go dormant until the next refill re-emits them.
        alive = p.alive & ~escaped & ~killed_now & ~hits_src

        if reabs_on:
            reemit_src = jnp.where(hits_src, src_row, p.reemit_src)
            # a completed flight (reached an interaction) resets the
            # successive re-absorption counter (ref iter_lucy.f90:160 the
            # ia loop restarts per re-absorption episode)
            n_reabs = jnp.where(interacting, 0, p.n_reabs)
        else:
            reemit_src = p.reemit_src
            n_reabs = p.n_reabs

        # --- probabilistic geometry self-check (ref grid_propagate_3d.f90:
        # 110-117 in_correct_cell): with probability check_frequency per
        # step, test the position against the claimed cell's bounds (with
        # tolerance — NOT a from-scratch relocate, which is ambiguous for
        # positions exactly on a wall); a disagreement kills the packet and
        # counts in killed_geo.
        killed_geo = carry.killed_geo
        check_freq = float(config.get('check_frequency', 0.0))
        if check_freq > 0.0:
            u_chk = jax.random.uniform(k_check, p.x.shape, dtype=dtype)
            do_check = alive & moving & (cell != ESCAPED) & \
                (u_chk < check_freq)
            ok = geometry.in_cell_tol(jnp.where(cell >= 0, cell, 0), x, y, z)
            bad = do_check & ~ok
            alive = alive & ~bad
            killed_geo = killed_geo + jnp.sum(bad.astype(killed_geo.dtype))

        packets = PacketState(x=x, y=y, z=z, kx=kx, ky=ky, kz=kz, nu=nu,
                              energy=p.energy, cell=cell, tau=tau,
                              n_inter=n_inter, n_mrw=n_mrw, n_reabs=n_reabs,
                              reemit_src=reemit_src, uid=p.uid, alive=alive,
                              chi=chi, kappa=kappa, albedo=albedo)
        # transport events this step: moved lanes (crossings/interactions)
        # plus MRW jumps — feeds the occupancy figure in util.perf/bench
        worked = moving
        if mrw is not None:
            worked = worked | mrw_now
        n_events = carry.n_events + jnp.sum(
            worked.astype(carry.n_events.dtype))
        return LucyCarry(
            packets=packets, key=key, budget=carry.budget,
            energy_current=carry.energy_current, energy_sum=energy_sum,
            energy_sum_spec=energy_sum_spec,
            n_photons_cell=n_photons_cell,
            last_uid_cell=last_uid_cell,
            uid_counter=carry.uid_counter,
            killed_int=carry.killed_int + jnp.sum(killed_now.astype(carry.killed_int.dtype)),
            killed_geo=killed_geo,
            n_steps=carry.n_steps + 1,
            n_events=n_events)

    return step


def lucy_iteration_impl(geometry, dt, st, density, jnu_var_id, jnu_var_frac,
                        key, n_photons, batch_size, config_tuple, mrw=None,
                        se_rho=None, spec_bins=None, spec_bin_frac=None):
    """Un-jitted single-device Lucy iteration body (also the per-device
    function under shard_map for multi-chip runs).

    Returns (energy_sum (n_dust, n_cells), energy_current, n_photons_cell,
    killed_int, killed_geo, n_steps, energy_sum_spec (n_dust, n_bins,
    n_cells — n_bins = 0 unless spec_bins is given)).
    """
    config = dict(config_tuple)

    # single carry constructor shared with the segmented driver so a new
    # carry field cannot silently drift between the two entry points
    carry = _init_lucy_carry(dt, density, key, n_photons, batch_size,
                             spec_bins)

    step = make_lucy_step(geometry, dt, st, density, jnu_var_id, jnu_var_frac,
                          config, mrw=mrw, se_rho=se_rho,
                          spec_bins=spec_bins, spec_bin_frac=spec_bin_frac)

    max_steps = config['max_steps']

    reabs_on = bool(config.get('source_intersect', False))

    def cond(carry):
        live = jnp.any(carry.packets.alive)
        if reabs_on:
            live = live | jnp.any(carry.packets.reemit_src >= 0)
        return ((carry.budget > 0) | live) & (carry.n_steps < max_steps)

    carry = jax.lax.while_loop(cond, step, carry)
    # Lanes still alive at max_steps are killed (bounded-step safety net)
    killed_int = carry.killed_int + jnp.sum(carry.packets.alive.astype(carry.killed_int.dtype))
    if reabs_on:
        killed_int = killed_int + jnp.sum(
            (carry.packets.reemit_src >= 0).astype(killed_int.dtype))
    return (carry.energy_sum, carry.energy_current, carry.n_photons_cell,
            killed_int, carry.killed_geo, carry.n_steps,
            carry.energy_sum_spec, carry.n_events)


run_lucy_iteration = partial(jax.jit,
                             static_argnames=('batch_size', 'config_tuple'))(
    lucy_iteration_impl)


def _visit_pad(n_cells):
    from .pallas_ops import pad_cells_for_visit
    return pad_cells_for_visit(n_cells)


def _init_lucy_carry(dt, density, key, n_photons, batch_size, spec_bins):
    n_dust = dt.n_dust
    n_cells = density.shape[1]
    dtype = density.dtype
    B = batch_size
    n_bins = int(spec_bins.shape[0]) - 1 if spec_bins is not None else 0
    itype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    zeros = lambda *s: jnp.zeros(s, dtype=dtype)
    packets = PacketState(
        x=zeros(B), y=zeros(B), z=zeros(B),
        kx=zeros(B), ky=zeros(B), kz=jnp.ones((B,), dtype=dtype),
        nu=jnp.ones((B,), dtype=dtype), energy=zeros(B),
        cell=jnp.zeros((B,), dtype=jnp.int32),
        tau=zeros(B), n_inter=jnp.zeros((B,), dtype=jnp.int32),
        n_mrw=jnp.zeros((B,), dtype=jnp.int32),
        n_reabs=jnp.zeros((B,), dtype=jnp.int32),
        reemit_src=jnp.full((B,), -1, dtype=jnp.int32),
        uid=jnp.full((B,), -1, dtype=jnp.int32),
        alive=jnp.zeros((B,), dtype=bool),
        chi=zeros(B, n_dust), kappa=zeros(B, n_dust),
        albedo=zeros(B, n_dust))
    return LucyCarry(
        packets=packets, key=key,
        budget=jnp.asarray(n_photons, dtype=itype),
        energy_current=jnp.asarray(0.0, dtype=dtype),
        energy_sum=jnp.zeros((n_dust, n_cells), dtype=dtype),
        energy_sum_spec=jnp.zeros((n_dust, n_bins, n_cells), dtype=dtype),
        n_photons_cell=jnp.zeros((n_cells,), dtype=itype),
        # padded to the pallas deposit_visit layout (a superset of the
        # (n_cells+1,) drop-slot layout the XLA paths use)
        last_uid_cell=jnp.full((_visit_pad(n_cells),), -2, dtype=jnp.int32),
        uid_counter=jnp.asarray(0, dtype=itype),
        killed_int=jnp.asarray(0, dtype=itype),
        killed_geo=jnp.asarray(0, dtype=itype),
        n_steps=jnp.asarray(0, dtype=itype),
        n_events=jnp.asarray(0, dtype=itype))


@partial(jax.jit, static_argnames=('config_tuple',))
def _lucy_segment(geometry, dt, st, density, jnu_var_id, jnu_var_frac,
                  carry, limit, config_tuple, mrw=None, se_rho=None,
                  spec_bins=None, spec_bin_frac=None):
    """Run the Lucy while_loop up to ``limit`` total steps and report
    whether more work remains. Bounding each device dispatch keeps any
    single XLA execution short (long-running dispatches trip RPC deadlines
    on remote/tunneled TPU runtimes and stall Ctrl-C locally)."""
    config = dict(config_tuple)
    step = make_lucy_step(geometry, dt, st, density, jnu_var_id,
                          jnu_var_frac, config, mrw=mrw, se_rho=se_rho,
                          spec_bins=spec_bins, spec_bin_frac=spec_bin_frac)
    reabs_on = bool(config.get('source_intersect', False))

    def unfinished(c):
        live = jnp.any(c.packets.alive)
        if reabs_on:
            live = live | jnp.any(c.packets.reemit_src >= 0)
        return (c.budget > 0) | live

    carry = jax.lax.while_loop(
        lambda c: unfinished(c) & (c.n_steps < limit), step, carry)
    more = unfinished(carry) & (carry.n_steps < config['max_steps'])
    return carry, more


def run_lucy_iteration_segmented(geometry, dt, st, density, jnu_var_id,
                                 jnu_var_frac, key, n_photons, batch_size,
                                 config_tuple, mrw=None, se_rho=None,
                                 spec_bins=None, spec_bin_frac=None,
                                 seg_steps=None):
    """Same contract as run_lucy_iteration, but the while_loop is dispatched
    in host-driven segments of ``seg_steps`` steps (default 2048, env
    override HYPERION_TPU_SEG_STEPS). One scalar fetch per segment decides
    continuation; state stays on device between dispatches."""
    import os
    if seg_steps is None:
        seg_steps = int(os.environ.get('HYPERION_TPU_SEG_STEPS', '2048'))
    config = dict(config_tuple)
    max_steps = config['max_steps']
    carry = _init_lucy_carry(dt, density, key, n_photons, batch_size,
                             spec_bins)
    reabs_on = bool(config.get('source_intersect', False))
    steps_done = 0
    while True:
        limit = min(steps_done + seg_steps, max_steps)
        carry, more = _lucy_segment(geometry, dt, st, density, jnu_var_id,
                                    jnu_var_frac, carry, limit,
                                    config_tuple, mrw=mrw, se_rho=se_rho,
                                    spec_bins=spec_bins,
                                    spec_bin_frac=spec_bin_frac)
        steps_done = limit
        if not bool(more) or steps_done >= max_steps:
            break
    killed_int = carry.killed_int + jnp.sum(
        carry.packets.alive.astype(carry.killed_int.dtype))
    if reabs_on:
        killed_int = killed_int + jnp.sum(
            (carry.packets.reemit_src >= 0).astype(killed_int.dtype))
    return (carry.energy_sum, carry.energy_current, carry.n_photons_cell,
            killed_int, carry.killed_geo, carry.n_steps,
            carry.energy_sum_spec, carry.n_events)
