"""Spatially sharded transport: grid state distributed over the mesh with
escaping-packet exchange via ``ppermute`` ring hops.

This is the memory-scaling axis the reference does NOT have (its MPI layer
replicates the whole grid on every rank, src/mpi/mpi_io.f90:436-449); the
design here is the Monte-Carlo analog of ring attention: each device owns a
contiguous slab of cells (density, emissivity locators, energy accumulators
all sharded over the cell axis), packets whose trajectory leaves the local
slab are parked in a fixed-size transit pool that rotates one hop around the
device ring every step, and deposits only ever touch device-local memory.

Per-device state:

- **resident pool** (batch_size lanes): packets being propagated; only lanes
  whose cell lies in the local slab advance, the rest wait to emigrate.
- **transit pool** (batch_size lanes): packets in flight between devices;
  the whole pool is ``ppermute``-shifted one hop per step, and lanes whose
  destination slab is the local one disembark into dead resident lanes.

All pool moves are rank-matched masked scatters (k-th emigrant into the k-th
free transit slot), so shapes stay static and everything jits. Termination
uses a globally psum-reduced liveness flag carried through the loop.

v2 capabilities (the single-event physics is SHARED with the replicated
engine — engine.interaction_update / engine.mrw_jump_update — so the two
paths cannot drift):

- MRW diffusion acceleration (per-cell tables sharded over the slabs)
- source re-absorption with local re-emission
- nu-resolved specific-energy spectrum binning
- arbitrary n_cells (the wrapper pads the cell axis to a multiple of the
  mesh size; padded cells have zero density and receive nothing)

Remaining limits: Lucy iteration only (imaging stays packet-DP), and
per-cell photon counts tally wall-entries rather than unique photons.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..transport.gtable import ESCAPED
from ..transport.engine import (update_optical_constants, interaction_update,
                                mrw_jump_update)
from ..transport.sampling import random_exp


def _rank_match_move(src_mask, dst_mask):
    """Pair the k-th True lane of src_mask with the k-th True lane of
    dst_mask. Returns (src_ok, dst_idx): for every lane, whether its packet
    actually moves, and the destination lane index (= B for lanes that
    don't move, suitable for mode='drop' scatters)."""
    B = src_mask.shape[0]
    dst_positions = jnp.nonzero(dst_mask, size=B, fill_value=B)[0]
    src_rank = jnp.cumsum(src_mask.astype(jnp.int32)) - 1
    n_free = jnp.sum(dst_mask.astype(jnp.int32))
    src_ok = src_mask & (src_rank < n_free)
    dst_idx = jnp.where(src_ok, dst_positions[jnp.clip(src_rank, 0, B - 1)],
                        B)
    return src_ok, dst_idx


# Packet fields exchanged between devices (SoA dict keys)
_FIELDS = ('x', 'y', 'z', 'kx', 'ky', 'kz', 'nu', 'energy', 'tau')


def lucy_iteration_spatial_impl(geometry, dt, st, density_local, jid_local,
                                jfrac_local, key, n_photons, batch_size,
                                config_tuple, n_dev, axis_name='dp',
                                mrw=None, spec_bins=None, spec_bin_frac=None):
    """Per-device body: runs under shard_map with density/jnu (and the MRW
    per-cell tables) sharded over the cell axis. Returns (energy_sum_local,
    energy_current, n_photons_cell local, killed_int, n_steps,
    energy_sum_spec local) — cell-axis outputs stay sharded."""
    from ..transport.stable import emit_packets, nearest_source_intersection

    config = dict(config_tuple)
    n_dust = dt.n_dust
    slab = density_local.shape[1]
    dtype = density_local.dtype
    B = batch_size
    itype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    spec_on = spec_bins is not None
    n_bins = int(spec_bins.shape[0]) - 1 if spec_on else 0
    reabs_on = bool(config.get('source_intersect', False))
    n_reabs_max = int(config.get('n_reabs_max', 0))
    mrw_on = mrw is not None

    me = jax.lax.axis_index(axis_name)
    offset = me.astype(jnp.int32) * slab
    key = jax.random.fold_in(key, me)

    def owner(cell):
        return jnp.where(cell >= 0, cell // slab, -1)

    zeros = lambda *s: jnp.zeros(s, dtype=dtype)

    def empty_pool():
        return dict(
            x=zeros(B), y=zeros(B), z=zeros(B), kx=zeros(B), ky=zeros(B),
            kz=jnp.ones((B,), dtype=dtype), nu=jnp.ones((B,), dtype=dtype),
            energy=zeros(B), tau=zeros(B),
            cell=jnp.full((B,), ESCAPED, jnp.int32),
            n_inter=jnp.zeros((B,), jnp.int32),
            n_mrw=jnp.zeros((B,), jnp.int32),
            n_reabs=jnp.zeros((B,), jnp.int32),
            reemit_src=jnp.full((B,), -1, jnp.int32),
            alive=jnp.zeros((B,), bool),
            chi=zeros(B, n_dust), kappa=zeros(B, n_dust),
            albedo=zeros(B, n_dust))

    res = empty_pool()
    trans = empty_pool()

    carry0 = dict(res=res, trans=trans, key=key,
                  budget=jnp.asarray(n_photons, itype),
                  energy_current=jnp.asarray(0.0, dtype),
                  energy_sum=jnp.zeros((n_dust, slab), dtype),
                  energy_sum_spec=jnp.zeros((n_dust, n_bins, slab), dtype),
                  n_photons_cell=jnp.zeros((slab,), itype),
                  killed_int=jnp.asarray(0, itype),
                  n_steps=jnp.asarray(0, itype),
                  live=jnp.asarray(True))

    def refill(c):
        """Emit fresh packets into dead resident lanes (same in-loop refill
        as the replicated engine; packets born in a foreign slab emigrate
        on the next exchange).  Re-absorbed photons re-emit from their
        absorbing source keeping their energy (ref iter_lucy.f90:158-183)."""
        res = c['res']
        key, k_e, k_tau, k_s = jax.random.split(c['key'], 4)
        dead = ~res['alive']
        if reabs_on:
            pending = res['reemit_src'] >= 0
            dead = dead & ~pending
        rank = jnp.cumsum(dead.astype(c['budget'].dtype))
        can_fresh = dead & (rank <= c['budget'])
        n_new = jnp.sum(can_fresh.astype(c['budget'].dtype))
        if reabs_on:
            u = jax.random.uniform(k_s, (B,), dtype=dtype)
            from ..transport.sampling import searchsorted_small
            src_fresh = jnp.clip(
                searchsorted_small(st.lum_cdf, u, side='left'),
                0, st.n_sources - 1).astype(jnp.int32)
            reabs_kill = pending & (res['n_reabs'] + 1 > n_reabs_max)
            reemit_ok = pending & ~reabs_kill
            src = jnp.where(reemit_ok, res['reemit_src'], src_fresh)
            can = can_fresh | reemit_ok
            new = emit_packets(st, k_e, B, dtype, src=src)
        else:
            can = can_fresh
            new = emit_packets(st, k_e, B, dtype)
        cell_new = geometry.find_cell(new['x'], new['y'], new['z'],
                                      new['kx'], new['ky'], new['kz'])
        chi_n, kappa_n, alb_n = update_optical_constants(dt, new['nu'])
        tau_new = random_exp(k_tau, (B,), dtype)

        def m(old, new_):
            return jnp.where(can, new_, old) if old.ndim == 1 else \
                jnp.where(can[:, None], new_, old)

        res = dict(
            x=m(res['x'], new['x']), y=m(res['y'], new['y']),
            z=m(res['z'], new['z']), kx=m(res['kx'], new['kx']),
            ky=m(res['ky'], new['ky']), kz=m(res['kz'], new['kz']),
            nu=m(res['nu'], new['nu']),
            energy=jnp.where(can_fresh, new['energy'], res['energy']),
            tau=m(res['tau'], tau_new),
            cell=jnp.where(can, cell_new, res['cell']),
            n_inter=jnp.where(can_fresh, 0, res['n_inter']),
            n_mrw=jnp.where(can, 0, res['n_mrw']),
            n_reabs=(jnp.where(can_fresh, 0,
                               jnp.where(reemit_ok, res['n_reabs'] + 1,
                                         res['n_reabs']))
                     if reabs_on else res['n_reabs']),
            reemit_src=(jnp.where(pending, -1, res['reemit_src'])
                        if reabs_on else res['reemit_src']),
            alive=res['alive'] | (can & (cell_new != ESCAPED)),
            chi=m(res['chi'], chi_n), kappa=m(res['kappa'], kappa_n),
            albedo=m(res['albedo'], alb_n))
        e_new = jnp.sum(jnp.where(can_fresh, new['energy'], 0.0))
        killed = c['killed_int']
        if reabs_on:
            killed = killed + jnp.sum(reabs_kill.astype(killed.dtype))
        return dict(c, res=res, key=key, budget=c['budget'] - n_new,
                    killed_int=killed,
                    energy_current=c['energy_current'] + e_new.astype(dtype))

    def _spec_deposit(spec_sum, dep, dep_idx, p_nu, local):
        """Bin a deposit by the packet frequency (per dust d is applied by
        the caller via dep; here the (bin, cell) scatter)."""
        log2nu = jnp.log2(jnp.maximum(p_nu, 1e-30))
        from ..transport.sampling import searchsorted_small
        ibin = searchsorted_small(spec_bins, log2nu, side='right') - 1
        ok = (ibin >= 0) & (ibin < n_bins) & local
        ibin_safe = jnp.clip(ibin, 0, max(n_bins - 1, 0))
        return spec_sum.at[ibin_safe, jnp.where(ok, dep_idx, slab)].add(
            dep, mode='drop')

    def physics(c):
        """One local transport event for resident lanes in the local slab:
        the same sequence as the replicated engine's step (MRW gate,
        tau-walk segment, deposit, interaction), with the single-event
        physics imported from the engine."""
        p = c['res']
        key, k_check, k_dust, k_coin, k_nu, k_dir, k_mu, k_phi, k_tau = \
            jax.random.split(c['key'], 9)
        local = p['alive'] & (owner(p['cell']) == me)
        lcell = jnp.clip(p['cell'] - offset, 0, slab - 1)
        rho_rows = density_local[:, lcell].T
        vid_rows = jid_local[:, lcell].T
        vfrac_rows = jfrac_local[:, lcell].T

        energy_sum = c['energy_sum']
        energy_spec = c['energy_sum_spec']
        killed_int = c['killed_int']
        active = local

        # --- MRW (shared Min+09 move; tables sharded over the slabs) ---
        if mrw_on:
            k_m1, k_m2, k_m3, k_m4, k_m5 = jax.random.split(
                jax.random.fold_in(key, 17), 5)
            alpha_inv = mrw.alpha_inv_planck[lcell]
            kappa_p_rows = mrw.kappa_planck[:, lcell].T
            d_close = geometry.closest_wall_distance(
                jnp.where(local, p['cell'], 0), p['x'], p['y'], p['z'])
            tau_close = alpha_inv * d_close
            mrw_now = local & (p['n_inter'] >= 1) & (tau_close > mrw.gamma)

            deps, x_m, y_m, z_m, nk, nu_m, chi_m, kappa_m, alb_m = \
                mrw_jump_update(dt, mrw, (k_m1, k_m2, k_m3, k_m4, k_m5),
                                mrw_now, p['x'], p['y'], p['z'], p['energy'],
                                p['chi'], d_close, alpha_inv, kappa_p_rows,
                                rho_rows, vid_rows, vfrac_rows, dtype)
            dep_idx_m = jnp.where(mrw_now, lcell, slab)
            for d in range(n_dust):
                energy_sum = energy_sum.at[d, dep_idx_m].add(deps[d],
                                                             mode='drop')
                if spec_on and spec_bin_frac is not None:
                    vid = vid_rows[:, d].astype(jnp.int32)
                    vf = vfrac_rows[:, d]
                    row0 = (d * dt.n_var + vid) * n_bins
                    row1 = (d * dt.n_var +
                            jnp.minimum(vid + 1, dt.n_var - 1)) * n_bins
                    fr_flat = spec_bin_frac.reshape(-1)
                    for b in range(n_bins):
                        fb = (1.0 - vf) * fr_flat[row0 + b] + \
                            vf * fr_flat[row1 + b]
                        energy_spec = energy_spec.at[
                            d, b, dep_idx_m].add(deps[d] * fb, mode='drop')
            nkx, nky, nkz = nk
            n_mrw_new = p['n_mrw'] + mrw_now.astype(jnp.int32)
            killed_mrw = mrw_now & (n_mrw_new > config['n_mrw_max'])
            cell_rm = geometry.find_cell(x_m, y_m, z_m, nkx, nky, nkz)
            cell_m = jnp.where(mrw_now & (cell_rm != ESCAPED), cell_rm,
                               p['cell'])
            p = dict(
                p, cell=cell_m,
                x=jnp.where(mrw_now, x_m, p['x']),
                y=jnp.where(mrw_now, y_m, p['y']),
                z=jnp.where(mrw_now, z_m, p['z']),
                kx=jnp.where(mrw_now, nkx, p['kx']),
                ky=jnp.where(mrw_now, nky, p['ky']),
                kz=jnp.where(mrw_now, nkz, p['kz']),
                nu=jnp.where(mrw_now, nu_m, p['nu']),
                chi=jnp.where(mrw_now[:, None], chi_m, p['chi']),
                kappa=jnp.where(mrw_now[:, None], kappa_m, p['kappa']),
                albedo=jnp.where(mrw_now[:, None], alb_m, p['albedo']),
                n_mrw=n_mrw_new,
                alive=p['alive'] & ~killed_mrw)
            killed_int = killed_int + jnp.sum(
                killed_mrw.astype(killed_int.dtype))
            active = p['alive'] & local & ~mrw_now

        t_wall, next_cell, ax, wall_coord = geometry.find_wall(
            jnp.where(local, p['cell'], 0), p['x'], p['y'], p['z'],
            p['kx'], p['ky'], p['kz'])

        chi_rho = jnp.sum(p['chi'] * rho_rows, axis=-1)
        tau_wall = chi_rho * t_wall
        hits_wall = (tau_wall < p['tau']) | (chi_rho <= 0.0)
        t_int = jnp.where(chi_rho > 0.0,
                          p['tau'] / jnp.maximum(chi_rho, 1e-300), t_wall)
        d_move = jnp.where(hits_wall, t_wall, t_int)

        # source re-absorption cuts the segment (ref grid_propagate_3d.f90:
        # 101,142-145: no deposit, no move; flagged for re-emission)
        if reabs_on:
            t_src, src_row = nearest_source_intersection(
                st, p['x'], p['y'], p['z'], p['kx'], p['ky'], p['kz'])
            hits_src = active & (d_move > t_src)
            hits_wall = hits_wall & ~hits_src
            moving = active & ~hits_src
        else:
            hits_src = jnp.zeros_like(active)
            moving = active

        dep_idx = jnp.where(moving, lcell, slab)
        for d in range(n_dust):
            dep = jnp.where(moving & (rho_rows[:, d] > 0.0),
                            d_move * p['kappa'][:, d] * p['energy'], 0.0)
            energy_sum = energy_sum.at[d, dep_idx].add(dep, mode='drop')
            if spec_on:
                energy_spec = _spec_deposit(energy_spec[d], dep, dep_idx,
                                            p['nu'], moving)[None] \
                    if n_dust == 1 else energy_spec.at[d].set(
                        _spec_deposit(energy_spec[d], dep, dep_idx,
                                      p['nu'], moving))

        x = jnp.where(moving, p['x'] + d_move * p['kx'], p['x'])
        y = jnp.where(moving, p['y'] + d_move * p['ky'], p['y'])
        z = jnp.where(moving, p['z'] + d_move * p['kz'], p['z'])
        x, y, z = geometry.snap(x, y, z, ax, wall_coord, moving & hits_wall)
        tau = jnp.where(moving,
                        jnp.where(hits_wall, p['tau'] - tau_wall,
                                  jnp.zeros_like(p['tau'])), p['tau'])

        cell = jnp.where(moving & hits_wall, next_cell, p['cell'])
        escaped = moving & hits_wall & (cell == ESCAPED)
        n_photons_cell = c['n_photons_cell'].at[
            jnp.where(moving & hits_wall & (owner(cell) == me),
                      jnp.clip(cell - offset, 0, slab - 1), slab)
        ].add(1, mode='drop')

        # --- interaction: SHARED single-event physics with the engine ---
        interacting = moving & ~hits_wall
        evt = interaction_update(
            dt, (k_dust, k_coin, k_nu, k_dir, k_mu, k_phi), interacting,
            p['nu'], p['kx'], p['ky'], p['kz'], p['chi'], p['albedo'],
            rho_rows, vid_rows, vfrac_rows, dtype)
        absorbed = evt['absorbed']
        nu, kx, ky, kz, chi = (evt['nu'], evt['kx'], evt['ky'], evt['kz'],
                               evt['chi'])
        kappa = jnp.where(absorbed[:, None], evt['kappa_abs'], p['kappa'])
        albedo = jnp.where(absorbed[:, None], evt['albedo_abs'],
                           p['albedo'])

        cell_re = geometry.find_cell(x, y, z, kx, ky, kz)
        cell = jnp.where(interacting & (cell_re != ESCAPED), cell_re, cell)
        tau = jnp.where(interacting, random_exp(k_tau, (B,), dtype), tau)
        n_inter = p['n_inter'] + interacting.astype(jnp.int32)
        n_mrw = jnp.where(interacting, 0, p['n_mrw'])
        killed_now = interacting & (n_inter > config['n_inter_max'])
        # same kill semantics as the replicated engine (engine.py:660-662)
        kill_flag = (config['kill_on_scatter'] & evt['scattered']) | \
                    (config['kill_on_absorb'] & absorbed)
        killed_now = killed_now | (interacting & kill_flag)
        alive = p['alive'] & ~escaped & ~killed_now & ~hits_src

        if reabs_on:
            reemit_src = jnp.where(hits_src, src_row, p['reemit_src'])
            n_reabs = jnp.where(interacting, 0, p['n_reabs'])
        else:
            reemit_src = p['reemit_src']
            n_reabs = p['n_reabs']

        res = dict(x=x, y=y, z=z, kx=kx, ky=ky, kz=kz, nu=nu,
                   energy=p['energy'], tau=tau, cell=cell, n_inter=n_inter,
                   n_mrw=n_mrw, n_reabs=n_reabs, reemit_src=reemit_src,
                   alive=alive, chi=chi, kappa=kappa, albedo=albedo)
        return dict(c, res=res, key=key, energy_sum=energy_sum,
                    energy_sum_spec=energy_spec,
                    n_photons_cell=n_photons_cell,
                    killed_int=killed_int +
                    jnp.sum(killed_now.astype(killed_int.dtype)))

    all_fields = _FIELDS + ('cell', 'n_inter', 'n_mrw', 'n_reabs',
                            'reemit_src', 'chi', 'kappa', 'albedo')

    def _write(pool, dst_idx, ok, values):
        """Rank-matched masked scatter of packet `values` into `pool`."""
        out = dict(pool)
        for f in all_fields:
            v = values[f]
            mask = ok if v.ndim == 1 else ok[:, None]
            out[f] = out[f].at[dst_idx].set(jnp.where(mask, v, 0 * v),
                                            mode='drop')
        out['alive'] = out['alive'].at[dst_idx].set(ok, mode='drop')
        return out

    def exchange(c):
        """Rotate the transit pool one ring hop, disembark arrivals, emigrate
        foreign residents (the ppermute census — the analog of the
        reference's MPI packet handoff it never had).

        Arrivals SWAP with outgoing residents: an arriving packet may land
        on a lane whose resident is itself waiting to emigrate — the
        displaced resident takes over the arrival's transit slot. Without
        the swap the system gridlocks (all resident lanes waiting to leave,
        all transit lanes waiting to land).  Lanes holding a re-absorbed
        photon awaiting local re-emission are NOT free slots."""
        res, trans = c['res'], c['trans']

        # 1) rotate the whole transit pool one hop around the ring
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        trans = {k: jax.lax.ppermute(v, axis_name, perm)
                 for k, v in trans.items()}

        # 2) arrivals land on dead OR emigrant resident lanes (swap)
        pending = res['reemit_src'] >= 0 if reabs_on else \
            jnp.zeros_like(res['alive'])
        foreign = res['alive'] & (res['cell'] != ESCAPED) & \
            (owner(res['cell']) != me)
        arriving = trans['alive'] & (owner(trans['cell']) == me)
        slots = ((~res['alive']) & ~pending) | foreign
        a_ok, r_idx = _rank_match_move(arriving, slots)
        r_safe = jnp.clip(r_idx, 0, B - 1)
        # snapshot the displaced residents before overwriting
        displaced = {f: (res[f][r_safe] if res[f].ndim == 1
                         else res[f][r_safe, :]) for f in all_fields}
        displaced_alive = a_ok & foreign[r_safe]
        arrival_vals = {f: trans[f] for f in all_fields}
        # the arrival's transit slot now carries the displaced resident
        # (or becomes free when the slot was simply dead)
        for f in all_fields:
            mask = a_ok if trans[f].ndim == 1 else a_ok[:, None]
            trans[f] = jnp.where(mask, displaced[f], trans[f])
        trans['alive'] = jnp.where(a_ok, displaced_alive, trans['alive'])
        res = _write(res, r_idx, a_ok, arrival_vals)

        # 3) remaining foreign residents -> free transit slots
        foreign2 = res['alive'] & (res['cell'] != ESCAPED) & \
            (owner(res['cell']) != me)
        free_t = ~trans['alive']
        s_ok, t_idx = _rank_match_move(foreign2, free_t)
        trans = _write(trans, t_idx, s_ok, {f: res[f] for f in all_fields})
        res = dict(res, alive=res['alive'] & ~s_ok)
        return dict(c, res=res, trans=trans)

    def step(c):
        c = refill(c)
        c = physics(c)
        c = exchange(c)
        n_live = jnp.sum(c['res']['alive'].astype(itype)) + \
            jnp.sum(c['trans']['alive'].astype(itype)) + c['budget']
        if reabs_on:
            n_live = n_live + jnp.sum(
                (c['res']['reemit_src'] >= 0).astype(itype))
        live = jax.lax.psum(n_live, axis_name) > 0
        return dict(c, live=live, n_steps=c['n_steps'] + 1)

    max_steps = config['max_steps']

    def cond(c):
        return c['live'] & (c['n_steps'] < max_steps)

    c = jax.lax.while_loop(cond, step, carry0)
    killed_int = c['killed_int'] + \
        jnp.sum(c['res']['alive'].astype(itype)) + \
        jnp.sum(c['trans']['alive'].astype(itype))
    return (c['energy_sum'], jax.lax.psum(c['energy_current'], axis_name),
            c['n_photons_cell'],
            jax.lax.psum(killed_int, axis_name),
            jax.lax.pmax(c['n_steps'], axis_name),
            c['energy_sum_spec'])


@lru_cache(maxsize=None)
def _spatial_fn(mesh, batch_size_per_device, config_tuple, axis_name,
                has_mrw, has_spec, has_spec_frac):
    n_dev = mesh.devices.size

    def per_device(geometry, dt, st, density_l, jid_l, jfrac_l, key,
                   n_photons_arr, mrw_t, spec_b, spec_f):
        idx = jax.lax.axis_index(axis_name)
        share = n_photons_arr // n_dev + jnp.where(
            idx == 0, n_photons_arr % n_dev, 0)
        return lucy_iteration_spatial_impl(
            geometry, dt, st, density_l, jid_l, jfrac_l, key, share,
            batch_size_per_device, config_tuple, n_dev, axis_name,
            mrw=mrw_t if has_mrw else None,
            spec_bins=spec_b if has_spec else None,
            spec_bin_frac=spec_f if has_spec and has_spec_frac else None)

    rep = P()
    cell_sharded = P(None, axis_name)
    # the MRW tables shard their per-cell axes; CDF/scalars replicate
    mrw_spec = None
    if has_mrw:
        from ..transport.mrw import MRWTables
        mrw_spec = MRWTables(alpha_inv_planck=P(axis_name),
                             kappa_planck=cell_sharded,
                             y_grid=rep, x_grid=rep, x_rows=rep, gamma=rep)
    fn = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, rep, cell_sharded, cell_sharded, cell_sharded,
                  rep, rep, mrw_spec if has_mrw else rep, rep, rep),
        out_specs=(cell_sharded, rep, P(axis_name), rep, rep,
                   P(None, None, axis_name)),
        check_vma=False)
    return jax.jit(fn)


def run_lucy_iteration_spatial(mesh, geometry, dt, st, density, jnu_var_id,
                               jnu_var_frac, key, n_photons,
                               batch_size_per_device, config_tuple,
                               axis_name='dp', mrw=None, spec_bins=None,
                               spec_bin_frac=None):
    """One Lucy iteration with the GRID sharded over the mesh (cell slabs)
    and packets exchanged via ppermute ring hops.

    ``n_cells`` need not divide the mesh size: the cell axis is padded with
    zero-density cells (they receive no deposits — a packet is only local
    to the slab its REAL cell id maps to).

    Returns (energy_sum (n_dust, n_cells — logically sharded),
    energy_current, n_photons_cell, killed_int, n_steps,
    energy_sum_spec)."""
    n_dev = mesh.devices.size
    n_cells = density.shape[1]
    pad = (-n_cells) % n_dev

    def padc(arr):
        if pad == 0:
            return arr
        return jnp.pad(arr, [(0, 0)] * (arr.ndim - 1) + [(0, pad)])

    density_p = padc(density)
    jid_p = padc(jnu_var_id)
    jfrac_p = padc(jnu_var_frac)
    mrw_p = None
    if mrw is not None:
        mrw_p = mrw._replace(alpha_inv_planck=padc(mrw.alpha_inv_planck[None])[0],
                             kappa_planck=padc(mrw.kappa_planck))
    zf = jnp.zeros((0,), density.dtype)
    fn = _spatial_fn(mesh, batch_size_per_device, config_tuple, axis_name,
                     mrw is not None, spec_bins is not None,
                     spec_bin_frac is not None)
    out = fn(geometry, dt, st, density_p, jid_p, jfrac_p, key,
             jnp.asarray(n_photons),
             mrw_p if mrw_p is not None else zf,
             spec_bins if spec_bins is not None else zf,
             spec_bin_frac if spec_bin_frac is not None else zf)
    energy_sum, e_cur, npc, killed, n_steps, espec = out
    if pad:
        energy_sum = energy_sum[:, :n_cells]
        npc = npc[:n_cells]
        espec = espec[:, :, :n_cells]
    return energy_sum, e_cur, npc, killed, n_steps, espec
