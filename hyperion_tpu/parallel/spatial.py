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

Restrictions (v1): Lucy iteration only, no MRW / source re-absorption /
spectrum binning; n_cells must divide evenly by the mesh size.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..transport.gtable import ESCAPED
from ..transport.engine import (update_optical_constants, sample_emission_nu,
                                sample_scattering_mu, select_dust)
from ..transport.sampling import (isotropic_direction, random_exp,
                                  rotate_direction)


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
                                config_tuple, n_dev, axis_name='dp'):
    """Per-device body: runs under shard_map with density/jnu sharded over
    the cell axis. Returns (energy_sum_local, energy_current, n_photons_cell
    local, killed_int, n_steps) — cell-axis outputs stay sharded."""
    from ..transport.stable import emit_packets

    config = dict(config_tuple)
    n_dust = dt.n_dust
    slab = density_local.shape[1]
    dtype = density_local.dtype
    B = batch_size
    itype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32

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
            alive=jnp.zeros((B,), bool),
            chi=zeros(B, n_dust), kappa=zeros(B, n_dust),
            albedo=zeros(B, n_dust))

    res = empty_pool()
    trans = empty_pool()

    carry0 = dict(res=res, trans=trans, key=key,
                  budget=jnp.asarray(n_photons, itype),
                  energy_current=jnp.asarray(0.0, dtype),
                  energy_sum=jnp.zeros((n_dust, slab), dtype),
                  n_photons_cell=jnp.zeros((slab,), itype),
                  killed_int=jnp.asarray(0, itype),
                  n_steps=jnp.asarray(0, itype),
                  live=jnp.asarray(True))

    def refill(c):
        """Emit fresh packets into dead resident lanes (same in-loop refill
        as the replicated engine; packets born in a foreign slab emigrate
        on the next exchange)."""
        res = c['res']
        key, k_e, k_tau = jax.random.split(c['key'], 3)
        dead = ~res['alive']
        rank = jnp.cumsum(dead.astype(c['budget'].dtype))
        can = dead & (rank <= c['budget'])
        n_new = jnp.sum(can.astype(c['budget'].dtype))
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
            energy=jnp.where(can, new['energy'], res['energy']),
            tau=m(res['tau'], tau_new),
            cell=jnp.where(can, cell_new, res['cell']),
            n_inter=jnp.where(can, 0, res['n_inter']),
            alive=res['alive'] | (can & (cell_new != ESCAPED)),
            chi=m(res['chi'], chi_n), kappa=m(res['kappa'], kappa_n),
            albedo=m(res['albedo'], alb_n))
        e_new = jnp.sum(jnp.where(can, new['energy'], 0.0))
        return dict(c, res=res, key=key, budget=c['budget'] - n_new,
                    energy_current=c['energy_current'] + e_new.astype(dtype))

    def physics(c):
        """One local transport event for resident lanes in the local slab
        (the replicated engine's step, minus MRW/reabs/self-check)."""
        p = c['res']
        key, k_dust, k_coin, k_nu, k_dir, k_mu, k_phi, k_tau = \
            jax.random.split(c['key'], 8)
        local = p['alive'] & (owner(p['cell']) == me)
        lcell = jnp.clip(p['cell'] - offset, 0, slab - 1)

        t_wall, next_cell, ax, wall_coord = geometry.find_wall(
            jnp.where(local, p['cell'], 0), p['x'], p['y'], p['z'],
            p['kx'], p['ky'], p['kz'])

        rho_rows = density_local[:, lcell].T
        chi_rho = jnp.sum(p['chi'] * rho_rows, axis=-1)
        tau_wall = chi_rho * t_wall
        hits_wall = (tau_wall < p['tau']) | (chi_rho <= 0.0)
        t_int = jnp.where(chi_rho > 0.0,
                          p['tau'] / jnp.maximum(chi_rho, 1e-300), t_wall)
        d_move = jnp.where(hits_wall, t_wall, t_int)

        energy_sum = c['energy_sum']
        dep_idx = jnp.where(local, lcell, slab)
        for d in range(n_dust):
            dep = jnp.where(local & (rho_rows[:, d] > 0.0),
                            d_move * p['kappa'][:, d] * p['energy'], 0.0)
            energy_sum = energy_sum.at[d, dep_idx].add(dep, mode='drop')

        x = jnp.where(local, p['x'] + d_move * p['kx'], p['x'])
        y = jnp.where(local, p['y'] + d_move * p['ky'], p['y'])
        z = jnp.where(local, p['z'] + d_move * p['kz'], p['z'])
        x, y, z = geometry.snap(x, y, z, ax, wall_coord, local & hits_wall)
        tau = jnp.where(local,
                        jnp.where(hits_wall, p['tau'] - tau_wall,
                                  jnp.zeros_like(p['tau'])), p['tau'])

        cell = jnp.where(local & hits_wall, next_cell, p['cell'])
        escaped = local & hits_wall & (cell == ESCAPED)
        n_photons_cell = c['n_photons_cell'].at[
            jnp.where(local & hits_wall & (owner(cell) == me),
                      jnp.clip(cell - offset, 0, slab - 1), slab)
        ].add(1, mode='drop')

        interacting = local & ~hits_wall
        d_sel = select_dust(k_dust, p['chi'], rho_rows)
        alb = jnp.take_along_axis(p['albedo'], d_sel[:, None], axis=-1)[:, 0]
        coin = jax.random.uniform(k_coin, alb.shape, dtype=dtype)
        scatter = coin <= alb

        var_id = jid_local[d_sel, lcell]
        var_frac = jfrac_local[d_sel, lcell]
        nu_em = sample_emission_nu(dt, d_sel, var_id, var_frac, k_nu)
        ex, ey, ez = isotropic_direction(k_dir, (B,), dtype)
        mu_s = sample_scattering_mu(dt, d_sel, p['nu'], k_mu)
        phi_s = jax.random.uniform(k_phi, (B,), dtype=dtype,
                                   maxval=2 * jnp.pi)
        sx, sy, sz = rotate_direction(p['kx'], p['ky'], p['kz'], mu_s, phi_s)

        absorbed = interacting & ~scatter
        scattered = interacting & scatter
        nu = jnp.where(absorbed, nu_em, p['nu'])
        kx = jnp.where(absorbed, ex, jnp.where(scattered, sx, p['kx']))
        ky = jnp.where(absorbed, ey, jnp.where(scattered, sy, p['ky']))
        kz = jnp.where(absorbed, ez, jnp.where(scattered, sz, p['kz']))
        chi_n, kappa_n, alb_n = update_optical_constants(dt, nu)
        chi = jnp.where(absorbed[:, None], chi_n, p['chi'])
        kappa = jnp.where(absorbed[:, None], kappa_n, p['kappa'])
        albedo = jnp.where(absorbed[:, None], alb_n, p['albedo'])

        cell_re = geometry.find_cell(x, y, z, kx, ky, kz)
        cell = jnp.where(interacting & (cell_re != ESCAPED), cell_re, cell)
        tau = jnp.where(interacting, random_exp(k_tau, (B,), dtype), tau)
        n_inter = p['n_inter'] + interacting.astype(jnp.int32)
        killed_now = interacting & (n_inter > config['n_inter_max'])
        alive = p['alive'] & ~escaped & ~killed_now

        res = dict(x=x, y=y, z=z, kx=kx, ky=ky, kz=kz, nu=nu,
                   energy=p['energy'], tau=tau, cell=cell, n_inter=n_inter,
                   alive=alive, chi=chi, kappa=kappa, albedo=albedo)
        return dict(c, res=res, key=key, energy_sum=energy_sum,
                    n_photons_cell=n_photons_cell,
                    killed_int=c['killed_int'] +
                    jnp.sum(killed_now.astype(c['killed_int'].dtype)))

    all_fields = _FIELDS + ('cell', 'n_inter', 'chi', 'kappa', 'albedo')

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
        all transit lanes waiting to land)."""
        res, trans = c['res'], c['trans']

        # 1) rotate the whole transit pool one hop around the ring
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        trans = {k: jax.lax.ppermute(v, axis_name, perm)
                 for k, v in trans.items()}

        # 2) arrivals land on dead OR emigrant resident lanes (swap)
        foreign = res['alive'] & (res['cell'] != ESCAPED) & \
            (owner(res['cell']) != me)
        arriving = trans['alive'] & (owner(trans['cell']) == me)
        slots = (~res['alive']) | foreign
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
            jax.lax.pmax(c['n_steps'], axis_name))


@lru_cache(maxsize=None)
def _spatial_fn(mesh, batch_size_per_device, config_tuple, axis_name):
    n_dev = mesh.devices.size

    def per_device(geometry, dt, st, density_l, jid_l, jfrac_l, key,
                   n_photons_arr):
        idx = jax.lax.axis_index(axis_name)
        share = n_photons_arr // n_dev + jnp.where(
            idx == 0, n_photons_arr % n_dev, 0)
        return lucy_iteration_spatial_impl(
            geometry, dt, st, density_l, jid_l, jfrac_l, key, share,
            batch_size_per_device, config_tuple, n_dev, axis_name)

    rep = P()
    cell_sharded = P(None, axis_name)
    fn = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, rep, cell_sharded, cell_sharded, cell_sharded,
                  rep, rep),
        out_specs=(cell_sharded, rep, P(axis_name), rep, rep),
        check_vma=False)
    return jax.jit(fn)


def run_lucy_iteration_spatial(mesh, geometry, dt, st, density, jnu_var_id,
                               jnu_var_frac, key, n_photons,
                               batch_size_per_device, config_tuple,
                               axis_name='dp'):
    """One Lucy iteration with the GRID sharded over the mesh (cell slabs)
    and packets exchanged via ppermute ring hops.

    Returns the same tuple layout as the replicated path's first five
    outputs: (energy_sum (n_dust, n_cells — logically sharded),
    energy_current, n_photons_cell, killed_int, n_steps)."""
    n_dev = mesh.devices.size
    n_cells = density.shape[1]
    if n_cells % n_dev != 0:
        raise ValueError("spatial sharding requires n_cells %% n_devices "
                         "== 0 (got %d cells on %d devices)"
                         % (n_cells, n_dev))
    fn = _spatial_fn(mesh, batch_size_per_device, config_tuple, axis_name)
    return fn(geometry, dt, st, density, jnu_var_id, jnu_var_frac, key,
              jnp.asarray(n_photons))
