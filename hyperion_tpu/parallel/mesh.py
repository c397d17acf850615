"""Multi-device photon-batch data parallelism over a JAX mesh.

TPU-native replacement for the reference's MPI layer
(ref: src/mpi/mpi_routines.f90:62-471): the dynamic master-worker photon
scheduler disappears — each device runs the same fused while_loop on its own
packet batch with a folded-in RNG stream (the analog of ``set_seed(seed +
rank)``, mpi_routines.f90:266-270), and the three MPI reduction patterns
(collect_physical_arrays / sync scalars / collect_images) become ``psum``
collectives over the 'dp' mesh axis. Grid state and dust/source tables are
replicated, exactly like the reference's replicated-memory design.
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(devices=None, axis_name='dp'):
    """A 1-D device mesh over all (or the given) local devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def resolve_mesh(parallel):
    """Map the user-facing ``parallel`` setting (False/True/int) onto a
    device mesh, or None for the single-device path (the analog of the
    launcher's ``-m n`` MPI flag, ref scripts/hyperion:60-92)."""
    if parallel in (False, None, 0, 1):
        return None
    devices = jax.devices()
    if parallel is True:
        n = len(devices)
    else:
        n = int(parallel)
        if n > len(devices):
            raise ValueError("requested %d devices but only %d available"
                             % (n, len(devices)))
    if n == 1:
        return None
    return make_mesh(devices[:n])


@lru_cache(maxsize=None)
def _lucy_sharded_fn(mesh, batch_size_per_device, config_tuple, has_mrw,
                     has_se_rho, has_spec, axis_name):
    from ..transport.engine import lucy_iteration_impl

    n_dev = mesh.devices.size

    def per_device(geometry, dt, st, density, jnu_var_id, jnu_var_frac, key,
                   n_photons_arr, mrw_tables, se_rho, spec_bins,
                   spec_bin_frac):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key, idx)
        share = n_photons_arr // n_dev + jnp.where(
            idx == 0, n_photons_arr % n_dev, 0)
        out = lucy_iteration_impl(geometry, dt, st, density, jnu_var_id,
                                  jnu_var_frac, key, share,
                                  batch_size_per_device, config_tuple,
                                  mrw=mrw_tables if has_mrw else None,
                                  se_rho=se_rho if has_se_rho else None,
                                  spec_bins=spec_bins if has_spec else None,
                                  spec_bin_frac=spec_bin_frac
                                  if has_spec and has_mrw else None)
        energy_sum, energy_current, n_photons_cell, killed_int, killed_geo, \
            n_steps, energy_sum_spec, n_events = out
        # The reference's mp_collect_physical_arrays + mp_sync
        energy_sum = jax.lax.psum(energy_sum, axis_name)
        energy_sum_spec = jax.lax.psum(energy_sum_spec, axis_name)
        energy_current = jax.lax.psum(energy_current, axis_name)
        n_photons_cell = jax.lax.psum(n_photons_cell, axis_name)
        killed_int = jax.lax.psum(killed_int, axis_name)
        killed_geo = jax.lax.psum(killed_geo, axis_name)
        n_steps = jax.lax.pmax(n_steps, axis_name)
        n_events = jax.lax.psum(n_events, axis_name)
        return (energy_sum, energy_current, n_photons_cell, killed_int,
                killed_geo, n_steps, energy_sum_spec, n_events)

    rep = P()
    fn = jax.shard_map(per_device, mesh=mesh, in_specs=(rep,) * 12,
                       out_specs=rep, check_vma=False)
    return jax.jit(fn)


def run_lucy_iteration_sharded(mesh, geometry, dt, st, density, jnu_var_id,
                               jnu_var_frac, key, n_photons,
                               batch_size_per_device, config_tuple,
                               mrw=None, se_rho=None, spec_bins=None,
                               spec_bin_frac=None, axis_name='dp'):
    """One Lucy iteration with packets sharded over the mesh.

    ``n_photons`` is the total budget; it is split evenly across devices
    (remainder to device 0). Accumulators come back fully reduced
    (psum), so results are identical in layout to the single-device path.
    """
    fn = _lucy_sharded_fn(mesh, batch_size_per_device, config_tuple,
                          mrw is not None, se_rho is not None,
                          spec_bins is not None, axis_name)
    one = jnp.zeros((1,))
    return fn(geometry, dt, st, density, jnu_var_id, jnu_var_frac,
              key, jnp.asarray(n_photons), mrw,
              se_rho if se_rho is not None else jnp.zeros_like(density),
              spec_bins if spec_bins is not None else one,
              spec_bin_frac if spec_bin_frac is not None else one)


@lru_cache(maxsize=None)
def _final_sharded_fn(mesh, batch_size_per_device, config_tuple, binned_dims,
                      has_se_rho, has_mrw, axis_name):
    from ..transport.imaging import final_iteration_impl

    n_dev = mesh.devices.size

    def per_device(geometry, dt, st, density, jnu_var_id, jnu_var_frac,
                   groups, key, n_photons_arr, binned_group_arg, se_rho,
                   mrw_tables):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key, idx)
        share = n_photons_arr // n_dev + jnp.where(
            idx == 0, n_photons_arr % n_dev, 0)
        accums, binned_acc, energy_current, killed_int, n_steps = \
            final_iteration_impl(geometry, dt, st, density, jnu_var_id,
                                 jnu_var_frac, groups, key, share,
                                 batch_size_per_device, config_tuple,
                                 binned_group=binned_group_arg,
                                 binned_dims=binned_dims,
                                 se_rho=se_rho if has_se_rho else None,
                                 mrw=mrw_tables if has_mrw else None)
        # the reference's image-cube reduction (value, sum², count channels
        # all SUM-reduce; ref mp_collect_images, mpi_routines.f90:363-471)
        accums = jax.lax.psum(accums, axis_name)
        if binned_acc is not None:
            binned_acc = jax.lax.psum(binned_acc, axis_name)
        energy_current = jax.lax.psum(energy_current, axis_name)
        killed_int = jax.lax.psum(killed_int, axis_name)
        n_steps = jax.lax.pmax(n_steps, axis_name)
        return accums, binned_acc, energy_current, killed_int, n_steps

    rep = P()
    fn = jax.shard_map(per_device, mesh=mesh, in_specs=(rep,) * 12,
                       out_specs=rep, check_vma=False)
    return jax.jit(fn)


def run_final_sharded(mesh, geometry, dt, st, density, jnu_var_id,
                      jnu_var_frac, groups, key, n_photons,
                      batch_size_per_device, config_tuple,
                      binned_group=None, binned_dims=None, se_rho=None,
                      mrw=None, axis_name='dp'):
    """Imaging iteration with packets sharded over the mesh; image/SED flux
    cubes come back fully psum-reduced."""
    fn = _final_sharded_fn(mesh, batch_size_per_device, config_tuple,
                           binned_dims, se_rho is not None, mrw is not None,
                           axis_name)
    return fn(geometry, dt, st, density, jnu_var_id, jnu_var_frac,
              list(groups), key, jnp.asarray(n_photons), binned_group,
              se_rho if se_rho is not None else jnp.zeros_like(density),
              mrw)


@lru_cache(maxsize=None)
def _mono_sharded_fn(mesh, batch_size_per_device, config_tuple, mode,
                     axis_name):
    from ..transport.mono import mono_pass_impl

    n_dev = mesh.devices.size

    def per_device(geometry, dt, st, density, groups, accums, key,
                   n_photons_arr, nu_value, inu_global, chi_vec, albedo_vec,
                   src_energy, cell_cdf, mean_prob):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key, idx)
        share = n_photons_arr // n_dev + jnp.where(
            idx == 0, n_photons_arr % n_dev, 0)
        accums, killed_int, n_steps = mono_pass_impl(
            geometry, dt, st, density, groups, accums, key, share,
            batch_size_per_device, config_tuple, mode, nu_value, inu_global,
            chi_vec, albedo_vec, src_energy, cell_cdf, mean_prob)
        accums = jax.lax.psum(accums, axis_name)
        killed_int = jax.lax.psum(killed_int, axis_name)
        n_steps = jax.lax.pmax(n_steps, axis_name)
        return accums, killed_int, n_steps

    rep = P()
    fn = jax.shard_map(per_device, mesh=mesh, in_specs=(rep,) * 15,
                       out_specs=rep, check_vma=False)
    return jax.jit(fn)


def run_mono_pass_sharded(mesh, geometry, dt, st, density, groups, accums,
                          key, n_photons, batch_size_per_device,
                          config_tuple, mode, nu_value, inu_global, chi_vec,
                          albedo_vec, src_energy, cell_cdf, mean_prob,
                          axis_name='dp'):
    """One monochromatic (frequency, source|dust) pass sharded over the
    mesh, image cubes psum-reduced."""
    fn = _mono_sharded_fn(mesh, batch_size_per_device, config_tuple, mode,
                          axis_name)
    return fn(geometry, dt, st, density, list(groups), list(accums), key,
              jnp.asarray(n_photons), nu_value, inu_global, chi_vec,
              albedo_vec, src_energy, cell_cdf, mean_prob)


@lru_cache(maxsize=None)
def _ray_sharded_fn(mesh, batch_size_per_device, kind, axis_name):
    from ..transport.raytrace import (raytrace_source_batch_impl,
                                      raytrace_dust_batch_impl)

    n_dev = mesh.devices.size

    def per_device(args, key, n_active_arr):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key, idx)
        share = n_active_arr // n_dev + jnp.where(
            idx == 0, n_active_arr % n_dev, 0)
        if kind == 'source':
            out = raytrace_source_batch_impl(
                *args, key, batch_size_per_device, share)
        else:
            out = raytrace_dust_batch_impl(
                *args, key, batch_size_per_device, share)
        return jax.lax.psum(out, axis_name)

    rep = P()
    fn = jax.shard_map(per_device, mesh=mesh, in_specs=(rep, rep, rep),
                       out_specs=rep, check_vma=False)
    return jax.jit(fn)


def run_raytrace_source_sharded(mesh, geometry, dt, st, rt, groups, density,
                                key, batch_size_per_device, n_active,
                                axis_name='dp'):
    """One raytracing source trip over the mesh: every device traces its own
    batch_size_per_device lanes; flux cubes psum-reduce."""
    fn = _ray_sharded_fn(mesh, batch_size_per_device, 'source', axis_name)
    return fn((geometry, dt, st, rt, list(groups), density), key,
              jnp.asarray(n_active))


def run_raytrace_dust_sharded(mesh, geometry, dt, rt, var_grids, groups,
                              density, specific_energy, key,
                              batch_size_per_device, n_active,
                              axis_name='dp'):
    """One raytracing grid-thermal trip over the mesh (psum-reduced)."""
    fn = _ray_sharded_fn(mesh, batch_size_per_device, 'dust', axis_name)
    return fn((geometry, dt, rt, list(var_grids), list(groups), density,
               specific_energy), key, jnp.asarray(n_active))
