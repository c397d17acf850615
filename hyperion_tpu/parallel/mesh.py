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

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(devices=None, axis_name='dp'):
    """A 1-D device mesh over all (or the given) local devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def run_lucy_iteration_sharded(mesh, geometry, dt, st, density, jnu_var_id,
                               jnu_var_frac, key, n_photons,
                               batch_size_per_device, config_tuple,
                               axis_name='dp'):
    """One Lucy iteration with packets sharded over the mesh.

    ``n_photons`` is the total budget; it is split evenly across devices
    (remainder to device 0). Accumulators come back fully reduced
    (psum), so results are identical in layout to the single-device path.
    """
    from ..transport.engine import lucy_iteration_impl

    n_dev = mesh.devices.size

    def per_device(geometry, dt, st, density, jnu_var_id, jnu_var_frac, key,
                   n_photons_arr):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key, idx)
        share = n_photons_arr // n_dev + jnp.where(
            idx == 0, n_photons_arr % n_dev, 0)
        out = lucy_iteration_impl(geometry, dt, st, density, jnu_var_id,
                                  jnu_var_frac, key, share,
                                  batch_size_per_device, config_tuple)
        energy_sum, energy_current, n_photons_cell, killed_int, killed_geo, \
            n_steps = out
        # The reference's mp_collect_physical_arrays + mp_sync
        energy_sum = jax.lax.psum(energy_sum, axis_name)
        energy_current = jax.lax.psum(energy_current, axis_name)
        n_photons_cell = jax.lax.psum(n_photons_cell, axis_name)
        killed_int = jax.lax.psum(killed_int, axis_name)
        killed_geo = jax.lax.psum(killed_geo, axis_name)
        n_steps = jax.lax.pmax(n_steps, axis_name)
        return (energy_sum, energy_current, n_photons_cell, killed_int,
                killed_geo, n_steps)

    rep = P()
    fn = jax.shard_map(per_device, mesh=mesh,
                       in_specs=(rep, rep, rep, rep, rep, rep, rep, rep),
                       out_specs=rep, check_vma=False)
    return jax.jit(fn)(geometry, dt, st, density, jnu_var_id, jnu_var_frac,
                       key, jnp.asarray(n_photons))
