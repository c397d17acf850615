"""Pallas TPU kernels for the transport loop's per-cell statistics.

The fused Monte-Carlo step spends most of its time in per-cell bookkeeping
(energy deposit, unique-visit accounting, quantile-table fetches): XLA
lowers each of those to either a serialized per-lane scatter/gather
(~10 ns/lane) or a (B, n_cells) one-hot materialized through HBM.  These
kernels do the same jobs on-chip: the one-hot mask never leaves VMEM, and
the flat cell index is FACTORED as ``cell = c2 * 128 + c1`` so the masks
are (128, B) and (n_cells/128, B) instead of (n_cells, B) — the matmuls
then run at MXU throughput with O((128 + NC/128) * B) mask-build cost.
The factoring is geometry-agnostic: it works for any flat cell space
(structured grids, octree, AMR, Voronoi alike).

Numerics: one-hot products at ``Precision.HIGHEST`` are bit-exact for
moderate-exponent values (covers uids/counts < 2^24 and the log2/mu
quantile tables) and <5e-7 relative otherwise — the only other deviation
from the serialized scatter is the f32 accumulation order.

Parity anchor: these replace the inner bookkeeping of the reference's
propagation loop (ref: specific_energy_sum updates and last_photon_id
dedup, src/grid/grid_propagate_3d.f90:91-97,153-155) with batched MXU
operations; the physics semantics are identical.

Availability: TPU backends only (``is_available()``); every caller keeps
the pure-XLA path as fallback, and unit tests compare the two exactly
(tests/test_pallas_ops.py).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

_C1 = 128  # minor factor of the cell index: matches the TPU lane width


@functools.cache
def is_available():
    """True when a TPU backend (including the tunneled 'axon' plugin) is
    the default JAX backend, so Mosaic kernels can compile."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ('tpu', 'axon')


def _pad_cells(n_cells):
    g = -(-int(n_cells) // _C1)
    return g, g * _C1


# ---------------------------------------------------------------------------
# deposit + unique-visit statistics
# ---------------------------------------------------------------------------

def _deposit_visit_kernel(dep_ref, cdep_ref, enter_ref, uid_ref, luid_ref,
                          dep_out_ref, cnt_out_ref, luid_out_ref,
                          *, n_dust, G, B):
    f32 = jnp.float32
    high = jax.lax.Precision.HIGHEST

    cdep = cdep_ref[...].reshape(1, B)
    enter = enter_ref[...].reshape(1, B)
    uid = uid_ref[...].reshape(1, B).astype(f32)

    # factored one-hot masks for the deposit cell
    io1 = jax.lax.broadcasted_iota(jnp.int32, (_C1, B), 0)
    ioG = jax.lax.broadcasted_iota(jnp.int32, (G, B), 0)
    oh1_d = (io1 == (cdep % _C1)).astype(f32)          # (128, B)
    oh2_d = (ioG == (cdep // _C1)).astype(f32)         # (G, B)

    # deposits: (G, B) * dep -> contract lanes against (128, B) -> (G, 128)
    for d in range(n_dust):
        dep_d = dep_ref[d, :].reshape(1, B)
        a = oh2_d * dep_d
        dep_out_ref[d, :, :] = jax.lax.dot_general(
            a, oh1_d, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=high)

    # entering-cell masks (enter == n_cells for non-entering lanes: the
    # pad/out-of-range slot drops naturally)
    oh1_e = (io1 == (enter % _C1)).astype(f32)
    oh2_e = (ioG == (enter // _C1)).astype(f32)

    # previous uid of each lane's entered cell: select the lane's c2 row
    # from the (G, 128) table, then its c1 column
    luid_f = luid_ref[...].astype(f32)                 # (G, 128)
    t = jax.lax.dot_general(                           # (128, B)
        luid_f, oh2_e, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32, precision=high)
    prev = jnp.sum(t * oh1_e, axis=0, keepdims=True)   # (1, B)
    fresh = (prev != uid).astype(f32)

    # fresh-visit counts per cell: exact 0/1 products
    cnt_out_ref[...] = jax.lax.dot_general(
        oh2_e * fresh, oh1_e, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32, precision=high)

    # last-uid update, winner = max entering uid per cell (the same
    # deterministic tie-break as engine.visit_update's compare-sum path).
    # z carries uid+3 (> 0) on entering lanes; per c2 row a masked
    # lane-max picks the winner, 0 means "no entrant, keep the old uid".
    uid_i = uid_ref[...].reshape(1, B)
    c2e = enter // _C1
    z = jnp.where(oh1_e > 0, (uid_i + 3).astype(f32), 0.0)   # (128, B)
    for g in range(G):
        zg = jnp.where(c2e == g, z, 0.0)
        win = jnp.max(zg, axis=1)                            # (128,)
        old = luid_ref[g, :].astype(f32)
        luid_out_ref[g, :] = jnp.where(
            win > 0, win - 3, old).astype(jnp.int32)


def deposit_visit(energy_sum, n_photons_cell, last_uid_cell, cell_dep,
                  dep_rows, enter_idx, uid, interpret=False):
    """Fused deposit + unique-visit statistics on the MXU.

    Semantically equivalent to::

        for d: energy_sum = energy_sum.at[d, cell_dep].add(dep_rows[d])
        fresh = last_uid_cell[enter_idx] != uid
        n_photons_cell += histogram(enter_idx where fresh)
        last_uid_cell = last_uid_cell.at[enter_idx].set(uid, mode='drop')

    ``cell_dep`` must be in [0, n_cells) (inactive lanes carry dep == 0);
    ``enter_idx`` uses >= n_cells as the drop slot.  ``last_uid_cell`` must
    already be in the PADDED flat layout (ceil((n_cells+1)/128)*128,) —
    see :func:`pad_cells_for_visit`; winner on collision = max uid, the
    same deterministic tie-break as engine.visit_update.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_dust, n_cells = energy_sum.shape
    B = cell_dep.shape[0]
    n_pad = int(last_uid_cell.shape[0])
    G = n_pad // _C1
    assert G * _C1 == n_pad and n_pad > n_cells

    kernel = functools.partial(_deposit_visit_kernel, n_dust=n_dust, G=G,
                               B=B)
    dep_add, cnt_add, luid_new = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n_dust, G, _C1), jnp.float32),
                   jax.ShapeDtypeStruct((G, _C1), jnp.float32),
                   jax.ShapeDtypeStruct((G, _C1), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
        interpret=interpret,
    )(dep_rows.astype(jnp.float32), cell_dep.astype(jnp.int32),
      enter_idx.astype(jnp.int32), uid.astype(jnp.int32),
      last_uid_cell.reshape(G, _C1))

    energy_sum = energy_sum + dep_add.reshape(n_dust, n_pad)[:, :n_cells]
    n_photons_cell = n_photons_cell + cnt_add.reshape(
        n_pad)[:n_cells].astype(n_photons_cell.dtype)
    return energy_sum, n_photons_cell, luid_new.reshape(n_pad)


def pad_cells_for_visit(n_cells):
    """Padded last-uid table length for :func:`deposit_visit`: room for
    the n_cells real slots plus the drop slot, rounded to the lane width."""
    return -(-int(n_cells + 1) // _C1) * _C1
