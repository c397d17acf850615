"""Pallas kernel equivalence tests (CPU interpreter mode).

The deposit_visit kernel replaces the engine's scatter/gather visit
bookkeeping (engine.visit_update + the deposit scatter); these tests pin
its semantics against a plain-numpy model of the same update so a kernel
regression fails fast without TPU hardware (interpret=True runs the
kernel logic on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hyperion_tpu.transport.pallas_ops import (deposit_visit,
                                               pad_cells_for_visit)


def _reference(es, npc, luid, cell_dep, dep_rows, enter, uid):
    """Numpy model: scatter-add deposits; unique-visit counts against the
    pre-update table; winner on collision = max uid."""
    es = np.array(es, np.float64)
    npc = np.array(npc, np.int64)
    luid = np.array(luid, np.int64)
    n_cells = es.shape[1]
    for d in range(es.shape[0]):
        np.add.at(es[d], cell_dep, dep_rows[d])
    fresh = luid[enter] != uid
    sel = (enter < n_cells) & fresh
    np.add.at(npc, enter[sel], 1)
    for c in np.unique(enter):
        luid[c] = uid[enter == c].max()
    return es, npc, luid


@pytest.mark.parametrize('n_dust', [1, 2])
@pytest.mark.parametrize('n_cells', [96, 1000])
def test_deposit_visit_matches_reference(n_dust, n_cells):
    rng = np.random.default_rng(42)
    B = 512
    cell_dep = rng.integers(0, n_cells, B).astype(np.int32)
    dep_rows = rng.random((n_dust, B)).astype(np.float32)
    enter = rng.integers(0, n_cells + 1, B).astype(np.int32)
    uid = rng.integers(0, 1 << 20, B).astype(np.int32)
    NP = pad_cells_for_visit(n_cells)
    es0 = jnp.zeros((n_dust, n_cells), jnp.float32)
    npc0 = jnp.zeros((n_cells,), jnp.int32)
    luid0 = jnp.full((NP,), -2, jnp.int32)

    es, npc, luid = deposit_visit(es0, npc0, luid0, jnp.asarray(cell_dep),
                                  jnp.asarray(dep_rows), jnp.asarray(enter),
                                  jnp.asarray(uid), interpret=True)
    es_r, npc_r, luid_r = _reference(np.zeros((n_dust, n_cells)),
                                     np.zeros(n_cells, np.int64),
                                     np.full(NP, -2, np.int64),
                                     cell_dep, dep_rows, enter, uid)
    np.testing.assert_allclose(np.asarray(es), es_r, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(npc), npc_r.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(luid), luid_r.astype(np.int32))


def test_deposit_visit_second_pass_dedups():
    """A second batch of the same photons entering the same cells must not
    recount (last_uid now matches)."""
    B, n_cells = 256, 200
    rng = np.random.default_rng(7)
    enter = rng.integers(0, n_cells, B).astype(np.int32)
    uid = rng.integers(0, 1 << 16, B).astype(np.int32)
    NP = pad_cells_for_visit(n_cells)
    es0 = jnp.zeros((1, n_cells), jnp.float32)
    dep = jnp.zeros((1, B), jnp.float32)
    npc = jnp.zeros((n_cells,), jnp.int32)
    luid = jnp.full((NP,), -2, jnp.int32)
    cd = jnp.zeros((B,), jnp.int32)
    _, npc, luid = deposit_visit(es0, npc, luid, cd, dep,
                                 jnp.asarray(enter), jnp.asarray(uid),
                                 interpret=True)
    first = np.asarray(npc).sum()
    assert first > 0
    # replay with each cell's WINNER uid only: no fresh visits
    winner = np.asarray(luid)[np.minimum(enter, NP - 1)].astype(np.int32)
    _, npc2, _ = deposit_visit(es0, npc, luid, cd, dep, jnp.asarray(enter),
                               jnp.asarray(winner), interpret=True)
    # lanes whose uid was not the winner still count once more; lanes with
    # the winner uid must not
    assert np.asarray(npc2).sum() == first
