"""Unit tests for the TPU-oriented sampling/lookup primitives: every
gather-replacement (compare-sum selects, one-hot matmuls, small-row
searchsorted) must agree exactly with the plain indexing it replaces —
these carry the transport loop's numerics (see sampling.py docstrings)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperion_tpu.transport.sampling import (
    select_small, gather_rows_matmul, scatter_add_matmul,
    searchsorted_rows, searchsorted_small, sample_quantile_rows,
    quantile_table)


def test_select_small_matches_indexing():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=37))
    j = jnp.asarray(rng.integers(0, 37, 500), jnp.int32)
    np.testing.assert_array_equal(np.asarray(select_small(table, j)),
                                  np.asarray(table)[np.asarray(j)])


def test_select_small_2d_lanes():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=16))
    j = jnp.asarray(rng.integers(0, 16, (4, 50)), jnp.int32)
    np.testing.assert_array_equal(np.asarray(select_small(table, j)),
                                  np.asarray(table)[np.asarray(j)])


def test_gather_rows_matmul_exact():
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(60, 33)) * 100, jnp.float64)
    rows = jnp.asarray(rng.integers(0, 60, 700), jnp.int32)
    out = gather_rows_matmul(table, rows)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(table)[np.asarray(rows)])


def test_gather_rows_matmul_fallback_large():
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.normal(size=(2000, 4)))
    rows = jnp.asarray(rng.integers(0, 2000, 100), jnp.int32)
    out = gather_rows_matmul(table, rows, max_rows=1024)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(table)[np.asarray(rows)])


@pytest.mark.parametrize('ndim_vals', [1, 2])
def test_scatter_add_matmul_matches_scatter(ndim_vals):
    rng = np.random.default_rng(4)
    n, B = 90, 1200
    idx = jnp.asarray(rng.integers(0, n + 1, B), jnp.int32)  # incl. drop
    if ndim_vals == 1:
        vals = jnp.asarray(rng.random(B))
        acc = jnp.asarray(rng.random(n))
        want = acc.at[idx].add(vals, mode='drop')
    else:
        vals = jnp.asarray(rng.random((3, B)))
        acc = jnp.asarray(rng.random((3, n)))
        want = acc
        for d in range(3):
            want = want.at[d, idx].add(vals[d], mode='drop')
    got = scatter_add_matmul(acc, idx, vals)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12)


def test_searchsorted_rows_small_path_matches_binary():
    rng = np.random.default_rng(5)
    n_rows, n_cols = 3, 24            # small path: n_rows <= 8
    table = jnp.asarray(np.sort(rng.normal(size=(n_rows, n_cols)), axis=1))
    rows = jnp.asarray(rng.integers(0, n_rows, 400), jnp.int32)
    x = jnp.asarray(rng.normal(size=400))
    got = np.asarray(searchsorted_rows(table, rows, x))
    want = np.array([np.searchsorted(np.asarray(table)[r], xi, side='right')
                     for r, xi in zip(np.asarray(rows), np.asarray(x))])
    np.testing.assert_array_equal(got, want)


def test_searchsorted_rows_binary_path_matches_numpy():
    rng = np.random.default_rng(6)
    n_rows, n_cols = 20, 300          # binary path: n_rows > 8
    table = jnp.asarray(np.sort(rng.normal(size=(n_rows, n_cols)), axis=1))
    rows = jnp.asarray(rng.integers(0, n_rows, 300), jnp.int32)
    x = jnp.asarray(rng.normal(size=300))
    got = np.asarray(searchsorted_rows(table, rows, x))
    want = np.array([np.searchsorted(np.asarray(table)[r], xi, side='right')
                     for r, xi in zip(np.asarray(rows), np.asarray(x))])
    np.testing.assert_array_equal(got, want)


def test_searchsorted_small_side_semantics():
    table = jnp.asarray([0.0, 1.0, 1.0, 2.0])
    x = jnp.asarray([1.0, 0.5, 2.5, -1.0])
    np.testing.assert_array_equal(
        np.asarray(searchsorted_small(table, x, side='right')),
        np.searchsorted(np.asarray(table), np.asarray(x), side='right'))
    np.testing.assert_array_equal(
        np.asarray(searchsorted_small(table, x, side='left')),
        np.searchsorted(np.asarray(table), np.asarray(x), side='left'))


def test_sample_quantile_rows_inverts_cdf():
    """Round-trip: build a quantile table from an analytic CDF and check the
    sampled values reproduce the inverse CDF to table resolution."""
    x = np.linspace(0.0, 4.0, 400)
    cdf = 1.0 - np.exp(-x)
    cdf /= cdf[-1]
    qt = jnp.asarray(quantile_table(x, cdf[None, :], 257))
    xi = jnp.asarray(np.linspace(0.005, 0.995, 300))
    rows = jnp.zeros(300, jnp.int32)
    got = np.asarray(sample_quantile_rows(qt, rows, xi))
    want = np.interp(np.asarray(xi), cdf, x)
    np.testing.assert_allclose(got, want, atol=2e-3)
