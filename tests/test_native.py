"""Native C++ host kernels (hyperion_tpu/native): build, bind, and agree
with the pure-Python fallbacks (ref native modules: _discretize_sph.c,
_integrate_core.c, _interpolate_core.c)."""

import numpy as np
import pytest

from hyperion_tpu import native
from hyperion_tpu.util.integrate import integrate_loglog
from hyperion_tpu.transport.sampling import interp_loglog as interp_jax


@pytest.mark.smoke
def test_native_builds_and_loads():
    assert native.available(), "g++ build of the native library failed"


def test_native_integrate_matches_numpy():
    rng = np.random.default_rng(1)
    x = np.logspace(0, 5, 200)
    y = np.abs(rng.lognormal(0, 1, 200))
    y[40:50] = 0.0  # zero segments contribute nothing
    ref = integrate_loglog(x, y)
    nat = native.integrate_loglog_native(x, y)
    assert nat is not None
    np.testing.assert_allclose(nat, ref, rtol=1e-12)


def test_native_interp_matches_jax():
    rng = np.random.default_rng(2)
    xt = np.logspace(0, 4, 50)
    yt = np.abs(rng.lognormal(0, 1, 50))
    q = np.sort(rng.uniform(0.5, 2e4, 1000))
    nat = native.interp_loglog_native(xt, yt, q)
    ref = np.asarray(interp_jax(xt, yt, q))
    np.testing.assert_allclose(nat, ref, rtol=1e-5)


def test_native_discretize_matches_fallback():
    rng = np.random.default_rng(3)
    n_cells, n_part = 60, 300
    lo = rng.uniform(-1, 0.8, (n_cells, 3))
    hi = lo + rng.uniform(0.05, 0.3, (n_cells, 3))
    mu = rng.uniform(-1, 1, (n_part, 3))
    sigma = rng.uniform(0.02, 0.2, n_part)
    mass = rng.uniform(0.5, 2.0, n_part)
    nat = native.discretize_sph(lo[:, 0], hi[:, 0], lo[:, 1], hi[:, 1],
                                lo[:, 2], hi[:, 2], mu[:, 0], mu[:, 1],
                                mu[:, 2], sigma, mass, cull=50.0)
    # force the numpy fallback by bypassing the loaded library
    saved, native._lib = native._lib, None
    saved_t, native._tried = native._tried, True
    try:
        ref = native.discretize_sph(lo[:, 0], hi[:, 0], lo[:, 1], hi[:, 1],
                                    lo[:, 2], hi[:, 2], mu[:, 0], mu[:, 1],
                                    mu[:, 2], sigma, mass)
    finally:
        native._lib, native._tried = saved, saved_t
    np.testing.assert_allclose(nat, ref, rtol=1e-10, atol=1e-13)


def test_sph_octree_exact_vs_mc():
    """Exact kernel discretization agrees with the Monte-Carlo estimate and
    conserves total particle mass."""
    from hyperion_tpu.importers.sph import construct_octree
    rng = np.random.default_rng(4)
    n = 400
    px, py, pz = rng.normal(0, 0.25, (3, n))
    sigma = np.full(n, 0.05)
    mass = np.full(n, 1.0 / n)
    g_exact = construct_octree(0., 0., 0., 1., 1., 1., px, py, pz, sigma,
                               mass, n_ref=32, method='exact')
    g_mc = construct_octree(0., 0., 0., 1., 1., 1., px, py, pz, sigma,
                            mass, n_ref=32, method='mc', mc_samples=64)
    refined = np.asarray(g_exact.refined, bool)
    centers, halves, _ = g_exact.tree_tables()
    vol = 8.0 * halves[:, 0] * halves[:, 1] * halves[:, 2]
    m_exact = (np.asarray(g_exact['density'][0].array) * vol)[~refined].sum()
    m_mc = (np.asarray(g_mc['density'][0].array) * vol)[~refined].sum()
    # nearly all mass falls inside the box
    assert abs(m_exact - 1.0) < 0.05
    assert abs(m_mc / m_exact - 1.0) < 0.05
