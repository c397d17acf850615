"""The O(1) quantile-table samplers must reproduce the exact CDF inversion
statistically (they replace the binary-search CDF walks in the hot loop)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperion_tpu.dust import IsotropicDust, HenyeyGreensteinDust
from hyperion_tpu.transport import build_dust_tables, build_source_tables
from hyperion_tpu.transport.engine import (sample_emission_nu,
                                           sample_scattering_mu)
from hyperion_tpu.transport.sampling import (sample_cdf_rows2,
                                             sample_quantile_rows,
                                             quantile_table)
from hyperion_tpu.sources import PointSource


@pytest.mark.smoke
def test_quantile_table_inverts_cdf():
    """quantile_table + sample_quantile_rows == sample_cdf_rows2 for draws
    at matching uniforms (up to the K-bin discretization)."""
    rng = np.random.default_rng(7)
    x = np.sort(rng.uniform(1.0, 100.0, 40))
    pdf = rng.uniform(0.1, 1.0, 40)
    cdf = np.concatenate([[0.0], np.cumsum(
        0.5 * (pdf[1:] + pdf[:-1]) * np.diff(x))])
    cdf /= cdf[-1]
    q = jnp.asarray(quantile_table(x, cdf[None, :], 4097, log2=False))
    xi = jnp.asarray(rng.uniform(0, 1, 20000), jnp.float64)
    rows = jnp.zeros(20000, jnp.int32)
    exact = sample_cdf_rows2(jnp.asarray(x)[None, :],
                             jnp.asarray(cdf)[None, :], rows, xi)
    fast = sample_quantile_rows(q, rows, xi)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=2e-3, atol=1e-3)


def _moments(nu, w=None):
    nu = np.asarray(nu, float)
    return np.array([np.mean(np.log(nu)), np.std(np.log(nu))])


def test_emission_nu_matches_planck_moments():
    """Re-emission frequencies from the quantile tables follow the LTE
    emissivity distribution: check log-nu moments against a dense exact
    histogram built from the jnu CDF."""
    nu = np.logspace(8, 16, 64)
    dust = IsotropicDust(nu, np.repeat(0.5, 64), np.repeat(5.0, 64))
    dt = build_dust_tables([dust], dtype=jnp.float64)

    n = 200000
    key = jax.random.PRNGKey(3)
    var_id = jnp.full((n,), 600, jnp.int32)
    did = jnp.zeros((n,), jnp.int32)
    draw = sample_emission_nu(dt, did, var_id, jnp.zeros(n), key)

    # exact inverse of the same CDF row on a dense uniform grid
    row = np.asarray(dt.jnu_cdf[600])
    enu = np.asarray(dt.emiss_nu[0])
    u = (np.arange(n) + 0.5) / n
    exact = np.interp(u, np.maximum.accumulate(
        row + np.arange(len(row)) * 1e-15), np.log(enu))
    m_draw = _moments(draw)
    m_exact = np.array([exact.mean(), exact.std()])
    np.testing.assert_allclose(m_draw, m_exact, rtol=2e-3)


def test_scattering_mu_matches_hg_mean():
    """Sampled scattering cosines reproduce <mu> = g for a HG phase
    function within MC error."""
    nu = np.logspace(8, 16, 16)
    g = 0.6
    dust = HenyeyGreensteinDust(nu, np.repeat(0.5, 16), np.repeat(5.0, 16),
                                np.repeat(g, 16), np.repeat(1.0, 16))
    dt = build_dust_tables([dust], dtype=jnp.float64)
    n = 400000
    mu = sample_scattering_mu(dt, jnp.zeros((n,), jnp.int32),
                              jnp.full((n,), 1e12), jax.random.PRNGKey(5))
    mu = np.asarray(mu)
    assert abs(mu.mean() - g) < 5e-3, mu.mean()
    assert np.all(mu >= -1.0) and np.all(mu <= 1.0)


def test_source_spectrum_quantile_sampling():
    """Source frequency draws follow B_nu(T) (photon-energy weighted):
    compare the mean log-frequency against the exact quantile grid."""
    src = PointSource(luminosity=1.0, temperature=5000.0)
    st = build_source_tables([src], dtype=jnp.float64)
    from hyperion_tpu.transport.stable import emit_packets
    out = emit_packets(st, jax.random.PRNGKey(11), 200000, jnp.float64)
    draw = np.log(np.asarray(out['nu']))
    # distribution moments from the (cos-warped) inverse-CDF grid by
    # trapezoid integration over the CDF coordinate
    grid = np.log(np.asarray(st.spec_nu[0]))
    u = np.asarray(st.spec_cdf[0])
    du = np.diff(u)
    mean = np.sum(0.5 * (grid[1:] + grid[:-1]) * du)
    m2 = np.sum(0.5 * (grid[1:] ** 2 + grid[:-1] ** 2) * du)
    std = np.sqrt(m2 - mean ** 2)
    np.testing.assert_allclose([draw.mean(), draw.std()],
                               [mean, std], rtol=5e-3)


def test_bernoulli_var_bin_interpolation():
    """var_frac=0 and var_frac=1 must reproduce the pure-bin distributions,
    and var_frac=0.5 their even mixture (ref picks bin var_id/var_id+1 with
    probability frac)."""
    nu = np.logspace(8, 16, 32)
    dust = IsotropicDust(nu, np.repeat(0.5, 32), np.repeat(5.0, 32))
    dt = build_dust_tables([dust], dtype=jnp.float64)
    n = 150000
    did = jnp.zeros((n,), jnp.int32)
    key = jax.random.PRNGKey(9)
    lo = sample_emission_nu(dt, did, jnp.full((n,), 300, jnp.int32),
                            jnp.zeros(n), key)
    hi = sample_emission_nu(dt, did, jnp.full((n,), 300, jnp.int32),
                            jnp.ones(n), key)
    mid = sample_emission_nu(dt, did, jnp.full((n,), 300, jnp.int32),
                             jnp.full((n,), 0.5), key)
    m_lo = np.log(np.asarray(lo)).mean()
    m_hi = np.log(np.asarray(hi)).mean()
    m_mid = np.log(np.asarray(mid)).mean()
    assert m_hi > m_lo  # hotter bin emits bluer
    np.testing.assert_allclose(m_mid, 0.5 * (m_lo + m_hi),
                               atol=3 * abs(m_hi - m_lo) / np.sqrt(n) * 10)
