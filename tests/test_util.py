import numpy as np
import pytest

from hyperion_tpu.util.integrate import (integrate, integrate_loglog,
                                         integrate_loglin, integrate_linlog,
                                         integrate_loglog_subset,
                                         integrate_subset, integrate_powerlaw,
                                         integrate_loglog2d)
from hyperion_tpu.util.interpolate import (interp1d_fast, interp1d_fast_loglog,
                                           interp1d_fast_linlog, interp2d_fast)
from hyperion_tpu.util.functions import (B_nu, dB_nu_dT, planck_nu_range,
                                         nu_common, FreezableClass)
from hyperion_tpu.util.constants import sigma, pi


def test_integrate_linear():
    x = np.linspace(0.0, 1.0, 100)
    assert np.isclose(integrate(x, 2 * x), 1.0)


def test_integrate_loglog_powerlaw():
    # On x^-2, log-log integration is exact at any sampling
    x = np.logspace(0, 3, 7)
    y = x ** -2.0
    expected = integrate_powerlaw(1.0, 1000.0, -2.0)
    assert np.isclose(integrate_loglog(x, y), expected, rtol=1e-12)


def test_integrate_loglog_xinv():
    # The b == -1 special case
    x = np.logspace(0, 2, 5)
    y = 1.0 / x
    assert np.isclose(integrate_loglog(x, y), np.log(100.0), rtol=1e-12)


def test_integrate_loglog_zero_segments():
    x = np.array([1.0, 2.0, 4.0, 8.0])
    y = np.array([0.0, 1.0, 1.0, 0.0])
    # Only the middle segment contributes
    assert np.isclose(integrate_loglog(x, y), 2.0)


def test_integrate_loglin_exact():
    # y = ln(x) is linear in (log x, y); integral of ln x = x ln x - x
    x = np.logspace(0, 1, 4)
    y = np.log(x)
    expected = 10 * np.log(10.0) - 10 + 1
    assert np.isclose(integrate_loglin(x, y), expected, rtol=1e-12)


def test_integrate_linlog_exact():
    # y = exp(x) is linear in (x, log y)
    x = np.linspace(0.0, 2.0, 5)
    y = np.exp(x)
    assert np.isclose(integrate_linlog(x, y), np.exp(2.0) - 1.0, rtol=1e-12)


def test_integrate_subset():
    x = np.linspace(0.0, 1.0, 101)
    y = np.ones_like(x)
    assert np.isclose(integrate_subset(x, y, 0.25, 0.751), 0.501)


def test_integrate_loglog_subset_powerlaw():
    x = np.logspace(0, 3, 10)
    y = x ** -1.5
    expected = integrate_powerlaw(2.0, 500.0, -1.5)
    assert np.isclose(integrate_loglog_subset(x, y, 2.0, 500.0), expected,
                      rtol=1e-12)


def test_integrate_loglog2d_matches_1d():
    x = np.logspace(0, 2, 20)
    ys = np.vstack([x ** -2, x ** -1, 3 * x ** 0.5])
    rows = integrate_loglog2d(x, ys)
    for i in range(3):
        assert np.isclose(rows[i], integrate_loglog(x, ys[i]), rtol=1e-12)


def test_interp1d_fast():
    x = np.array([0.0, 1.0, 2.0])
    y = np.array([0.0, 10.0, 40.0])
    assert np.isclose(interp1d_fast(x, y, 0.5), 5.0)
    vals = interp1d_fast(x, y, np.array([0.5, 1.5]))
    assert np.allclose(vals, [5.0, 25.0])


def test_interp1d_fast_loglog_powerlaw():
    x = np.logspace(0, 2, 3)
    y = x ** -2
    assert np.isclose(interp1d_fast_loglog(x, y, 5.0), 5.0 ** -2, rtol=1e-12)


def test_interp1d_fast_loglog_zero():
    x = np.array([1.0, 10.0, 100.0])
    y = np.array([0.0, 1.0, 1.0])
    assert interp1d_fast_loglog(x, y, 3.0) == 0.0


def test_interp1d_linlog():
    x = np.array([0.0, 1.0])
    y = np.array([1.0, np.e])
    assert np.isclose(interp1d_fast_linlog(x, y, 0.5), np.exp(0.5), rtol=1e-12)


def test_interp2d():
    x = np.array([0.0, 1.0])
    y = np.array([0.0, 1.0])
    z = np.array([[0.0, 1.0], [1.0, 2.0]])  # z = x + y
    assert np.isclose(interp2d_fast(x, y, z, 0.25, 0.5), 0.75)


def test_planck_integral():
    # Integral of pi*B_nu over nu = sigma T^4
    T = 731.0
    nu = planck_nu_range(T)
    total = integrate_loglog(nu, pi * B_nu(nu, T))
    assert np.isclose(total, sigma * T ** 4, rtol=1e-2)


def test_db_nu_dt_consistency():
    T = 100.0
    nu = planck_nu_range(T)
    dT = 1e-4 * T
    numeric = (B_nu(nu, T + dT) - B_nu(nu, T - dT)) / (2 * dT)
    analytic = dB_nu_dT(nu, T)
    sel = B_nu(nu, T) > B_nu(nu, T).max() * 1e-6
    assert np.allclose(numeric[sel], analytic[sel], rtol=1e-5)


def test_nu_common_dedup():
    out = nu_common(np.array([1.0, 2.0]), np.array([2.0 * (1 + 1e-12), 3.0]))
    assert len(out) == 3


def test_freezable():
    class Thing(FreezableClass):
        def __init__(self):
            self.a = 1
            self._freeze()

    t = Thing()
    t.a = 2
    with pytest.raises(AttributeError):
        t.b = 3
