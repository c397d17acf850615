"""Forced-first-interaction sampler tests (ref: forced_interaction.f90)."""

import numpy as np
import jax
import jax.numpy as jnp

from hyperion_tpu.transport.ffi import (forced_interaction_wr99,
                                        forced_interaction_baes16,
                                        sample_first_interaction)


def test_wr99_distribution():
    tau_esc = jnp.full(200000, 3.0)
    tau, w = forced_interaction_wr99(jax.random.PRNGKey(0), tau_esc,
                                     jnp.float64)
    tau = np.asarray(tau)
    assert (tau >= 0).all() and (tau <= 3.0).all()
    assert np.allclose(np.asarray(w), 1 - np.exp(-3.0))
    # unbiased estimator of int_0^tau_esc e^-tau dtau for f = 1 (weights
    # constant) and of the truncated-exponential mean for f = tau
    mean_expected = (1 - 4 * np.exp(-3.0)) / (1 - np.exp(-3.0))
    assert abs(tau.mean() - mean_expected) < 0.01


def test_baes16_unbiased():
    """E[w f(tau)] under the composite-biased sampling equals
    E[f(tau)] under the forced (truncated-exponential) distribution
    times its normalization, for several f."""
    tau_esc = jnp.full(400000, 2.0)
    tau, w = forced_interaction_baes16(jax.random.PRNGKey(1), tau_esc, 0.5,
                                       jnp.float64)
    tau = np.asarray(tau)
    w = np.asarray(w)
    assert (tau >= 0).all() and (tau <= 2.0).all()
    # f = 1: integral of e^-tau on [0, 2]
    assert abs(w.mean() - (1 - np.exp(-2.0))) < 0.005
    # f = tau: integral of tau e^-tau on [0, 2]
    expected = 1 - 3 * np.exp(-2.0)
    assert abs((w * tau).mean() - expected) < 0.01


def test_baes16_xi_limits():
    """xi -> 0 reduces to WR99."""
    tau_esc = jnp.full(100000, 1.5)
    t0, w0 = forced_interaction_baes16(jax.random.PRNGKey(2), tau_esc, 0.0,
                                       jnp.float64)
    tw, ww = forced_interaction_wr99(jax.random.PRNGKey(2), tau_esc,
                                     jnp.float64)
    assert abs(float(jnp.mean(t0)) - float(jnp.mean(tw))) < 0.01
    assert np.allclose(np.asarray(w0), np.asarray(ww), rtol=1e-6)


def test_dispatch_fallback():
    """Lanes where FFI does not apply draw a plain exponential."""
    tau_esc = jnp.asarray([5.0, 0.0])
    applies = jnp.asarray([True, False])
    tau, w = sample_first_interaction(jax.random.PRNGKey(3), tau_esc,
                                      applies, 'baes16', 0.3, jnp.float64)
    assert float(w[1]) == 1.0
    assert float(tau[0]) <= 5.0
