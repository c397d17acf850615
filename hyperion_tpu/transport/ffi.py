"""Forced first interaction algorithms, vectorized over packet lanes.

Two algorithms matching the reference (src/main/forced_interaction.f90):

- **WR99** (Wood & Reynolds 1999): truncated-exponential PDF on
  [0, tau_escape]; tau = -ln(1 - xi (1 - e^{-tau_esc})),
  weight = 1 - e^{-tau_esc} (ref :23-57).
- **Baes16** (Baes et al. 2016 composite biasing): PDF is a mixture of the
  truncated exponential and a uniform component with mixing parameter
  xi_b; the CDF alpha (1 - e^{-tau}) + beta tau is inverted by a
  fixed-trip-count bisection (the reference uses 60 steps; 40 reaches f32
  machine precision), weight = 1 / (alpha + beta e^{tau}) (ref :59-135).

Both are branchless over the batch: lanes where FFI does not apply
(tau_escape <= 1e-10) fall back to an ordinary exponential sample.
"""

import jax
import jax.numpy as jnp

from .sampling import random_exp

TAU_THRES = 1e-6


def forced_interaction_wr99(key, tau_escape, dtype):
    """Returns (tau, weight) per lane."""
    xi = jax.random.uniform(key, tau_escape.shape, dtype=dtype)
    one_minus_exp = jnp.where(tau_escape > TAU_THRES,
                              -jnp.expm1(-tau_escape), tau_escape)
    tau = -jnp.log1p(-xi * one_minus_exp)
    return tau, one_minus_exp


def forced_interaction_baes16(key, tau_escape, xi_b, dtype, n_bisect=60):
    """Returns (tau, weight) per lane; xi_b is the composite-biasing mixing
    parameter (0 -> pure WR99, 1 -> pure uniform)."""
    xi = jax.random.uniform(key, tau_escape.shape, dtype=dtype)
    one_minus_exp = jnp.where(tau_escape > TAU_THRES,
                              -jnp.expm1(-tau_escape), tau_escape)
    alpha = (1.0 - xi_b) / jnp.maximum(one_minus_exp, 1e-300)
    beta = xi_b / jnp.maximum(tau_escape, 1e-300)

    def body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        cdf = jnp.where(mid > TAU_THRES,
                        alpha * -jnp.expm1(-mid) + beta * mid,
                        (alpha + beta) * mid)
        above = cdf > xi
        return jnp.where(above, lo, mid), jnp.where(above, mid, hi)

    lo, hi = jax.lax.fori_loop(
        0, n_bisect, body,
        (jnp.zeros_like(tau_escape), tau_escape))
    tau = 0.5 * (lo + hi)
    weight = 1.0 / (alpha + beta * jnp.exp(tau))
    return tau, weight


def sample_first_interaction(key, tau_escape, applies, algorithm, xi_b,
                             dtype):
    """Dispatch (static algorithm string) with the ordinary-exponential
    fallback where FFI does not apply. Returns (tau, energy_factor)."""
    k_f, k_e = jax.random.split(key)
    if algorithm == 'baes16':
        tau_f, w = forced_interaction_baes16(k_f, tau_escape, xi_b, dtype)
    else:
        tau_f, w = forced_interaction_wr99(k_f, tau_escape, dtype)
    tau_plain = random_exp(k_e, tau_escape.shape, dtype)
    tau = jnp.where(applies, tau_f, tau_plain)
    weight = jnp.where(applies, w, jnp.ones_like(w))
    return tau, weight
