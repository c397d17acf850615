"""Polarized-scattering (Stokes) math validation
(ref: scatter_stokes / dust_scatter, dust_type_4elem.f90:446-691)."""

import numpy as np
import jax
import jax.numpy as jnp

from hyperion_tpu.dust import IsotropicDust, SphericalDust
from hyperion_tpu.transport import build_dust_tables
from hyperion_tpu.transport.stokes import (sample_scatter_stokes,
                                           peel_scatter_stokes,
                                           meridian_frame)


def rayleigh_dust():
    """Rayleigh scattering matrix on a fine mu grid."""
    d = SphericalDust()
    op = d.optical_properties
    n_mu = 201
    op.mu = np.linspace(-1.0, 1.0, n_mu)
    op.nu = np.logspace(5, 18, 8)
    op.albedo = np.repeat(0.5, 8)
    op.chi = np.repeat(1.0, 8)
    op.initialize_scattering_matrix()
    mu = op.mu[None, :]
    op.P1[:, :] = 0.75 * (1.0 + mu ** 2)
    op.P2[:, :] = -0.75 * (1.0 - mu ** 2)
    op.P3[:, :] = 1.5 * mu
    op.P4[:, :] = 0.0
    op._sort()
    return d


def tables(dust):
    return build_dust_tables([dust], dtype=jnp.float64)


def B(n, val=0.0):
    return jnp.full((n,), val, dtype=jnp.float64)


def test_meridian_frame_orthonormal():
    rng = np.random.RandomState(0)
    k = rng.normal(size=(3, 100))
    k /= np.linalg.norm(k, axis=0)
    kx, ky, kz = [jnp.asarray(v) for v in k]
    el, er = meridian_frame(kx, ky, kz)
    el = np.stack([np.asarray(c) for c in el])
    er = np.stack([np.asarray(c) for c in er])
    assert np.allclose((el * el).sum(0), 1.0)
    assert np.allclose((er * er).sum(0), 1.0)
    assert np.allclose((el * er).sum(0), 0.0, atol=1e-12)
    assert np.allclose((el * k).sum(0), 0.0, atol=1e-12)
    # right-handed: el x er == k
    cross = np.cross(el.T, er.T).T
    assert np.allclose(cross, k, atol=1e-12)


def test_isotropic_rotation_preserves_polarization_degree():
    dt = tables(IsotropicDust(np.logspace(5, 18, 8), np.repeat(0.5, 8),
                              np.repeat(1.0, 8)))
    n = 5000
    rng = np.random.RandomState(1)
    k = rng.normal(size=(3, n))
    k /= np.linalg.norm(k, axis=0)
    kx, ky, kz = [jnp.asarray(v) for v in k]
    q = B(n, 0.3)
    u = B(n, -0.2)
    v = B(n, 0.1)
    d_id = jnp.zeros(n, dtype=jnp.int32)
    nu = B(n, 1e12)
    nkx, nky, nkz, q2, u2, v2 = sample_scatter_stokes(
        dt, d_id, nu, jax.random.PRNGKey(0), kx, ky, kz, q, u, v)
    # isotropic matrix (P1=P3=1, P2=P4=0): pure frame rotations, so the
    # linear+circular polarization degree is exactly preserved
    p_in = np.sqrt(0.3 ** 2 + 0.2 ** 2 + 0.1 ** 2)
    p_out = np.sqrt(np.asarray(q2) ** 2 + np.asarray(u2) ** 2 +
                    np.asarray(v2) ** 2)
    assert np.allclose(p_out, p_in, rtol=1e-10)
    # circular polarization magnitude is also invariant (P4 = 0 and V
    # only mixes through P3=1)
    assert np.allclose(np.abs(np.asarray(v2)), 0.1, rtol=1e-10)
    # directions unit-norm
    nn = np.asarray(nkx) ** 2 + np.asarray(nky) ** 2 + np.asarray(nkz) ** 2
    assert np.allclose(nn, 1.0, rtol=1e-12)


def test_rayleigh_90deg_peel_fully_polarized_perpendicular():
    dt = tables(rayleigh_dust())
    n = 1
    kx, ky, kz = B(n, 1.0), B(n, 0.0), B(n, 0.0)   # travel along +x
    rx, ry, rz = B(n, 0.0), B(n, 1.0), B(n, 0.0)   # peel toward +y
    d_id = jnp.zeros(n, dtype=jnp.int32)
    nu = B(n, 1e12)
    wi, wq, wu, wv = peel_scatter_stokes(dt, d_id, nu, kx, ky, kz,
                                         B(n), B(n), B(n), rx, ry, rz)
    wi, wq, wu, wv = [float(np.asarray(w)[0]) for w in (wi, wq, wu, wv)]
    # Rayleigh at 90 deg: I = P1(0) = 0.75, fully linearly polarized
    assert abs(wi - 0.75) < 1e-4
    pol = np.sqrt(wq ** 2 + wu ** 2) / wi
    assert abs(pol - 1.0) < 1e-4
    assert abs(wv) < 1e-12
    # the E-vector must be perpendicular to the scattering (x-y) plane:
    # chi = 0.5 atan2(U, Q) gives the orientation from e_l(r)
    chi = 0.5 * np.arctan2(wu, wq)
    el, er = meridian_frame(rx, ry, rz)
    evec = np.cos(chi) * np.stack([np.asarray(c)[0] for c in el]) + \
        np.sin(chi) * np.stack([np.asarray(c)[0] for c in er])
    assert abs(abs(evec[2]) - 1.0) < 1e-4  # along +-z (plane normal)


def test_rayleigh_forward_peel_unpolarized():
    dt = tables(rayleigh_dust())
    n = 1
    kx, ky, kz = B(n, 0.0), B(n, 0.0), B(n, 1.0)
    wi, wq, wu, wv = peel_scatter_stokes(dt, jnp.zeros(n, dtype=jnp.int32),
                                         B(n, 1e12), kx, ky, kz,
                                         B(n), B(n), B(n), kx, ky, kz)
    assert abs(float(wi[0]) - 1.5) < 1e-4  # P1(1) = 0.75*2
    assert abs(float(wq[0])) < 1e-9 and abs(float(wu[0])) < 1e-9


def test_peel_normalization_over_sphere():
    """Average of the I peel weight over isotropic directions is 1."""
    dt = tables(rayleigh_dust())
    n = 200000
    rng = np.random.RandomState(3)
    r = rng.normal(size=(3, n))
    r /= np.linalg.norm(r, axis=0)
    kx, ky, kz = B(n, 0.0), B(n, 0.0), B(n, 1.0)
    q = B(n, 0.4)
    u = B(n, 0.1)
    wi, _, _, _ = peel_scatter_stokes(
        dt, jnp.zeros(n, dtype=jnp.int32), B(n, 1e12), kx, ky, kz,
        q, u, B(n), jnp.asarray(r[0]), jnp.asarray(r[1]), jnp.asarray(r[2]))
    assert abs(float(jnp.mean(wi)) - 1.0) < 0.01


def test_sampled_mu_matches_phase_function():
    """Unpolarized photons: sampled mu histogram matches P1."""
    dt = tables(rayleigh_dust())
    n = 400000
    kx, ky, kz = B(n, 0.0), B(n, 0.0), B(n, 1.0)
    nkx, nky, nkz, _, _, _ = sample_scatter_stokes(
        dt, jnp.zeros(n, dtype=jnp.int32), B(n, 1e12),
        jax.random.PRNGKey(5), kx, ky, kz, B(n), B(n), B(n))
    mu = np.asarray(nkz)
    hist, edges = np.histogram(mu, bins=20, range=(-1, 1), density=True)
    cent = 0.5 * (edges[:-1] + edges[1:])
    expected = 0.75 * (1 + cent ** 2) / 2.0  # P1 / int P1 dmu
    assert np.allclose(hist, expected, rtol=0.05)


def test_polarized_sampling_biases_mu():
    """Fully Q-polarized photons prefer azimuths/angles where
    I*P1 + Q_s*P2 is large — mean I-weighted mu distribution still valid:
    check energy bookkeeping stays exact (I renormalized to 1)."""
    dt = tables(rayleigh_dust())
    n = 100000
    kx, ky, kz = B(n, 0.0), B(n, 0.0), B(n, 1.0)
    nkx, nky, nkz, q2, u2, v2 = sample_scatter_stokes(
        dt, jnp.zeros(n, dtype=jnp.int32), B(n, 1e12),
        jax.random.PRNGKey(6), kx, ky, kz, B(n, 1.0), B(n), B(n))
    pol = np.sqrt(np.asarray(q2) ** 2 + np.asarray(u2) ** 2 +
                  np.asarray(v2) ** 2)
    assert (pol <= 1.0 + 1e-9).all()
    nn = np.asarray(nkx) ** 2 + np.asarray(nky) ** 2 + np.asarray(nkz) ** 2
    assert np.allclose(nn, 1.0, rtol=1e-12)
