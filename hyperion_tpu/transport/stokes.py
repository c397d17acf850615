"""Polarized scattering: Stokes-vector transport through dust scattering.

Vector-algebra re-expression of the reference's angle-based implementation
(ref: dust_scatter + scatter_stokes, src/dust/dust_type_4elem.f90:446-691;
peeloff variant dust_scatter_peeloff :421-443). The reference chains
spherical-triangle identities on cached (cost, sint, cosp, sinp) angles;
here everything is computed from the direction vectors directly, which is
branch-free and numerically stable at the poles — exactly what the
lockstep SoA batch wants.

Conventions (self-consistent; validated by the polarization test suite):

- The photon's Stokes vector (I, Q, U, V) is defined in the meridian basis
  (e_l, e_r) = (e_theta, e_phi) of its direction of travel; I is kept
  normalized to 1 (ref dust_scatter:566-571).
- A scattering event with local angles (Theta, phi) rotates the Stokes
  basis into the scattering plane [L(psi1)], applies the 4-element matrix
  R(Theta) with elements P1..P4, and rotates into the outgoing meridian
  basis [L(psi2)]:  S_out = L(psi2) R(Theta) L(psi1) S_in.
- mu = cos(Theta) is sampled from the polarization-aware mixture
  I * P1(mu) + Q_scat * P2(mu) (ref dust_scatter:504-545), inverted from
  the unnormalized cumulative tables by fixed-trip bisection.
"""

import jax
import jax.numpy as jnp

from .sampling import searchsorted_rows


def meridian_frame(kx, ky, kz):
    """(e_l, e_r) = (e_theta, e_phi) for direction k; at the poles falls
    back to (x_hat, y_hat) like the reference's default angle convention."""
    st = jnp.sqrt(kx * kx + ky * ky)
    safe = st > 1e-12
    inv = jnp.where(safe, 1.0 / jnp.where(safe, st, 1.0), 0.0)
    cp = jnp.where(safe, kx * inv, 1.0)
    sp = jnp.where(safe, ky * inv, 0.0)
    # e_theta = (cost*cosp, cost*sinp, -sint)
    elx = kz * cp
    ely = kz * sp
    elz = -st
    # e_phi = (-sinp, cosp, 0)
    erx = -sp
    ery = cp
    erz = jnp.zeros_like(kz)
    return (elx, ely, elz), (erx, ery, erz)


def _rotate_stokes(q, u, cos2, sin2):
    """L(psi) applied to (Q, U): basis rotated by psi toward e_r."""
    return cos2 * q + sin2 * u, -sin2 * q + cos2 * u


def _interp_P_rows(dt, rows, j, frac, table):
    flat = table.reshape(-1)
    n_mu = dt.mu.shape[1]
    base = rows.astype(jnp.int32) * n_mu
    p0 = flat[base + j - 1]
    p1 = flat[base + j]
    return p0 + frac * (p1 - p0)


def _matrix_at(dt, dust_id, nu, mu):
    """P1..P4 (peel-normalized) at each lane's (nearest nu bin, mu)."""
    n_nu = dt.nu.shape[1]
    n_mu = dt.mu.shape[1]
    inu = jnp.clip(searchsorted_rows(dt.nu, dust_id, nu) - 1, 0, n_nu - 1)
    rows = dust_id * n_nu + inu
    j = jnp.clip(searchsorted_rows(dt.mu, dust_id, mu), 1, n_mu - 1)
    muflat = dt.mu.reshape(-1)
    mubase = dust_id.astype(jnp.int32) * n_mu
    m0 = muflat[mubase + j - 1]
    m1 = muflat[mubase + j]
    frac = jnp.clip(jnp.where(m1 > m0, (mu - m0) / (m1 - m0), 0.0), 0.0, 1.0)
    P1 = _interp_P_rows(dt, rows, j, frac, dt.P1_peel)
    P2 = _interp_P_rows(dt, rows, j, frac, dt.P2_peel)
    P3 = _interp_P_rows(dt, rows, j, frac, dt.P3_peel)
    P4 = _interp_P_rows(dt, rows, j, frac, dt.P4_peel)
    return P1, P2, P3, P4


def _apply_matrix_and_frames(dt, dust_id, nu, kx, ky, kz, tx, ty, tz,
                             cos_t, q, u, v, nx, ny, nz, cos2p1, sin2p1):
    """Shared second half of scattering: R(Theta) then rotate into the
    outgoing meridian basis. t is the in-scattering-plane transverse unit
    vector at the incoming direction; (cos2p1, sin2p1) encode L(psi1)."""
    P1, P2, P3, P4 = _matrix_at(dt, dust_id, nu, cos_t)

    # into scattering basis
    q_s, u_s = _rotate_stokes(q, u, cos2p1, sin2p1)

    # R(Theta) (ref scatter_stokes RLS1..4)
    i1 = P1 * 1.0 + P2 * q_s
    q1 = P2 * 1.0 + P1 * q_s
    u1 = P3 * u_s - P4 * v
    v1 = P4 * u_s + P3 * v

    # outgoing meridian rotation L(psi2'): e_l(n) in the scattering basis
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    el2x = cos_t * tx - sin_t * kx
    el2y = cos_t * ty - sin_t * ky
    el2z = cos_t * tz - sin_t * kz
    # scattering-plane normal e_r' = k x t
    epx = ky * tz - kz * ty
    epy = kz * tx - kx * tz
    epz = kx * ty - ky * tx
    (elnx, elny, elnz), _ = meridian_frame(nx, ny, nz)
    cosp2 = el2x * elnx + el2y * elny + el2z * elnz
    sinp2 = epx * elnx + epy * elny + epz * elnz
    # normalize the (cos, sin) pair against f32 drift
    r = jnp.sqrt(jnp.maximum(cosp2 ** 2 + sinp2 ** 2, 1e-30))
    cosp2 = cosp2 / r
    sinp2 = sinp2 / r
    cos2p2 = cosp2 * cosp2 - sinp2 * sinp2
    sin2p2 = 2.0 * cosp2 * sinp2
    q2, u2 = _rotate_stokes(q1, u1, cos2p2, sin2p2)
    return i1, q2, u2, v1


def sample_scatter_stokes(dt, dust_id, nu, key, kx, ky, kz, q, u, v):
    """Sample a polarized scattering event.

    Returns (nkx, nky, nkz, q', u', v') with the outgoing Stokes vector
    renormalized to I = 1 (ref dust_scatter:566-571). The energy is NOT
    changed: the mu sampling uses the exact angular density
    proportional to P1 + Q_scat/I * P2, so no importance weight is needed.
    """
    k_phi, k_mu = jax.random.split(key)
    dtype = kx.dtype
    phi = jax.random.uniform(k_phi, kx.shape, dtype=dtype,
                             maxval=2.0 * jnp.pi)
    cphi = jnp.cos(phi)
    sphi = jnp.sin(phi)

    # frame around k (identical to sampling.rotate_direction)
    st = jnp.sqrt(jnp.maximum(kx * kx + ky * ky, 0.0))
    safe = st > 1e-12
    inv_st = jnp.where(safe, 1.0 / jnp.where(safe, st, 1.0), 0.0)
    ux = jnp.where(safe, ky * inv_st, 1.0)
    uy = jnp.where(safe, -kx * inv_st, 0.0)
    uz = jnp.zeros_like(kx)
    vx = jnp.where(safe, kz * kx * inv_st, 0.0)
    vy = jnp.where(safe, kz * ky * inv_st, 1.0)
    vz = jnp.where(safe, -st, 0.0)

    tx = cphi * ux + sphi * vx
    ty = cphi * uy + sphi * vy
    tz = cphi * uz + sphi * vz

    # L(psi1) with psi1 = phi - pi/2 (derivation in module docstring)
    cos2p1 = -jnp.cos(2.0 * phi)
    sin2p1 = -jnp.sin(2.0 * phi)
    q_s, _ = _rotate_stokes(q, u, cos2p1, sin2p1)

    # sample mu from I*P1 + q_s*P2 via the unnormalized cumulatives
    n_nu = dt.nu.shape[1]
    n_mu = dt.mu.shape[1]
    inu = jnp.clip(searchsorted_rows(dt.nu, dust_id, nu) - 1, 0, n_nu - 1)
    rows = (dust_id * n_nu + inu).astype(jnp.int32)
    c1 = dt.P1_cum.reshape(-1)
    c2 = dt.P2_cum.reshape(-1)
    base = rows * n_mu
    tot = c1[base + n_mu - 1] + q_s * c2[base + n_mu - 1]
    xi = jax.random.uniform(k_mu, kx.shape, dtype=dtype) * tot

    # bisection on the monotone mixture (|P2| <= P1 and |q_s| <= 1)
    lo = jnp.zeros_like(rows)
    hi = jnp.full_like(rows, n_mu - 1)
    import numpy as _np
    n_steps = int(_np.ceil(_np.log2(max(n_mu, 2)))) + 1

    def body(_, state):
        lo_, hi_ = state
        mid = (lo_ + hi_) // 2
        val = c1[base + mid] + q_s * c2[base + mid]
        go_hi = val < xi
        return jnp.where(go_hi, mid, lo_), jnp.where(go_hi, hi_, mid)

    lo, hi = jax.lax.fori_loop(0, n_steps, body, (lo, hi))
    j = jnp.clip(hi, 1, n_mu - 1)
    v0 = c1[base + j - 1] + q_s * c2[base + j - 1]
    v1_ = c1[base + j] + q_s * c2[base + j]
    frac = jnp.clip(jnp.where(v1_ > v0, (xi - v0) / (v1_ - v0), 0.0),
                    0.0, 1.0)
    muflat = dt.mu.reshape(-1)
    mubase = dust_id.astype(jnp.int32) * n_mu
    m0 = muflat[mubase + j - 1]
    m1 = muflat[mubase + j]
    cos_t = jnp.clip(m0 + frac * (m1 - m0), -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))

    nx = sin_t * tx + cos_t * kx
    ny = sin_t * ty + cos_t * ky
    nz = sin_t * tz + cos_t * kz
    norm = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz)
    nx, ny, nz = nx * norm, ny * norm, nz * norm

    i2, q2, u2, v2 = _apply_matrix_and_frames(
        dt, dust_id, nu, kx, ky, kz, tx, ty, tz, cos_t, q, u, v,
        nx, ny, nz, cos2p1, sin2p1)
    inv_i = 1.0 / jnp.maximum(i2, 1e-30)
    return nx, ny, nz, q2 * inv_i, u2 * inv_i, v2 * inv_i


def peel_scatter_stokes(dt, dust_id, nu, kx, ky, kz, q, u, v,
                        rx, ry, rz):
    """Stokes peel weights toward the required direction r
    (ref dust_scatter_peeloff). Returns (wI, wQ, wU, wV) in units of
    1/4pi — the I component reduces to the P1 phase value for
    unpolarized photons."""
    cos_t = jnp.clip(kx * rx + ky * ry + kz * rz, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    safe = sin_t > 1e-12

    # transverse in-plane direction toward r
    tx = jnp.where(safe, (rx - cos_t * kx) / jnp.where(safe, sin_t, 1.0), 0.0)
    ty = jnp.where(safe, (ry - cos_t * ky) / jnp.where(safe, sin_t, 1.0), 0.0)
    tz = jnp.where(safe, (rz - cos_t * kz) / jnp.where(safe, sin_t, 1.0), 0.0)
    # forward/backward peel: scattering plane undefined; use the u-axis of
    # k's frame (psi rotations then cancel for the symmetric matrix)
    st = jnp.sqrt(jnp.maximum(kx * kx + ky * ky, 0.0))
    safek = st > 1e-12
    inv_st = jnp.where(safek, 1.0 / jnp.where(safek, st, 1.0), 0.0)
    ux = jnp.where(safek, ky * inv_st, 1.0)
    uy = jnp.where(safek, -kx * inv_st, 0.0)
    tx = jnp.where(safe, tx, ux)
    ty = jnp.where(safe, ty, uy)
    tz = jnp.where(safe, tz, 0.0)

    # psi1: angle of t from e_l(k) toward e_r(k)
    (elx, ely, elz), (erx, ery, erz) = meridian_frame(kx, ky, kz)
    cosp1 = tx * elx + ty * ely + tz * elz
    sinp1 = tx * erx + ty * ery + tz * erz
    r_ = jnp.sqrt(jnp.maximum(cosp1 ** 2 + sinp1 ** 2, 1e-30))
    cosp1, sinp1 = cosp1 / r_, sinp1 / r_
    cos2p1 = cosp1 * cosp1 - sinp1 * sinp1
    sin2p1 = 2.0 * cosp1 * sinp1

    i2, q2, u2, v2 = _apply_matrix_and_frames(
        dt, dust_id, nu, kx, ky, kz, tx, ty, tz, cos_t, q, u, v,
        rx, ry, rz, cos2p1, sin2p1)
    return i2, q2, u2, v2
