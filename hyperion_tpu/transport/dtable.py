"""Device-side dust tables: SoA pytree built on host from SphericalDust.

Replaces the reference's per-photon dust type + tabulated PDFs
(ref: src/dust/dust_type_4elem.f90:220-566) with stacked, padded arrays:

- opacity interpolation tables chi/albedo/kappa(nu) per dust (padded to a
  common frequency count, log-log interpolated on device),
- emissivity CDFs per (dust, specific-energy bin) for re-emission frequency
  sampling (the reference's ``d%j_nu`` PDFs), and the reciprocal ``b_nu``
  CDFs used by the MRW,
- scattering-angle CDFs per (dust, frequency bin) from the P1 matrix row,
- mean-opacity tables vs specific energy (Planck / reciprocal-Planck /
  Rosseland) for temperature conversion, MRW diffusion and PDA.

All CDF construction happens once on host in float64; the device arrays are
cast to the engine dtype.
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..util.integrate import integrate_loglog2d


class DustTables(NamedTuple):
    # Opacities: (n_dust, n_nu) log-log tables, padded by edge-replication
    nu: jnp.ndarray
    chi: jnp.ndarray
    albedo: jnp.ndarray
    kappa: jnp.ndarray
    # Emissivities: var grid (n_dust, n_var); nu grid (n_dust, n_enu);
    # CDFs flattened to (n_dust * n_var, n_enu) for row-indexed inversion
    emiss_var: jnp.ndarray
    log_emiss_var: jnp.ndarray
    emiss_nu: jnp.ndarray
    jnu_cdf: jnp.ndarray
    bnu_cdf: jnp.ndarray
    # O(1)-inversion quantile tables (see sampling.sample_quantile_rows):
    # log2(nu) at evenly spaced CDF values, (n_dust * n_var, n_q)
    jnu_q: jnp.ndarray
    bnu_q: jnp.ndarray
    # mu at evenly spaced P1-CDF values, (n_dust * n_nu, n_q_mu)
    mu_q: jnp.ndarray
    # Scattering: mu grid (n_dust, n_mu); CDF (n_dust * n_nu, n_mu)
    mu: jnp.ndarray
    P1_cdf: jnp.ndarray
    # Phase function normalized so (1/4pi) * integral over solid angle == 1
    # (used for peeloff probabilities): (n_dust * n_nu, n_mu)
    P1_peel: jnp.ndarray
    # Full 4-element scattering matrix, all scaled by the SAME per-(dust,nu)
    # norm as P1_peel, so Stokes peel weights stay in units of 1/4pi
    # (ref dust_type_4elem.f90 P1..P4 + scatter_stokes): (n_dust*n_nu, n_mu)
    P2_peel: jnp.ndarray
    P3_peel: jnp.ndarray
    P4_peel: jnp.ndarray
    # Unnormalized cumulative integrals of P1 and P2 over mu (same scale),
    # for polarization-aware mu sampling from the mixture
    # I*P1 + Q_scat*P2 (ref dust_scatter, dust_type_4elem.f90:504-545)
    P1_cum: jnp.ndarray
    P2_cum: jnp.ndarray
    # Mean opacities vs specific energy: (n_dust, n_e)
    me_specific_energy: jnp.ndarray
    me_temperature: jnp.ndarray
    me_chi_planck: jnp.ndarray
    me_kappa_planck: jnp.ndarray
    me_chi_inv_planck: jnp.ndarray
    me_kappa_inv_planck: jnp.ndarray
    me_chi_rosseland: jnp.ndarray
    me_kappa_rosseland: jnp.ndarray
    # Sublimation: (n_dust,) mode codes 0=no 1=fast 2=slow 3=cap + threshold
    sublimation_mode: jnp.ndarray
    sublimation_energy: jnp.ndarray

    @property
    def n_dust(self):
        return self.nu.shape[0]

    @property
    def n_var(self):
        return self.emiss_var.shape[1]


def _pad_to(arr, n, axis=-1):
    """Pad 1-D array to length n by replicating the final value."""
    pad = n - arr.shape[0]
    if pad <= 0:
        return arr
    return np.concatenate([arr, np.repeat(arr[-1:], pad)])


def _cdf_loglog(x, y_rows):
    """Cumulative integral along x of piecewise power-law rows, normalized.

    y_rows is (n_rows, n_x). Returns (n_rows, n_x) with [:, 0] == 0 and
    [:, -1] == 1 (rows with zero integral become a uniform ramp).
    """
    x = np.asarray(x, dtype=float)
    y = np.asarray(y_rows, dtype=float)
    x1, x2 = x[:-1], x[1:]
    y1, y2 = y[:, :-1], y[:, 1:]
    with np.errstate(divide='ignore', invalid='ignore'):
        b = np.log10(y2 / y1) / np.log10(x2 / x1)
        powlaw = y1 * x1 / (b + 1.0) * ((x2 / x1) ** (b + 1.0) - 1.0)
        logcase = x1 * y1 * np.log(x2 / x1)
    seg = np.where(np.abs(b + 1.0) < 1e-10, logcase, powlaw)
    seg = np.where((y1 == 0.0) | (y2 == 0.0), 0.0, seg)
    cdf = np.concatenate([np.zeros((y.shape[0], 1)), np.cumsum(seg, axis=1)],
                         axis=1)
    total = cdf[:, -1:]
    uniform = (x - x[0]) / (x[-1] - x[0])
    cdf = np.where(total > 0.0, cdf / np.where(total > 0.0, total, 1.0),
                   uniform[None, :])
    # Enforce strict final value of 1 to keep inversion in range
    cdf[:, -1] = 1.0
    return cdf


def _cdf_linear(x, y_rows):
    """Trapezoidal cumulative integral along x, normalized per row."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y_rows, dtype=float)
    seg = 0.5 * (y[:, :-1] + y[:, 1:]) * np.diff(x)[None, :]
    cdf = np.concatenate([np.zeros((y.shape[0], 1)), np.cumsum(seg, axis=1)],
                         axis=1)
    total = cdf[:, -1:]
    uniform = (x - x[0]) / (x[-1] - x[0])
    cdf = np.where(total > 0.0, cdf / np.where(total > 0.0, total, 1.0),
                   uniform[None, :])
    cdf[:, -1] = 1.0
    return cdf


_SUBLIMATION_CODES = {'no': 0, 'fast': 1, 'slow': 2, 'cap': 3}


def build_dust_tables(dusts, dtype=jnp.float32, n_quantiles=257,
                      n_quantiles_mu=129):
    """Build DustTables from a list of SphericalDust objects.

    ``n_quantiles``/``n_quantiles_mu`` size the inverse-CDF quantile tables
    used for O(1) frequency/angle sampling on device (each quantile bin
    carries 1/(K-1) of the probability mass; the defaults keep the sampled
    distribution within ~0.4% of the exact piecewise CDF inversion)."""
    n_dust = len(dusts)
    for d in dusts:
        d.optical_properties.ensure_all_set()
        d._compute_mean_opacities()
        if not d.emissivities.all_set():
            d.emissivities.set_lte(d.optical_properties, d.mean_opacities)

    n_nu = max(len(d.optical_properties.nu) for d in dusts)
    n_mu = max(len(d.optical_properties.mu) for d in dusts)
    n_enu = max(len(d.emissivities.nu) for d in dusts)
    n_var = max(len(d.emissivities.var) for d in dusts)
    n_e = max(len(d.mean_opacities.temperature) for d in dusts)

    nu = np.zeros((n_dust, n_nu))
    chi = np.zeros((n_dust, n_nu))
    albedo = np.zeros((n_dust, n_nu))
    kappa = np.zeros((n_dust, n_nu))
    emiss_var = np.zeros((n_dust, n_var))
    emiss_nu = np.zeros((n_dust, n_enu))
    jnu_cdf = np.zeros((n_dust, n_var, n_enu))
    bnu_cdf = np.zeros((n_dust, n_var, n_enu))
    mu = np.zeros((n_dust, n_mu))
    P1_cdf = np.zeros((n_dust, n_nu, n_mu))
    P1_peel = np.zeros((n_dust, n_nu, n_mu))
    P2_peel = np.zeros((n_dust, n_nu, n_mu))
    P3_peel = np.zeros((n_dust, n_nu, n_mu))
    P4_peel = np.zeros((n_dust, n_nu, n_mu))
    P1_cum = np.zeros((n_dust, n_nu, n_mu))
    P2_cum = np.zeros((n_dust, n_nu, n_mu))
    jnu_q = np.zeros((n_dust, n_var, n_quantiles))
    bnu_q = np.zeros((n_dust, n_var, n_quantiles))
    mu_q = np.zeros((n_dust, n_nu, n_quantiles_mu))
    me = {k: np.zeros((n_dust, n_e)) for k in
          ('specific_energy', 'temperature', 'chi_planck', 'kappa_planck',
           'chi_inv_planck', 'kappa_inv_planck', 'chi_rosseland',
           'kappa_rosseland')}
    subl_mode = np.zeros(n_dust, dtype=np.int32)
    subl_energy = np.zeros(n_dust)

    for i, d in enumerate(dusts):
        op = d.optical_properties
        op._sort()
        nu[i] = _pad_to(np.asarray(op.nu, float), n_nu)
        chi[i] = _pad_to(np.asarray(op.chi, float), n_nu)
        albedo[i] = _pad_to(np.asarray(op.albedo, float), n_nu)
        kappa[i] = _pad_to(np.asarray(op.kappa, float), n_nu)

        em = d.emissivities
        var = np.asarray(em.var, float)
        enu = np.asarray(em.nu, float)
        jnu = np.asarray(em.jnu, float)  # (n_enu_d, n_var_d)
        emiss_var[i] = _pad_to(var, n_var)
        emiss_nu[i] = _pad_to(enu, n_enu)
        # CDF of j_nu over nu per var bin (ref dust_setup: set_pdf(j_nu))
        rows = jnu.T  # (n_var_d, n_enu_d)
        # b_nu PDF = j_nu / kappa(nu) (ref dust_setup)
        kappa_enu = np.interp(np.log10(enu), np.log10(np.asarray(op.nu, float)),
                              np.log10(np.maximum(np.asarray(op.kappa, float),
                                                  1e-300)))
        kappa_enu = 10.0 ** kappa_enu
        rows_b = rows / kappa_enu[None, :]
        cj = _cdf_loglog(enu, rows)
        cb = _cdf_loglog(enu, rows_b)
        jnu_cdf[i, :cj.shape[0], :cj.shape[1]] = cj
        bnu_cdf[i, :cb.shape[0], :cb.shape[1]] = cb
        if cj.shape[0] < n_var:
            jnu_cdf[i, cj.shape[0]:] = cj[-1]
            bnu_cdf[i, cb.shape[0]:] = cb[-1]
        if cj.shape[1] < n_enu:
            jnu_cdf[i, :, cj.shape[1]:] = 1.0
            bnu_cdf[i, :, cb.shape[1]:] = 1.0
        # O(1)-sampling quantile tables (log2 nu at even CDF steps)
        from .sampling import quantile_table
        jnu_q[i] = quantile_table(enu, jnu_cdf[i, :, :len(enu)],
                                  n_quantiles, log2=True)
        bnu_q[i] = quantile_table(enu, bnu_cdf[i, :, :len(enu)],
                                  n_quantiles, log2=True)

        mu_d = np.asarray(op.mu, float)
        mu[i] = _pad_to(mu_d, n_mu)
        # Normalize the scattering matrix the same way the engine input file
        # does, then build the mu-CDF of P1 at each frequency row.
        P1 = np.asarray(op.P1, float)
        c = _cdf_linear(mu_d, P1)
        P1_cdf[i] = np.pad(c, ((0, n_nu - c.shape[0]), (0, n_mu - c.shape[1])),
                           mode='edge')
        from .sampling import quantile_table
        mq = quantile_table(mu_d, c, n_quantiles_mu, log2=False)
        mu_q[i] = np.pad(mq, ((0, n_nu - mq.shape[0]), (0, 0)), mode='edge')
        # Peel weight: P1 normalized so its solid-angle average is 1
        # (isotropic events peel with weight exactly 1, so a scattering
        # event's weight is the phase function in units of 1/4pi)
        norm = 0.5 * np.trapezoid(P1, mu_d, axis=1)  # (n_nu_d,)
        with np.errstate(divide='ignore', invalid='ignore'):
            inv_norm = np.where(norm > 0, 1.0 / np.where(norm > 0, norm, 1.0),
                                1.0)
        pp = np.where(norm[:, None] > 0, P1 * inv_norm[:, None], 1.0)
        P1_peel[i] = np.pad(pp, ((0, n_nu - pp.shape[0]),
                                 (0, n_mu - pp.shape[1])), mode='edge')
        # Remaining matrix elements, same scale (zero rows where P1 had no
        # norm -> isotropic unpolarized fallback)
        pad2 = lambda a: np.pad(a, ((0, n_nu - a.shape[0]),
                                    (0, n_mu - a.shape[1])), mode='edge')
        P2 = np.asarray(op.P2, float) * inv_norm[:, None]
        P3 = np.asarray(op.P3, float) * inv_norm[:, None]
        P4 = np.asarray(op.P4, float) * inv_norm[:, None]
        P2_peel[i] = pad2(np.where(norm[:, None] > 0, P2, 0.0))
        P3_peel[i] = pad2(np.where(norm[:, None] > 0, P3, 1.0))
        P4_peel[i] = pad2(np.where(norm[:, None] > 0, P4, 0.0))
        # Unnormalized cumulatives (same 1/norm scale) for mixture sampling
        dmu = np.diff(mu_d)[None, :]
        seg1 = 0.5 * (pp[:, :-1] + pp[:, 1:]) * dmu
        seg2 = 0.5 * (P2_peel[i][:P2.shape[0], :len(mu_d) - 1] +
                      P2_peel[i][:P2.shape[0], 1:len(mu_d)]) * dmu
        c1 = np.concatenate([np.zeros((pp.shape[0], 1)),
                             np.cumsum(seg1, axis=1)], axis=1)
        c2 = np.concatenate([np.zeros((pp.shape[0], 1)),
                             np.cumsum(seg2, axis=1)], axis=1)
        P1_cum[i] = pad2(c1)
        P2_cum[i] = pad2(c2)

        mo = d.mean_opacities
        for k in me:
            me[k][i] = _pad_to(np.asarray(getattr(mo, k), float), n_e)

        subl_mode[i] = _SUBLIMATION_CODES[d.sublimation_mode]
        subl_energy[i] = d.sublimation_energy

    f = lambda a: jnp.asarray(a, dtype=dtype)
    return DustTables(
        nu=f(nu), chi=f(chi), albedo=f(albedo), kappa=f(kappa),
        emiss_var=f(emiss_var), log_emiss_var=f(np.log10(emiss_var)),
        emiss_nu=f(emiss_nu),
        jnu_cdf=f(jnu_cdf.reshape(n_dust * n_var, n_enu)),
        bnu_cdf=f(bnu_cdf.reshape(n_dust * n_var, n_enu)),
        jnu_q=f(jnu_q.reshape(n_dust * n_var, n_quantiles)),
        bnu_q=f(bnu_q.reshape(n_dust * n_var, n_quantiles)),
        mu_q=f(mu_q.reshape(n_dust * n_nu, n_quantiles_mu)),
        mu=f(mu), P1_cdf=f(P1_cdf.reshape(n_dust * n_nu, n_mu)),
        P1_peel=f(P1_peel.reshape(n_dust * n_nu, n_mu)),
        P2_peel=f(P2_peel.reshape(n_dust * n_nu, n_mu)),
        P3_peel=f(P3_peel.reshape(n_dust * n_nu, n_mu)),
        P4_peel=f(P4_peel.reshape(n_dust * n_nu, n_mu)),
        P1_cum=f(P1_cum.reshape(n_dust * n_nu, n_mu)),
        P2_cum=f(P2_cum.reshape(n_dust * n_nu, n_mu)),
        me_specific_energy=f(me['specific_energy']),
        me_temperature=f(me['temperature']),
        me_chi_planck=f(me['chi_planck']),
        me_kappa_planck=f(me['kappa_planck']),
        me_chi_inv_planck=f(me['chi_inv_planck']),
        me_kappa_inv_planck=f(me['kappa_inv_planck']),
        me_chi_rosseland=f(me['chi_rosseland']),
        me_kappa_rosseland=f(me['kappa_rosseland']),
        sublimation_mode=jnp.asarray(subl_mode),
        sublimation_energy=f(subl_energy),
    )
