"""Device-side source tables + batched photon emission.

Replaces the reference's per-photon ``emit``/``source_emit`` dispatch
(ref: src/sources/source.f90:100-180, src/sources/source_type.f90:398-511)
with stacked source parameter arrays and masked, branchless per-lane
computation: every lane samples a source from the luminosity CDF, then the
position/direction recipes for each source type are evaluated under masks
(n_source types is small; lanes are many).

Spectra: every source gets a tabulated frequency CDF on host — tabulated
spectra use their own grid; blackbody sources get B_nu(T) sampled on a
Planck-range grid — so device-side frequency sampling is a single row-indexed
CDF inversion regardless of spectrum type. LTE-spectrum sources re-use the
dust emissivity tables at the local cell (deferred to the interaction module).
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..util.functions import B_nu, planck_nu_range
from .sampling import sample_cdf_rows2, isotropic_direction

# Source type codes (mirroring ref source%type 1..8)
POINT = 1
SPHERE = 2
EXTERN_SPH = 5
EXTERN_BOX = 6
PLANE_PARALLEL = 7
POINT_COLLECTION = 8


class SourceTables(NamedTuple):
    type_code: jnp.ndarray      # (n_emit,) int32
    position: jnp.ndarray       # (n_emit, 3)
    radius: jnp.ndarray         # (n_emit,)
    limb: jnp.ndarray           # (n_emit,) bool
    direction: jnp.ndarray      # (n_emit, 3) for plane-parallel
    bounds: jnp.ndarray         # (n_emit, 3, 2) for extern_box
    luminosity: jnp.ndarray     # (n_emit,)
    lum_cdf: jnp.ndarray        # (n_emit,) cumulative, last == 1
    # per-row initial packet energy: 1 for luminosity-proportional sampling;
    # L_group * n_groups / L_tot when sampling sources evenly
    # (ref source.f90:162: p%energy * luminosity%pdf(id) * n_sources)
    energy_weight: jnp.ndarray  # (n_emit,)
    spec_nu: jnp.ndarray        # (n_emit, n_snu)
    spec_cdf: jnp.ndarray       # (n_emit, n_snu)
    energy_total: jnp.ndarray   # scalar: sum of luminosities
    # Sources photons can be re-absorbed by (spherical sources,
    # ref source_type.f90:96,148 intersect flag)
    intersect: jnp.ndarray      # (n_emit,) bool

    @property
    def n_sources(self):
        return self.type_code.shape[0]

    @property
    def any_intersect(self):
        import numpy as _np
        return bool(_np.asarray(self.intersect).any())


def _spectrum_cdf(source, n_grid):
    """Host-side (nu, cdf) for one source's emission spectrum.

    Photon frequencies are sampled proportional to fnu (photon-energy
    weighting, matching the reference's PDF over fnu: set_pdf of the spectrum
    column read in source_read).
    """
    from ..util.integrate import integrate_loglog
    if source.spectrum is not None:
        nu = np.asarray(source.spectrum['nu'], float)
        fnu = np.asarray(source.spectrum['fnu'], float)
    elif source.temperature is not None:
        nu = planck_nu_range(source.temperature)
        fnu = B_nu(nu, source.temperature)
    else:
        raise ValueError("LTE-spectrum sources are not yet supported by the "
                         "transport engine")
    # piecewise power-law cumulative (same quadrature as the dust tables)
    from .dtable import _cdf_loglog
    cdf = _cdf_loglog(nu, fnu[None, :])[0]
    # Resample onto a fixed-size grid so all sources stack
    if len(nu) != n_grid:
        u = np.linspace(0.0, 1.0, n_grid)
        # Invert: nu(u) at evenly spaced quantiles keeps sampling exact-ish
        nu_new = np.interp(u, cdf, nu)
        nu_new[0], nu_new[-1] = nu[0], nu[-1]
        nu, cdf = nu_new, u.copy()
    cdf[-1] = 1.0
    return nu, cdf


def build_source_tables(sources, dtype=jnp.float32, n_spec=400,
                        length_scale=1.0, sample_evenly=False):
    """Build SourceTables from a list of Source objects.

    PointSourceCollection is expanded into one emission row per point (the
    reference treats the collection as one source with an internal position
    PDF; expanding rows gives the same sampling distribution). With
    ``sample_evenly`` every *top-level* source gets equal pick probability
    and packets carry energy L_source*n_sources/L_tot instead of 1
    (ref source.f90:118-121,162).
    """
    from ..sources import (PointSource, PointSourceCollection, SphericalSource,
                           ExternalSphericalSource, ExternalBoxSource,
                           PlaneParallelSource, MapSource)

    rows = []
    for i_top, s in enumerate(sources):
        s._check_all_set()
        if isinstance(s, PointSourceCollection):
            nu, cdf = _spectrum_cdf(s, n_spec)
            for i in range(s.position.shape[0]):
                rows.append(dict(code=POINT, position=s.position[i],
                                 radius=0.0, limb=False,
                                 direction=(0, 0, 1),
                                 bounds=np.zeros((3, 2)),
                                 luminosity=float(s.luminosity[i]),
                                 nu=nu, cdf=cdf, group=i_top))
            continue
        nu, cdf = _spectrum_cdf(s, n_spec)
        row = dict(code=POINT, position=(0.0, 0.0, 0.0), radius=0.0,
                   limb=False, direction=(0.0, 0.0, 1.0),
                   bounds=np.zeros((3, 2)), luminosity=float(s.luminosity),
                   nu=nu, cdf=cdf, group=i_top)
        if isinstance(s, PointSource):
            row['code'] = POINT
            row['position'] = s.position
        elif isinstance(s, SphericalSource):
            row['code'] = SPHERE
            row['position'] = s.position
            row['radius'] = float(s.radius)
            row['limb'] = bool(s.limb)
            if s.spots:
                raise NotImplementedError("Spots not yet supported by the "
                                          "transport engine")
        elif isinstance(s, ExternalSphericalSource):
            row['code'] = EXTERN_SPH
            row['position'] = s.position
            row['radius'] = float(s.radius)
        elif isinstance(s, ExternalBoxSource):
            row['code'] = EXTERN_BOX
            row['bounds'] = np.asarray(s.bounds, float)
        elif isinstance(s, PlaneParallelSource):
            row['code'] = PLANE_PARALLEL
            row['position'] = s.position
            row['radius'] = float(s.radius)
            theta = np.radians(s.direction[0])
            phi = np.radians(s.direction[1])
            row['direction'] = (np.sin(theta) * np.cos(phi),
                                np.sin(theta) * np.sin(phi), np.cos(theta))
        elif isinstance(s, MapSource):
            raise NotImplementedError("MapSource not yet supported by the "
                                      "transport engine")
        else:
            raise NotImplementedError("Unsupported source type: %s" % type(s))
        rows.append(row)

    n = len(rows)
    L = float(length_scale)
    for r in rows:
        r['position'] = np.asarray(r['position'], float) / L
        r['radius'] = r['radius'] / L
        r['bounds'] = np.asarray(r['bounds'], float) / L
    lum = np.array([r['luminosity'] for r in rows])
    groups = np.array([r['group'] for r in rows])
    n_groups = len(sources)
    if sample_evenly and n_groups > 1:
        # equal pick probability per top-level source, luminosity-split
        # within a collection; packets carry a compensating energy weight
        l_group = np.array([lum[groups == g].sum() for g in range(n_groups)])
        p_row = lum / l_group[groups] / n_groups
        lum_cdf = np.cumsum(p_row)
        energy_weight = l_group[groups] * n_groups / lum.sum()
    else:
        lum_cdf = np.cumsum(lum) / lum.sum()
        energy_weight = np.ones(len(rows))
    lum_cdf[-1] = 1.0
    codes = np.array([r['code'] for r in rows], np.int32)
    radii = np.array([r['radius'] for r in rows], float)
    f = lambda a: jnp.asarray(np.asarray(a, float), dtype=dtype)
    return SourceTables(
        type_code=jnp.asarray(codes),
        position=f([r['position'] for r in rows]),
        radius=f(radii),
        limb=jnp.asarray(np.array([r['limb'] for r in rows], bool)),
        direction=f([r['direction'] for r in rows]),
        bounds=f([r['bounds'] for r in rows]),
        luminosity=f(lum), lum_cdf=f(lum_cdf),
        energy_weight=f(energy_weight),
        spec_nu=f([r['nu'] for r in rows]),
        spec_cdf=f([r['cdf'] for r in rows]),
        energy_total=f(lum.sum()),
        intersect=jnp.asarray((codes == SPHERE) & (radii > 0.0)),
    )


def emit_packets(st, key, n, dtype, src=None):
    """Sample n fresh packets: returns dict of arrays (position, direction,
    nu, source id). Energies are 1 (normalized at iteration end, ref
    iter_lucy.f90:219 update_energy_abs(energy_total/energy_current)).

    With ``src`` given ((n,) int32 rows), emit from those sources instead of
    sampling the luminosity CDF — the re-emission path for photons
    re-absorbed by a source (ref emit(reemit=...), source.f90:134-141)."""
    k_src, k_nu, k_dir, k_pos, k_pos2 = jax.random.split(key, 5)

    if src is None:
        u = jax.random.uniform(k_src, (n,), dtype=dtype)
        src = jnp.searchsorted(st.lum_cdf, u, side='left').astype(jnp.int32)
        src = jnp.clip(src, 0, st.n_sources - 1)
    code = st.type_code[src]

    nu = sample_cdf_rows2(st.spec_nu, st.spec_cdf, src,
                          jax.random.uniform(k_nu, (n,), dtype=dtype),
                          log_interp=True)

    # --- position ---
    pos = st.position[src]
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    # sphere surface point (also used for extern_sph, emitting inward)
    sx, sy, sz = isotropic_direction(k_pos, (n,), dtype)
    on_sphere = (code == SPHERE) | (code == EXTERN_SPH)
    r = st.radius[src]
    x = jnp.where(on_sphere, x + r * sx, x)
    y = jnp.where(on_sphere, y + r * sy, y)
    z = jnp.where(on_sphere, z + r * sz, z)
    # extern_box: uniform in box
    ub = jax.random.uniform(k_pos2, (n, 3), dtype=dtype)
    bounds = st.bounds[src]
    in_box = code == EXTERN_BOX
    x = jnp.where(in_box, bounds[:, 0, 0] + ub[:, 0] * (bounds[:, 0, 1] - bounds[:, 0, 0]), x)
    y = jnp.where(in_box, bounds[:, 1, 0] + ub[:, 1] * (bounds[:, 1, 1] - bounds[:, 1, 0]), y)
    z = jnp.where(in_box, bounds[:, 2, 0] + ub[:, 2] * (bounds[:, 2, 1] - bounds[:, 2, 0]), z)

    # --- direction ---
    k1, k2 = jax.random.split(k_dir)
    kx, ky, kz = isotropic_direction(k1, (n,), dtype)
    u1 = jax.random.uniform(k2, (n,), dtype=dtype)
    # Sphere: cosine-weighted outward from surface normal (s) — or
    # limb-darkened. Limb darkening law (ref ran_mu_limb,
    # source_type.f90:982): mu from cubic sampling; plain case mu=sqrt(u).
    mu_cos = jnp.sqrt(u1)
    # Limb darkening: I(mu) ∝ 1 - 0.4471 + 0.4471*... — the reference samples
    # via root-finding; we use the standard Milne-Eddington approximation
    # P(mu) ∝ mu*(1 + 1.5*mu) sampled by inversion below.
    mu_limb = _sample_limb_mu(u1)
    mu_s = jnp.where(st.limb[src], mu_limb, mu_cos)
    from .sampling import rotate_direction
    phi_t = jax.random.uniform(jax.random.fold_in(k2, 1), (n,), dtype=dtype,
                               maxval=2 * jnp.pi)
    ox, oy, oz = rotate_direction(sx, sy, sz, mu_s, phi_t)
    emits_out = code == SPHERE
    kx = jnp.where(emits_out, ox, kx)
    ky = jnp.where(emits_out, oy, ky)
    kz = jnp.where(emits_out, oz, kz)
    # extern_sph: cosine-weighted *inward*
    ix, iy, iz = rotate_direction(-sx, -sy, -sz, mu_cos, phi_t)
    emits_in = code == EXTERN_SPH
    kx = jnp.where(emits_in, ix, kx)
    ky = jnp.where(emits_in, iy, ky)
    kz = jnp.where(emits_in, iz, kz)
    # plane parallel: fixed direction; position uniform on disk perp to it
    d = st.direction[src]
    pp = code == PLANE_PARALLEL
    u_r = jnp.sqrt(jax.random.uniform(jax.random.fold_in(k_pos, 2), (n,),
                                      dtype=dtype))
    u_p = jax.random.uniform(jax.random.fold_in(k_pos, 3), (n,), dtype=dtype,
                             maxval=2 * jnp.pi)
    # disk frame perpendicular to d
    ax_, ay_, az_ = rotate_direction(d[:, 0], d[:, 1], d[:, 2],
                                     jnp.zeros_like(u_r), u_p)
    rr = st.radius[src] * u_r
    x = jnp.where(pp, st.position[src][:, 0] + rr * ax_, x)
    y = jnp.where(pp, st.position[src][:, 1] + rr * ay_, y)
    z = jnp.where(pp, st.position[src][:, 2] + rr * az_, z)
    kx = jnp.where(pp, d[:, 0], kx)
    ky = jnp.where(pp, d[:, 1], ky)
    kz = jnp.where(pp, d[:, 2], kz)

    return dict(x=x, y=y, z=z, kx=kx, ky=ky, kz=kz, nu=nu, source=src,
                energy=st.energy_weight[src])


def nearest_source_intersection(st, x, y, z, kx, ky, kz):
    """Distance along the ray to the nearest intersecting source's surface
    (ref find_nearest_source + source_intersect, source.f90:206-227,
    source_type.f90:359-396). Returns (t, source_row); t = +inf where no
    intersecting source lies ahead."""
    big = jnp.asarray(jnp.finfo(x.dtype).max / 8, dtype=x.dtype)
    rx = x[:, None] - st.position[None, :, 0]
    ry = y[:, None] - st.position[None, :, 1]
    rz = z[:, None] - st.position[None, :, 2]
    b = rx * kx[:, None] + ry * ky[:, None] + rz * kz[:, None]
    c = rx * rx + ry * ry + rz * rz - st.radius[None, :] ** 2
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = -b - sq
    t2 = -b + sq
    # exclusion zone ∝ radius: a photon just (re-)emitted on the surface
    # sits within f32 rounding of c = 0 and must not self-intersect
    eps = 1e-3 * st.radius[None, :]
    t = jnp.where(t1 > eps, t1, jnp.where(t2 > eps, t2, big))
    t = jnp.where((disc > 0.0) & st.intersect[None, :], t, big)
    row = jnp.argmin(t, axis=-1).astype(jnp.int32)
    t_min = jnp.take_along_axis(t, row[:, None], axis=-1)[:, 0]
    return t_min, row


def _sample_limb_mu(u):
    """Sample mu with limb darkening, P(mu) ∝ mu + 1.5*mu^2 on [0,1].

    CDF: (mu^2/2 + mu^3/2) / 1 -> solve cubic by a few Newton steps
    (fixed trip count, branchless)."""
    mu = jnp.sqrt(u)  # good initial guess

    def body(_, mu):
        f = 0.5 * mu ** 2 + 0.5 * mu ** 3 - u
        fp = mu + 1.5 * mu ** 2
        return jnp.clip(mu - f / jnp.maximum(fp, 1e-6), 0.0, 1.0)

    return jax.lax.fori_loop(0, 4, body, mu)
