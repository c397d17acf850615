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
from .sampling import searchsorted_small, sample_quantile_rows, isotropic_direction

# Source type codes (mirroring ref source%type 1..8; spots — ref type 3 —
# are expanded into SPHERE rows with a cap constraint, see build below)
POINT = 1
SPHERE = 2
MAP = 4
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
    spec_nu: jnp.ndarray        # (n_emit, n_snu) nu at even CDF quantiles
    spec_cdf: jnp.ndarray       # (n_emit, n_snu) == linspace(0, 1)
    spec_logq: jnp.ndarray      # (n_emit, n_snu) log2(spec_nu) for O(1) draw
    energy_total: jnp.ndarray   # scalar: sum of luminosities
    # Sources photons can be re-absorbed by (spherical sources,
    # ref source_type.f90:96,148 intersect flag)
    intersect: jnp.ndarray      # (n_emit,) bool
    # Spots (ref type 3, source_type.f90:150-190): SPHERE rows emitting from
    # the spherical cap around cap_dir with cos(size) = cap_cos; plain
    # spheres have cap_cos = -1 (whole surface).
    cap_dir: jnp.ndarray        # (n_emit, 3)
    cap_cos: jnp.ndarray        # (n_emit,)
    # Luminosity maps (ref type 4 / grid_sample_pdf_map): map_row points
    # into map_cdf (per-cell cumulative), -1 for non-map rows.
    map_row: jnp.ndarray        # (n_emit,) int32
    map_cdf: jnp.ndarray        # (n_map, n_cells) — (0, 1) if none
    # LTE local-emissivity spectrum (ref freq_type 3, source_type.f90:468):
    # frequency sampled at emit time from the dust emissivity at the cell.
    # Shape (n_emit,) when any row is LTE, (0,) otherwise — the presence
    # flags below are derived from SHAPES, not values, so they stay static
    # when SourceTables flows through jit/shard_map as an argument.
    lte: jnp.ndarray            # (n_emit,) bool or (0,)

    @property
    def n_sources(self):
        return self.type_code.shape[0]

    @property
    def any_intersect(self):
        import numpy as _np
        return bool(_np.asarray(self.intersect).any())

    @property
    def has_map(self):
        return self.map_cdf.shape[0] > 0

    @property
    def has_lte(self):
        return self.lte.shape[0] > 0


def _spectrum_cdf(source, n_grid):
    """Host-side (nu, cdf) for one source's emission spectrum.

    Photon frequencies are sampled proportional to fnu (photon-energy
    weighting, matching the reference's PDF over fnu: set_pdf of the spectrum
    column read in source_read).
    """
    from ..util.integrate import integrate_loglog
    if getattr(source, 'spectrum', None) is not None:
        nu = np.asarray(source.spectrum['nu'], float)
        fnu = np.asarray(source.spectrum['fnu'], float)
    elif getattr(source, 'temperature', None) is not None:
        nu = planck_nu_range(source.temperature)
        fnu = B_nu(nu, source.temperature)
    else:
        # LTE local-emissivity spectrum: sampled on device at emit time
        # (ref freq_type 3); placeholder CDF, flagged via the lte column
        from .sampling import quantile_grid
        nu = np.geomspace(1e8, 1e17, n_grid)
        return nu, quantile_grid(n_grid)
    # piecewise power-law cumulative (same quadrature as the dust tables)
    from .dtable import _cdf_loglog
    from .sampling import quantile_table, quantile_grid
    cdf = _cdf_loglog(nu, fnu[None, :])[0]
    # Invert onto the cosine-warped quantile grid (log-nu interpolated) so
    # all sources stack AND device-side sampling is an O(1) table lookup —
    # inside the fused transport loop a per-lane binary search costs
    # log2(n) serialized gathers on TPU.
    nu_new = 2.0 ** quantile_table(nu, cdf[None, :], n_grid, log2=True)[0]
    nu_new[0], nu_new[-1] = nu[0], nu[-1]
    return nu_new, quantile_grid(n_grid)


def _flatten_map(grid, arr):
    """Flatten a grid-shaped luminosity map to (n_cells,) in the engine's
    flat-index convention (matching run._flatten_quantity)."""
    try:
        from ..grid import AMRGrid
    except ImportError:
        AMRGrid = ()
    if AMRGrid and isinstance(grid, AMRGrid) and isinstance(arr, list):
        parts = []
        i = 0
        for level in grid.levels:
            for g in level.grids:
                parts.append(np.asarray(arr[i], float).reshape(-1))
                i += 1
        return np.concatenate(parts)
    return np.asarray(arr, float).reshape(-1)


def build_source_tables(sources, dtype=jnp.float32, n_spec=1024,
                        length_scale=1.0, sample_evenly=False, grid=None):
    """Build SourceTables from a list of Source objects.

    PointSourceCollection is expanded into one emission row per point (the
    reference treats the collection as one source with an internal position
    PDF; expanding rows gives the same sampling distribution). Spots are
    expanded the same way: a spotted sphere becomes one whole-surface row at
    the photospheric luminosity plus one cap row per spot (ref spot_pdf,
    source_type.f90:159-190). With ``sample_evenly`` every *top-level* source
    gets equal pick probability and packets carry energy L_source*n_sources/
    L_tot instead of 1 (ref source.f90:118-121,162).

    ``grid`` is required when any source is a MapSource (the per-cell
    luminosity map is flattened in the engine's cell-index convention).
    """
    from ..sources import (PointSource, PointSourceCollection, SphericalSource,
                           ExternalSphericalSource, ExternalBoxSource,
                           PlaneParallelSource, MapSource)

    rows = []
    maps = []
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
        lte = s.has_lte_spectrum()
        spot_rows = []
        if lte and not isinstance(s, MapSource):
            # the reference only permits LTE spectra for diffuse sources
            # (source_type.f90:130,146: point/sphere "cannot have LTE")
            raise ValueError("LTE spectra are only supported for MapSource")
        nu, cdf = _spectrum_cdf(s, n_spec)
        row = dict(code=POINT, position=(0.0, 0.0, 0.0), radius=0.0,
                   limb=False, direction=(0.0, 0.0, 1.0),
                   bounds=np.zeros((3, 2)), luminosity=float(s.luminosity),
                   nu=nu, cdf=cdf, group=i_top, lte=bool(lte))
        if isinstance(s, PointSource):
            row['code'] = POINT
            row['position'] = s.position
        elif isinstance(s, SphericalSource):
            row['code'] = SPHERE
            row['position'] = s.position
            row['radius'] = float(s.radius)
            row['limb'] = bool(s.limb)
            for spot in s.spots:
                # cap row: emits from the spherical section around
                # (longitude, latitude) with angular radius in degrees
                # (ref source_type.f90:176-178)
                spot._check_all_set()
                lon = np.radians(float(spot.longitude))
                lat = np.radians(float(spot.latitude))
                cap_dir = (np.cos(lat) * np.cos(lon),
                           np.cos(lat) * np.sin(lon), np.sin(lat))
                s_nu, s_cdf = _spectrum_cdf(spot, n_spec)
                spot_rows.append(dict(
                    code=SPHERE, position=s.position, radius=float(s.radius),
                    limb=bool(s.limb), direction=(0.0, 0.0, 1.0),
                    bounds=np.zeros((3, 2)),
                    luminosity=float(spot.luminosity),
                    nu=s_nu, cdf=s_cdf, group=i_top,
                    cap_dir=cap_dir,
                    cap_cos=float(np.cos(np.radians(float(spot.radius)))),
                    intersect=False))
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
            if grid is None:
                raise ValueError("build_source_tables needs the model grid "
                                 "to flatten a MapSource luminosity map")
            row['code'] = MAP
            flat_map = np.maximum(_flatten_map(grid, s.map), 0.0)
            total = flat_map.sum()
            if total <= 0:
                raise ValueError("MapSource map has no positive values")
            mcdf = np.cumsum(flat_map) / total
            mcdf[-1] = 1.0
            row['map_row'] = len(maps)
            maps.append(mcdf)
        else:
            raise NotImplementedError("Unsupported source type: %s" % type(s))
        rows.append(row)
        rows.extend(spot_rows)

    L = float(length_scale)
    for r in rows:
        r['position'] = np.asarray(r['position'], float) / L
        r['radius'] = r['radius'] / L
        r['bounds'] = np.asarray(r['bounds'], float) / L
    lum = np.array([r['luminosity'] for r in rows])
    groups = np.array([r['group'] for r in rows], dtype=int)
    n_groups = len(sources)
    if len(rows) == 0:
        # source-less model (legal for monochromatic dust-emission-only
        # imaging, ref iter_final_mono.f90 source loop simply idles):
        # a single zero-luminosity placeholder row keeps shapes static
        nu0 = np.array([1e10, 1e15])
        rows = [dict(code=POINT, luminosity=0.0, position=(0., 0., 0.),
                     radius=0.0, limb=False, direction=(0.0, 0.0, 1.0),
                     bounds=np.zeros((3, 2)), nu=nu0,
                     cdf=np.array([0.0, 1.0]), group=0, lte=False,
                     intersect=False)]
        lum = np.array([0.0])
        groups = np.array([0])
        n_groups = 1
    if sample_evenly and n_groups > 1:
        # equal pick probability per top-level source, luminosity-split
        # within a collection; packets carry a compensating energy weight
        l_group = np.array([lum[groups == g].sum() for g in range(n_groups)])
        p_row = lum / l_group[groups] / n_groups
        lum_cdf = np.cumsum(p_row)
        energy_weight = l_group[groups] * n_groups / lum.sum()
    else:
        lum_cdf = np.cumsum(lum) / max(lum.sum(), 1e-300)
        energy_weight = np.ones(len(rows))
    lum_cdf[-1] = 1.0
    codes = np.array([r['code'] for r in rows], np.int32)
    radii = np.array([r['radius'] for r in rows], float)
    f = lambda a: jnp.asarray(np.asarray(a, float), dtype=dtype)
    intersect = np.array([r.get('intersect', True) for r in rows], bool)
    map_cdf = np.stack(maps) if maps else np.zeros((0, 1))
    lte_col = np.array([r.get('lte', False) for r in rows], bool)
    if not lte_col.any():
        lte_col = np.zeros((0,), bool)
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
        spec_logq=f(np.log2(np.maximum(
            np.asarray([r['nu'] for r in rows], float), 1e-300))),
        energy_total=f(lum.sum()),
        intersect=jnp.asarray((codes == SPHERE) & (radii > 0.0) & intersect),
        cap_dir=f([r.get('cap_dir', (0.0, 0.0, 1.0)) for r in rows]),
        cap_cos=f([r.get('cap_cos', -1.0) for r in rows]),
        map_row=jnp.asarray(np.array([r.get('map_row', -1) for r in rows],
                                     np.int32)),
        map_cdf=f(map_cdf),
        lte=jnp.asarray(lte_col),
    )


def emit_packets(st, key, n, dtype, src=None, geometry=None, lte_ctx=None):
    """Sample n fresh packets: returns dict of arrays (position, direction,
    nu, source id). Energies are 1 (normalized at iteration end, ref
    iter_lucy.f90:219 update_energy_abs(energy_total/energy_current)).

    With ``src`` given ((n,) int32 rows), emit from those sources instead of
    sampling the luminosity CDF — the re-emission path for photons
    re-absorbed by a source (ref emit(reemit=...), source.f90:134-141).

    ``geometry`` is required when the tables contain MapSource rows (cell
    position sampling); ``lte_ctx = (dt, jnu_var_id, jnu_var_frac, se_rho)``
    when any row has an LTE local-emissivity spectrum (ref freq_type 3)."""
    k_src, k_nu, k_dir, k_pos, k_pos2 = jax.random.split(key, 5)

    if src is None:
        u = jax.random.uniform(k_src, (n,), dtype=dtype)
        src = searchsorted_small(st.lum_cdf, u, side='left')
        src = jnp.clip(src, 0, st.n_sources - 1)
    code = st.type_code[src]

    # O(1) spectrum draw: spec_nu rows are quantile grids (cdf == linspace)
    nu = sample_quantile_rows(st.spec_logq, src,
                              jax.random.uniform(k_nu, (n,), dtype=dtype),
                              exp2=True)

    # --- position ---
    pos = st.position[src]
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    # sphere surface point, constrained to the cap around cap_dir for spot
    # rows (plain spheres and extern_sph have cap_cos=-1 -> whole surface;
    # ref emit_from_sphere's rejection loop, source_type.f90:630-639)
    from .sampling import rotate_direction
    k_cap1, k_cap2 = jax.random.split(k_pos)
    u_cap = jax.random.uniform(k_cap1, (n,), dtype=dtype)
    cap_cos = st.cap_cos[src]
    cosc = 1.0 - u_cap * (1.0 - cap_cos)
    phi_cap = jax.random.uniform(k_cap2, (n,), dtype=dtype,
                                 maxval=2 * jnp.pi)
    cd = st.cap_dir[src]
    sx, sy, sz = rotate_direction(cd[:, 0], cd[:, 1], cd[:, 2], cosc, phi_cap)
    on_sphere = (code == SPHERE) | (code == EXTERN_SPH)
    r = st.radius[src]
    x = jnp.where(on_sphere, x + r * sx, x)
    y = jnp.where(on_sphere, y + r * sy, y)
    z = jnp.where(on_sphere, z + r * sz, z)

    # --- map sources: sample a cell from the per-cell luminosity CDF, then
    # a uniform position inside it (ref emit_from_map, source_type.f90:713)
    map_cell = jnp.zeros((n,), dtype=jnp.int32)
    if st.has_map:
        if geometry is None:
            raise ValueError("emit_packets needs geometry for MapSource rows")
        from .raytrace import sample_position_in_cell
        u_map = jax.random.uniform(jax.random.fold_in(k_pos2, 11), (n,),
                                   dtype=dtype)
        n_map = st.map_cdf.shape[0]
        mrow = st.map_row[src]
        for i in range(n_map):
            idx_i = searchsorted_small(st.map_cdf[i], u_map,
                                     side='left').astype(jnp.int32)
            map_cell = jnp.where(mrow == i, idx_i, map_cell)
        map_cell = jnp.clip(map_cell, 0, st.map_cdf.shape[1] - 1)
        mx, my, mz = sample_position_in_cell(
            geometry, map_cell, jax.random.fold_in(k_pos2, 12), dtype)
        in_map = code == MAP
        x = jnp.where(in_map, mx, x)
        y = jnp.where(in_map, my, y)
        z = jnp.where(in_map, mz, z)

    # --- LTE local-emissivity frequency: dust picked ∝ specific_energy*rho
    # at the emission cell, nu from its emissivity CDF (ref
    # select_dust_specific_energy_rho + dust_sample_j_nu,
    # source_type.f90:468-471, grid_physics_3d.f90:101-109)
    if st.has_lte:
        if lte_ctx is None:
            raise ValueError("emit_packets needs lte_ctx for LTE rows")
        dt, jnu_var_id, jnu_var_frac, se_rho = lte_ctx
        from .engine import sample_emission_nu
        k_l1, k_l2 = jax.random.split(jax.random.fold_in(k_nu, 13))
        w = se_rho[:, map_cell].T  # (n, n_dust)
        tot = jnp.sum(w, axis=-1)
        # fallback: uniform dust pick where SE*rho is all zero (iteration 1)
        w = jnp.where(tot[:, None] > 0.0, w, jnp.ones_like(w))
        csum = jnp.cumsum(w, axis=-1)
        u_d = jax.random.uniform(k_l1, (n,), dtype=dtype) * csum[:, -1]
        d_sel = jnp.clip(jnp.sum((csum < u_d[:, None]).astype(jnp.int32),
                                 axis=-1), 0, w.shape[-1] - 1)
        nu_lte = sample_emission_nu(dt, d_sel, jnu_var_id[d_sel, map_cell],
                                    jnu_var_frac[d_sel, map_cell], k_l2)
        nu = jnp.where(st.lte[src], nu_lte, nu)
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

    # surface-emission context for cosine-law peeloff weights
    # (ref emit_from_sphere_peeloff, source_type.f90:692-707): outward
    # normal for spheres, inward for external illumination spheres
    flip = jnp.where(emits_in, -1.0, 1.0)
    return dict(x=x, y=y, z=z, kx=kx, ky=ky, kz=kz, nu=nu, source=src,
                energy=st.energy_weight[src],
                surf=on_sphere, snx=sx * flip, sny=sy * flip, snz=sz * flip,
                limb=st.limb[src])


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
