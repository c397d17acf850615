"""Engine-side emission for the full source menagerie: spots, MapSource,
LTE local-emissivity spectra (ref source_type.f90 types 3/4, freq_type 3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.grid import CartesianGrid
from hyperion_tpu.sources import SphericalSource, MapSource, PointSource
from hyperion_tpu.transport import (build_dust_tables,
                                    build_cartesian_geometry,
                                    build_source_tables)
from hyperion_tpu.transport.stable import emit_packets, MAP, SPHERE


def _grid(n=5, half=10.0):
    w = np.linspace(-half, half, n + 1)
    return CartesianGrid(w, w, w)


def _dust():
    nu = np.geomspace(1e8, 1e17, 32)
    return IsotropicDust(nu, np.full_like(nu, 0.5), np.full_like(nu, 2.0))


def test_spot_rows_expand():
    s = SphericalSource(luminosity=4.0, temperature=5000.0, radius=1.0,
                        position=(0.0, 0.0, 0.0))
    s.add_spot(luminosity=1.0, temperature=10000.0, longitude=0.0,
               latitude=90.0, radius=20.0)
    st = build_source_tables([s], dtype=jnp.float64)
    assert st.n_sources == 2
    caps = np.asarray(st.cap_cos)
    assert caps[0] == -1.0
    assert np.isclose(caps[1], np.cos(np.radians(20.0)))
    # spot luminosity joins the CDF: spot picked ~1/5 of the time
    lum = np.asarray(st.luminosity)
    assert np.isclose(lum.sum(), 5.0)
    # only the parent sphere row intersects (re-absorption target)
    assert list(np.asarray(st.intersect)) == [True, False]


def test_spot_emission_confined_to_cap():
    s = SphericalSource(luminosity=1e-6, temperature=5000.0, radius=2.0,
                        position=(0.0, 0.0, 0.0))
    s.add_spot(luminosity=1e6, temperature=10000.0, longitude=45.0,
               latitude=30.0, radius=15.0)
    st = build_source_tables([s], dtype=jnp.float64)
    new = emit_packets(st, jax.random.PRNGKey(0), 4096, jnp.float64)
    sel = np.asarray(new['source']) == 1
    assert sel.mean() > 0.99  # essentially always the spot
    x = np.asarray(new['x'])[sel]
    y = np.asarray(new['y'])[sel]
    z = np.asarray(new['z'])[sel]
    r = np.sqrt(x ** 2 + y ** 2 + z ** 2)
    assert np.allclose(r, 2.0, rtol=1e-6)
    lon, lat = np.radians(45.0), np.radians(30.0)
    cd = np.array([np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon),
                   np.sin(lat)])
    mu = (x * cd[0] + y * cd[1] + z * cd[2]) / r
    assert mu.min() >= np.cos(np.radians(15.0)) - 1e-6
    # outward-ish directions: k . n >= 0
    n = np.stack([x, y, z], -1) / r[:, None]
    k = np.stack([np.asarray(new['kx'])[sel], np.asarray(new['ky'])[sel],
                  np.asarray(new['kz'])[sel]], -1)
    assert (np.sum(n * k, -1) >= -1e-6).all()


def test_map_source_emission_positions():
    grid = _grid(n=5)
    geometry = build_cartesian_geometry(grid, dtype=jnp.float64)
    m = np.zeros((5, 5, 5))
    m[2, 2, 2] = 1.0  # single hot cell at the center
    src = MapSource(luminosity=1.0, temperature=100.0, map=m)
    st = build_source_tables([src], dtype=jnp.float64, grid=grid,
                             length_scale=geometry.length_scale)
    assert st.has_map and not st.has_lte
    new = emit_packets(st, jax.random.PRNGKey(1), 2048, jnp.float64,
                       geometry=geometry)
    cell = geometry.find_cell(new['x'], new['y'], new['z'],
                              new['kx'], new['ky'], new['kz'])
    want = np.ravel_multi_index((2, 2, 2), (5, 5, 5))
    assert (np.asarray(cell) == want).all()


def test_map_source_lte_spectrum():
    grid = _grid(n=3)
    geometry = build_cartesian_geometry(grid, dtype=jnp.float64)
    dt = build_dust_tables([_dust()], dtype=jnp.float64)
    m = np.ones((3, 3, 3))
    src = MapSource(luminosity=1.0, map=m)  # no spectrum/temperature -> LTE
    assert src.has_lte_spectrum
    st = build_source_tables([src], dtype=jnp.float64, grid=grid,
                             length_scale=geometry.length_scale)
    assert st.has_lte
    n_cells = 27
    se_rho = jnp.ones((1, n_cells), dtype=jnp.float64)
    jnu_id = jnp.zeros((1, n_cells), dtype=jnp.int32)
    jnu_fr = jnp.zeros((1, n_cells), dtype=jnp.float64)
    new = emit_packets(st, jax.random.PRNGKey(2), 1024, jnp.float64,
                       geometry=geometry,
                       lte_ctx=(dt, jnu_id, jnu_fr, se_rho))
    nu = np.asarray(new['nu'])
    e_nu = np.asarray(dt.emiss_nu[0])
    assert (nu >= e_nu[0] * 0.999).all() and (nu <= e_nu[-1] * 1.001).all()
    assert np.unique(nu).size > 100  # a real spread, not a constant


def test_lte_rejected_for_point_source():
    s = PointSource(luminosity=1.0, position=(0., 0., 0.))
    # no spectrum and no temperature -> would be LTE; engine must refuse
    with pytest.raises(ValueError):
        build_source_tables([s], dtype=jnp.float64)


def test_map_source_through_lucy():
    from hyperion_tpu.transport import run_lucy
    grid = _grid(n=4, half=5.0)
    geometry = build_cartesian_geometry(grid, dtype=jnp.float64)
    dt = build_dust_tables([_dust()], dtype=jnp.float64)
    m = np.ones((4, 4, 4))
    src = MapSource(luminosity=3.8e33, map=m)  # LTE accretion-style source
    st = build_source_tables([src], dtype=jnp.float64, grid=grid,
                             length_scale=geometry.length_scale)
    density = jnp.full((1, 64), 1e-19 * geometry.length_scale,
                       dtype=jnp.float64)
    res = run_lucy(geometry, dt, st, density, jax.random.PRNGKey(3),
                   n_photons=2000, n_iterations=2, batch_size=512,
                   verbose=False)
    assert res.specific_energy.min() > 0.0
    assert res.killed_int == 0
