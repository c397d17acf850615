import numpy as np
import jax
import jax.numpy as jnp

from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.grid import CylindricalPolarGrid
from hyperion_tpu.sources import PointSource
from hyperion_tpu.transport import (build_dust_tables, build_source_tables,
                                    run_lucy)
from hyperion_tpu.transport.gtable_cylindrical import build_cylindrical_geometry
from hyperion_tpu.transport.imaging import escape_tau_walk


def make_grid(n_w=10, n_z=8, n_p=6):
    w_wall = np.hstack([0.0, np.logspace(-2, 0, n_w)])
    z_wall = np.linspace(-1.0, 1.0, n_z + 1)
    p_wall = np.linspace(0.0, 2 * np.pi, n_p + 1)
    return CylindricalPolarGrid(w_wall, z_wall, p_wall)


def test_escape_tau_uniform_cylinder():
    grid = make_grid()
    geo = build_cylindrical_geometry(grid, dtype=jnp.float64)
    rho_phys, chi = 0.6, 1.1
    density = jnp.full((1, geo.n_cells), rho_phys * geo.length_scale,
                       dtype=jnp.float64)
    rng = np.random.RandomState(7)
    n = 2000
    pts = np.stack([rng.uniform(-0.6, 0.6, n), rng.uniform(-0.6, 0.6, n),
                    rng.uniform(-0.8, 0.8, n)])
    dirs = rng.normal(size=(3, n))
    dirs /= np.linalg.norm(dirs, axis=0)
    x, y, z = [jnp.asarray(p) for p in pts]
    kx, ky, kz = [jnp.asarray(d) for d in dirs]
    cell = geo.find_cell(x, y, z, kx, ky, kz)
    assert int((cell < 0).sum()) == 0
    chi_rows = jnp.full((n, 1), chi, dtype=jnp.float64)
    tau = np.asarray(escape_tau_walk(geo, density, chi_rows, x, y, z,
                                     kx, ky, kz, cell,
                                     jnp.ones(n, dtype=bool)))
    # analytic: distance to exit of the (w<=1, |z|<=1) cylinder
    a = dirs[0] ** 2 + dirs[1] ** 2
    b = (pts[0] * dirs[0] + pts[1] * dirs[1])
    c = pts[0] ** 2 + pts[1] ** 2 - 1.0
    with np.errstate(invalid='ignore', divide='ignore'):
        t_cyl = (-b + np.sqrt(b * b - a * c)) / a
    t_cyl[a < 1e-12] = np.inf
    t_z = np.where(dirs[2] > 0, (1.0 - pts[2]) / dirs[2],
                   np.where(dirs[2] < 0, (-1.0 - pts[2]) / dirs[2], np.inf))
    chord = np.minimum(t_cyl, t_z)
    expected = chi * rho_phys * geo.length_scale * chord
    assert np.allclose(tau, expected, rtol=1e-10)


def test_cylindrical_lucy_offset_source():
    grid = make_grid(n_w=8, n_z=6, n_p=5)
    geo = build_cylindrical_geometry(grid, dtype=jnp.float64)
    dust = IsotropicDust(np.logspace(5, 18, 20), np.repeat(0.4, 20),
                         np.repeat(1.0, 20))
    dt = build_dust_tables([dust], dtype=jnp.float64)
    src = PointSource(luminosity=1.0, temperature=5000.0,
                      position=(0.25, 0.1, -0.3))
    st = build_source_tables([src], dtype=jnp.float64,
                             length_scale=geo.length_scale)
    density = jnp.full((1, geo.n_cells), 0.4 * geo.length_scale,
                       dtype=jnp.float64)
    res = run_lucy(geo, dt, st, density, jax.random.PRNGKey(9),
                   n_photons=100000, n_iterations=1, batch_size=8192,
                   verbose=False)
    assert res.killed_geo == 0
    assert res.killed_int == 0
    assert np.isclose(res.energy_current, 100000.0)
    assert np.all(res.specific_energy >= 0)
