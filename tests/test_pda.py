"""PDA (partial diffusion approximation) tests
(ref: grid_pda_3d.f90 semantics; test strategy mirrors the reference's
physics sanity checks)."""

import numpy as np
import jax.numpy as jnp

from hyperion_tpu.grid import CartesianGrid, SphericalPolarGrid
from hyperion_tpu.dust import IsotropicDust
from hyperion_tpu.transport import build_dust_tables
from hyperion_tpu.transport.pda import build_pda_tables, solve_pda


def gray_dust_tables():
    nu = np.logspace(5, 18, 16)
    dust = IsotropicDust(nu, np.repeat(0.4, 16), np.repeat(1.0, 16))
    return build_dust_tables([dust], dtype=jnp.float64)


def test_pda_laplace_linear_profile():
    """Gray dust (constant opacities) + uniform density: the diffusion
    equation is Laplace's equation, so a linear boundary profile must be
    reproduced exactly in the starved interior."""
    n = 10
    w = np.linspace(0.0, 1.0, n + 1)
    grid = CartesianGrid(w, w, w)
    tables = build_pda_tables(grid)
    dt = gray_dust_tables()

    n_cells = n ** 3
    i1 = np.arange(n_cells) % n
    x = (w[:-1] + w[1:])[i1] / 2

    density = np.full((1, n_cells), 1.0)
    # linear specific-energy profile in x
    se_true = (1.0 + 2.0 * x)[None, :] * 1e-2
    se = se_true.copy()

    # starve an interior block
    i2 = (np.arange(n_cells) // n) % n
    i3 = np.arange(n_cells) // n ** 2
    starved = ((i1 >= 3) & (i1 <= 6) & (i2 >= 3) & (i2 <= 6) &
               (i3 >= 3) & (i3 <= 6))
    se[0, starved] = 37.0  # garbage that PDA must replace
    n_phot = np.where(starved, 0, 1000)

    se_fix, n_pda = solve_pda(tables, dt, density, se, n_phot)
    assert n_pda == starved.sum()
    assert np.allclose(se_fix[0, starved], se_true[0, starved], rtol=2e-3)
    # non-starved cells untouched
    assert np.array_equal(se_fix[0, ~starved], se[0, ~starved])


def test_pda_no_starved_cells():
    n = 4
    w = np.linspace(0.0, 1.0, n + 1)
    grid = CartesianGrid(w, w, w)
    tables = build_pda_tables(grid)
    dt = gray_dust_tables()
    n_cells = n ** 3
    se = np.full((1, n_cells), 1e-3)
    se_fix, n_pda = solve_pda(tables, dt, np.ones((1, n_cells)), se,
                              np.full(n_cells, 100))
    assert n_pda == 0
    assert np.array_equal(se_fix, se)


def test_pda_spherical_tables():
    """Spherical tables build and solve without boundary leakage."""
    r = np.linspace(0.0, 1.0, 9)
    t = np.linspace(0.0, np.pi, 7)
    p = np.linspace(0.0, 2 * np.pi, 5)
    grid = SphericalPolarGrid(r, t, p)
    tables = build_pda_tables(grid)
    dt = gray_dust_tables()
    n_cells = 8 * 6 * 4
    density = np.full((1, n_cells), 1.0)
    se = np.full((1, n_cells), 1e-2)
    starved = np.zeros(n_cells, dtype=bool)
    # starve some interior cells (r index 3..4, theta 2..3)
    i1 = np.arange(n_cells) % 8
    i2 = (np.arange(n_cells) // 8) % 6
    starved = (i1 >= 3) & (i1 <= 4) & (i2 >= 2) & (i2 <= 3)
    se2 = se.copy()
    se2[0, starved] = 99.0
    n_phot = np.where(starved, 0, 1000)
    se_fix, n_pda = solve_pda(tables, dt, density, se2, n_phot)
    assert n_pda == starved.sum()
    # uniform boundary -> uniform interior
    assert np.allclose(se_fix[0, starved], 1e-2, rtol=5e-3)


def test_pda_octree_tables():
    """Octree graph PDA: a uniform boundary field fills a starved interior
    leaf with the same value (beyond the reference, which has no octree
    PDA)."""
    from hyperion_tpu.grid import OctreeGrid
    # root split once; child 0 split again -> 1 + 8 + 8 = 17 nodes
    refined = np.zeros(17, dtype=bool)
    refined[0] = True
    refined[1] = True
    grid = OctreeGrid(0., 0., 0., 1., 1., 1., refined)
    tables = build_pda_tables(grid)
    assert tables.n_cells == 17
    # interior cells exist (fine leaves inside the domain)
    assert tables.allowed.any()
    dt = gray_dust_tables()
    density = np.full((1, 17), 1.0)
    se = np.full((1, 17), 1e-2)
    starved_cell = np.where(tables.allowed)[0][0]
    se2 = se.copy()
    se2[0, starved_cell] = 42.0
    n_phot = np.full(17, 1000)
    n_phot[starved_cell] = 0
    se_fix, n_pda = solve_pda(tables, dt, density, se2, n_phot)
    assert n_pda == 1
    assert np.allclose(se_fix[0, starved_cell], 1e-2, rtol=5e-3)


def test_pda_voronoi_tables():
    from hyperion_tpu.grid import VoronoiGrid
    rng = np.random.RandomState(42)
    n = 200
    grid = VoronoiGrid(rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                       rng.uniform(-1, 1, n))
    tables = build_pda_tables(grid)
    assert tables.n_cells == n
    assert tables.allowed.any() and not tables.allowed.all()
    dt = gray_dust_tables()
    density = np.full((1, n), 1.0)
    se = np.full((1, n), 1e-2)
    starved = np.where(tables.allowed)[0][:5]
    se2 = se.copy()
    se2[0, starved] = 3.14
    n_phot = np.full(n, 1000)
    n_phot[starved] = 0
    se_fix, n_pda = solve_pda(tables, dt, density, se2, n_phot)
    assert n_pda == len(starved)
    assert np.allclose(se_fix[0, starved], 1e-2, rtol=1e-2)


def test_pda_amr_tables():
    from hyperion_tpu.grid import AMRGrid
    amr = AMRGrid()
    level = amr.add_level()
    g = level.add_grid()
    g.xmin, g.xmax = -1., 1.
    g.ymin, g.ymax = -1., 1.
    g.zmin, g.zmax = -1., 1.
    g.nx = g.ny = g.nz = 6
    tables = build_pda_tables(amr)
    assert tables.n_cells == 216
    dt = gray_dust_tables()
    density = np.full((1, 216), 1.0)
    se = np.full((1, 216), 1e-2)
    starved = np.where(tables.allowed)[0][:8]
    se2 = se.copy()
    se2[0, starved] = 7.0
    n_phot = np.full(216, 1000)
    n_phot[starved] = 0
    se_fix, n_pda = solve_pda(tables, dt, density, se2, n_phot)
    assert n_pda == len(starved)
    assert np.allclose(se_fix[0, starved], 1e-2, rtol=5e-3)


def test_pda_exact_matches_jacobi():
    """The sparse direct solve and the Jacobi relaxation converge to the
    same diffusion solution (they solve the same linear system)."""
    import hyperion_tpu.transport.pda as pda_mod
    n = 8
    w = np.linspace(0.0, 1.0, n + 1)
    grid = CartesianGrid(w, w, w)
    tables = build_pda_tables(grid)
    dt = gray_dust_tables()
    n_cells = n ** 3
    i1 = np.arange(n_cells) % n
    x = (w[:-1] + w[1:])[i1] / 2
    density = np.full((1, n_cells), 1.0)
    se_true = (1.0 + 2.0 * x)[None, :] * 1e-2
    i2 = (np.arange(n_cells) // n) % n
    i3 = np.arange(n_cells) // n ** 2
    starved = ((i1 >= 2) & (i1 <= 5) & (i2 >= 2) & (i2 <= 5) &
               (i3 >= 2) & (i3 <= 5))
    se = se_true.copy()
    se[0, starved] = 11.0
    n_phot = np.where(starved, 0, 1000)

    se_exact, _ = solve_pda(tables, dt, density, se.copy(), n_phot)
    old = pda_mod.N_EXACT_MAX
    pda_mod.N_EXACT_MAX = 0  # force the Jacobi path
    try:
        se_jac, _ = solve_pda(tables, dt, density, se.copy(), n_phot)
    finally:
        pda_mod.N_EXACT_MAX = old
    assert np.allclose(se_exact[0, starved], se_jac[0, starved], rtol=5e-3)
