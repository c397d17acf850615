"""Orion/BoxLib plotfile importer (ref importers/orion.py parse_orion):
round-trip against a synthetic plotfile written in the BoxLib on-disk
format."""

import os

import numpy as np
import pytest

from hyperion_tpu.importers.orion import parse_orion


def _write_plotfile(dirname, levels, quantities, stars=()):
    """Write a minimal BoxLib plotfile: levels = [[(bounds, shape), ...]],
    quantities = {name: [[array per fab per level]]}."""
    os.makedirs(dirname)
    names = list(quantities)
    n_levels = len(levels)
    with open(os.path.join(dirname, 'Header'), 'w') as f:
        f.write("HyperCLaw-V1.1\n")
        f.write("%d\n" % len(names))
        for q in names:
            f.write(q + "\n")
        f.write("3\n")                       # ndim
        f.write("0.0\n")                     # time
        f.write("%d\n" % (n_levels - 1))     # finest level
        f.write("0.0 0.0 0.0\n")
        f.write("1.0 1.0 1.0\n")
        f.write(" ".join(["2"] * max(n_levels - 1, 1)) + "\n")
        f.write(" ".join("((0,0,0) (7,7,7) (0,0,0))"
                         for _ in range(n_levels)) + "\n")
        f.write(" ".join(["10"] * n_levels) + "\n")
        for _ in range(n_levels):
            f.write("0.125 0.125 0.125\n")
        f.write("0\n")                       # coordtype
        f.write("0\n")                       # dummy
        for ilev, fabs in enumerate(levels):
            f.write("%d %d 0.0\n" % (ilev, len(fabs)))
            f.write("10\n")
            for (bounds, shape) in fabs:
                f.write("%r %r\n" % (bounds[0], bounds[1]))
                f.write("%r %r\n" % (bounds[2], bounds[3]))
                f.write("%r %r\n" % (bounds[4], bounds[5]))
            f.write("Level_%d/Cell\n" % ilev)
            _write_multifab(dirname, ilev, fabs, names,
                            [quantities[q][ilev] for q in names])
    with open(os.path.join(dirname, 'StarParticles'), 'w') as f:
        f.write("%d\n" % len(stars))
        for (m, x, y, z, r, mdot) in stars:
            row = [m, x, y, z] + [0.0] * 7 + [r, 0.0, 0.0, mdot, 1.0]
            f.write(" ".join("%r" % v for v in row) + "\n")


def _write_multifab(dirname, ilev, fabs, names, arrays_per_name):
    lev_dir = os.path.join(dirname, 'Level_%d' % ilev)
    os.makedirs(lev_dir, exist_ok=True)
    offsets = []
    data_name = 'Cell_D_00000'
    with open(os.path.join(lev_dir, data_name), 'wb') as fd:
        for i, (bounds, shape) in enumerate(fabs):
            nz, ny, nx = shape
            offsets.append(fd.tell())
            box = "((0,0,0) (%d,%d,%d) (0,0,0))" % (nx - 1, ny - 1, nz - 1)
            fd.write(("FAB ((8, (64 11 52 0 1 12 0 1023)),"
                      "(8, (1 2 3 4 5 6 7 8))) %s %d\n"
                      % (box, len(names))).encode('ascii'))
            for arrays in arrays_per_name:
                fd.write(np.asarray(arrays[i], '>f8').tobytes())
    with open(os.path.join(lev_dir, 'Cell_H'), 'w') as fh:
        fh.write("1\n1\n%d\n0\n" % len(names))
        fh.write("(%d 0\n" % len(fabs))
        for (bounds, shape) in fabs:
            nz, ny, nx = shape
            fh.write("((0,0,0) (%d,%d,%d) (0,0,0))\n"
                     % (nx - 1, ny - 1, nz - 1))
        fh.write(")\n")
        fh.write("%d\n" % len(fabs))
        for off in offsets:
            fh.write("FabOnDisk: %s %d\n" % (data_name, off))


@pytest.fixture
def plotfile(tmp_path):
    rng = np.random.default_rng(42)
    d = str(tmp_path / 'plt00010')
    fabs0 = [((0.0, 1.0, 0.0, 1.0, 0.0, 1.0), (4, 4, 8))]
    fabs1 = [((0.0, 0.5, 0.0, 0.5, 0.0, 0.5), (4, 4, 4)),
             ((0.5, 1.0, 0.5, 1.0, 0.5, 1.0), (2, 6, 4))]
    dens = [[rng.random(s) for (_, s) in fabs0],
            [rng.random(s) for (_, s) in fabs1]]
    temp = [[rng.random(s) for (_, s) in fabs0],
            [rng.random(s) for (_, s) in fabs1]]
    _write_plotfile(d, [fabs0, fabs1],
                    {'density': dens, 'temperature': temp},
                    stars=[(2.0, 0.1, 0.2, 0.3, 1e11, 1e-6)])
    return d, dens, temp


@pytest.mark.smoke
def test_parse_orion_density(plotfile):
    d, dens, temp = plotfile
    amr, stars = parse_orion(d, quantities='density')
    assert len(amr.levels) == 2
    assert len(amr.levels[0].grids) == 1
    assert len(amr.levels[1].grids) == 2
    g = amr.levels[1].grids[1]
    assert (g.nz, g.ny, g.nx) == (2, 6, 4)
    assert g.xmin == 0.5 and g.zmax == 1.0
    np.testing.assert_allclose(g.quantities['density'], dens[1][1])
    assert 'temperature' not in g.quantities
    assert len(stars) == 1
    s = stars[0]
    assert (s.m, s.x, s.r, s.mdot) == (2.0, 0.1, 1e11, 1e-6)


def test_parse_orion_all_quantities_and_max_level(plotfile):
    d, dens, temp = plotfile
    amr, _ = parse_orion(d, quantities='all', max_level=1)
    assert len(amr.levels) == 1
    g = amr.levels[0].grids[0]
    np.testing.assert_allclose(g.quantities['temperature'], temp[0][0])
    np.testing.assert_allclose(g.quantities['density'], dens[0][0])


def test_parse_orion_unknown_quantity(plotfile):
    d, _, _ = plotfile
    with pytest.raises(ValueError, match="not in plotfile"):
        parse_orion(d, quantities='pressure')


def test_parse_orion_grid_runs_through_model(plotfile, tmp_path):
    """The imported AMRGrid drives an actual model run."""
    import jax.numpy as jnp
    from hyperion_tpu.dust import IsotropicDust
    from hyperion_tpu.model import Model
    from hyperion_tpu.model.run import run_model
    d, _, _ = plotfile
    amr, stars = parse_orion(d, quantities='density')
    nu = np.logspace(5, 18, 16)
    dust = IsotropicDust(nu, np.repeat(0.4, 16), np.repeat(1.0, 16))
    m = Model()
    m.set_amr_grid(amr)
    m.add_density_grid(amr['density'], dust)
    s = m.add_point_source()
    s.position = (0.5, 0.5, 0.5)
    s.luminosity = 1.0
    s.temperature = 5000.0
    m.set_n_photons(initial=500, imaging=0)
    m.set_n_initial_iterations(1)
    out = str(tmp_path / 'orion.rtout')
    run_model(m, out)
    import h5py
    with h5py.File(out, 'r') as f:
        assert 'date_ended' in f.attrs
