"""Native engine execution of a Model: the replacement for the reference's
``hyperion`` launcher + Fortran main program (ref: src/main/main.f90:99-356).

Builds device tables from the assembled model, runs the Lucy temperature
loop (and later: imaging / raytracing / monochromatic iterations), and
writes a reference-layout .rtout file (iteration_%05d grid groups, root
attributes, embedded /Input copy)."""

import datetime
import time

import numpy as np


def _engine_dtype(dtype):
    import jax
    import jax.numpy as jnp
    if dtype is not None:
        return dtype
    # f64 when x64 is enabled (CPU validation runs), else f32 (TPU)
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def build_geometry_tables(grid, dtype):
    from ..grid import CartesianGrid, SphericalPolarGrid, CylindricalPolarGrid
    from ..transport.gtable import build_cartesian_geometry
    if isinstance(grid, CartesianGrid):
        return build_cartesian_geometry(grid, dtype=dtype)
    elif isinstance(grid, SphericalPolarGrid):
        from ..transport.gtable_spherical import build_spherical_geometry
        return build_spherical_geometry(grid, dtype=dtype)
    elif isinstance(grid, CylindricalPolarGrid):
        from ..transport.gtable_cylindrical import build_cylindrical_geometry
        return build_cylindrical_geometry(grid, dtype=dtype)
    from ..grid import OctreeGrid, AMRGrid, VoronoiGrid
    if isinstance(grid, OctreeGrid):
        from ..transport.gtable_octree import build_octree_geometry
        return build_octree_geometry(grid, dtype=dtype)
    if isinstance(grid, AMRGrid):
        from ..transport.gtable_amr import build_amr_geometry
        return build_amr_geometry(grid, dtype=dtype)
    if isinstance(grid, VoronoiGrid):
        from ..transport.gtable_voronoi import build_voronoi_geometry
        return build_voronoi_geometry(grid, dtype=dtype)
    raise NotImplementedError("Geometry not yet supported by the transport "
                              "engine: %s" % type(grid))


def _flatten_quantity(grid, quantity):
    """Per-dust quantity arrays -> (n_dust, n_cells) float64, handling the
    AMR per-fab layout (fabs flattened level-major, matching
    gtable_amr.build_amr_geometry)."""
    from ..grid import AMRGrid
    if isinstance(grid, AMRGrid):
        n_pop = None
        for level in grid.levels:
            for g in level.grids:
                q = g.quantities[quantity]
                n_pop = len(q) if isinstance(q, list) else 1
                break
            break
        rows = []
        for i in range(n_pop):
            parts = []
            for level in grid.levels:
                for g in level.grids:
                    q = g.quantities[quantity]
                    arr = q[i] if isinstance(q, list) else q
                    parts.append(np.asarray(arr, float).reshape(-1))
            rows.append(np.concatenate(parts))
        return np.array(rows)
    q = grid.quantities[quantity]
    return np.array([np.asarray(d, float).reshape(-1) for d in q])


def _density_array(model, dtype, length_scale):
    """Flatten per-dust densities to (n_dust, n_cells) in ENGINE units:
    multiplied by the geometry length scale so chi*rho*ds is scale-free.

    Non-zero densities are floored to an f32-safe tiny value: analytic
    density profiles produce Gaussian tails down to ~1e-200 g/cm3 which
    underflow to zero in float32 (TPUs also flush subnormals).  A cell whose
    density underflows would never receive Lucy deposits — but the Lucy
    specific-energy estimator is density-independent (sum E*kappa*ds/V, the
    rho cancels), so such cells carry a physically meaningful radiation-field
    temperature in the reference (f64 Fortran) and act as Dirichlet anchors
    for the PDA.  The floor (1e-30 engine units ~ 1e-45 g/cm3) adds
    negligible optical depth (chi*rho*ds < 1e-25 per grid crossing) while
    keeping 'has dust' semantics identical to the f64 reference."""
    import jax.numpy as jnp
    arr = _flatten_quantity(model.grid, 'density') * length_scale
    arr = np.where(arr > 0.0, np.maximum(arr, 1e-30), 0.0)
    return jnp.asarray(arr, dtype=dtype)


def _initial_specific_energy(model, n_dust, n_cells, dtype):
    import jax.numpy as jnp
    if 'specific_energy' in model.grid:
        arr = _flatten_quantity(model.grid, 'specific_energy')
        return jnp.asarray(arr, dtype=dtype)
    return None


def _write_grid_dataset(group, name, flat, model_grid, compression='gzip',
                        io_dtype=None):
    """Write a flat (n_cells,) or (n_dust, n_cells) array back in the
    grid's on-disk layout (structured: (ndust, n3, n2, n1); AMR: per
    level_*/grid_* datasets; voronoi/octree: flat).

    ``io_dtype``: on-disk float width for physical arrays, from
    ``set_output_bytes`` (ref grid_io.f90 writes f4 when io_bytes=4,
    conf_files.py:700)."""
    from ..grid import AMRGrid
    flat = np.asarray(flat)
    if io_dtype is not None and flat.dtype.kind == 'f':
        flat = flat.astype(io_dtype)
    if isinstance(model_grid, AMRGrid):
        pos = 0
        for ilevel, level in enumerate(model_grid.levels):
            g_level = group.require_group('level_%05i' % (ilevel + 1))
            for igrid, g in enumerate(level.grids):
                g_grid = g_level.require_group('grid_%05i' % (igrid + 1))
                n = g.nx * g.ny * g.nz
                block = flat[..., pos:pos + n]
                shape = flat.shape[:-1] + (g.nz, g.ny, g.nx)
                g_grid.create_dataset(name, data=block.reshape(shape),
                                      compression=compression)
                pos += n
        return
    shape = model_grid.shape
    if shape is not None and len(shape) > 1:
        flat = flat.reshape(flat.shape[:-1] + shape)
    group.create_dataset(name, data=flat, compression=compression)


def _pda_tables(model):
    if not model.pda:
        return None
    from ..transport.pda import build_pda_tables
    return build_pda_tables(model.grid)


def _validate_model(geometry, st, dt):
    """Fail fast on misconfigurations the reference engine aborts on at
    runtime (ref hyperion/model/tests/test_fortran.py:13-84): sources
    placed outside the grid ("photon was not emitted inside a cell") and
    source spectra extending beyond the dust frequency tables ("photon
    frequency ... is outside the range defined ... for the dust optical
    properties"). Checking statically up front gives the same guarantee
    without waiting for an unlucky sample."""
    import numpy as np
    from ..transport.stable import POINT, SPHERE
    from ..transport.gtable import ESCAPED

    codes = np.asarray(st.type_code)
    pos = np.asarray(st.position, float)
    check = np.isin(codes, (POINT, SPHERE))
    if check.any():
        import jax.numpy as jnp
        p = pos[check]
        z = jnp.zeros(p.shape[0])
        cell = geometry.find_cell(jnp.asarray(p[:, 0]), jnp.asarray(p[:, 1]),
                                  jnp.asarray(p[:, 2]), z, z, z + 1.0)
        bad = np.asarray(cell) == ESCAPED
        if bad.any():
            i = int(np.where(check)[0][np.where(bad)[0][0]])
            raise ValueError(
                "photon was not emitted inside a cell: source %d at "
                "position %s lies outside the grid" % (i, pos[i] *
                                                       geometry.length_scale))

    nu_lo = float(np.asarray(dt.nu).min())
    nu_hi = float(np.asarray(dt.nu).max())
    spec = np.asarray(st.spec_nu, float)
    lte = np.asarray(st.lte, bool) if st.has_lte else \
        np.zeros(spec.shape[0], bool)
    for i in range(spec.shape[0]):
        if lte[i]:
            continue
        if spec[i].min() < nu_lo * (1 - 1e-10) or \
                spec[i].max() > nu_hi * (1 + 1e-10):
            raise ValueError(
                "photon frequency for source %d (range %.3e-%.3e Hz) is "
                "outside the range defined (%.3e-%.3e Hz) for the dust "
                "optical properties" % (i, spec[i].min(), spec[i].max(),
                                        nu_lo, nu_hi))


def run_model(model, filename, batch_size=None, dtype=None, parallel=False,
              shard_grid=False):
    """Execute the model and write the .rtout file.

    ``parallel``: False/1 = single device; True = all local devices;
    int n = first n devices. Photon batches are data-parallel over the
    resulting mesh in every Monte-Carlo stage (the analog of the reference's
    ``mpirun -n N hyperion_*_mpi``, ref scripts/hyperion:60-92).

    ``shard_grid``: additionally shard the GRID state over the mesh for the
    Lucy iterations (slab decomposition + ppermute packet exchange,
    parallel/spatial.py) — the memory-scaling axis the reference's
    replicated-grid MPI design lacks. Imaging stages stay photon-DP."""
    import h5py
    import jax
    import jax.numpy as jnp
    from ..transport import (build_dust_tables, build_source_tables, run_lucy)
    from ..transport.lucy import specific_energy_to_temperature
    from ..parallel.mesh import resolve_mesh

    t_start = time.time()
    dtype = _engine_dtype(dtype)
    mesh = resolve_mesh(parallel)

    dusts = model._dust_objects()
    if not dusts:
        raise Exception("Cannot run a model with no dust or density "
                        "(pure-source models are not yet supported)")

    geometry = build_geometry_tables(model.grid, dtype)
    dt = build_dust_tables(dusts, dtype=dtype)
    st = build_source_tables(model.sources, dtype=dtype,
                             length_scale=geometry.length_scale,
                             sample_evenly=model.sample_sources_evenly,
                             grid=model.grid)
    density = _density_array(model, dtype, geometry.length_scale)
    n_cells = density.shape[1]
    _validate_model(geometry, st, dt)

    user_batch_size = batch_size
    if batch_size is None:
        # Heuristic: large enough to fill the VPU, bounded by photon count
        n_init = model.n_photons.get('initial', 100000)
        batch_size = int(min(2 ** 17, max(4096, n_init // 4)))

    min_se = model._resolved_minimum_specific_energy(dusts)
    init_se = _initial_specific_energy(model, dt.n_dust, n_cells, dtype)

    seed = model._seed
    key = jax.random.PRNGKey(abs(seed) % (2 ** 31))

    from ..util.perf import PerfTable
    perf = PerfTable()
    iterations = []
    _iter_t = [time.time()]

    def callback(it, se, rho, n_photons_cell, se_spectrum=None, stats=None):
        now = time.time()
        stats = stats or {}
        perf.add('lucy iteration %d' % it, now - _iter_t[-1],
                 photons=n_initial, events=stats.get('n_events'),
                 steps=stats.get('n_steps'),
                 lanes=stats.get('batch_size'))
        _iter_t.append(now)
        # the engine density array carries the length_scale factor; store the
        # physical density so written datasets don't depend on the extent
        iterations.append(dict(
            specific_energy=se.copy(),
            density=np.asarray(rho, float) / geometry.length_scale,
            n_photons=n_photons_cell.copy(),
            specific_energy_spectrum=(se_spectrum.copy()
                                      if se_spectrum is not None else None)))

    n_initial = model.n_photons.get('initial', 0)
    # original physical density for the density_diff output (the engine
    # array carries the length_scale factor)
    density0 = np.asarray(density, float) / geometry.length_scale
    result = None
    if model.n_iterations > 0 and n_initial > 0:
        result = run_lucy(
            geometry, dt, st, density, key,
            n_photons=n_initial,
            n_iterations=model.n_iterations,
            batch_size=batch_size,
            n_inter_max=model.n_inter_max,
            kill_on_scatter=model.kill_on_scatter,
            kill_on_absorb=model.kill_on_absorb,
            n_reabs_max=model.n_reabs_max,
            minimum_specific_energy=min_se,
            enforce_energy_range=model.enforce_energy_range,
            check_convergence=model.check_convergence,
            convergence_absolute=getattr(model, 'convergence_absolute', 0.0),
            convergence_relative=getattr(model, 'convergence_relative', 1.02),
            convergence_percentile=getattr(model, 'convergence_percentile', 100.0),
            initial_specific_energy=init_se,
            additional_specific_energy=(
                init_se if (init_se is not None and
                            model.specific_energy_type == 'additional')
                else None),
            use_mrw=model.mrw,
            mrw_gamma=getattr(model, 'mrw_gamma', 1.0),
            n_mrw_max=getattr(model, 'n_inter_mrw_max', 1000),
            use_pda=model.pda, pda_tables=_pda_tables(model),
            check_frequency=getattr(model, '_frequency', 0.0),
            spectrum_bins=model.specific_energy_spectrum_bins,
            mesh=mesh, shard_grid=shard_grid, verbose=True,
            iteration_callback=callback)

    # ---- write output -------------------------------------------------------
    out = h5py.File(filename, 'w')
    out.attrs['python_version'] = np.bytes_("hyperion_tpu")
    out.attrs['date_started'] = np.bytes_(
        datetime.datetime.now().isoformat())

    n_iter_done = len(iterations)
    oc = model.conf.output

    for i, itdata in enumerate(iterations):
        g = out.create_group('iteration_%05i' % (i + 1))
        last = (i == n_iter_done - 1)

        def want(setting):
            return setting == 'all' or (setting == 'last' and last)

        io_dtype = np.float32 if getattr(model, 'physics_io_bytes', 8) == 4 \
            else np.float64
        if want(oc.output_specific_energy):
            _write_grid_dataset(g, 'specific_energy',
                                itdata['specific_energy'], model.grid,
                                io_dtype=io_dtype)
        if want(oc.output_density):
            _write_grid_dataset(g, 'density', itdata['density'], model.grid,
                                io_dtype=io_dtype)
        if want(oc.output_density_diff):
            # density - original density (nonzero after sublimation; ref
            # grid_generic.f90:114-120)
            diff = np.asarray(itdata['density']) - np.asarray(density0)
            _write_grid_dataset(g, 'density_diff', diff, model.grid,
                                io_dtype=io_dtype)
        if want(oc.output_n_photons):
            _write_grid_dataset(g, 'n_photons', itdata['n_photons'],
                                model.grid)
        if itdata.get('specific_energy_spectrum') is not None and \
                want(oc.output_specific_energy_spectrum):
            # (n_dust, n_bins, *grid shape) + the bin edges (ref
            # grid_generic.f90:68-74)
            _write_grid_dataset(g, 'specific_energy_spectrum',
                                itdata['specific_energy_spectrum'],
                                model.grid, io_dtype=io_dtype)
            g.create_dataset('specific_energy_spectrum_bin_edges',
                             data=np.asarray(
                                 model.specific_energy_spectrum_bins, float))
        if result is not None:
            g.attrs['killed_photons_geo'] = result.killed_geo
            g.attrs['killed_photons_int'] = result.killed_int

    if result is not None:
        out.attrs['converged'] = bool2bytes(result.converged)
        out.attrs['iterations'] = result.iterations
        out.attrs['killed_photons_geo_initial'] = result.killed_geo
        out.attrs['killed_photons_int_initial'] = result.killed_int
    else:
        out.attrs['converged'] = bool2bytes(False)
        out.attrs['iterations'] = 0

    # Imaging iterations are produced by the imaging module (peeloff);
    # when configured but not yet supported we raise rather than silently
    # writing an output missing images.
    if model.peeled_output or model.binned_output is not None:
        from .imaging_runner import run_imaging
        perf.start('imaging + raytracing')
        # with zero Lucy iterations the user-supplied initial specific
        # energy drives the imaging/mono/raytracing emission (ref: the
        # engine reads the grid's specific_energy when n_initial_iter == 0)
        se_img = iterations[-1]['specific_energy'] if iterations else \
            (np.asarray(init_se) if init_se is not None else None)
        run_imaging(model, out, geometry, dt, st, density,
                    se_img, batch_size, dtype, mesh=mesh,
                    user_batch_size=user_batch_size)
        n_img = (model.n_photons.get('last') or 0) + \
            (model.n_photons.get('last_sources') or 0) + \
            (model.n_photons.get('last_dust') or 0)
        perf.stop(photons=n_img or None)

    out.attrs['cpu_time'] = time.time() - t_start
    out.attrs['date_ended'] = np.bytes_(datetime.datetime.now().isoformat())
    perf.report()

    # Embed the input for self-contained outputs (ref main.f90:135-151)
    if model.copy_input and model.filename is not None:
        with h5py.File(model.filename, 'r') as fin:
            fin.copy('/', out, name='Input')

    out.close()


def bool2bytes(value):
    return np.bytes_(b'yes') if value else np.bytes_(b'no')
