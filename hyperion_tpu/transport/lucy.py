"""Lucy (1999) temperature-iteration driver.

Orchestrates the device kernel (engine.run_lucy_iteration) and the
between-iteration physics that the reference spreads across
iter_lucy/grid_physics (ref: src/main/iter_lucy.f90:216-238,
src/grid/grid_physics_3d.f90:500-690):

- energy normalization: specific_energy = energy_sum * (E_total/E_current) / V
- emissivity locator (jnu_var_id/frac) from the new specific energy
- minimum specific energy floor, dust sublimation
- temperature conversion and the percentile convergence test
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .sampling import interp_loglog, searchsorted_small


def normalize_specific_energy(energy_sum, scale, volumes):
    """ref: update_energy_abs, grid_physics_3d.f90:500-555.

    Divide by volume BEFORE applying the luminosity scale: in f32 cgs units
    the product energy_sum * scale can reach ~1e44 and overflow, while
    (energy_sum / volume) * scale stays in range.
    """
    se = energy_sum / jnp.maximum(volumes[None, :], 1e-300) * scale
    return jnp.where(volumes[None, :] > 0.0, se, 0.0)


def compute_jnu_var(dt, specific_energy):
    """Locate each (dust, cell) specific energy in the dust's emissivity
    variable grid (ref: dust_jnu_var_pos_frac, dust_type_4elem.f90:296-321).

    Returns int32 ids and float fracs, both (n_dust, n_cells).
    """
    n_var = dt.n_var
    ids, fracs = [], []
    for d in range(dt.n_dust):
        var = dt.emiss_var[d]
        logv = dt.log_emiss_var[d]
        e = specific_energy[d]
        i = jnp.clip(searchsorted_small(var, e, side='right') - 1, 0,
                     n_var - 2)
        frac = (jnp.log10(jnp.maximum(e, 1e-300)) - logv[i]) / \
               (logv[i + 1] - logv[i])
        below = e < var[0]
        above = e > var[-1]
        i = jnp.where(below, 0, jnp.where(above, n_var - 2, i))
        frac = jnp.where(below, 0.0, jnp.where(above, 1.0, frac))
        ids.append(i.astype(jnp.int32))
        fracs.append(frac)
    return jnp.stack(ids), jnp.stack(fracs)


def specific_energy_to_temperature(dt, specific_energy):
    """Invert E = 4 sigma T^4 kappa_planck(T) via the mean-opacity table
    (ref: specific_energy2temperature)."""
    temps = []
    for d in range(dt.n_dust):
        e = jnp.clip(specific_energy[d], dt.me_specific_energy[d, 0],
                     dt.me_specific_energy[d, -1])
        temps.append(interp_loglog(dt.me_specific_energy[d],
                                   dt.me_temperature[d], e))
    return jnp.stack(temps)


def apply_minimum_specific_energy(specific_energy, minimum):
    """Per-dust floor (ref: grid_physics_3d.f90 minimum_specific_energy)."""
    return jnp.maximum(specific_energy, jnp.asarray(minimum)[:, None])


def enforce_energy_limits(dt, specific_energy, minimum_specific_energy,
                          enforce_range):
    """Floor at the user minimum, then (when ``enforce_energy_range``, the
    reference default) clip every cell — empty ones included — into the
    dust's tabulated specific-energy range
    (ref: check_energy_abs, grid_physics_3d.f90:555-601)."""
    se = specific_energy
    if minimum_specific_energy is not None:
        se = jnp.maximum(
            se, jnp.asarray(minimum_specific_energy, se.dtype)[:, None])
    if enforce_range:
        lo = dt.me_specific_energy[:, 0][:, None]
        hi = dt.me_specific_energy[:, -1][:, None]
        se = jnp.clip(se, lo, hi)
    return se


def _chi_rosseland(dt, d, e):
    e = jnp.clip(e, dt.me_specific_energy[d, 0], dt.me_specific_energy[d, -1])
    return interp_loglog(dt.me_specific_energy[d], dt.me_chi_rosseland[d], e)


def sublimate_dust(dt, density, specific_energy,
                   minimum_specific_energy=None):
    """Apply per-dust sublimation (ref: sublimate_dust,
    grid_physics_3d.f90:420-498). Modes: 0 none; 1 fast — remove dust,
    reset E to the minimum; 2 slow — scale density by
    (E_sub/E)·(χ_R(E)/χ_R(E_sub))² and cap E; 3 cap — cap E only.
    Runs host-side between iterations (modes are static per dust)."""
    modes = np.asarray(dt.sublimation_mode)
    rows_rho, rows_se = [], []
    for d in range(dt.n_dust):
        mode = int(modes[d])
        rho, e = density[d], specific_energy[d]
        if mode:
            e_sub = dt.sublimation_energy[d]
            exceed = e > e_sub
        if mode == 1:
            rho = jnp.where(exceed, 0.0, rho)
            e_min = 0.0 if minimum_specific_energy is None else \
                minimum_specific_energy[d]
            e = jnp.where(exceed, jnp.asarray(e_min, e.dtype), e)
        elif mode == 2:
            ratio = _chi_rosseland(dt, d, e) / _chi_rosseland(dt, d, e_sub)
            rho = jnp.where(
                exceed,
                rho * e_sub / jnp.maximum(e, 1e-300) * ratio ** 2, rho)
            e = jnp.where(exceed, e_sub, e)
        elif mode == 3:
            e = jnp.where(exceed, e_sub, e)
        rows_rho.append(rho)
        rows_se.append(e)
    return jnp.stack(rows_rho), jnp.stack(rows_se)


def specific_energy_converged(se_prev, se, percentile, absolute, relative,
                              value_prev):
    """Quantile convergence test (ref: specific_energy_converged,
    grid_physics_3d.f90:637-690). Returns (converged, value)."""
    se_prev = np.asarray(se_prev, dtype=float)
    se = np.asarray(se, dtype=float)
    mask = (se_prev > 0) & (se > 0) & (se_prev != se)
    if np.all(se_prev == se):
        value = 0.0
    elif not np.any(mask):
        return False, None
    else:
        ratio = np.maximum(se_prev[mask] / se[mask], se[mask] / se_prev[mask])
        value = np.percentile(ratio, percentile)
    if value_prev is None:
        return False, value
    if value == 0.0:
        return True, value
    rel_change = max(value_prev / value, value / value_prev)
    return (value < absolute) and (abs(rel_change) < relative), value


def spectrum_bin_fractions(dt, edges):
    """Fraction of the local LTE emissivity within each specific-energy
    spectrum bin, per (dust, var) state — used to distribute MRW deposits
    over frequency bins without sampling (ref: j_nu_bin_frac setup for
    deposit_specific_energy_spectrum, grid_physics_3d.f90:367-415)."""
    n_dust, n_var = dt.n_dust, dt.n_var
    cdf = np.asarray(dt.jnu_cdf, float)      # (n_dust*n_var, n_enu)
    edges = np.asarray(edges, float)
    out = np.zeros((n_dust * n_var, len(edges) - 1))
    for d in range(n_dust):
        enu = np.asarray(dt.emiss_nu[d], float)
        lg = np.log(np.maximum(enu, 1e-300))
        for v in range(n_var):
            row = cdf[d * n_var + v]
            c_at = np.interp(np.log(edges), lg, row)
            out[d * n_var + v] = np.maximum(np.diff(c_at), 0.0)
    return out


class LucyResult(NamedTuple):
    specific_energy: np.ndarray     # (n_dust, n_cells)
    temperature: np.ndarray         # (n_dust, n_cells)
    density: np.ndarray             # possibly sublimated
    n_photons_cell: np.ndarray
    energy_current: float
    killed_int: int
    killed_geo: int
    n_steps: int
    n_events: int                   # alive-lane transport events (occupancy
                                    # = n_events / (n_steps * batch))
    converged: bool
    iterations: int
    # (n_dust, n_bins, n_cells) when spectrum binning is on, else None
    specific_energy_spectrum: np.ndarray = None


def run_lucy(geometry, dt, st, density, key, n_photons, n_iterations,
             batch_size=65536, n_inter_max=1000000, kill_on_scatter=False,
             kill_on_absorb=False, n_reabs_max=0, max_steps=100000000,
             minimum_specific_energy=None, enforce_energy_range=True,
             check_convergence=False,
             convergence_absolute=0.0, convergence_relative=1.02,
             convergence_percentile=100.0, initial_specific_energy=None,
             additional_specific_energy=None,
             use_mrw=False, mrw_gamma=1.0, n_mrw_max=1000,
             use_pda=False, pda_tables=None, mesh=None, shard_grid=False,
             check_frequency=0.0, spectrum_bins=None,
             verbose=True, iteration_callback=None):
    """Run the Lucy loop: n_iterations (or until converged).

    ``density`` is (n_dust, n_cells); returns a LucyResult. With ``mesh``
    the photon batch is data-parallel over the devices (psum-reduced
    accumulators; see parallel/mesh.py).  With ``shard_grid`` the GRID is
    additionally sharded over the mesh (slab decomposition + ppermute
    packet exchange; see parallel/spatial.py) — the memory-scaling mode
    the reference does not have.
    """
    from .engine import run_lucy_iteration

    n_dust = dt.n_dust
    n_cells = density.shape[1]
    dtype = density.dtype

    if initial_specific_energy is None:
        specific_energy = jnp.zeros((n_dust, n_cells), dtype=dtype)
    else:
        specific_energy = jnp.asarray(initial_specific_energy, dtype=dtype)
    # specific_energy_type='additional': the input field is EXTRA heating
    # added on top of every iteration's MC estimate (ref
    # grid_physics_3d.f90:213-240,530-541); it also seeds the first
    # iteration's emissivities via initial_specific_energy above.
    if additional_specific_energy is not None:
        additional_specific_energy = jnp.asarray(additional_specific_energy,
                                                 dtype=dtype)

    config_tuple = (('n_inter_max', int(n_inter_max)),
                    ('kill_on_scatter', bool(kill_on_scatter)),
                    ('kill_on_absorb', bool(kill_on_absorb)),
                    ('n_mrw_max', int(n_mrw_max)),
                    ('n_reabs_max', int(n_reabs_max)),
                    # compile the re-absorption path only when a source
                    # can actually intersect photon paths
                    ('source_intersect', bool(st.any_intersect)),
                    ('check_frequency', float(check_frequency)),
                    ('max_steps', int(max_steps)))

    # nu-resolved specific-energy binning (ref grid_physics_3d.f90:41-56,
    # grid_propagate_3d.f90:71,155,217)
    spec_bins_dev = None
    spec_bin_frac_dev = None
    if spectrum_bins is not None:
        edges = np.asarray(spectrum_bins, float)
        spec_bins_dev = jnp.asarray(np.log2(np.maximum(edges, 1e-300)),
                                    dtype=dtype)
        if use_mrw:
            spec_bin_frac_dev = jnp.asarray(
                spectrum_bin_fractions(dt, edges), dtype=dtype)

    se_prev = None
    value_prev = None
    converged = False
    stats = dict(killed_int=0, killed_geo=0, n_steps=0, energy_current=0.0)
    n_photons_cell = np.zeros(n_cells, dtype=np.int64)
    se_spectrum = None
    it = 0

    for it in range(1, n_iterations + 1):
        key, k_it = jax.random.split(key)
        jnu_var_id, jnu_var_frac = compute_jnu_var(dt, specific_energy)
        # LTE-spectrum sources pick their dust ∝ specific_energy*rho at the
        # emission cell (ref select_dust_specific_energy_rho)
        se_rho = specific_energy * density if st.has_lte else None
        mrw_tables = None
        if use_mrw:
            from .mrw import prepare_mrw_tables
            mrw_tables = prepare_mrw_tables(dt, density, specific_energy,
                                            mrw_gamma, dtype)
        if mesh is not None and shard_grid:
            from ..parallel.spatial import run_lucy_iteration_spatial
            energy_sum, energy_current, n_photons_cell, killed_int, \
                n_steps, energy_sum_spec = run_lucy_iteration_spatial(
                    mesh, geometry, dt, st, density, jnu_var_id,
                    jnu_var_frac, k_it, n_photons, batch_size, config_tuple,
                    mrw=mrw_tables, spec_bins=spec_bins_dev,
                    spec_bin_frac=spec_bin_frac_dev)
            killed_geo = 0
            n_events = 0
        elif mesh is not None:
            from ..parallel.mesh import run_lucy_iteration_sharded
            energy_sum, energy_current, n_photons_cell, killed_int, \
                killed_geo, n_steps, energy_sum_spec, n_events = \
                run_lucy_iteration_sharded(
                    mesh, geometry, dt, st, density, jnu_var_id,
                    jnu_var_frac, k_it, n_photons, batch_size, config_tuple,
                    mrw=mrw_tables, se_rho=se_rho, spec_bins=spec_bins_dev,
                    spec_bin_frac=spec_bin_frac_dev)
        else:
            # segmented dispatch: bounded per-dispatch step count so thick
            # models never wedge a single XLA execution for minutes
            from .engine import run_lucy_iteration_segmented
            energy_sum, energy_current, n_photons_cell, killed_int, \
                killed_geo, n_steps, energy_sum_spec, n_events = \
                run_lucy_iteration_segmented(
                    geometry, dt, st, density, jnu_var_id, jnu_var_frac,
                    k_it, n_photons, batch_size, config_tuple,
                    mrw=mrw_tables, se_rho=se_rho, spec_bins=spec_bins_dev,
                    spec_bin_frac=spec_bin_frac_dev)

        # Host-side float64 for the combined scale; the engine works in
        # lengths of geometry.length_scale so ds carries one factor of L and
        # volumes carry L^3 -> net 1/L^2 here (see gtable docstring)
        scale = float(st.energy_total) / max(float(energy_current), 1e-300) \
            / geometry.length_scale ** 2
        specific_energy = normalize_specific_energy(
            energy_sum, jnp.asarray(scale, dtype=dtype), geometry.volumes)
        if spectrum_bins is not None:
            # same luminosity/volume normalization per bin (ref
            # scale_specific_energy_spectrum, grid_physics_3d.f90)
            nb = energy_sum_spec.shape[1]
            se_spectrum = np.asarray(normalize_specific_energy(
                energy_sum_spec.reshape(n_dust * nb, n_cells),
                jnp.asarray(scale, dtype=dtype),
                geometry.volumes)).reshape(n_dust, nb, n_cells)
        if additional_specific_energy is not None:
            specific_energy = specific_energy + additional_specific_energy
        specific_energy = enforce_energy_limits(
            dt, specific_energy, minimum_specific_energy,
            enforce_energy_range)
        if use_pda and pda_tables is not None:
            # diffusion fill-in for photon-starved cells, host-side
            # (ref iter_lucy.f90:228 solve_pda on rank 0)
            from .pda import solve_pda
            rho_phys = np.asarray(density, float) / geometry.length_scale
            se_fixed, n_pda = solve_pda(pda_tables, dt, rho_phys,
                                        np.asarray(specific_energy, float),
                                        np.asarray(n_photons_cell))
            if verbose and n_pda:
                print("[pda] corrected %d photon-starved cells" % n_pda)
            specific_energy = jnp.asarray(se_fixed, dtype=dtype)
        density, specific_energy = sublimate_dust(
            dt, density, specific_energy, minimum_specific_energy)
        specific_energy = enforce_energy_limits(
            dt, specific_energy, minimum_specific_energy,
            enforce_energy_range)

        stats = dict(killed_int=int(killed_int), killed_geo=int(killed_geo),
                     n_steps=int(n_steps), n_events=int(n_events),
                     energy_current=float(energy_current))
        if verbose:
            print("[lucy] iteration %d/%d: %d steps, killed=%d/%d"
                  % (it, n_iterations, stats['n_steps'], stats['killed_int'],
                     stats['killed_geo']))

        if iteration_callback is not None:
            try:
                iteration_callback(it, np.asarray(specific_energy),
                                   np.asarray(density),
                                   np.asarray(n_photons_cell),
                                   se_spectrum, stats=dict(
                                       stats, batch_size=batch_size))
            except TypeError:
                # older callbacks without the stats kwarg
                iteration_callback(it, np.asarray(specific_energy),
                                   np.asarray(density),
                                   np.asarray(n_photons_cell),
                                   se_spectrum)

        if check_convergence and se_prev is not None:
            converged, value_prev = specific_energy_converged(
                se_prev, np.asarray(specific_energy), convergence_percentile,
                convergence_absolute, convergence_relative, value_prev)
            if converged:
                if verbose:
                    print("[lucy] converged after %d iterations" % it)
                break
        elif check_convergence:
            _, value_prev = specific_energy_converged(
                np.zeros_like(np.asarray(specific_energy)) + 1.0,
                np.asarray(specific_energy), convergence_percentile,
                convergence_absolute, convergence_relative, None)
        se_prev = np.asarray(specific_energy)

    temperature = specific_energy_to_temperature(dt, specific_energy)
    return LucyResult(
        specific_energy=np.asarray(specific_energy),
        temperature=np.asarray(temperature),
        density=np.asarray(density),
        n_photons_cell=np.asarray(n_photons_cell),
        energy_current=stats['energy_current'],
        killed_int=stats['killed_int'], killed_geo=stats['killed_geo'],
        n_steps=stats['n_steps'], n_events=stats.get('n_events', 0),
        converged=converged, iterations=it,
        specific_energy_spectrum=se_spectrum)
