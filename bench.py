"""Throughput benchmark: photon packets/sec/chip on BASELINE workloads.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "workloads"}.

Two workloads (BASELINE.md configs 1 and 2):

* ``quickstart`` — point source in a uniform optically-thin scattering box
  (cartesian); measures raw engine throughput with short trajectories.
* ``yso_thick``  — flared-disk YSO on a spherical-polar grid with midplane
  optical depth >= 1e3, MRW enabled (ref: grid_mrw_3d.f90); measures the
  regime where lockstep-batch divergence and diffusion acceleration matter.

The headline metric is the *thick* workload (the hard one); the full
per-workload numbers ride along in the same JSON line. The reference
publishes no absolute numbers (BASELINE.md); its figure of merit is the
runtime photons/sec counter (ref src/main/performance.f90). ``vs_baseline``
divides by a nominal 1e5 photons/s single-CPU-core figure for the reference
Fortran engine on a comparable model — update when a measured reference
number is available.

Defensive notes for the tunneled-TPU driver environment: the persistent
compilation cache is enabled (fresh-process compiles over the tunnel cost
minutes), every workload is individually fenced so one failure still emits
a JSON line from the survivors, and loop bounds are finite so a wedged
dispatch cannot run away.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_PHOTONS_PER_SEC = 1.0e5


def _enable_cache():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache_tpu'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


def bench_quickstart(args):
    import jax
    import jax.numpy as jnp
    from hyperion_tpu.dust import IsotropicDust
    from hyperion_tpu.grid import CartesianGrid
    from hyperion_tpu.sources import PointSource
    from hyperion_tpu.transport import (build_dust_tables,
                                        build_cartesian_geometry,
                                        build_source_tables)
    from hyperion_tpu.transport.lucy import compute_jnu_var
    from hyperion_tpu.transport.engine import run_lucy_iteration

    dtype = jnp.float32
    n_photons = args.photons or (100_000 if args.smoke else 2_000_000)
    batch = args.batch or (8192 if args.smoke else 131072)

    nu = np.logspace(5, 18, 24)
    dust = IsotropicDust(nu, np.repeat(0.3, 24), np.repeat(1.0, 24))
    n = 15
    grid = CartesianGrid(np.linspace(-1, 1, n + 1), np.linspace(-1, 1, n + 1),
                         np.linspace(-1, 1, n + 1))
    geometry = build_cartesian_geometry(grid, dtype=dtype)
    dt = build_dust_tables([dust], dtype=dtype)
    st = build_source_tables([PointSource(luminosity=1.0, temperature=5000.0)],
                             dtype=dtype)
    density = jnp.full((1, grid.n_cells), 0.2, dtype=dtype)
    jid, jfrac = compute_jnu_var(dt, jnp.zeros_like(density))
    config = (('n_inter_max', 1000000), ('kill_on_scatter', False),
              ('kill_on_absorb', False), ('max_steps', 1000000))

    out = run_lucy_iteration(geometry, dt, st, density, jid, jfrac,
                             jax.random.PRNGKey(0), n_photons // 10, batch,
                             config)
    # jax.block_until_ready does NOT reliably block on the tunneled 'axon'
    # backend — fetch a value so the warmup's compile + execution actually
    # complete before the timed region starts
    float(np.asarray(out[0]).sum())

    t0 = time.time()
    out = run_lucy_iteration(
        geometry, dt, st, density, jid, jfrac,
        jax.random.PRNGKey(int(os.environ.get('BENCH_SEED', 1))),
        n_photons, batch, config)
    # force full materialization (fetch, don't just block) so async
    # dispatch quirks on experimental backends can't fake the timing
    dep = float(np.asarray(out[0]).sum())
    wall = time.time() - t0
    print("# quickstart: E=%g dep=%g steps=%d wall=%.4fs" %
          (float(out[1]), dep, int(out[5]), wall), file=sys.stderr)
    return dict(name='quickstart', photons=n_photons, wall_s=round(wall, 4),
                photons_per_sec=round(n_photons / wall, 1),
                n_loop_steps=int(out[5]))


def bench_yso_thick(args):
    """Flared-disk YSO, spherical-polar grid, tau_mid >= 1e3, MRW on.

    2 Lucy iterations through the full run_lucy driver (the second one has a
    warm temperature field, so MRW diffusion coefficients are realistic);
    timing covers the second iteration only (compile + cold tables excluded,
    matching how the reference's photons/s counter reports steady state).
    """
    import jax
    import jax.numpy as jnp
    from hyperion_tpu.dust import IsotropicDust
    from hyperion_tpu.grid import SphericalPolarGrid
    from hyperion_tpu.sources import SphericalSource
    from hyperion_tpu.densities import FlaredDisk
    from hyperion_tpu.transport import build_dust_tables, build_source_tables
    from hyperion_tpu.transport.gtable_spherical import build_spherical_geometry
    from hyperion_tpu.transport.lucy import run_lucy
    from hyperion_tpu.util.constants import au, msun, rsun, lsun

    dtype = jnp.float32
    # Production-scale budget: the photon-number guidance is 10-100x
    # n_cells for thick disks (ref docs/setup/photon_numbers.rst); at 2M
    # photons the serial diffusion tail (the ~1e4-step deepest walkers that
    # floor the wall clock at ANY batch size) amortizes over 10x more
    # photons. The reference engine's photons/s is count-independent
    # (serial per photon), so scaling the workload is fair to it.
    n_photons = args.photons or (20_000 if args.smoke else 2_000_000)
    # batch scan on v5e (2M photons): 131072 -> 5.2k, 65536 -> 12.4k,
    # 32768 -> 25.5k, 8192 -> 46.3k, 4096 -> 54.3k, 2048 -> 43.3k photons/s;
    # small batches win because the deep-diffusion tail serializes and the
    # per-step cost scales with batch width
    batch = args.batch or (4096 if args.smoke else 4096)

    rmin, rmax = 0.1 * au, 300.0 * au
    nr, nt = (24, 16) if args.smoke else (64, 32)
    rw = np.hstack([0.0, np.logspace(np.log10(rmin), np.log10(rmax), nr)])
    tw = np.linspace(0.0, np.pi, nt + 1)
    pw = np.array([0.0, 2.0 * np.pi])
    grid = SphericalPolarGrid(rw, tw, pw)

    # gray dust, kappa ~ 800 cm^2/g dust with albedo 0.5
    nu = np.logspace(9, 17, 32)
    dust = IsotropicDust(nu, np.repeat(0.5, 32), np.repeat(800.0, 32))

    disk = FlaredDisk(mass=2e-5 * msun, rmin=rmin, rmax=rmax,
                      r_0=10.0 * au, h_0=1.0 * au, p=-1.0, beta=1.25)
    rho = np.asarray(disk.density(grid), float).reshape(-1)
    tau_mid = float(disk.midplane_cumulative_density(np.array([rmax]))[0]
                    * 800.0)
    print("# yso_thick: tau_mid(visual-equivalent) = %.3g" % tau_mid,
          file=sys.stderr)

    geometry = build_spherical_geometry(grid, dtype=dtype)
    dt = build_dust_tables([dust], dtype=dtype)
    star = SphericalSource(luminosity=lsun, radius=2.0 * rsun,
                           temperature=4000.0)
    st = build_source_tables([star], dtype=dtype,
                             length_scale=geometry.length_scale)
    density = jnp.asarray(rho[None, :] * geometry.length_scale, dtype=dtype)

    per_iter_walls = []

    iter_stats = []

    def cb(it, se, rho_now, npc, se_spec=None, stats=None):
        per_iter_walls.append(time.time())
        iter_stats.append(stats or {})

    t_start = time.time()
    per_iter_walls.append(t_start)
    result = run_lucy(geometry, dt, st, density,
                      jax.random.PRNGKey(int(os.environ.get('BENCH_SEED', 1))),
                      n_photons, 2, batch_size=batch,
                      use_mrw=True, mrw_gamma=1.0, n_mrw_max=100000,
                      n_reabs_max=100, max_steps=100000,
                      verbose=False, iteration_callback=cb)
    wall_last = per_iter_walls[-1] - per_iter_walls[-2]
    print("# yso_thick: steps=%d killed=%d/%d wall_iter2=%.3fs" %
          (result.n_steps, result.killed_int, result.killed_geo, wall_last),
          file=sys.stderr)
    last = iter_stats[-1] if iter_stats else {}
    ev = last.get('n_events') or 0
    st_n = last.get('n_steps') or 0
    lanes = last.get('batch_size') or batch
    return dict(name='yso_thick', photons=n_photons,
                tau_mid=round(tau_mid, 1),
                wall_s=round(wall_last, 4),
                photons_per_sec=round(n_photons / wall_last, 1),
                events_per_sec=round(ev / wall_last, 1) if ev else None,
                occupancy=round(ev / (st_n * lanes), 4)
                if ev and st_n else None,
                killed=int(result.killed_int + result.killed_geo),
                n_loop_steps=int(result.n_steps))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--smoke', action='store_true',
                        help='quick CPU run for verification')
    parser.add_argument('--workload', default='all',
                        choices=['all', 'quickstart', 'yso_thick'])
    parser.add_argument('--photons', type=int, default=None)
    parser.add_argument('--batch', type=int, default=None)
    args = parser.parse_args()

    if args.smoke:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    _enable_cache()

    workloads = []
    failures = []
    if args.workload in ('all', 'quickstart'):
        try:
            workloads.append(bench_quickstart(args))
        except Exception as exc:  # keep the JSON line alive
            failures.append('quickstart: %s' % exc)
            print("# quickstart FAILED: %s" % exc, file=sys.stderr)
    if args.workload in ('all', 'yso_thick'):
        try:
            workloads.append(bench_yso_thick(args))
        except Exception as exc:
            failures.append('yso_thick: %s' % exc)
            print("# yso_thick FAILED: %s" % exc, file=sys.stderr)

    if not workloads:
        print(json.dumps({"metric": "photon_packets_per_sec_per_chip",
                          "value": 0.0, "unit": "photons/s",
                          "vs_baseline": 0.0, "error": '; '.join(failures)}))
        return 1

    head = workloads[-1]
    rate = head['photons_per_sec']
    out = {
        "metric": "photon_packets_per_sec_per_chip_thick_disk_mrw"
                  if head['name'] == 'yso_thick'
                  else "photon_packets_per_sec_per_chip",
        "value": rate,
        "unit": "photons/s",
        "vs_baseline": round(rate / BASELINE_PHOTONS_PER_SEC, 3),
        "workloads": workloads,
    }
    if failures:
        out["error"] = '; '.join(failures)
    print(json.dumps(out))
    return 0


if __name__ == '__main__':
    sys.exit(main())
