"""Throughput benchmark: photon packets/sec/chip on the quickstart config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no absolute numbers (BASELINE.md); its figure of
merit is the runtime photons/sec counter (ref src/main/performance.f90).
``vs_baseline`` is measured against a nominal 1e5 photons/s single-CPU-core
figure for the reference Fortran engine on a comparable scattering model —
update when a measured reference number is available.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_PHOTONS_PER_SEC = 1.0e5


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--smoke', action='store_true',
                        help='quick CPU run for verification')
    parser.add_argument('--photons', type=int, default=None)
    parser.add_argument('--batch', type=int, default=None)
    args = parser.parse_args()

    if args.smoke:
        import jax
        jax.config.update('jax_platforms', 'cpu')

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

    # Quickstart-like config: point source in a uniform scattering box
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
              ('kill_on_absorb', False), ('max_steps', 100000000))

    # Warm up (compile)
    out = run_lucy_iteration(geometry, dt, st, density, jid, jfrac,
                             jax.random.PRNGKey(0), n_photons // 10, batch,
                             config)
    jax.block_until_ready(out)

    t0 = time.time()
    out = run_lucy_iteration(geometry, dt, st, density, jid, jfrac,
                             jax.random.PRNGKey(int(os.environ.get('BENCH_SEED', 1))), n_photons, batch, config)
    jax.block_until_ready(out)
    wall = time.time() - t0

    # sanity: the run must actually have emitted the full budget
    print("# diag: E=%g steps=%d wall=%.4fs" % (float(out[1]), int(out[5]),
                                                wall), file=sys.stderr)

    rate = n_photons / wall
    print(json.dumps({
        "metric": "photon_packets_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "photons/s",
        "vs_baseline": round(rate / BASELINE_PHOTONS_PER_SEC, 3),
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
