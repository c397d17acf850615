"""Command-line launcher: run a .rtin model file with the engine.

Replaces the reference's binary-dispatch launcher (ref scripts/hyperion:39-106
— there is a single engine here; the grid type is read from the file and the
right traversal tables are built automatically).

Usage:
    hyperion_tpu [-f] [-m n_devices] input.rtin output.rtout

-f             overwrite the output file if it exists
-m n_devices   use multi-device data parallelism over n local devices
--cpu          force the host CPU backend (default: best available device)
--f64          run the engine in float64 (requires CPU backend)
"""

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog='hyperion_tpu')
    parser.add_argument('-f', action='store_true', dest='force',
                        help='overwrite existing output')
    parser.add_argument('-m', type=int, default=None, dest='n_processes',
                        metavar='n_devices',
                        help='number of devices for data parallelism')
    parser.add_argument('--shard-grid', action='store_true',
                        dest='shard_grid',
                        help='shard the grid state over the device mesh '
                             '(slab decomposition + packet exchange) for '
                             'the Lucy iterations')
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--f64', action='store_true')
    parser.add_argument('input')
    parser.add_argument('output')
    args = parser.parse_args(argv)

    if not os.path.exists(args.input):
        parser.error("input file %s does not exist" % args.input)
    if os.path.exists(args.output) and not args.force:
        parser.error("output file %s exists (use -f to overwrite)"
                     % args.output)

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    if args.f64:
        jax.config.update('jax_enable_x64', True)

    from ..model import Model
    from ..model.run import run_model

    model = Model.read(args.input)
    model.filename = args.input
    run_model(model, args.output,
              parallel=args.n_processes
              if args.n_processes and args.n_processes > 1 else False,
              shard_grid=args.shard_grid)

    # post-run integrity check (ref scripts/hyperion:95-106)
    import h5py
    with h5py.File(args.output, 'r') as f:
        if 'date_ended' not in f.attrs:
            print("ERROR: output file appears incomplete", file=sys.stderr)
            return 1
    print("run complete: %s" % args.output)
    return 0


if __name__ == '__main__':
    sys.exit(main())
