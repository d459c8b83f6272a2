#!/usr/bin/env python
"""Local + collaborative HyperPlonk (parity: hyperplonk/examples/hyperplonk.rs,
bench_hyperplonk.rs, bench_hyperplonk_dataparallel.rs).

Variants: --variant {local,localpp,dist,dist-dp}.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.common import Timer, base_parser, setup  # noqa: E402


def main():
    ap = base_parser(__doc__)
    ap.add_argument(
        "--variant",
        choices=("local", "localpp", "dist", "dist-dp"),
        default="dist",
    )
    args = ap.parse_args()
    setup(args)
    import jax

    from scalable_collaborative_zksnark_tpu.curves.g1 import bls12_381_g1
    from scalable_collaborative_zksnark_tpu.hyperplonk import (
        dhyperplonk,
        dhyperplonk_data_parallel,
        local_hyperplonk,
        local_hyperplonkpp,
        packed_proving_parameters,
    )
    from scalable_collaborative_zksnark_tpu.mpc.net import PartyNet
    from scalable_collaborative_zksnark_tpu.primitives.poly_comm import srs_random

    curve = bls12_381_g1()
    n = args.n

    if args.variant in ("local", "localpp"):
        srs = srs_random(curve, n + 2, 7)
        fn = local_hyperplonk if args.variant == "local" else local_hyperplonkpp
        out = fn(n, srs)
        jax.block_until_ready(out[0][0][0])
        with Timer() as t:
            out = fn(n, srs)
            jax.block_until_ready(out[0][0][0])
        print(f"{args.variant} hyperplonk n={n}: {t.dt:.3f} s")
        return

    net = PartyNet(8 * args.l, mode=args.mode)
    pk = packed_proving_parameters(n, args.l, net, curve=curve)
    fn = dhyperplonk if args.variant == "dist" else dhyperplonk_data_parallel
    out = fn(n, pk, net)
    jax.block_until_ready(out[0][0][0])
    net.reset_comm()
    with Timer() as t:
        out = fn(n, pk, net)
        jax.block_until_ready(out[0][0][0])
    up, down = net.comm(0)
    print(f"{args.variant} hyperplonk n={n} l={args.l} mode={args.mode}: "
          f"{t.dt:.3f} s, comm up={up} down={down}")


if __name__ == "__main__":
    main()
