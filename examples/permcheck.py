#!/usr/bin/env python
"""Collaborative + distributed permcheck (parity: hyperplonk/examples/
permcheck.rs, bench_cpermcheck.rs, bench_dpermcheck.rs).

Variants: --variant {c,d} — baseline collaborative (paper §4.3) vs the
improved distributed permcheck (paper §5.1).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.common import Timer, base_parser, setup  # noqa: E402


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--variant", choices=("c", "d"), default="d")
    args = ap.parse_args()
    setup(args)
    import jax

    from scalable_collaborative_zksnark_tpu.hyperplonk import (
        cpermcheck,
        dpermcheck,
        packed_proving_parameters,
    )
    from scalable_collaborative_zksnark_tpu.mpc.net import PartyNet

    net = PartyNet(8 * args.l, mode=args.mode)
    pk = packed_proving_parameters(args.n, args.l, net)
    fn = cpermcheck if args.variant == "c" else dpermcheck
    out = fn(args.n, pk, net)
    jax.block_until_ready(out[0][0])
    net.reset_comm()
    with Timer() as t:
        out = fn(args.n, pk, net)
        jax.block_until_ready(out[0][0])
    up, down = net.comm(0)
    print(f"{args.variant}permcheck n={args.n} l={args.l} mode={args.mode}: "
          f"{t.dt:.3f} s, comm up={up} down={down}")


if __name__ == "__main__":
    main()
