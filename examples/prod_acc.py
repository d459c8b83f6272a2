#!/usr/bin/env python
"""Product accumulation (parity: dist-primitive/examples/prod_acc.rs)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.common import Timer, base_parser, setup  # noqa: E402


def main():
    args = base_parser(__doc__).parse_args()
    setup(args)
    import jax

    from scalable_collaborative_zksnark_tpu.fields.fr import get_field
    from scalable_collaborative_zksnark_tpu.mpc.net import PartyNet
    from scalable_collaborative_zksnark_tpu.primitives.acc_product import (
        c_acc_product_and_share,
    )
    from scalable_collaborative_zksnark_tpu.pss.pss import PackedSharingParams

    F = get_field("bls12_381_fr")
    pp = PackedSharingParams(F, args.l)
    net = PartyNet(pp.n, mode=args.mode)
    P = net.local_parties
    S = (1 << args.n) // pp.l

    shares = F.random((P, S), 1)
    masks = F.random((P, S), 2)
    unmask = F.random((P, 4 * S), 3)

    run = jax.jit(
        lambda sh, mk, um: c_acc_product_and_share(pp, net, sh, mk, um, um, um)
    )
    out = run(shares, masks, unmask)
    jax.block_until_ready(out[0])
    with Timer() as t:
        out = run(shares, masks, unmask)
        jax.block_until_ready(out[0])
    up, down = net.comm(0)
    print(f"c_acc_product_and_share n={args.n} l={args.l}: {t.dt*1e3:.1f} ms, "
          f"streams {[o.shape[-2] for o in out]}, comm up={up} down={down}")


if __name__ == "__main__":
    main()
