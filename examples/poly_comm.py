#!/usr/bin/env python
"""Collaborative PCS commit/open (parity: dist-primitive/examples/poly_comm.rs)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.common import Timer, base_parser, setup  # noqa: E402


def main():
    args = base_parser(__doc__).parse_args()
    setup(args)
    import jax

    from scalable_collaborative_zksnark_tpu.curves.g1 import bls12_381_g1
    from scalable_collaborative_zksnark_tpu.mpc.net import PartyNet
    from scalable_collaborative_zksnark_tpu.primitives.poly_comm import (
        c_commit,
        c_open,
        srs_random,
    )
    from scalable_collaborative_zksnark_tpu.pss.pss import PackedSharingParams

    curve = bls12_381_g1()
    F = curve.fr
    pp = PackedSharingParams(F, args.l)
    net = PartyNet(pp.n, mode=args.mode)
    P = net.local_parties
    m_loc = (1 << args.n) // pp.l

    srs = srs_random(curve, args.n, 7, packed_parties=pp.n, max_level=-1)
    peval = F.random((P, m_loc), 1)
    point = F.random((args.n + 2,), 2)

    commit = jax.jit(lambda pe: c_commit(srs, pp, net, [pe]))
    com = commit(peval)
    jax.block_until_ready(com.x)
    with Timer() as t:
        com = commit(peval)
        jax.block_until_ready(com.x)
    print(f"c_commit n={args.n} l={args.l}: {t.dt*1e3:.1f} ms")

    open_ = jax.jit(lambda pe, pt: c_open(srs, pp, net, pe, pt))
    val, proofs = open_(peval, point)
    jax.block_until_ready(val)
    with Timer() as t:
        val, proofs = open_(peval, point)
        jax.block_until_ready(val)
    up, down = net.comm(0)
    print(f"c_open   n={args.n} l={args.l}: {t.dt*1e3:.1f} ms, "
          f"comm up={up} down={down}")


if __name__ == "__main__":
    main()
