#!/usr/bin/env python
"""Distributed MSM on shares (parity: dist-primitive/examples/msm.rs)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.common import Timer, base_parser, setup  # noqa: E402


def main():
    args = base_parser(__doc__).parse_args()
    setup(args)
    import jax
    import jax.numpy as jnp

    from scalable_collaborative_zksnark_tpu.curves.g1 import bls12_381_g1
    from scalable_collaborative_zksnark_tpu.mpc.net import PartyNet
    from scalable_collaborative_zksnark_tpu.primitives.msm import d_msm, msm
    from scalable_collaborative_zksnark_tpu.pss.pss import PackedSharingParams

    curve = bls12_381_g1()
    F = curve.fr
    pp = PackedSharingParams(F, args.l)
    net = PartyNet(pp.n, mode=args.mode)
    P = net.local_parties
    m_loc = (1 << args.n) // pp.l

    ks = F.decode(F.random((m_loc,), 3))
    g = curve.from_affine_ints([None])  # infinity placeholder replaced below
    from scalable_collaborative_zksnark_tpu.curves.g1 import BLS12_381_G1_GEN

    g = curve.from_affine_ints([BLS12_381_G1_GEN])
    base = jax.tree.map(lambda a: jnp.broadcast_to(a, (P, 1, m_loc) + a.shape[1:]), g)
    scal = F.decode(F.random((P, 1, m_loc), 4))

    run = jax.jit(lambda b, s: d_msm(curve, pp, net, b, s))
    out = run(base, scal)
    jax.block_until_ready(out.x)
    with Timer() as t:
        out = run(base, scal)
        jax.block_until_ready(out.x)
    up, down = net.comm(0)
    print(f"d_msm n={args.n} l={args.l} ({m_loc} pts/party): {t.dt*1e3:.1f} ms, "
          f"comm up={up} down={down}")

    lrun = jax.jit(lambda b, s: msm(curve, b, s))
    base1 = jax.tree.map(lambda a: a[0, 0], base)
    out = lrun(base1, ks)
    jax.block_until_ready(out.x)
    with Timer() as t:
        out = lrun(base1, ks)
        jax.block_until_ready(out.x)
    print(f"local msm ({m_loc} pts): {t.dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
