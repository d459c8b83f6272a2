#!/usr/bin/env python
"""Collaborative vs local sumcheck (parity: dist-primitive/examples/sumcheck.rs).

Runs c_sumcheck_product on PSS shares of a random 2^n-evaluation table
and reports per-party wall time plus communication bytes.
"""

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
    from scalable_collaborative_zksnark_tpu.primitives.sumcheck import (
        c_sumcheck_product,
        sumcheck_product,
    )
    from scalable_collaborative_zksnark_tpu.pss.pss import PackedSharingParams

    F = get_field("bls12_381_fr")
    pp = PackedSharingParams(F, args.l)
    net = PartyNet(pp.n, mode=args.mode)
    P = net.local_parties
    m_loc = (1 << args.n) // pp.l

    shares_f = F.random((P, m_loc), 1)
    shares_g = F.random((P, m_loc), 2)
    challenges = F.random((args.n + 4,), 3)

    step = jax.jit(
        lambda f, g, ch: c_sumcheck_product(pp, net, f, g, ch)
    )
    proof = step(shares_f, shares_g, challenges)
    jax.block_until_ready(proof)
    with Timer() as t:
        proof = step(shares_f, shares_g, challenges)
        jax.block_until_ready(proof)
    up, down = net.comm(0)
    print(f"c_sumcheck_product n={args.n} l={args.l} mode={args.mode}: "
          f"{t.dt*1e3:.1f} ms/step, proof {proof.shape}, comm up={up} down={down}")

    # local baseline
    evals_f = F.random((1 << args.n,), 4)
    evals_g = F.random((1 << args.n,), 5)
    local = jax.jit(lambda f, g, ch: sumcheck_product(F, f, g, ch))
    out = local(evals_f, evals_g, challenges)
    jax.block_until_ready(out)
    with Timer() as t:
        out = local(evals_f, evals_g, challenges)
        jax.block_until_ready(out)
    print(f"local sumcheck_product n={args.n}: {t.dt*1e3:.1f} ms/step")


if __name__ == "__main__":
    main()
