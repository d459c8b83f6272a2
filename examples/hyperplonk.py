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
    ap.add_argument(
        "--verify",
        action="store_true",
        help="local variant: build an honest SRS and run the full proof "
             "verifier (transcript binding + pairing checks) on the bundle",
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
        if args.verify:
            import numpy as np

            from scalable_collaborative_zksnark_tpu.curves import host_curve as hc
            from scalable_collaborative_zksnark_tpu.hyperplonk import (
                local_inputs,
                verify_local_hyperplonk,
            )
            from scalable_collaborative_zksnark_tpu.primitives.poly_comm import (
                srs_from_secret,
            )

            rng = np.random.RandomState(11)
            s = [int.from_bytes(rng.bytes(40), "little") % curve.fr.p
                 for _ in range(n + 2)]
            srs = srs_from_secret(curve, hc.G1_GEN, hc.G2_GEN, s)
            ins = local_inputs(curve.fr, n)
            proof = local_hyperplonk(n, srs, ins)
            with Timer() as t:
                ok, fails = verify_local_hyperplonk(n, srs, proof, ins)
            print(f"verify local hyperplonk n={n}: ok={ok} "
                  f"({t.dt:.3f} s){'; ' + '; '.join(fails) if fails else ''}")
            return
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
    if args.verify:
        if args.variant != "dist" or args.mode != "sim":
            raise SystemExit("--verify needs --variant dist --mode sim")
        import numpy as np

        from scalable_collaborative_zksnark_tpu.curves import host_curve as hc
        from scalable_collaborative_zksnark_tpu.hyperplonk.params import (
            consistent_proving_parameters,
        )
        from scalable_collaborative_zksnark_tpu.hyperplonk.verify import (
            verify_dhyperplonk_gate,
        )
        from scalable_collaborative_zksnark_tpu.primitives.poly_comm import (
            srs_from_secret,
            srs_packed,
        )
        from scalable_collaborative_zksnark_tpu.pss.pss import PackedSharingParams

        pp = PackedSharingParams(curve.fr, args.l)
        rng = np.random.RandomState(13)
        sec = lambda: [int.from_bytes(rng.bytes(40), "little") % curve.fr.p
                       for _ in range(n + 2)]
        d_srs = srs_from_secret(curve, hc.G1_GEN, hc.G2_GEN, sec(),
                                n_parties=net.n)
        c_plain = srs_from_secret(curve, hc.G1_GEN, hc.G2_GEN, sec())
        c_srs = srs_packed(c_plain, pp)
        pk, g = consistent_proving_parameters(
            n, args.l, net, srs={"c": c_srs, "d": d_srs}, curve=curve
        )
        gate, _wire = dhyperplonk(n, pk, net)
        with Timer() as t:
            ok, fails = verify_dhyperplonk_gate(
                pp, c_plain, d_srs, gate, g["eq"], pk.challenge
            )
        print(f"verify dhyperplonk gate section n={n} l={args.l}: ok={ok} "
              f"({t.dt:.3f} s){'; ' + '; '.join(fails) if fails else ''}")
        return
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
