#!/usr/bin/env python
"""Kernel microbenchmarks: field mul, MSM, fused sumcheck phase.

Prints one JSON line per metric.  Run on TPU (ambient axon env) for the
numbers that matter; works on CPU for sanity.  These are the
VERDICT-mandated kernel throughput trackers (items 3/4): fr.mul Mmul/s,
2^15-point MSM wall time across window sizes, and the fused
sumcheck-product phase vs its unfused form.

Timing uses a jitted checksum + device_get barrier (block_until_ready
is not a reliable barrier over the axon tunnel).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mul-m", type=int, default=1 << 20, help="elements for fr.mul")
    ap.add_argument("--msm-n", type=int, default=1 << 15)
    ap.add_argument("--msm-c", type=int, nargs="*", default=[8, 10, 12])
    ap.add_argument("--sc-m", type=int, default=1 << 15, help="sumcheck table size")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--skip", nargs="*", default=[], choices=["mul", "msm", "sc"])
    args = ap.parse_args()

    from scalable_collaborative_zksnark_tpu.utils.benchlib import ensure_accelerator

    ensure_accelerator()  # dead axon relay -> CPU, not a silent hang

    import jax
    import jax.numpy as jnp

    from scalable_collaborative_zksnark_tpu.curves.g1 import bls12_381_g1
    from scalable_collaborative_zksnark_tpu.fields.fr import get_field

    F = get_field("bls12_381_fr")
    C = bls12_381_g1()

    @jax.jit
    def _sum(out):
        return functools.reduce(
            lambda a, b: a + b.ravel()[0].astype(jnp.uint32),
            jax.tree.leaves(out),
            jnp.uint32(0),
        )

    def timeit(fn, *xs, repeat=args.repeat):
        jax.device_get(_sum(fn(*xs)))  # compile + warm
        best = float("inf")
        for _ in range(repeat):
            t0 = time.time()
            jax.device_get(_sum(fn(*xs)))
            best = min(best, time.time() - t0)
        return best

    def emit(metric, value, unit, baseline=None):
        rec = {"metric": metric, "value": round(value, 6), "unit": unit}
        if baseline is not None:
            rec["vs_baseline"] = round(baseline / value, 4)
        print(json.dumps(rec))

    if "mul" not in args.skip:
        # chained squarings so XLA cannot strength-reduce the loop
        a = F.random((args.mul_m,), 5)
        K = 8

        @jax.jit
        def mul_chain(x):
            for _ in range(K):
                x = F.mul(x, x)
            return x

        dt = timeit(mul_chain, a)
        emit("fr_mul_Mmul_per_s", args.mul_m * K / dt / 1e6, "Mmul/s")

    if "msm" not in args.skip:
        import numpy as np

        from scalable_collaborative_zksnark_tpu.curves.host_curve import G1_GEN
        from scalable_collaborative_zksnark_tpu.primitives.msm import msm

        g = C.from_affine_ints([G1_GEN])
        base = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (args.msm_n,) + x.shape[1:]), g
        )
        ks = jnp.asarray(
            np.random.RandomState(3).randint(
                1, 1 << 16, size=(args.msm_n, 2)
            ).astype("uint32")
        )
        pts = C.normalize(C.scalar_mul(base, ks))
        scal = F.decode(F.random((args.msm_n,), 7))
        # reference local share-MSM: ~18.5-26.7 ms (BASELINE.md)
        for c in args.msm_c:
            dt = timeit(lambda p, s, _c=c: msm(C, p, s, c=_c, affine=True), pts, scal)
            emit(f"msm_2e{args.msm_n.bit_length()-1}_c{c}_s", dt, "s", 0.0225)

    if "sc" not in args.skip:
        from scalable_collaborative_zksnark_tpu.primitives.sumcheck import (
            sumcheck_product,
        )

        f = F.random((1, args.sc_m), 11)
        gt = F.random((1, args.sc_m), 12)
        ch = F.random((args.sc_m.bit_length() + 2,), 13)
        dt = timeit(jax.jit(lambda x, y: sumcheck_product(F, x, y, ch)), f, gt)
        emit(f"sumcheck_product_2e{args.sc_m.bit_length()-1}_s", dt, "s")


if __name__ == "__main__":
    main()
