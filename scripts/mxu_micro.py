#!/usr/bin/env python
"""Microbenchmarks: MXU field engine and dense-MSM cores on the device.

Each op is CHAINED k times inside one jit (the remote-tunnel barrier
costs ~25-30 ms per dispatch — single-shot timings only measure the
tunnel).  Reports element throughput for the kernels that set the
flagship prove time.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHAIN = 64


def main() -> None:
    from scalable_collaborative_zksnark_tpu.utils.benchlib import (
        barrier,
        enable_compile_cache,
        ensure_accelerator,
    )

    ensure_accelerator()
    enable_compile_cache(Path(__file__).resolve().parent.parent / ".jax_cache")
    import jax
    import jax.numpy as jnp

    from scalable_collaborative_zksnark_tpu.fields import mxu
    from scalable_collaborative_zksnark_tpu.fields.fr import get_field
    from scalable_collaborative_zksnark_tpu.primitives import mxu_sumcheck

    F = get_field("bls12_381_fr")
    M = 1 << 20
    x = F.random((M,), 3)
    g = F.random((M,), 4)
    r = F.random((), 5)

    # barrier floor (tunnel round-trip)
    nop = jax.jit(lambda a: a + 1)
    barrier(nop(jnp.zeros((8,), jnp.uint32)))
    t0 = time.time()
    for _ in range(4):
        barrier(nop(jnp.zeros((8,), jnp.uint32)))
    floor = (time.time() - t0) / 4
    print(f"barrier floor {floor*1e3:.1f} ms")

    def timeit(name, fn, *args, iters=3, unit=M, chained=CHAIN):
        jf = jax.jit(fn)
        t0 = time.time()
        barrier(jf(*args))
        cold = time.time() - t0
        best = float("inf")
        for _ in range(iters):
            t0 = time.time()
            barrier(jf(*args))
            best = min(best, time.time() - t0)
        eff = max(best - floor, 1e-9) / chained
        print(f"{name:28s} {eff*1e3:8.2f} ms/op  {unit/eff/1e6:9.1f} M/s"
              f"  (cold {cold:.1f}s)")

    # 1) MXU shared-scalar fold, chained (stays in red8 between folds)
    def fold(xv, rv):
        red = mxu.to_red(xv)
        for _ in range(CHAIN):
            m_r, _ = mxu.fold_matrix(F.spec, F, rv, red.bound, red.W)
            red = mxu.mul_shared(F.spec, red, m_r)
        return mxu.canon(F.spec, F, red)

    timeit("mxu mul_shared (chained)", fold, x, r)

    # 2) VPU pallas elementwise mul, chained
    def vmul(a, b):
        for _ in range(CHAIN):
            a = F.mul(a, b)
        return a

    timeit("vpu pallas fr.mul", vmul, x, g)

    # 3) MXU dot: CHAIN slices of the table, summed (defeats DCE)
    def dot(a, b):
        outs = []
        ra, rb = mxu.to_red(a), mxu.to_red(b)
        for i in range(8):
            fa = mxu.Red(ra.arr + jnp.uint32(i), 256 + 8)
            outs.append(mxu.canon(F.spec, F, mxu.dot_red(F.spec, fa, rb)))
        return jnp.stack(outs)

    timeit("mxu dot_red (sum prod)", dot, x, g, unit=M, chained=8)

    # 4) full MXU product phase (18 rounds, one dispatch)
    chs = F.random((20,), 6)
    timeit(
        "mxu full product phase",
        lambda a, b, cs: mxu_sumcheck.product_phase(F, a, b, cs, 0),
        x, g, chs, unit=M * 2, chained=1,
    )

    # 5) dense vs bucket MSM at the commit size (throughput-only points:
    #    random x/y are not on the curve; the group law never checks)
    from scalable_collaborative_zksnark_tpu.curves.g1 import PointJ, bls12_381_g1
    from scalable_collaborative_zksnark_tpu.primitives.msm import (
        _msm_1d_buckets,
        _msm_1d_dense,
    )

    cv = bls12_381_g1()
    Fq = cv.fq
    N = 1 << 13
    sc = F.decode(F.random((N,), 7))
    pts = PointJ(
        Fq.random((N,), 8),
        Fq.random((N,), 9),
        jnp.broadcast_to(jnp.asarray(Fq.to_mont_int(1)), (N, Fq.L)),
    )
    timeit(
        "dense msm 2^13 (c=8)",
        lambda p, s: _msm_1d_dense(cv, p, s, 8, affine=True), pts, sc,
        unit=N, chained=1,
    )
    timeit(
        "bucket msm 2^13 (c=8)",
        lambda p, s: _msm_1d_buckets(cv, p, s, 8, affine=True), pts, sc,
        unit=N, chained=1,
    )


if __name__ == "__main__":
    main()
