#!/usr/bin/env python
"""Micro-timing of the G1 pallas kernels on the ambient backend.

Times the fused point kernels (add_reset_lazy step, scalar_mul ladder,
horner combine) that set the MSM cost model — run after any kernel
change to keep docs/PERF.md numbers honest.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scalable_collaborative_zksnark_tpu.utils.benchlib import (
        barrier,
        enable_compile_cache,
    )

    enable_compile_cache(REPO / ".jax_cache")
    from scalable_collaborative_zksnark_tpu.curves.g1 import bls12_381_g1, PointJ
    from scalable_collaborative_zksnark_tpu.curves import host_curve as hc
    from scalable_collaborative_zksnark_tpu.primitives.msm import _horner_windows

    C = bls12_381_g1()
    F = C.fr

    def timeit(name, fn, *fargs):
        t0 = time.time()
        out = fn(*fargs)
        barrier(out)
        first = time.time() - t0
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            out = fn(*fargs)
            barrier(out)
            best = min(best, time.time() - t0)
        print(f"{name:40s} warm {best*1e3:9.2f} ms  (first {first:6.1f} s)",
              flush=True)
        return out

    base = C.from_affine_ints([hc.G1_GEN])
    T = 8192
    acc = jax.tree.map(lambda a: jnp.broadcast_to(a, (T, a.shape[-1])), base)
    k2 = C.from_affine_ints([hc.g1_mul(hc.G1_GEN, 12345)])
    p2 = jax.tree.map(lambda a: jnp.broadcast_to(a, (T, a.shape[-1])), k2)
    mask = jnp.ones((T,), bool)

    def steps100(a, b, m):
        def body(i, st):
            x, flag = C.add_mixed_reset_lazy(st, b, m)
            return x

        return jax.lax.fori_loop(0, 100, body, a)

    timeit("100x add_reset_lazy [8192]", jax.jit(steps100), acc, p2, mask)

    def adds100(a, b):
        return jax.lax.fori_loop(0, 100, lambda i, st: C.add(st, b), a)

    timeit("100x full add [8192]", jax.jit(adds100), acc, p2)

    # one-launch scalar_mul ladder at linear-map-ish sizes
    for M in (1152, 8192):
        pts = jax.tree.map(lambda a: jnp.broadcast_to(a, (M, a.shape[-1])), base)
        sc = F.decode(F.random((M,), 7))
        sm = jax.jit(lambda p, s: C.scalar_mul(p, s))
        timeit(f"scalar_mul ladder [{M}]", sm, pts, sc)

    # horner combine at ragged-call shapes
    for (W, c, Cb) in ((32, 8, 1), (43, 6, 45)):
        tot = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (W, Cb, a.shape[-1])), base
        )
        hj = jax.jit(lambda t: _horner_windows(C, PointJ(*t), c))
        timeit(f"horner W={W} c={c} C={Cb}", hj, tuple(tot))


if __name__ == "__main__":
    main()
