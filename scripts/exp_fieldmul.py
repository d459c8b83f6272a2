#!/usr/bin/env python
"""Experiment: Montgomery-mul formulations on TPU.

Compares, at [2^m] elements:
  A. current lax.scan CIOS (fr.Field.mul)
  B. unrolled CIOS — Python loop over limbs at trace time, so XLA can
     fuse the whole multiply into one elementwise kernel (no HBM
     round-trips between limb steps, which is what makes the scan slow)
  C. Pallas kernel — limb-major [L, TILE] layout in VMEM, unrolled CIOS
     inside the kernel.

All three must agree bit-exactly with the host oracle.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.common import base_parser, setup  # noqa: E402


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--m", type=int, default=20)
    args = ap.parse_args()
    setup(args)
    import jax
    import jax.numpy as jnp

    from scalable_collaborative_zksnark_tpu.fields.config import LIMB_BITS, LIMB_MASK
    from scalable_collaborative_zksnark_tpu.fields.fr import get_field

    F = get_field("bls12_381_fr")
    L = F.L
    MASK = jnp.uint32(LIMB_MASK)
    p_np = F._p_np
    n0inv = F._n0inv

    M = 1 << args.m
    a = F.random((M,), 1)
    b = F.random((M,), 2)

    # ---------------- B: unrolled CIOS --------------------------------
    @jax.jit
    def mul_unrolled(a, b):
        p = jnp.asarray(p_np, dtype=jnp.uint32)
        t = [jnp.zeros(a.shape[:-1], jnp.uint32) for _ in range(L + 1)]
        for i in range(L):
            ai = a[..., i]
            # t += a_i * b (lo/hi split)
            for j in range(L):
                prod = ai * b[..., j]
                t[j] = t[j] + (prod & MASK)
                t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
            m = ((t[0] & MASK) * n0inv) & MASK
            for j in range(L):
                mp = m * p[j]
                t[j] = t[j] + (mp & MASK)
                t[j + 1] = t[j + 1] + (mp >> LIMB_BITS)
            carry = t[0] >> LIMB_BITS
            t = t[1:] + [jnp.zeros(a.shape[:-1], jnp.uint32)]
            t[0] = t[0] + carry
        # carry propagate
        limbs = []
        c = jnp.zeros(a.shape[:-1], jnp.uint32)
        for j in range(L):
            s = t[j] + c
            limbs.append(s & MASK)
            c = s >> LIMB_BITS
        c = c + t[L]
        out = jnp.stack(limbs, axis=-1)
        # conditional subtract p (value < 2p)
        diff = []
        borrow = jnp.zeros(a.shape[:-1], jnp.uint32)
        for j in range(L):
            d = out[..., j] - jnp.uint32(p_np[j]) - borrow
            borrow = (d >> 31) & jnp.uint32(1)
            diff.append(d & MASK)
        diff = jnp.stack(diff, axis=-1)
        take = jnp.logical_or(c > 0, borrow == 0)
        return jnp.where(take[..., None], diff, out)

    # ---------------- C: Pallas kernel --------------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE = 1024
    n0inv_i = int(n0inv)
    p_ints = [int(v) for v in p_np]

    KMASK = (1 << LIMB_BITS) - 1  # python int: no captured jnp constant

    def mont_kernel_lm(a_ref, b_ref, o_ref):
        # limb-major refs [L, TILE]: limb j is a [1, TILE] row, lanes=TILE
        av = a_ref[:]
        bv = b_ref[:]
        t = [jnp.zeros((1, TILE), jnp.uint32) for _ in range(L + 1)]
        for i in range(L):
            ai = av[i : i + 1, :]
            for j in range(L):
                prod = ai * bv[j : j + 1, :]
                t[j] = t[j] + (prod & KMASK)
                t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
            m = ((t[0] & KMASK) * jnp.uint32(n0inv_i)) & KMASK
            for j in range(L):
                mp = m * jnp.uint32(p_ints[j])
                t[j] = t[j] + (mp & KMASK)
                t[j + 1] = t[j + 1] + (mp >> LIMB_BITS)
            carry = t[0] >> LIMB_BITS
            t = t[1:] + [jnp.zeros((1, TILE), jnp.uint32)]
            t[0] = t[0] + carry
        limbs = []
        c = jnp.zeros((1, TILE), jnp.uint32)
        for j in range(L):
            s = t[j] + c
            limbs.append(s & KMASK)
            c = s >> LIMB_BITS
        c = c + t[L]
        out = jnp.concatenate(limbs, axis=0)  # [L, TILE]
        borrow = jnp.zeros((1, TILE), jnp.uint32)
        diff = []
        for j in range(L):
            d = out[j : j + 1, :] - jnp.uint32(p_ints[j]) - borrow
            borrow = (d >> 31) & jnp.uint32(1)
            diff.append(d & KMASK)
        diff = jnp.concatenate(diff, axis=0)
        take = jnp.logical_or(c > 0, borrow == 0)  # [1, TILE]
        o_ref[:] = jnp.where(take, diff, out)

    @jax.jit
    def mul_pallas(a, b):
        # transpose to limb-major [L, M] at the XLA level (one pass)
        at = a.T
        bt = b.T
        grid = (a.shape[0] // TILE,)
        ot = pl.pallas_call(
            mont_kernel_lm,
            out_shape=jax.ShapeDtypeStruct(at.shape, at.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(at, bt)
        return ot.T

    # ------------- D: Pallas, full-sublane tiles [L, 8, 512] ----------
    SUB, LANE = 8, 512
    TB = SUB * LANE  # 4096 batch elements per block

    def mont_kernel_lm2(a_ref, b_ref, o_ref):
        # refs [1, L, SUB, LANE]: each limb is a full (8, 512) vreg tile
        t = [jnp.zeros((SUB, LANE), jnp.uint32) for _ in range(L + 1)]
        for i in range(L):
            ai = a_ref[0, i]
            for j in range(L):
                prod = ai * b_ref[0, j]
                t[j] = t[j] + (prod & KMASK)
                t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
            m = ((t[0] & KMASK) * jnp.uint32(n0inv_i)) & KMASK
            for j in range(L):
                mp = m * jnp.uint32(p_ints[j])
                t[j] = t[j] + (mp & KMASK)
                t[j + 1] = t[j + 1] + (mp >> LIMB_BITS)
            carry = t[0] >> LIMB_BITS
            t = t[1:] + [jnp.zeros((SUB, LANE), jnp.uint32)]
            t[0] = t[0] + carry
        c = jnp.zeros((SUB, LANE), jnp.uint32)
        for j in range(L):
            s = t[j] + c
            o_ref[0, j] = s & KMASK  # pre-reduction limbs; final sub below
            c = s >> LIMB_BITS
        # store carry info in t; conditional subtract handled by re-read
        out = [o_ref[0, j] for j in range(L)]
        c = c + t[L]
        borrow = jnp.zeros((SUB, LANE), jnp.uint32)
        diff = []
        for j in range(L):
            d = out[j] - jnp.uint32(p_ints[j]) - borrow
            borrow = (d >> 31) & jnp.uint32(1)
            diff.append(d & KMASK)
        take = jnp.logical_or(c > 0, borrow == 0)
        for j in range(L):
            o_ref[0, j] = jnp.where(take, diff[j], out[j])

    @jax.jit
    def mul_pallas2(a, b):
        G = a.shape[0] // TB
        at = a.reshape(G, SUB, LANE, L).transpose(0, 3, 1, 2)  # [G, L, 8, 512]
        bt = b.reshape(G, SUB, LANE, L).transpose(0, 3, 1, 2)
        ot = pl.pallas_call(
            mont_kernel_lm2,
            out_shape=jax.ShapeDtypeStruct(at.shape, at.dtype),
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, L, SUB, LANE), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, SUB, LANE), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, L, SUB, LANE), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(at, bt)
        return ot.transpose(0, 2, 3, 1).reshape(a.shape)

    def timeit(fn, *xs, reps=5):
        out = fn(*xs)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*xs)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best, out

    tA, outA = timeit(F.mul, a, b)
    tB, outB = timeit(mul_unrolled, a, b)
    print(f"A scan     [2^{args.m}]: {tA*1e3:8.3f} ms ({M/tA/1e6:7.1f} Mmul/s)")
    print(f"B unrolled [2^{args.m}]: {tB*1e3:8.3f} ms ({M/tB/1e6:7.1f} Mmul/s)",
          "match" if bool(jnp.all(outA == outB)) else "MISMATCH")
    try:
        tC, outC = timeit(mul_pallas, a, b)
        print(f"C pallas   [2^{args.m}]: {tC*1e3:8.3f} ms ({M/tC/1e6:7.1f} Mmul/s)",
              "match" if bool(jnp.all(outA == outC)) else "MISMATCH")
    except Exception as e:  # noqa: BLE001
        print("C pallas failed:", repr(e)[:300])
    try:
        tD, outD = timeit(mul_pallas2, a, b)
        print(f"D pallas8x [2^{args.m}]: {tD*1e3:8.3f} ms ({M/tD/1e6:7.1f} Mmul/s)",
              "match" if bool(jnp.all(outA == outD)) else "MISMATCH")
    except Exception as e:  # noqa: BLE001
        print("D pallas8x failed:", repr(e)[:300])


if __name__ == "__main__":
    main()
