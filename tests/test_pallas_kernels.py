"""Pallas kernel conformance on CPU via the interpreter.

The fused G1 point kernels and tiled field kernels are TPU Mosaic
kernels; ``SCZK_PALLAS_INTERPRET=1`` runs the same kernel bodies under
the pallas interpreter so CI (CPU-only) covers their math.  Oracle:
the native C++ host library (same as the curve tests).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scalable_collaborative_zksnark_tpu import native as no
from scalable_collaborative_zksnark_tpu.curves.g1 import (
    BLS12_381_G1_GEN,
    PointJ,
    bls12_381_g1,
)


@pytest.fixture()
def interpret_mode():
    os.environ["SCZK_PALLAS_INTERPRET"] = "1"
    yield
    del os.environ["SCZK_PALLAS_INTERPRET"]


def _mk_points(cv, n, seed=3):
    ks = [(seed * i * i + i + 2) for i in range(1, n + 1)]
    host = [no.g1_mul(BLS12_381_G1_GEN, k) for k in ks]
    return host, cv.from_affine_ints(host)


def _case_points(cv, n=9):
    h1, _ = _mk_points(cv, n, 3)
    h2, _ = _mk_points(cv, n, 7)
    # make interesting cases: equal pair (double), cancel pair, infinities
    h2[0] = h1[0]
    h2[1] = (h1[1][0], (-h1[1][1]) % no.P)
    h2[2] = None
    h1[3] = None
    return h1, cv.from_affine_ints(h1), h2, cv.from_affine_ints(h2)


def test_msm_accumulate_kernel_vs_oracle(interpret_mode):
    """Default-suite coverage of the MSM hot kernel (VERDICT weak #4).

    ``add_masked`` is THE bucket-serial MSM accumulate step
    (msm.py -> Curve.add_mixed_masked), and its `_add_t` body embeds
    the double formula and every complete-case select — so this one
    kernel covers the whole fused point-op surface the TPU hot path
    runs.  One op only: interpret-mode cost is XLA:CPU *compile* of
    the ~16-mul CIOS graph (~2 min on this 1-core box), not
    simulation, so each extra op costs the same again; the remaining
    three ops run under SCZK_SLOW_TESTS below.
    """
    if not no.available():
        pytest.skip("native oracle unavailable")
    from scalable_collaborative_zksnark_tpu.curves.pallas_g1 import point_op

    cv = bls12_381_g1()
    h1, p1, h2, p2 = _case_points(cv)
    want = [no.g1_add(a, b) for a, b in zip(h1, h2)]
    mask = jnp.asarray([1, 0, 1, 0, 1, 0, 1, 0, 1], jnp.uint32)
    x, y, z = point_op("add_masked", cv.fq.spec.name, (*p1, *p2), mask=mask)
    got = cv.to_affine_ints(PointJ(x, y, z))
    want_m = [w if m else a for a, w, m in zip(h1, want, mask.tolist())]
    assert got == want_m


def test_point_kernels_vs_oracle(interpret_mode):
    if not os.environ.get("SCZK_SLOW_TESTS"):
        pytest.skip(
            "each op costs ~1-2.5 min of XLA:CPU compile on this 1-core "
            "box; add_masked (the MSM hot kernel, whose body embeds the "
            "others' formulas) runs by default above — set "
            "SCZK_SLOW_TESTS=1 for the remaining ops"
        )
    if not no.available():
        pytest.skip("native oracle unavailable")
    from scalable_collaborative_zksnark_tpu.curves.pallas_g1 import point_op

    cv = bls12_381_g1()
    h1, p1, h2, p2 = _case_points(cv)

    fq = cv.fq.spec.name
    # general add
    want = [no.g1_add(a, b) for a, b in zip(h1, h2)]
    x, y, z = point_op("add", fq, (*p1, *p2))
    got = cv.to_affine_ints(PointJ(x, y, z))
    assert got == want

    # double
    x, y, z = point_op("double", fq, tuple(p1))
    got = cv.to_affine_ints(PointJ(x, y, z))
    assert got == [no.g1_add(a, a) for a in h1]

    # mixed add (p2 affine by construction)
    x, y, z = point_op("add_mixed", fq, (*p1, *p2))
    got = cv.to_affine_ints(PointJ(x, y, z))
    assert got == want

    # masked mixed add runs in the default suite above


def test_field_kernels_vs_ints(interpret_mode):
    from scalable_collaborative_zksnark_tpu.fields import pallas_fr
    from scalable_collaborative_zksnark_tpu.fields.fr import get_field

    F = get_field("bls12_381_fr")
    rng = np.random.RandomState(5)
    xs = [int.from_bytes(rng.bytes(31), "little") % F.p for _ in range(10)]
    ys = [int.from_bytes(rng.bytes(31), "little") % F.p for _ in range(10)]
    xs += [0, 1, F.p - 1]
    ys += [F.p - 1, 0, F.p - 1]
    a, b = F.array_from_ints(xs), F.array_from_ints(ys)
    assert list(F.array_to_ints(pallas_fr.binary("mul", F.spec, a, b))) == [
        x * y % F.p for x, y in zip(xs, ys)
    ]
    assert list(F.array_to_ints(pallas_fr.binary("add", F.spec, a, b))) == [
        (x + y) % F.p for x, y in zip(xs, ys)
    ]
    assert list(F.array_to_ints(pallas_fr.binary("sub", F.spec, a, b))) == [
        (x - y) % F.p for x, y in zip(xs, ys)
    ]


def test_fused_sumcheck_phase_vs_jnp(interpret_mode):
    """The fused full-phase sumcheck-product kernel must emit the exact
    canonical messages and folded values of the unfused jnp round loop."""
    if not os.environ.get("SCZK_SLOW_TESTS"):
        pytest.skip("~2-4 min of XLA:CPU kernel compile; covered on real "
                    "TPU by bench.py --conformance (set SCZK_SLOW_TESTS=1)")
    from scalable_collaborative_zksnark_tpu.fields.fr import get_field
    from scalable_collaborative_zksnark_tpu.primitives import pallas_sumcheck as psc
    from scalable_collaborative_zksnark_tpu.primitives.sumcheck import (
        _rounds_product,
    )

    F = get_field("bls12_381_fr")
    B, M = 2, 256
    f = F.random((B, M), 11)
    g = F.random((B, M), 12)
    ch = F.random((M.bit_length() - 1 + 3,), 13)

    k_msgs, k_f, k_g = psc.product_phase(F, f, g, ch, 1)
    j_msgs, j_f, j_g = _rounds_product(F, f, g, ch, 1, M.bit_length() - 1)
    assert len(k_msgs) == len(j_msgs)
    for a, b in zip(k_msgs, j_msgs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(k_f), np.asarray(j_f))
    np.testing.assert_array_equal(np.asarray(k_g), np.asarray(j_g))


def test_sumcheck_peel_then_fuse(interpret_mode, monkeypatch):
    """Tables above the fused kernel's exact-u32 bound peel unfused
    rounds then fuse the tail — bitwise equal to the pure path."""
    if not os.environ.get("SCZK_SLOW_TESTS"):
        pytest.skip("~2-4 min of XLA:CPU kernel compile; covered on real "
                    "TPU by bench.py --conformance (set SCZK_SLOW_TESTS=1)")
    from scalable_collaborative_zksnark_tpu.fields.fr import get_field
    from scalable_collaborative_zksnark_tpu.primitives import (
        pallas_sumcheck as psc,
    )
    from scalable_collaborative_zksnark_tpu.primitives.sumcheck import (
        sumcheck_product,
    )

    F = get_field("bls12_381_fr")
    monkeypatch.setattr(psc, "MAX_M", 128)
    f = F.random((1, 512), 21)
    g = F.random((1, 512), 22)
    ch = F.random((12,), 23)
    fused = sumcheck_product(F, f, g, ch)
    monkeypatch.setenv("SCZK_NO_PALLAS", "1")
    ref = sumcheck_product(F, f, g, ch)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_add_reset_kernel_vs_oracle(interpret_mode):
    """The dense-MSM scan step kernel: same ? acc + P2(mixed) : P2."""
    if not no.available():
        pytest.skip("native oracle unavailable")
    from scalable_collaborative_zksnark_tpu.curves.pallas_g1 import point_op

    cv = bls12_381_g1()
    h1, p1, h2, p2 = _case_points(cv)
    want_add = [no.g1_add(a, b) for a, b in zip(h1, h2)]
    same = jnp.asarray([1, 0, 1, 0, 1, 0, 1, 0, 1], jnp.uint32)
    x, y, z = point_op("add_reset", cv.fq.spec.name, (*p1, *p2), mask=same)
    got = cv.to_affine_ints(PointJ(x, y, z))
    want = [w if m else b for b, w, m in zip(h2, want_add, same.tolist())]
    assert got == want


def test_horner_kernel_and_bucket_totals_vs_oracle(interpret_mode):
    """The fused window-Horner kernel and the weighted bucket reduce
    (XLA prefix-scan form) vs the native host oracle."""
    if not no.available():
        pytest.skip("native oracle unavailable")
    from scalable_collaborative_zksnark_tpu.primitives.msm import (
        _horner_windows,
        _weighted_bucket_totals,
    )

    cv = bls12_381_g1()
    rng = np.random.RandomState(11)
    pts_int = [no.g1_mul(BLS12_381_G1_GEN, int(rng.randint(1, 10**9))) for _ in range(6)]
    tot3 = jax.tree.map(lambda a: a.reshape(3, 2, -1), cv.from_affine_ints(pts_int))
    got = cv.to_affine_ints(_horner_windows(cv, tot3, 2))
    for b in range(2):
        want = None
        for w in range(3):
            t = no.g1_mul(pts_int[2 * w + b], 1 << (2 * w))
            want = t if want is None else no.g1_add(want, t)
        assert got[b] == want, b

    binds = [
        no.g1_mul(BLS12_381_G1_GEN, int(rng.randint(1, 10**9)))
        if rng.rand() > 0.3
        else None
        for _ in range(16)
    ]
    acc4 = jax.tree.map(lambda a: a.reshape(2, 2, 4, -1), cv.from_affine_ints(binds))
    import scalable_collaborative_zksnark_tpu.primitives.msm as msm_mod

    got = cv.to_affine_ints(_weighted_bucket_totals(cv, acc4))
    # the serial-bucket kernel (grid over K, lanes = W*C) must agree
    old_gate = msm_mod.SERIAL_REDUCE_MIN_LANES
    try:
        msm_mod.SERIAL_REDUCE_MIN_LANES = 1
        got_serial = cv.to_affine_ints(_weighted_bucket_totals(cv, acc4))
    finally:
        msm_mod.SERIAL_REDUCE_MIN_LANES = old_gate
    i = 0
    for w in range(2):
        for c in range(2):
            want = None
            for k in range(1, 4):
                p = binds[(w * 2 + c) * 4 + k]
                if p is None:
                    continue
                t = no.g1_mul(p, k)
                want = t if want is None else no.g1_add(want, t)
            assert got[i] == want, (w, c)
            assert got_serial[i] == want, ("serial", w, c)
            i += 1


def test_horner_chunked_vs_oracle(interpret_mode):
    """The hierarchical (VMEM-budgeted) window combine: W split into
    chunks, partials recombined with window width c*Wc plus MSB identity
    padding.  ~9 min of XLA:CPU kernel compiles, so gated; the TPU bench
    exercises the same path at the ragged-open shapes every round."""
    if not os.environ.get("SCZK_SLOW_TESTS"):
        pytest.skip("set SCZK_SLOW_TESTS=1 for the chunked-horner case")
    if not no.available():
        pytest.skip("native oracle unavailable")
    from scalable_collaborative_zksnark_tpu.curves import pallas_g1 as pg
    from scalable_collaborative_zksnark_tpu.primitives.msm import _horner_windows

    cv = bls12_381_g1()
    rng = np.random.RandomState(11)
    W, B = 5, 2
    pts_int = [
        no.g1_mul(BLS12_381_G1_GEN, int(rng.randint(1, 10**9)))
        for _ in range(W * B)
    ]
    tot = jax.tree.map(lambda a: a.reshape(W, B, -1), cv.from_affine_ints(pts_int))
    old = pg.HORNER_VMEM_BUDGET
    try:
        pg.HORNER_VMEM_BUDGET = 3 * 24 * 8 * 4 * 2  # 2 windows/launch -> 3 chunks
        got = cv.to_affine_ints(_horner_windows(cv, tot, 2))
    finally:
        pg.HORNER_VMEM_BUDGET = old
    for b in range(B):
        want = None
        for w in range(W):
            t = no.g1_mul(pts_int[B * w + b], 1 << (2 * w))
            want = t if want is None else no.g1_add(want, t)
        assert got[b] == want, b


def test_scalar_mul_ladder_kernel_vs_oracle(interpret_mode):
    """One-launch double-and-add ladder kernel (short scalars keep the
    interpreter fast; the full 256-bit path is covered on hardware by
    bench.py --conformance)."""
    if not os.environ.get("SCZK_SLOW_TESTS"):
        pytest.skip("~2-4 min of XLA:CPU kernel compile; covered on real "
                    "TPU by bench.py --conformance (set SCZK_SLOW_TESTS=1)")
    if not no.available():
        pytest.skip("native oracle unavailable")
    from scalable_collaborative_zksnark_tpu.curves import pallas_g1 as pg
    from scalable_collaborative_zksnark_tpu.fields.config import int_to_limbs

    cv = bls12_381_g1()
    rng = np.random.RandomState(12)
    pts_int = [no.g1_mul(BLS12_381_G1_GEN, int(rng.randint(1, 10**9))) for _ in range(3)]
    pts_int.append(None)
    P = cv.from_affine_ints(pts_int)
    ks = [int(rng.randint(0, 1 << 30)) for _ in range(3)] + [7]
    ks[1] = 0
    sc = jnp.asarray(np.stack([int_to_limbs(k, 2) for k in ks]))
    x, y, z = pg.scalar_mul(cv.fq.spec.name, (P.x, P.y, P.z), sc)
    got = cv.to_affine_ints(PointJ(x, y, z))
    want = [
        no.g1_mul(p, k) if (p is not None and k) else None
        for p, k in zip(pts_int, ks)
    ]
    assert got == want
