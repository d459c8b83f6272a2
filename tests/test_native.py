"""Native C++ host oracle — cross-validation against the Python tower."""

import pytest

from scalable_collaborative_zksnark_tpu import native
from scalable_collaborative_zksnark_tpu.curves import host_curve as hc

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_g1_ops_match_python():
    g = hc.G1_GEN
    assert native.g1_add(g, g) == hc.g1_add(g, g)
    assert native.g1_add(g, None) == g
    assert native.g1_add(g, hc.g1_neg(g)) is None
    for k in (0, 1, 2, 0xDEADBEEF, hc.R - 1):
        assert native.g1_mul(g, k) == hc.g1_mul(g, k)


def test_g2_ops_match_python():
    q = hc.G2_GEN
    assert native.g2_add(q, q) == hc.g2_add(q, q)
    for k in (1, 3, 0xBADC0FFEE):
        assert native.g2_mul(q, k) == hc.g2_mul(q, k)


def test_g1_msm_matches_python():
    g = hc.G1_GEN
    pts = [hc.g1_mul(g, i + 1) for i in range(5)] + [None]
    ks = [7, 11, 13, 17, 19, 23]
    expect = None
    for p, k in zip(pts, ks):
        expect = hc.g1_add(expect, hc.g1_mul(p, k) if p else None)
    assert native.g1_msm(pts, ks) == expect


def test_pairing_bilinearity():
    g, q = hc.G1_GEN, hc.G2_GEN
    a = 424242
    assert native.pairing_product_is_one(
        [(hc.g1_mul(g, a), q), (hc.g1_neg(g), hc.g2_mul(q, a))]
    )
    assert not native.pairing_product_is_one(
        [(hc.g1_mul(g, a), q), (g, hc.g2_mul(q, a))]
    )
    # infinity pairs are identity
    assert native.pairing_product_is_one([(None, q), (g, None)])


def test_dispatch_helper_matches():
    g, q = hc.G1_GEN, hc.G2_GEN
    pairs = [(hc.g1_mul(g, 5), q), (hc.g1_neg(g), hc.g2_mul(q, 5))]
    assert hc.pairing_product_is_one(pairs) == (hc.pairing_product(pairs) == hc.F12_ONE)
