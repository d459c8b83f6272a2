"""PSS conformance: mirrors the reference's pss.rs test suite.

- test_pack_from_public  (pss.rs:203)  roundtrip
- test_multiplication    (pss.rs:219)  share-multiply then unpack2
- test_pack_rand         (pss.rs:257)  randomized packing roundtrip
- test_group_addition    (pss.rs:237)  G1 packing (shares added, unpack2)
plus matrix/NTT-path agreement (our linear-map formulation).
"""

import jax
import numpy as np
import pytest

from scalable_collaborative_zksnark_tpu.fields.fr import get_field
from scalable_collaborative_zksnark_tpu.pss.pss import PackedSharingParams

F = get_field("bls12_377_fr")


def rand_secrets(l, seed):
    rng = np.random.RandomState(seed)
    return [int.from_bytes(rng.bytes(40), "little") % F.p for _ in range(l)]


@pytest.mark.parametrize("l", [2, 4])
def test_pack_unpack_roundtrip(l):
    pp = PackedSharingParams(F, l)
    secrets = rand_secrets(l, l)
    shares = jax.jit(pp.pack_from_public)(F.array_from_ints(secrets))
    assert shares.shape == (8 * l, F.L)
    back = F.array_to_ints(jax.jit(pp.unpack)(shares))
    assert list(back) == secrets


@pytest.mark.parametrize("l", [2, 4])
def test_share_multiplication_unpack2(l):
    pp = PackedSharingParams(F, l)
    secrets = rand_secrets(l, 10 + l)
    sh = pp.pack_from_public(F.array_from_ints(secrets))
    prod = F.array_to_ints(jax.jit(pp.unpack2)(F.mul(sh, sh)))
    assert list(prod) == [s * s % F.p for s in secrets]


def test_pack_rand_roundtrip():
    pp = PackedSharingParams(F, 4)
    secrets = rand_secrets(4, 20)
    sh = pp.pack_from_public_rand(F.array_from_ints(secrets), seed=7)
    assert list(F.array_to_ints(pp.unpack(sh))) == secrets
    prod = F.array_to_ints(pp.unpack2(F.mul(sh, sh)))
    assert prod.tolist() == [s * s % F.p for s in secrets]


@pytest.mark.parametrize("l", [2])
def test_matrices_agree_with_ntt_path(l):
    pp = PackedSharingParams(F, l)
    secrets = rand_secrets(l, 30)
    sh_ints = list(F.array_to_ints(pp.pack_from_public(F.array_from_ints(secrets))))
    P = pp.pack_matrix()
    assert [
        sum(int(P[i, j]) * secrets[j] for j in range(l)) % F.p for i in range(pp.n)
    ] == sh_ints
    U = pp.unpack_matrix()
    assert [
        sum(int(U[i, j]) * sh_ints[j] for j in range(pp.n)) % F.p for i in range(l)
    ] == secrets


def test_pack_single_variants():
    pp = PackedSharingParams(F, 2)
    s = rand_secrets(1, 40)[0]
    sv = F.array_from_ints([s])[0]
    # faithful variant matches its matrix form (rank-1 map)
    ss = pp.pack_single(sv)
    u = pp.pack_single_vector()
    assert list(F.array_to_ints(ss)) == [int(u[j]) * s % F.p for j in range(pp.n)]
    # reconstructible variant: unpack gives [s, 0, ..., 0]
    sr = pp.pack_single_reconstructible(sv)
    got = F.array_to_ints(pp.unpack(sr))
    assert int(got[0]) == s
    assert all(int(g) == 0 for g in got[1:])


def test_group_packing_bls381():
    """pss.rs test_group_addition, on BLS12-381 G1 with the host oracle."""
    from scalable_collaborative_zksnark_tpu.curves import host_curve as hc
    from scalable_collaborative_zksnark_tpu.curves.g1 import bls12_381_g1

    C = bls12_381_g1()
    Fr = get_field("bls12_381_fr")
    pp = PackedSharingParams(Fr, 2)
    rng = np.random.RandomState(50)
    ks = [int.from_bytes(rng.bytes(31), "little") % hc.R for _ in range(2)]
    pts = [hc.g1_mul(hc.G1_GEN, k) for k in ks]
    P = C.from_affine_ints(pts)
    shares = pp.pack_from_public_group(C, P)  # [n] share points
    # add shares (share of 2*secret), unpack2
    doubled = C.add(shares, shares)
    back = pp.unpack2_group(C, doubled)
    expect = [hc.g1_mul(q, 2) for q in pts]
    assert C.to_affine_ints(back) == expect
    # plain unpack roundtrip as well
    back1 = pp.unpack_group(C, shares)
    assert C.to_affine_ints(back1) == pts


def test_group_g2_pack_unpack():
    """G2 packing via the same linear maps (pss.rs:69 DomainCoeff
    genericity; G2 is SRS/verify-side only, so the path is host-exact)."""
    from scalable_collaborative_zksnark_tpu.curves import host_curve as hc

    Fr = get_field("bls12_381_fr")
    pp = PackedSharingParams(Fr, 2)
    rng = np.random.RandomState(51)
    ks = [int.from_bytes(rng.bytes(31), "little") % hc.R for _ in range(2)]
    pts = [hc.g2_mul(hc.G2_GEN, k) for k in ks]
    shares = pp.pack_from_public_g2(pts)
    assert len(shares) == 8 * 2
    assert pp.unpack_g2(shares) == pts
    doubled = [hc.g2_add(s, s) for s in shares]
    assert pp.unpack2_g2(doubled) == [hc.g2_mul(q, 2) for q in pts]


def test_unpack_degree_bound_debug_flag(monkeypatch):
    """SCZK_DEBUG_PSS=1: unpack validates that coefficients above degree
    t+l vanish (the reference's debug assertion, pss.rs:137-142)."""
    monkeypatch.setenv("SCZK_DEBUG_PSS", "1")
    pp = PackedSharingParams(F, 2)
    secrets = rand_secrets(2, 77)
    shares = pp.pack_from_public(F.array_from_ints(secrets))
    got = [int(v) for v in F.array_to_ints(pp.unpack(shares))]
    assert got == secrets  # valid sharing passes
    # corrupt one share: interpolation degree exceeds t+l -> assertion
    bad = shares.at[3, 0].set((int(shares[3, 0]) + 1) % (1 << 16))
    with pytest.raises(AssertionError, match="degree t\\+l"):
        pp.unpack(bad)
