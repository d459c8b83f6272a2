"""unpack helpers, pss2ss, degree_reduce, mle — conformance tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scalable_collaborative_zksnark_tpu.fields.fr import get_field
from scalable_collaborative_zksnark_tpu.mpc.net import PartyNet
from scalable_collaborative_zksnark_tpu.primitives import unpack as up
from scalable_collaborative_zksnark_tpu.primitives.degree_reduce import (
    degree_reduce,
    degree_reduce_many,
)
from scalable_collaborative_zksnark_tpu.primitives.mle import (
    d_fix_variable,
    fix_variable,
    pack_vec,
    unpack_vec,
)
from scalable_collaborative_zksnark_tpu.pss.pss import PackedSharingParams

F = get_field("bls12_377_fr")
L_PACK = 2
N = 8 * L_PACK
pp = PackedSharingParams(F, L_PACK)


def rand_ints(n, seed):
    rng = np.random.RandomState(seed)
    return [int.from_bytes(rng.bytes(40), "little") % F.p for _ in range(n)]


def test_pack_unpack_vec_roundtrip():
    xs = rand_ints(8, 0)
    x = F.array_from_ints(xs)
    shares = pack_vec(pp, x)  # [N, 4, L]
    assert shares.shape == (N, 8 // L_PACK, F.L)
    assert list(F.array_to_ints(unpack_vec(pp, shares))) == xs


def test_d_unpack_0():
    xs = rand_ints(L_PACK, 1)
    sh = pp.pack_from_public(F.array_from_ints(xs))  # [N, L]
    net = PartyNet(N)
    out = up.d_unpack_0(pp, net, sh)
    vals = F.array_to_ints(out)
    assert all(int(v) == xs[0] for v in vals)


def test_d_unpack2_many():
    xs = rand_ints(2 * L_PACK, 2)
    x = F.array_from_ints(xs)
    shares = pack_vec(pp, x)  # [N, B=2, L]
    sq = F.mul(shares, shares)  # degree-2 shares
    net = PartyNet(N)
    out = up.d_unpack2_many(pp, net, sq, receiver=3)
    got = list(F.array_to_ints(out))
    assert got == [v * v % F.p for v in xs]


def test_pss2ss_reconstruction():
    xs = rand_ints(L_PACK, 3)
    sh = pp.pack_from_public(F.array_from_ints(xs))  # [N, L]
    net = PartyNet(N)
    ss = up.pss2ss(pp, net, sh)  # [N, l, L]
    # for each secret k: unpack the party-column k -> [v_k, 0, ...]
    cols = jnp.moveaxis(ss, 0, -2)  # [l, N, L]
    secrets = pp.unpack(cols)  # [l, l, L]
    vals = F.array_to_ints(secrets)
    for k in range(L_PACK):
        assert int(vals[k][0]) == xs[k]
        assert all(int(v) == 0 for v in vals[k][1:])


def test_degree_reduce():
    xs = rand_ints(L_PACK, 4)
    sh = pp.pack_from_public(F.array_from_ints(xs))
    sq = F.mul(sh, sh)  # degree-2 share of x^2
    net = PartyNet(N)
    red = degree_reduce(pp, net, sq)
    # reduced share must unpack (degree t+l) to the squares
    got = F.array_to_ints(pp.unpack(red))
    assert list(got) == [v * v % F.p for v in xs]


def test_degree_reduce_many():
    xs = rand_ints(3 * L_PACK, 5)
    x = F.array_from_ints(xs)
    shares = pack_vec(pp, x)  # [N, 3, L]
    sq = F.mul(shares, shares)
    net = PartyNet(N)
    red = degree_reduce_many(pp, net, sq)
    got = list(F.array_to_ints(unpack_vec(pp, red)))
    assert got == [v * v % F.p for v in xs]


def test_fix_variable_matches_reference_fold():
    xs = rand_ints(8, 6)
    points = rand_ints(2, 7)
    x = F.array_from_ints(xs)
    pt = F.array_from_ints(points)
    out = F.array_to_ints(fix_variable(F, x, pt))
    # oracle: fold MSB-first: cur = lo + p*(hi-lo)
    cur = xs
    for p_ in points:
        half = len(cur) // 2
        cur = [(cur[i] + p_ * (cur[i + half] - cur[i])) % F.p for i in range(half)]
    assert list(out) == cur


def test_d_fix_variable_full_collapse():
    n_vars = 3  # 8 evals; points span local + packed dims
    xs = rand_ints(1 << n_vars, 8)
    points = rand_ints(n_vars, 9)
    x = F.array_from_ints(xs)
    shares = pack_vec(pp, x)  # [N, 4, L]
    net = PartyNet(N)
    out = d_fix_variable(pp, net, shares, F.array_from_ints(points))  # [N, 1, L]
    # result is a rank-1 (pss2ss-style) share; unpack across parties,
    # secret slot 0 holds the value
    secrets = pp.unpack(jnp.moveaxis(out[:, 0], 0, -2))
    # oracle
    cur = xs
    for p_ in points:
        half = len(cur) // 2
        cur = [(cur[i] + p_ * (cur[i + half] - cur[i])) % F.p for i in range(half)]
    assert int(F.array_to_ints(secrets)[0]) == cur[0]
