"""Product-accumulation tree — conformance vs a pure-int reference oracle.

The oracle below re-executes the reference algorithm
(/root/reference/dist-primitive/src/dacc_product.rs) on Python ints,
including the level-order subtree layout, the leader-tree interleave and
the ``merge`` share-stream reassembly — so the device path is checked
against an independent implementation, not against itself.
"""

import jax.numpy as jnp
import numpy as np

from scalable_collaborative_zksnark_tpu.fields.fr import get_field
from scalable_collaborative_zksnark_tpu.mpc.net import PartyNet
from scalable_collaborative_zksnark_tpu.primitives.acc_product import (
    acc_product,
    c_acc_product_and_share,
    d_acc_product,
    sub_index,
)
from scalable_collaborative_zksnark_tpu.pss.pss import PackedSharingParams

F = get_field("bls12_377_fr")
L_PACK = 2
N = 8 * L_PACK
pp = PackedSharingParams(F, L_PACK)


def rand_ints(n, seed):
    rng = np.random.RandomState(seed)
    return [int.from_bytes(rng.bytes(40), "little") % F.p for _ in range(n)]


def test_sub_index():
    assert sub_index(26) == (20, 21)  # dacc_product.rs:442-448


def test_acc_product_reference_vector():
    # dacc_product.rs:451-466 (vector is for 4 inputs)
    x = F.array_from_ints([1, 2, 3, 4])
    v0, v1, v2 = acc_product(F, x)
    assert list(F.array_to_ints(v0)) == [1, 3, 2, 24]
    assert list(F.array_to_ints(v1)) == [2, 4, 12, 0]
    assert list(F.array_to_ints(v2)) == [2, 12, 24, 0]


# ---------------------------------------------------------------------------
# int-level oracle
# ---------------------------------------------------------------------------
def oracle_subtree(vals, p):
    M = len(vals)
    res = list(vals) + [0] * M
    for i in range(M, 2 * M - 1):
        x0, x1 = sub_index(i)
        res[i] = res[x0] * res[x1] % p
    res[2 * M - 1] = 0
    return res


def oracle_leader_tree(subtrees, n, p):
    tops = [st[-n:] for st in subtrees]
    lt = []
    ll, start = n // 2, 0
    while ll > 0:
        for j in range(n):
            lt += tops[j][start : start + ll]
        start += ll
        ll >>= 1
    for i in range(n * n - n, n * n - 1):
        x0, x1 = sub_index(i)
        lt.append(lt[x0] * lt[x1] % p)
    lt.append(0)
    return lt


def oracle_merge_vals(streams, l):
    K = len(streams[0]) // l
    out = []
    num = 1 << ((K + 1).bit_length() - 1)
    start = 0
    while start + num <= K:
        for s in streams:
            out += s[start * l : (start + num) * l]
        start += num
        num >>= 1
    return out


def unpack2_stream(share):
    """[P, K, L] degree-2t share stream -> K*l plain ints."""
    cols = jnp.moveaxis(share, 0, -2)  # [K, N, L]
    vals = pp.unpack2(cols)  # [K, l, L]
    return [int(v) for v in F.array_to_ints(vals).reshape(-1)]


def test_d_acc_product():
    per = 8
    vals = rand_ints(N * per, 3)
    parts = F.array_from_ints(np.asarray(vals).reshape(N, per))
    net = PartyNet(N)
    subtree, leader_tree = d_acc_product(F, net, parts)
    # each party's subtree equals the oracle
    for j in range(N):
        st = oracle_subtree(vals[j * per : (j + 1) * per], F.p)
        got = [int(v) for v in F.array_to_ints(subtree[j])]
        assert got == st
    roots = [oracle_subtree(vals[j * per : (j + 1) * per], F.p)[-2] for j in range(N)]
    lt = oracle_subtree(roots, F.p)  # leader tree = [roots | levels | 0]
    got = [int(v) for v in F.array_to_ints(leader_tree)]
    assert got == lt


def test_c_acc_product_and_share_full_pipeline():
    # S shares/party so that M = (S/N)*l >= N (subtree at least N deep)
    S = 256  # M = (S/N)*l = 32 > N so the v(1,x) merge path is non-empty
    secrets = rand_ints(S * L_PACK, 4)
    # pack globally: shares [N, S, L]; party blocks of the plain stream
    chunks = F.array_from_ints(np.asarray(secrets).reshape(S, L_PACK))
    shares = jnp.moveaxis(pp.pack_from_public(chunks), -2, 0)  # [N, S, L]
    ones = pp.pack_from_public(F.array_from_ints([[1] * L_PACK] * S))
    mask_sh = jnp.moveaxis(ones, -2, 0)  # shares of all-ones mask
    big = 4 * S
    ones_u = pp.pack_from_public(F.array_from_ints([[1] * L_PACK] * big))
    unmask = jnp.moveaxis(ones_u, -2, 0)  # [N, big, L]

    net = PartyNet(N)
    s0, s1, s2 = c_acc_product_and_share(
        pp, net, shares, mask_sh, unmask, unmask, unmask, run_reduce=False
    )

    # oracle: masked_x at party i = secrets of block i, slot-major
    B = S // N
    per_party = []
    for i in range(N):
        vals = []
        for b in range(B):
            slot = i * B + b
            vals += secrets[slot * L_PACK : (slot + 1) * L_PACK]
        per_party.append(vals)
    subtrees = [oracle_subtree(v, F.p) for v in per_party]
    lt = oracle_leader_tree(subtrees, N, F.p)
    M = len(per_party[0])
    sts = [st[: 2 * M - N] for st in subtrees]
    exp0 = oracle_merge_vals([s[0::2] for s in sts], L_PACK) + lt[0::2]
    exp1 = oracle_merge_vals([s[1::2] for s in sts], L_PACK) + lt[1::2]
    exp2 = oracle_merge_vals(
        [s[M : 2 * M - N] for s in sts], L_PACK
    ) + lt[N * N // 2 :]

    assert unpack2_stream(s0) == exp0
    assert unpack2_stream(s1) == exp1
    assert unpack2_stream(s2) == exp2
    # the global product is the leader tree's root-of-roots
    total = 1
    for v in secrets:
        total = total * v % F.p
    assert exp2[-2] == total

    # comm accounting ticked (all-to-all + scatters)
    up, down = net.comm_total()
    assert up > 0 and down > 0
