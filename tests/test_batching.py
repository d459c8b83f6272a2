"""Round-compression batching — batched calls must equal per-item calls.

The protocol stacks same-shape primitive groups onto a batch axis
(hyperplonk/collaborative.py _stackp) so one collective round serves the
group; these tests pin the batched results to the sequential ones.
"""

import jax
import jax.numpy as jnp
import numpy as np

from scalable_collaborative_zksnark_tpu.fields.fr import get_field
from scalable_collaborative_zksnark_tpu.mpc.net import PartyNet
from scalable_collaborative_zksnark_tpu.primitives.sumcheck import (
    c_sumcheck_product,
    d_sumcheck_product,
)
from scalable_collaborative_zksnark_tpu.primitives.unpack import pss2ss
from scalable_collaborative_zksnark_tpu.pss.pss import PackedSharingParams

F = get_field("bls12_377_fr")
L_PACK = 2
N = 8 * L_PACK
pp = PackedSharingParams(F, L_PACK)


def test_pss2ss_batched_equals_single():
    sh = F.random((N, 3), 5)  # 3 batch slots of one packed share per party
    net = PartyNet(N)
    batched = pss2ss(pp, net, sh)  # [N, 3, l, L]
    for b in range(3):
        single = pss2ss(pp, PartyNet(N), sh[:, b])
        assert bool(jnp.all(batched[:, b] == single))


def test_c_sumcheck_product_batched_equals_single():
    M = 16
    ch = F.random((8,), 1)
    fs = F.random((N, 3, M), 2)
    gs = F.random((N, 3, M), 3)
    net = PartyNet(N)
    batched = c_sumcheck_product(pp, net, fs, gs, ch)  # [N, 3, R, 3, L]
    for b in range(3):
        single = c_sumcheck_product(pp, PartyNet(N), fs[:, b], gs[:, b], ch)
        assert bool(jnp.all(batched[:, b] == single))


def test_d_sumcheck_product_batched_equals_single():
    M = 8
    ch = F.random((8,), 4)
    fs = F.random((N, 2, M), 5)
    gs = F.random((N, 2, M), 6)
    net = PartyNet(N)
    batched = d_sumcheck_product(F, net, fs, gs, ch)  # [2, R, 3, L]
    for b in range(2):
        single = d_sumcheck_product(F, PartyNet(N), fs[:, b], gs[:, b], ch)
        assert bool(jnp.all(batched[b] == single))


def test_d_open_and_commit_batched_equal_single():
    from scalable_collaborative_zksnark_tpu.curves import host_curve as hc
    from scalable_collaborative_zksnark_tpu.curves.g1 import bls12_381_g1
    from scalable_collaborative_zksnark_tpu.primitives.poly_comm import srs_from_secret

    curve = bls12_381_g1()
    Fr = curve.fr
    rng = np.random.RandomState(3)
    s_ints = [int.from_bytes(rng.bytes(40), "little") % Fr.p for _ in range(5)]
    n_parties = 8
    srs = srs_from_secret(curve, hc.G1_GEN, hc.G2_GEN, s_ints, n_parties=n_parties)
    net = PartyNet(n_parties)
    pe = Fr.random((n_parties, 2, 4), 7)  # 2 batch polys, 2^2 local evals
    point = Fr.random((5,), 8)

    cb = srs.d_commit(net, pe, c=4)  # [P, 2]
    for b in range(2):
        single = srs.d_commit(PartyNet(n_parties), pe[:, b], c=4)
        assert bool(jnp.all(curve.equal(
            jax.tree.map(lambda a: a[:, b], cb), single)))

    vals, pis = srs.d_open(net, pe, point, c=4)
    for b in range(2):
        v1, p1 = srs.d_open(PartyNet(n_parties), pe[:, b], point, c=4)
        assert bool(jnp.all(vals[b] == v1))
        for pa, pb_ in zip(pis, p1):
            assert bool(jnp.all(curve.equal(
                jax.tree.map(lambda a: a[b], pa), pb_)))
