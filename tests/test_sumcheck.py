"""Sumcheck conformance: local vs collaborative vs distributed.

Mirrors the reference's dsumcheck.rs test suite with a strengthened
oracle: collaborative transcripts (opened across parties) must equal the
monolithic transcript *bit-exactly* and pass the round-consistency
verifier (check_sumcheck / check_sumcheck_product, dsumcheck.rs:541-588).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scalable_collaborative_zksnark_tpu.fields.fr import get_field
from scalable_collaborative_zksnark_tpu.mpc.net import PartyNet
from scalable_collaborative_zksnark_tpu.primitives import sumcheck as sc
from scalable_collaborative_zksnark_tpu.primitives.mle import pack_vec
from scalable_collaborative_zksnark_tpu.pss.pss import PackedSharingParams

F = get_field("bls12_377_fr")
L_PACK = 4
N = 8 * L_PACK
N_VARS = 6
M = 1 << N_VARS


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    xs = [int.from_bytes(rng.bytes(40), "little") % F.p for _ in range(M)]
    ch = [int.from_bytes(rng.bytes(40), "little") % F.p for _ in range(N_VARS)]
    return xs, ch, F.array_from_ints(xs), F.array_from_ints(ch)


def to_proof(arr):
    return [tuple(int(v) for v in row) for row in F.array_to_ints(arr)]


def test_local_sumcheck(data):
    xs, ch, x, challenges = data
    proof = to_proof(sc.sumcheck(F, x, challenges))
    h = sum(xs) % F.p
    assert (proof[0][0] + proof[0][1]) % F.p == h
    assert sc.check_sumcheck(F, h, proof, ch)


def test_local_sumcheck_product(data):
    xs, ch, x, challenges = data
    proof = to_proof(sc.sumcheck_product(F, x, x, challenges))
    hp = sum(v * v for v in xs) % F.p
    assert sc.check_sumcheck_product(F, hp, proof, ch)


def test_c_sumcheck_matches_monolithic(data):
    xs, ch, x, challenges = data
    pp = PackedSharingParams(F, L_PACK)
    net = PartyNet(N)
    shares = pack_vec(pp, x)  # [N, M/l, L]
    cmsgs = sc.c_sumcheck(pp, net, shares, challenges)
    secrets = pp.unpack(jnp.moveaxis(cmsgs, 0, -2))
    cproof = to_proof(F.sum(secrets, axis=-2))
    mono = to_proof(sc.sumcheck(F, x, challenges))
    h = sum(xs) % F.p
    assert cproof == mono
    assert sc.check_sumcheck(F, h, cproof, ch)
    # one gather + scatter for pss2ss
    assert net.rounds == 2


def test_c_sumcheck_product_matches_monolithic(data):
    xs, ch, x, challenges = data
    pp = PackedSharingParams(F, L_PACK)
    net = PartyNet(N)
    shares = pack_vec(pp, x)
    cmsgs = sc.c_sumcheck_product(pp, net, shares, shares, challenges)
    secrets = pp.unpack2(jnp.moveaxis(cmsgs, 0, -2))
    cproof = to_proof(F.sum(secrets, axis=-2))
    mono = to_proof(sc.sumcheck_product(F, x, x, challenges))
    hp = sum(v * v for v in xs) % F.p
    assert cproof == mono
    assert sc.check_sumcheck_product(F, hp, cproof, ch)


def test_d_sumcheck(data):
    xs, ch, x, challenges = data
    parts = x.reshape(N, M // N, F.L)
    proof = to_proof(sc.d_sumcheck(F, PartyNet(N), parts, challenges))
    h = sum(xs) % F.p
    assert (proof[0][0] + proof[0][1]) % F.p == h
    assert sc.check_sumcheck(F, h, proof, ch)
    assert len(proof) == (M // N).bit_length() - 1 + N.bit_length() - 1


def test_d_sumcheck_product(data):
    xs, ch, x, challenges = data
    parts = x.reshape(N, M // N, F.L)
    proof = to_proof(sc.d_sumcheck_product(F, PartyNet(N), parts, parts, challenges))
    hp = sum(v * v for v in xs) % F.p
    assert sc.check_sumcheck_product(F, hp, proof, ch)


def test_leader_mode_comm_parity(data):
    xs, ch, x, challenges = data
    pp = PackedSharingParams(F, L_PACK)
    net_sim = PartyNet(N)
    shares = pack_vec(pp, x)
    sc.c_sumcheck(pp, net_sim, shares, challenges)
    net_lead = PartyNet(N, mode="leader")
    sc.c_sumcheck(pp, net_lead, shares[:1], challenges)
    assert net_lead.comm(0) == net_sim.comm(0)
    assert net_lead.comm(3) == net_sim.comm(3)
