"""Sharded-equality tests: party-axis Mesh runs must be bit-identical
to the single-device sim runs.

The reference's conformance surface runs every protocol over a real
16-party loopback TCP net (mpc-net/src/multi.rs:273-362); here the
equivalent claim is that sharding the party axis of the SAME array
program over a ``Mesh(("party",))`` of the 8 virtual CPU devices
changes nothing — XLA inserts collectives, values stay bit-equal.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scalable_collaborative_zksnark_tpu.curves.g1 import bls12_381_g1
from scalable_collaborative_zksnark_tpu.fields.fr import get_field
from scalable_collaborative_zksnark_tpu.mpc.net import PartyNet
from scalable_collaborative_zksnark_tpu.primitives.msm import d_msm
from scalable_collaborative_zksnark_tpu.primitives.sumcheck import c_sumcheck_product
from scalable_collaborative_zksnark_tpu.pss.pss import PackedSharingParams

Fr = get_field("bls12_381_fr")


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8 virtual CPU devices")
    return Mesh(devs[:8], ("party",))


def _assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_c_sumcheck_product_sharded_equal():
    l, M = 1, 32
    pp = PackedSharingParams(Fr, l)
    net = PartyNet(8 * l)
    shares_f = Fr.random((pp.n, M), 21)
    shares_g = Fr.random((pp.n, M), 22)
    ch = Fr.random((M.bit_length() - 1 + max(l.bit_length() - 1, 1),), 23)

    fn = lambda f, g: c_sumcheck_product(pp, net, f, g, ch)
    want = jax.jit(fn)(shares_f, shares_g)

    mesh = _mesh()
    sh = NamedSharding(mesh, P("party", None, None))
    fs = jax.device_put(shares_f, sh)
    gs = jax.device_put(shares_g, sh)
    with mesh:
        got = jax.jit(fn, in_shardings=(sh, sh))(fs, gs)
    _assert_tree_equal(got, want)


def test_d_msm_sharded_equal():
    C = bls12_381_g1()
    l, M = 1, 16
    pp = PackedSharingParams(Fr, l)
    rng = np.random.RandomState(31)
    from scalable_collaborative_zksnark_tpu.curves import host_curve as hc

    ks = [int.from_bytes(rng.bytes(31), "little") % hc.R for _ in range(pp.n * M)]
    pts = C.from_affine_ints([hc.g1_mul(hc.G1_GEN, k) for k in ks])
    bases = jax.tree.map(lambda a: a.reshape(pp.n, 1, M, -1), pts)
    scal = Fr.decode(Fr.random((pp.n, 1, M), 33))

    def fn(b, s):
        net = PartyNet(8 * l)  # fresh counters per call
        return d_msm(C, pp, net, b, s, c=4)

    want = jax.jit(fn)(bases, scal)

    mesh = _mesh()
    shb = jax.tree.map(
        lambda a: NamedSharding(mesh, P("party", *([None] * (a.ndim - 1)))), bases
    )
    shs = NamedSharding(mesh, P("party", None, None, None))
    bs = jax.device_put(bases, shb)
    ss = jax.device_put(scal, shs)
    with mesh:
        got = jax.jit(fn, in_shardings=(shb, shs))(bs, ss)
    _assert_tree_equal(got, want)


def test_dhyperplonk_sharded_equal():
    from scalable_collaborative_zksnark_tpu.hyperplonk import (
        dhyperplonk,
        packed_proving_parameters,
    )
    from scalable_collaborative_zksnark_tpu.hyperplonk.sharding import (
        party_shardings,
        pk_arrays,
        pk_merge,
    )

    n, l = 5, 1
    net = PartyNet(8 * l, mode="sim")
    pk = packed_proving_parameters(n, l, net)
    arrays = pk_arrays(pk)

    def step(arrs):
        return dhyperplonk(n, pk_merge(pk, arrs), net)

    want = jax.jit(step)(arrays)

    mesh = _mesh()
    shardings = party_shardings(mesh, arrays, 8 * l)
    sharded = jax.device_put(arrays, shardings)
    with mesh:
        got = jax.jit(step, in_shardings=(shardings,))(sharded)
    _assert_tree_equal(got, want)


def test_dhyperplonk_sharded_equal_l2_16parties():
    """VERDICT r4 item 7: the l=2 / N=16-parties prover on EIGHT devices
    (2 parties per device) must be bit-equal to the single-device sim
    run — the scale the multichip dryrun only smoke-checks.  Reference
    anchor: dsumcheck.rs:623-685 verifies transcripts at N=16."""
    from scalable_collaborative_zksnark_tpu.hyperplonk import (
        dhyperplonk,
        packed_proving_parameters,
    )
    from scalable_collaborative_zksnark_tpu.hyperplonk.sharding import (
        party_shardings,
        pk_arrays,
        pk_merge,
    )

    n, l = 6, 2
    net = PartyNet(8 * l, mode="sim")
    pk = packed_proving_parameters(n, l, net)
    arrays = pk_arrays(pk)

    def step(arrs):
        return dhyperplonk(n, pk_merge(pk, arrs), net)

    want = jax.jit(step)(arrays)

    mesh = _mesh()
    shardings = party_shardings(mesh, arrays, 8 * l)
    sharded = jax.device_put(arrays, shardings)
    with mesh:
        got = jax.jit(step, in_shardings=(shardings,))(sharded)
    _assert_tree_equal(got, want)


def test_c_acc_product_and_share_sharded_equal():
    """The rotating-root all-to-all transpose (dacc_product.rs:94-203)
    under a party-sharded mesh must be bit-identical to the single-device
    sim run — XLA lowers the src<->dest moveaxis to real all-to-alls."""
    from scalable_collaborative_zksnark_tpu.primitives.acc_product import (
        c_acc_product_and_share,
    )

    l, S = 1, 64
    pp = PackedSharingParams(Fr, l)
    N = pp.n
    shares = Fr.random((N, S), 41)
    masks = Fr.random((N, S), 42)
    u0 = Fr.random((N, S), 43)
    u1 = Fr.random((N, S), 44)
    u2 = Fr.random((N, S), 45)

    def fn(sh, mk, a, b, c):
        net = PartyNet(N)  # fresh counters per trace
        return c_acc_product_and_share(pp, net, sh, mk, a, b, c)

    want = jax.jit(fn)(shares, masks, u0, u1, u2)

    mesh = _mesh()
    sh3 = NamedSharding(mesh, P("party", None, None))
    args = [jax.device_put(a, sh3) for a in (shares, masks, u0, u1, u2)]
    with mesh:
        got = jax.jit(fn, in_shardings=(sh3,) * 5)(*args)
    _assert_tree_equal(got, want)


def test_cpermcheck_sharded_equal():
    """Full baseline collaborative permcheck (dhyperplonk.rs:1249-1385)
    under Mesh(("party",)) — covers c_acc_product_and_share, c_commit,
    c_open and c_sumcheck_product end-to-end on a sharded party axis."""
    from scalable_collaborative_zksnark_tpu.hyperplonk import (
        cpermcheck,
        packed_proving_parameters,
    )
    from scalable_collaborative_zksnark_tpu.hyperplonk.sharding import (
        party_shardings,
        pk_arrays,
        pk_merge,
    )

    n, l = 4, 1
    net = PartyNet(8 * l, mode="sim")
    pk = packed_proving_parameters(n, l, net)
    arrays = pk_arrays(pk)

    def step(arrs):
        return cpermcheck(n, pk_merge(pk, arrs), net)

    want = jax.jit(step)(arrays)

    mesh = _mesh()
    shardings = party_shardings(mesh, arrays, 8 * l)
    sharded = jax.device_put(arrays, shardings)
    with mesh:
        got = jax.jit(step, in_shardings=(shardings,))(sharded)
    _assert_tree_equal(got, want)
