"""Collaborative / distributed HyperPlonk provers and permcheck variants.

Parity with /root/reference/hyperplonk/src/dhyperplonk.rs:

* ``dhyperplonk``                (rs:159-571)  — the flagship prover:
  3 c_commit + 3 d_commit; 6 c_sumcheck_product gate identity; wire
  identity with the all-to-all witness exchange, c/d opens, grand
  product via d_acc_product, 8 d_commits + 5 d_opens, direct zerocheck
  (3 d_sumcheck_product), the *layered* zerocheck (n - log N iterations
  of 3 sumchecks + 3 opens on halving slices), the leader tree-top, and
  6 final openings.
* ``dhyperplonk_data_parallel``  (rs:573-960)  — identical minus the
  all-to-all exchange (data-parallel circuits keep s local, rs:601-604).
* ``dpermcheck``                 (rs:962-1247) — the improved permcheck
  (paper §5.1): exactly the wire-identity section.
* ``cpermcheck``                 (rs:1249-1385)— the baseline collabora-
  tive permcheck (paper §4.3): num/den on shares, two full
  c_acc_product_and_share pipelines, ~10 c_commit/c_open, 6 c_sumcheck.

TPU shapes: share vectors are [P, len, L] (party axis first); plain
``_p`` vectors are the 1/N slices [P, len/N, L].  Leader-only work
(tree top) is computed once, not per party — on a sharded mesh it runs
replicated, which is cheaper than a real leader round-trip.

DOCUMENTED DEVIATION (cpermcheck stream lengths): the grand-product
share streams from c_acc_product_and_share have lengths S and
S - N^2/(2l); the reference feeds them to c_commit/c_open whose
power-of-two asserts (dpoly_comm.rs:414,257) such lengths violate.  We
zero-pad every stream to exactly S so shapes are static powers of two;
cost differs by < N^2/(2lS).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ..fields.fr import Field
from ..mpc.net import PartyNet
from ..primitives.acc_product import acc_product, c_acc_product_and_share, d_acc_product
from ..primitives.poly_comm import PolynomialCommitment, c_commit, c_open
from ..primitives.sumcheck import c_sumcheck_product, d_sumcheck_product, sumcheck_product
from ..utils.timer import trace as timed
from .params import PackedProvingParameters


def _pt1(pt):
    """PointJ [..., 1, Lq] -> [..., Lq] (first batch entry)."""
    return jax.tree.map(lambda a: a[..., 0, :], pt)


def _stackp(xs):
    """List of [P, M, L] tables -> [P, B, M, L] (protocol batch axis).

    Same-shape primitive calls are stacked onto one batch axis so one
    collective round (and one device dispatch) serves the whole group —
    the reference's round-compression axis (SURVEY §2.6.8) applied to
    every same-shape group in the prover.
    """
    return jnp.stack(xs, axis=1)


def _unstack(arr, B: int, axis: int = 1):
    return [jnp.take(arr, i, axis=axis) for i in range(B)]


def _unstack_pt(pt, B: int, axis: int = 1):
    return [jax.tree.map(lambda a: jnp.take(a, i, axis=axis), pt) for i in range(B)]


def _exchange_s(F: Field, net: PartyNet, local_s: jnp.ndarray) -> jnp.ndarray:
    """All-to-all broadcast of each party's witness-share block
    (dhyperplonk.rs:270-294): party i sends its local_s to everyone;
    every party ends with s = concat_i local_s_i."""
    B = local_s.shape[-2]
    net.all_to_all_rotating_root("fr", count_per_root=B, vec=True)
    if net.mode == "leader":
        # fake-network path: own block stands in for every received one
        return jnp.tile(local_s, (1, net.n, 1))
    flat = local_s.reshape(1, net.n * B, F.L)
    return jnp.broadcast_to(flat, (net.n, net.n * B, F.L))


def _num_den_h(F: Field, num_base, sid_like, den_base, ssig_like, alpha, beta):
    """num = a + α·sid + β; den = b + α·ssigma + β; h = num/den
    (dhyperplonk.rs:326-339) with Montgomery batch inversion."""
    num = F.add(F.add(num_base, F.mul(alpha, sid_like)), beta)
    den = F.add(F.add(den_base, F.mul(alpha, ssig_like)), beta)
    h = F.mul(num, F.batch_inv(den))
    return num, den, h


def _subtree_views(subtree: jnp.ndarray):
    """v(1,x), v(x,0), v(x,1) stride views (dhyperplonk.rs:344-359)."""
    H = subtree.shape[-2] // 2
    return subtree[..., H:, :], subtree[..., 0::2, :], subtree[..., 1::2, :]


def _wire_part_a(
    n: int,
    pk: PackedProvingParameters,
    net: PartyNet,
    local_s_p: jnp.ndarray,
    s_shares: jnp.ndarray,
    c: int,
):
    """Wire identity 2.b-2.e.1 (dhyperplonk.rs:296-413): s commit/opens,
    num/den/h, accumulation tree, the 8-poly commit group and the direct
    zerocheck.  Returns the lists plus the tree slices for parts b/c."""
    F = pk.pp.field
    pp = pk.pp
    proofs: List = []
    commits: List = []
    opens: List = []

    # 2.b commit s with the distributed PCS
    commits.append(pk.d_commitment.d_commit(net, local_s_p, c=c))
    # 2.c collaborative sumcheck product between s and V at r1
    proofs.append(c_sumcheck_product(pp, net, s_shares, pk.V, pk.challenge_r1))
    # 2.d co-open V at r1/r2; di-open s at r2
    opens.append(c_open(pk.c_commitment, pp, net, pk.V, pk.challenge_r1, c=c))
    opens.append(c_open(pk.c_commitment, pp, net, pk.V, pk.challenge_r2, c=c))
    opens.append(pk.d_commitment.d_open(net, local_s_p, pk.challenge_r2, c=c))

    # 2.e distributed permcheck on s and eq(r1, x)
    with timed("Local: calculate den, num and h_p"):
        num, den, h_p = _num_den_h(
            F, local_s_p, pk.sid_p, pk.eq_r1_p, pk.ssigma_p, pk.alpha, pk.beta
        )
    subtree, leader_tree = d_acc_product(F, net, h_p)
    with timed("Local: get three v"):
        v1x, vx0, vx1 = _subtree_views(subtree)

    # commit + open the wire polynomials — all 8 share one shape, so one
    # batched d_commit / d_open round serves the group
    grp8 = _stackp([pk.ssigma_p, pk.sid_p, h_p, num, den, v1x, vx0, vx1])
    commits.extend(_unstack_pt(pk.d_commitment.d_commit(net, grp8, c=c), 8))
    grp5 = _stackp([pk.ssigma_p, pk.sid_p, h_p, num, den])
    val5, pis5 = pk.d_commitment.d_open(net, grp5, pk.challenge_r2, c=c)
    for b in range(5):
        opens.append((val5[b], [jax.tree.map(lambda a: a[b], pi) for pi in pis5]))

    # 2.e.1 direct zerocheck on p(x) = g*v0x - f (3 same-shape sumchecks)
    z3 = d_sumcheck_product(
        F,
        net,
        _stackp([den, h_p, num]),
        _stackp([pk.eq_r2_p, den, pk.eq_r2_p]),
        _dsum_ch(net, pk.challenge_r2),
    )
    proofs.extend(_unstack(z3, 3, axis=0))
    return proofs, commits, opens, (v1x, vx0, vx1, leader_tree)


def _dsum_ch(net: PartyNet, ch: jnp.ndarray) -> jnp.ndarray:
    """Challenge order for d_sumcheck_product calls.

    DOCUMENTED DEVIATION (same class as sumcheck.py's phase-2 fix): the
    reference's d_sumcheck consumes challenge[0..] in round order
    (dsumcheck.rs:319-353) while d_open binds the party/root variables
    to point[:s] FIRST (dpoly_comm.rs:432-441) — so the transcript and
    the opening of the same polynomial evaluate at block-swapped points
    and can never be checked against each other.  Feeding the local
    rounds ch[s:] and the leader rounds ch[:s] makes both evaluate at
    ``ch`` proper; see verify.verify_dhyperplonk_wire_a.
    """
    s = net.n.bit_length() - 1
    return jnp.concatenate([ch[s:], ch[:s]], axis=0)


def _zerocheck_layer(pk, net, cur_v1x, cur_vx0, cur_vx1, cur_eq, ch, c):
    """One layer of the layered zerocheck (dhyperplonk.rs:415-478):
    3 batched sumchecks + 3 batched opens on the current halving slice."""
    F = pk.pp.field
    zl = d_sumcheck_product(
        F,
        net,
        _stackp([cur_eq, cur_eq, cur_vx0]),
        _stackp([cur_v1x, cur_vx0, cur_vx1]),
        _dsum_ch(net, ch),
    )
    val3, pis3 = pk.d_commitment.d_open(
        net, _stackp([cur_v1x, cur_vx0, cur_vx1]), ch, c=c
    )
    return zl, val3, pis3


def _wire_part_b(
    n: int,
    pk: PackedProvingParameters,
    net: PartyNet,
    v1x: jnp.ndarray,
    vx0: jnp.ndarray,
    vx1: jnp.ndarray,
    c: int,
    sum_fn=None,
    open_fn=None,
):
    """2.e.2 layered zerocheck loop.

    The layers are data-INDEPENDENT (each consumes a slice of the part-a
    trees), so their sumchecks run per layer (``sum_fn`` lets phased
    execution jit one executable per halving shape) while ALL layers'
    3-poly opens merge into one :meth:`d_open_many` round (``open_fn``
    override) — per-layer MSM fixed costs dominated this phase."""
    s_bits = net.n.bit_length() - 1
    proofs: List = []
    opens: List = []
    F = pk.pp.field
    if sum_fn is None:
        sum_fn = lambda v1, v0, vx, eq, ch: d_sumcheck_product(
            F,
            net,
            _stackp([eq, eq, v0]),
            _stackp([v1, v0, vx]),
            _dsum_ch(net, ch),
        )
    if open_fn is None:
        open_fn = lambda items: pk.d_commitment.d_open_many(net, items, c=c)
    half = v1x.shape[-2] // 2
    cur_v1x, cur_vx0, cur_vx1 = v1x[..., :half, :], vx0[..., :half, :], vx1[..., :half, :]
    cur_eq = pk.eq_r2_p[..., : pk.eq_r2_p.shape[-2] // 2, :]
    items = []
    for i in range(1, n - s_bits + 1):
        ch = pk.challenge_r2[i:]
        zl = sum_fn(cur_v1x, cur_vx0, cur_vx1, cur_eq, ch)
        proofs.extend(_unstack(zl, 3, axis=0))
        items.append((_stackp([cur_v1x, cur_vx0, cur_vx1]), ch))
        cur_v1x = cur_v1x[..., cur_v1x.shape[-2] // 2 :, :]
        cur_vx0 = cur_vx0[..., cur_vx0.shape[-2] // 2 :, :]
        cur_vx1 = cur_vx1[..., cur_vx1.shape[-2] // 2 :, :]
        cur_eq = cur_eq[..., cur_eq.shape[-2] // 2 :, :]
    for val3, pis3 in open_fn(items):
        for b in range(3):
            opens.append((val3[b], [jax.tree.map(lambda a: a[b], pi) for pi in pis3]))
    return proofs, opens


def _wire_part_c(pk, net, leader_tree, eq_top, c):
    """Leader finishes the tree top locally (dhyperplonk.rs:480-511)."""
    F = pk.pp.field
    s_bits = net.n.bit_length() - 1
    proofs: List = []
    commits: List = []
    opens: List = []
    with timed("Leader: Compute leader tree"):
        N = net.n
        lt_v1x = leader_tree[N:, :]
        lt_vx0 = leader_tree[0::2, :]
        lt_vx1 = leader_tree[1::2, :]
        ch_top = pk.challenge_r2[:s_bits]
        lt3 = jnp.stack([lt_vx0, lt_vx1, lt_v1x], axis=0)  # [3, N, L]
        commits.extend(_unstack_pt(pk.d_commitment.commit(lt3, c=c), 3, axis=0))
        vals, pis = pk.d_commitment.open(lt3, ch_top, c=c)
        for b in range(3):
            opens.append((vals[b], [jax.tree.map(lambda a: a[b], pi) for pi in pis]))
        top3 = sumcheck_product(
            F,
            jnp.stack([jnp.broadcast_to(eq_top, lt_v1x.shape)] * 2 + [lt_vx0], 0),
            jnp.stack([lt_v1x, lt_vx0, lt_vx1], axis=0),
            ch_top,
        )
        proofs.extend(_unstack(top3, 3, axis=0))
    return proofs, commits, opens


def _wire_identity_distributed(
    n: int,
    pk: PackedProvingParameters,
    net: PartyNet,
    local_s_p: jnp.ndarray,
    s_shares: jnp.ndarray,
    eq_top: jnp.ndarray,
    c: int,
):
    """Steps 2.b-2.e shared by dhyperplonk / _data_parallel / dpermcheck
    (dhyperplonk.rs:296-511)."""
    proofs, commits, opens, (v1x, vx0, vx1, leader_tree) = _wire_part_a(
        n, pk, net, local_s_p, s_shares, c
    )
    pb, ob = _wire_part_b(n, pk, net, v1x, vx0, vx1, c)
    proofs.extend(pb)
    opens.extend(ob)
    pc, cc, oc = _wire_part_c(pk, net, leader_tree, eq_top, c)
    proofs.extend(pc)
    commits.extend(cc)
    opens.extend(oc)
    return proofs, commits, opens


def _gate_identity(pk: PackedProvingParameters, net: PartyNet):
    """Six collaborative gate-identity sumchecks (dhyperplonk.rs:222-260).

    All six share one table shape, so they run as ONE batched
    c_sumcheck_product (identical bytes, 6x fewer rounds/dispatches)."""
    F = pk.pp.field
    pp = pk.pp
    ch = pk.challenge
    with timed("Local: Sum a and b"):
        sum_ab = F.add(pk.a_evals, pk.b_evals)
    with timed("Local: c-I"):
        sum_ci = F.add(F.neg(pk.c_evals), pk.I)
    fs = _stackp([pk.eq, pk.S1, pk.eq, pk.a_evals, pk.S2, pk.eq])
    gs = _stackp([pk.S1, sum_ab, pk.S2, pk.b_evals, pk.a_evals, sum_ci])
    batch = c_sumcheck_product(pp, net, fs, gs, ch)  # [P, 6, R, 3, L]
    return _unstack(batch, 6, axis=1)


def _commit_step(pk: PackedProvingParameters, net: PartyNet, c: int):
    """Step 1: 3 collaborative + 3 distributed commits (rs:197-217),
    grouped into one c_commit batch and one d_commit batch."""
    pp = pk.pp
    cc = c_commit(
        pk.c_commitment, pp, net, [pk.a_evals, pk.b_evals, pk.c_evals], c=c
    )  # [P, 3]
    com_a, com_b, com_c = _unstack_pt(cc, 3, axis=1)
    dc = pk.d_commitment.d_commit(net, _stackp([pk.I_p, pk.S1_p, pk.S2_p]), c=c)
    com_I, com_S1, com_S2 = _unstack_pt(dc, 3, axis=1)
    return com_a, com_b, com_c, com_I, com_S1, com_S2


def _final_opens(pk: PackedProvingParameters, net: PartyNet, coms, c: int):
    """Final 3 c_open + 3 d_open (rs:517-554), one batched round each."""
    pp = pk.pp
    com_a, com_b, com_c, com_I, com_S1, com_S2 = coms
    cval, cpis = c_open(
        pk.c_commitment,
        pp,
        net,
        _stackp([pk.a_evals, pk.b_evals, pk.c_evals]),
        pk.challenge,
        c=c,
    )  # cval [P, 3, L], cpis PointJ [P, 3, R]
    dval, dpis = pk.d_commitment.d_open(
        net, _stackp([pk.I_p, pk.S1_p, pk.S2_p]), pk.challenge, c=c
    )
    out = []
    for b, com in enumerate((com_a, com_b, com_c)):
        out.append(
            (com, (cval[:, b], jax.tree.map(lambda a: a[:, b], cpis)))
        )
    for b, com in enumerate((com_I, com_S1, com_S2)):
        out.append(
            (com, (dval[b], [jax.tree.map(lambda a: a[b], pi) for pi in dpis]))
        )
    return out


def dhyperplonk(n: int, pk: PackedProvingParameters, net: PartyNet,
                seed: int = 2, c: int = 8):
    """The flagship collaborative HyperPlonk prover (dhyperplonk.rs:159-571)."""
    F = pk.pp.field
    gc = 1 << n
    P = net.local_parties
    # "Jump from sky" protocol-internal placeholders (rs:187-190)
    local_s_p = F.random((P, gc * 4 // net.n), seed * 31 + 1)
    local_s = F.random((P, gc * 4 // net.n // pk.pp.l), seed * 31 + 2)
    eq_top = F.random((net.n,), seed * 31 + 3)

    net.sync()
    with timed("Distributed HyperPlonk"):
        with timed("Commit"):
            coms = _commit_step(pk, net, c)
        with timed("Distributed HyperPlonk Prover"):
            with timed("Gate identity"):
                gate_proofs = _gate_identity(pk, net)
            with timed("Wire identity"):
                s_shares = _exchange_s(F, net, local_s)  # 2.a (rs:270-294)
                wire = _wire_identity_distributed(
                    n, pk, net, local_s_p, s_shares, eq_top, c
                )
            with timed("Open"):
                gate_coms = _final_opens(pk, net, coms, c)
    return (gate_proofs, gate_coms), wire


def dhyperplonk_phased(n: int, pk: PackedProvingParameters, net: PartyNet,
                       seed: int = 2, c: int = 8):
    """dhyperplonk with each protocol phase as its OWN jitted executable.

    The single-executable form is preferable on owned hardware, but a
    whole-prover program embeds every Pallas kernel instance's payload
    and can exceed PJRT's 2 GiB executable-serialization cap (observed
    6 GB at n=12) — phase executables stay well under it, and phases
    re-dispatch back-to-back with no host round-trip in between.
    Output and comm accounting are identical to ``dhyperplonk``.
    """
    from .sharding import pk_arrays, pk_merge

    F = pk.pp.field
    gc = 1 << n
    P = net.local_parties
    local_s_p = F.random((P, gc * 4 // net.n), seed * 31 + 1)
    local_s = F.random((P, gc * 4 // net.n // pk.pp.l), seed * 31 + 2)
    eq_top = F.random((net.n,), seed * 31 + 3)
    arrays = pk_arrays(pk)

    # phase jits are cached on pk so repeated proves reuse executables;
    # the wire identity is split a / per-layer / c — a single wire
    # executable exceeded the compile helper's memory at n=12
    fns = getattr(pk, "_phase_jits", None)
    if fns is None:
        fns = {
            "commit": jax.jit(lambda ar: _commit_step(pk_merge(pk, ar), net, c)),
            "gate": jax.jit(lambda ar: _gate_identity(pk_merge(pk, ar), net)),
            "wire_a": jax.jit(
                lambda ar, ls_p, ss: _wire_part_a(
                    n, pk_merge(pk, ar), net, ls_p, ss, c
                )
            ),
            # per-LAYER sumcheck executable (one per halving shape) plus
            # ONE merged-opens executable: a single whole-loop graph
            # with per-layer dense MSMs exceeded the remote compile
            # service's response cap ("response body closed" crash),
            # and per-layer opens paid the MSM fixed costs 10x
            "wire_b_sum": jax.jit(
                lambda v1, v0, vx, eq, ch: d_sumcheck_product(
                    pk.pp.field,
                    net,
                    _stackp([eq, eq, v0]),
                    _stackp([v1, v0, vx]),
                    _dsum_ch(net, ch),
                )
            ),
            "wire_b_open": jax.jit(
                lambda ar, items: pk_merge(pk, ar).d_commitment.d_open_many(
                    net, items, c=c
                )
            ),
            "wire_c": jax.jit(
                lambda ar, lt, et: _wire_part_c(pk_merge(pk, ar), net, lt, et, c)
            ),
            "open": jax.jit(
                lambda ar, coms: _final_opens(pk_merge(pk, ar), net, coms, c)
            ),
        }
        pk._phase_jits = fns

    import os

    if os.environ.get("SCZK_SYNC_PHASES"):
        # profiling mode: force device completion at phase boundaries so
        # the timed() spans report real device time (dispatch is async
        # and block_until_ready is unreliable over the remote tunnel).
        # benchlib.barrier's checksum jit is module-level, so its
        # executables cache across proves (a per-call jit re-compiled
        # the checksum graphs every run and inflated the spans ~5x).
        from ..utils.benchlib import barrier
    else:
        barrier = lambda o: o

    net.sync()
    with timed("Distributed HyperPlonk"):
        with timed("Commit"):
            coms = fns["commit"](arrays)
            barrier(coms)
        with timed("Distributed HyperPlonk Prover"):
            with timed("Gate identity"):
                gate_proofs = fns["gate"](arrays)
                barrier(gate_proofs)
            with timed("Wire identity"):
                s_shares = _exchange_s(F, net, local_s)
                with timed("wire a"):
                    wp, wc, wo, (v1x, vx0, vx1, leader_tree) = fns["wire_a"](
                        arrays, local_s_p, s_shares
                    )
                    barrier(wo)
                with timed("wire layers"):
                    pb, ob = _wire_part_b(
                        n, pk, net, v1x, vx0, vx1, c,
                        sum_fn=lambda v1, v0, vx, eq, ch: fns[
                            "wire_b_sum"
                        ](v1, v0, vx, eq, ch),
                        open_fn=lambda items: fns["wire_b_open"](
                            arrays, tuple(items)
                        ),
                    )
                    barrier(ob)
                wp.extend(pb)
                wo.extend(ob)
                with timed("wire top"):
                    pc, cc, oc = fns["wire_c"](arrays, leader_tree, eq_top)
                    barrier(oc)
                wp.extend(pc)
                wc.extend(cc)
                wo.extend(oc)
                wire = (wp, wc, wo)
            with timed("Open"):
                gate_coms = fns["open"](arrays, coms)
                barrier(gate_coms)
    return (gate_proofs, gate_coms), wire


def dhyperplonk_data_parallel(n: int, pk: PackedProvingParameters, net: PartyNet,
                              seed: int = 2, c: int = 8):
    """Data-parallel-circuit variant (dhyperplonk.rs:573-960): identical
    except s stays local — no all-to-all exchange (rs:601-604)."""
    F = pk.pp.field
    gc = 1 << n
    P = net.local_parties
    local_s_p = F.random((P, gc * 4 // net.n), seed * 37 + 1)
    s_shares = F.random((P, gc * 4 // pk.pp.l), seed * 37 + 2)
    eq_top = F.random((net.n,), seed * 37 + 3)

    net.sync()
    with timed("Distributed HyperPlonk (data-parallel)"):
        with timed("Commit"):
            coms = _commit_step(pk, net, c)
        with timed("Distributed HyperPlonk Prover"):
            with timed("Gate identity"):
                gate_proofs = _gate_identity(pk, net)
            with timed("Wire identity"):
                wire = _wire_identity_distributed(
                    n, pk, net, local_s_p, s_shares, eq_top, c
                )
            with timed("Open"):
                gate_coms = _final_opens(pk, net, coms, c)
    return (gate_proofs, gate_coms), wire


def dpermcheck(n: int, pk: PackedProvingParameters, net: PartyNet,
               seed: int = 3, c: int = 8):
    """Improved permcheck standalone (dhyperplonk.rs:962-1247) — the
    wire-identity section only, including the all-to-all exchange."""
    F = pk.pp.field
    gc = 1 << n
    P = net.local_parties
    local_s = F.random((P, gc * 4 // net.n // pk.pp.l), seed * 41 + 1)
    local_s_p = F.random((P, gc * 4 // net.n), seed * 41 + 2)
    eq_top = F.random((net.n,), seed * 41 + 3)

    net.sync()
    with timed("Distributed Permcheck"):
        s_shares = _exchange_s(F, net, local_s)
        wire = _wire_identity_distributed(n, pk, net, local_s_p, s_shares, eq_top, c)
    return wire


def cpermcheck(n: int, pk: PackedProvingParameters, net: PartyNet, c: int = 8):
    """Baseline collaborative permcheck (dhyperplonk.rs:1249-1385, paper
    §4.3): everything on PSS shares via c_acc_product_and_share."""
    F = pk.pp.field
    pp = pk.pp
    S = pk.V.shape[-2]  # gate_count*4/l shares per party

    net.sync()
    proofs: List = []
    commits: List = []
    opens: List = []
    with timed("Collaborative Permcheck"):
        with timed("Local: calculate num and den"):
            num = F.add(F.add(pk.V, F.mul(pk.alpha, pk.sid)), pk.beta)
            den = F.add(F.add(pk.eq_r1, F.mul(pk.alpha, pk.ssigma)), pk.beta)
        cc2 = c_commit(pk.c_commitment, pp, net, [pk.ssigma, pk.sid], c=c)
        commits.extend(_unstack_pt(cc2, 2, axis=1))
        ov, opi = c_open(
            pk.c_commitment, pp, net, _stackp([pk.ssigma, pk.sid]),
            pk.challenge_r1, c=c,
        )
        for b in range(2):
            opens.append((ov[:, b], jax.tree.map(lambda a: a[:, b], opi)))
        for evals in (num, den):
            vx0, vx1, v1x = c_acc_product_and_share(
                pp, net, evals, pk.mask, pk.unmask0, pk.unmask1, pk.unmask2
            )
            # pad streams to S (power of two) — see module DEVIATION note
            def pad(x):
                k = S - x.shape[-2]
                if k <= 0:
                    return x[..., :S, :]
                return jnp.concatenate(
                    [x, jnp.zeros(x.shape[:-2] + (k, F.L), jnp.uint32)], axis=-2
                )

            vx0, vx1, v1x = pad(vx0), pad(vx1), pad(v1x)
            cc4 = c_commit(pk.c_commitment, pp, net, [evals, vx0, vx1, v1x], c=c)
            commits.extend(_unstack_pt(cc4, 4, axis=1))
            # 4 opens interleaved with the commits + the final evaluation
            # check (rs:1371-1375) — 5 same-shape/same-point opens batched
            ov, opi = c_open(
                pk.c_commitment, pp, net,
                _stackp([evals, vx0, vx1, v1x, evals]),
                pk.challenge_r1, c=c,
            )
            for b in range(5):
                opens.append((ov[:, b], jax.tree.map(lambda a: a[:, b], opi)))
            sc3 = c_sumcheck_product(
                pp, net,
                _stackp([pk.eq_r1, pk.eq_r1, vx0]),
                _stackp([v1x, vx0, vx1]),
                pk.challenge_r1,
            )
            proofs.extend(_unstack(sc3, 3, axis=1))
    return proofs, commits, opens
