"""End-to-end HyperPlonk proof verification.

The reference ships per-primitive verifier oracles in its tests but no
composed proof verifier — its examples prove and never check
(hyperplonk.rs, examples/*).  A delegation framework needs one: this
module verifies the complete ``local_hyperplonk`` proof bundle —

1. every sumcheck-product transcript is round-consistent and degree-2
   (the dsumcheck.rs:541-588 oracle semantics),
2. each transcript's FINAL value is bound to the PCS-opened evaluations
   of its two constituent polynomials at the transcript's challenge
   point (e.g. the a*b gate transcript must end at a(r)*b(r)),
3. every opening pairing-verifies against its commitment,
4. opened values of PUBLIC polynomials (selectors q1/q2, circuit input)
   equal the verifier's own MLE evaluation.

What is NOT checked, and why: the placeholder-input protocol (both here
and in the reference, hyperplonk.rs:70-72) never commits the witness
polynomial m, so the num/den wire-polynomial RELATIONS
(num = w + alpha*sid + beta, ...) cannot be re-derived by the verifier;
their transcripts and openings are still checked as in 1-3.

Verification runs on the host (Python ints + the native pairing
oracle): proof sizes are logarithmic, so device lanes would be idle.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..curves import host_curve as hc
from ..fields.fr import Field
from ..primitives.mle import fix_variable
from ..primitives.poly_comm import PolynomialCommitment
from ..primitives.sumcheck import check_sumcheck_product
from .local import LocalInputs


def eval_mle_ints(F: Field, evals: jnp.ndarray, point: jnp.ndarray) -> int:
    """Evaluate a multilinear table [2^k, L] at a point [k, L] -> int."""
    k = evals.shape[-2].bit_length() - 1
    v = fix_variable(F, evals, point[:k])
    return int(F.array_to_ints(v)[0])


def transcript_ints(F: Field, msgs: jnp.ndarray) -> List[List[int]]:
    """[k, 3, L] sumcheck messages -> [[t0, t1, t2] ints]."""
    return [[int(x) for x in F.array_to_ints(row)] for row in msgs]


def _eval_deg2(p: int, row, x: int) -> int:
    """Evaluate the degree-2 round polynomial from its (t=0,1,2) values."""
    inv2 = pow(2, -1, p)
    a = (row[2] - 2 * row[1] + row[0]) * inv2 % p
    b = (-row[2] + 4 * row[1] - 3 * row[0]) * inv2 % p
    return (a * x * x + b * x + row[0]) % p


def _check_product_transcript(
    F: Field, msgs, challenge_ints, expect_final: int, failures, tag: str,
    has_final_row: bool = True,
) -> None:
    proof = transcript_ints(F, msgs)
    h = (proof[0][0] + proof[0][1]) % F.p
    if not check_sumcheck_product(F, h, proof, challenge_ints):
        failures.append(f"{tag}: transcript round-consistency")
    # final binding to the OPENED evaluations: local/c_ transcripts end
    # with a (0, f(r)*g(r), 0) row already pinned by the consistency
    # check; d_ transcripts (like the reference's, dsumcheck.rs:433)
    # have no trailing value row, so evaluate the LAST round polynomial
    # at the last challenge instead.
    if has_final_row:
        got = proof[-1][1] % F.p
    else:
        got = _eval_deg2(F.p, proof[-1], challenge_ints[len(proof) - 1])
    if got != expect_final % F.p:
        failures.append(f"{tag}: final value != product of opened evals")


def _vrfy_open(srs, com, opn, point_ints, g2_offset, failures, tag, pairings):
    value = int(srs.curve.fr.array_to_ints(opn[0][None])[0]) \
        if opn[0].ndim == 1 else int(srs.curve.fr.array_to_ints(opn[0])[0])
    if pairings:
        proofs = opn[1]
        if not srs.verify(com, value, proofs, point_ints, g2_offset=g2_offset):
            failures.append(f"{tag}: pairing check")
    return value


def verify_local_hyperplonk(
    n: int,
    srs: PolynomialCommitment,
    proof,
    ins: LocalInputs,
    pairings: bool = True,
) -> Tuple[bool, List[str]]:
    """Verify a ``local_hyperplonk`` proof bundle.

    ``ins`` supplies the VERIFIER's data: the challenge points and the
    public polynomials (selectors q1/q2, circuit input, the eq tables).
    Returns (ok, failure descriptions).  ``pairings=False`` skips the
    (host-slow) pairing checks and keeps the algebraic binding checks.
    """
    F = srs.curve.fr
    (gate_proofs, gate_coms), (wire_proofs, wire_commits, wire_opens) = proof
    failures: List[str] = []

    ch = [int(x) for x in F.array_to_ints(ins.challenge)]
    chp2 = [int(x) for x in F.array_to_ints(ins.challengep2)]

    # -- gate section: openings of a,b,c,input,q1,q2 at `challenge` ----
    names = ("a", "b", "c", "input", "q1", "q2")
    vals = {}
    for name, (com, opn) in zip(names, gate_coms):
        vals[name] = _vrfy_open(
            srs, com, opn, ch, 2, failures, f"open[{name}]", pairings
        )
    # public polynomials: opened value must equal our own evaluation
    for name, tbl in (("input", ins.input), ("q1", ins.q1), ("q2", ins.q2)):
        if vals[name] != eval_mle_ints(F, tbl, ins.challenge):
            failures.append(f"open[{name}]: public value mismatch")
    eqv = eval_mle_ints(F, ins.eq, ins.challenge)

    p = F.p
    gate_expect = [
        eqv * vals["q1"] % p,
        vals["q1"] * (vals["a"] + vals["b"]) % p,
        eqv * vals["q2"] % p,
        vals["a"] * vals["b"] % p,
        vals["q2"] * vals["a"] % p,
        eqv * ((vals["input"] - vals["c"]) % p) % p,
    ]
    for i, (msgs, exp) in enumerate(zip(gate_proofs, gate_expect)):
        _check_product_transcript(F, msgs, ch, exp, failures, f"gate[{i}]")

    # -- wire section: 8 polys at `challengep2` ------------------------
    wnames = ("sid", "ssigma", "h", "num", "den", "vx0", "vx1", "v1x")
    wvals = {}
    for name, com, opn in zip(wnames, wire_commits, wire_opens):
        wvals[name] = _vrfy_open(
            srs, com, opn, chp2, 0, failures, f"open[{name}]", pairings
        )
    for name, tbl in (("sid", ins.sid), ("ssigma", ins.ssigma)):
        if wvals[name] != eval_mle_ints(F, tbl, ins.challengep2):
            failures.append(f"open[{name}]: public value mismatch")
    eqp2v = eval_mle_ints(F, ins.eq_p2, ins.challengep2)

    wire_expect = [
        eqp2v * wvals["v1x"] % p,
        eqp2v * wvals["vx0"] % p,
        wvals["vx0"] * wvals["vx1"] % p,
        eqp2v * wvals["den"] % p,
        wvals["h"] * wvals["den"] % p,
        eqp2v * wvals["num"] % p,
    ]
    for i, (msgs, exp) in enumerate(zip(wire_proofs, wire_expect)):
        _check_product_transcript(F, msgs, chp2, exp, failures, f"wire[{i}]")

    return not failures, failures


# ---------------------------------------------------------------------------
# Collaborative proof assembly + verification
# ---------------------------------------------------------------------------
def _unpack_point(pp, curve, pt_shares):
    """PointJ share batch [N, ...] -> the secret point (l=...[0])."""
    sec = pp.unpack_group(
        curve, jax.tree.map(lambda a: jnp.moveaxis(a, 0, -2), pt_shares)
    )
    return jax.tree.map(lambda a: a[..., 0, :], sec)


def verify_dhyperplonk_gate(
    pp,
    c_srs_plain: PolynomialCommitment,
    d_srs: PolynomialCommitment,
    proof,
    eq: jnp.ndarray,
    challenge: jnp.ndarray,
    pairings: bool = True,
) -> Tuple[bool, List[str]]:
    """Assemble and verify the gate section of a ``dhyperplonk`` proof.

    The verifier's view after the parties hand over their shares
    (``sim`` mode: proof elements carry the party axis): each of the six
    gate transcripts unpacks across parties to the monolithic
    transcript; the c_opened witness values (a, b, c) and d_opened
    index/selector values (I, S1, S2) bind every transcript's final
    value; all six openings pairing-verify.

    ``proof`` = the (gate_proofs, gate_coms) half of dhyperplonk's
    output, run from ``consistent_proving_parameters`` shares with
    honest SRSs (params.py); ``c_srs_plain`` is the UNPACKED
    secret-derived SRS matching the packed c-SRS; ``eq`` the global eq
    table (public).  Transcripts are over ``challenge`` (n variables
    under the (n+2)-variable SRSs -> g2 offset 2).
    """
    F = c_srs_plain.curve.fr
    curve = c_srs_plain.curve
    gate_proofs, gate_coms = proof
    failures: List[str] = []
    p = F.p
    ch = [int(x) for x in F.array_to_ints(challenge)]

    # -- openings: a, b, c via c_open; I, S1, S2 via d_open ------------
    vals = {}
    for name, (com_sh, (val_sh, pis_sh)) in zip("abc", gate_coms[:3]):
        com = _unpack_point(pp, curve, com_sh)
        val = int(F.array_to_ints(pp.unpack(val_sh))[0])
        R = pis_sh.x.shape[1]
        pis = [
            _unpack_point(pp, curve, jax.tree.map(lambda a, _i=i: a[:, _i], pis_sh))
            for i in range(R)
        ]
        if pairings and not c_srs_plain.verify(com, val, pis, ch, g2_offset=2):
            failures.append(f"c_open[{name}]: pairing check")
        vals[name] = val
    for name, (com_sh, (dval, dpis)) in zip(("I", "S1", "S2"), gate_coms[3:6]):
        com = jax.tree.map(lambda a: a[0], com_sh)
        val = int(F.array_to_ints(dval[None])[0])
        if pairings and not d_srs.verify(com, val, dpis, ch, g2_offset=2):
            failures.append(f"d_open[{name}]: pairing check")
        vals[name] = val

    eqv = eval_mle_ints(F, eq, challenge)

    # -- six transcripts, unpacked across parties ----------------------
    expect = [
        eqv * vals["S1"] % p,
        vals["S1"] * (vals["a"] + vals["b"]) % p,
        eqv * vals["S2"] % p,
        vals["a"] * vals["b"] % p,
        vals["S2"] * vals["a"] % p,
        eqv * ((vals["I"] - vals["c"]) % p) % p,
    ]
    for i, (msgs_sh, exp) in enumerate(zip(gate_proofs, expect)):
        secrets = pp.unpack2(jnp.moveaxis(msgs_sh, 0, -2))  # [R, 3, l, L]
        msgs = F.sum(secrets, axis=-2)
        _check_product_transcript(F, msgs, ch, exp, failures, f"gate[{i}]")

    return not failures, failures


def verify_dhyperplonk_wire_a(
    pp,
    d_srs: PolynomialCommitment,
    wire,
    eq_r2: jnp.ndarray,
    challenge_r2: jnp.ndarray,
    pairings: bool = True,
) -> Tuple[bool, List[str]]:
    """Verify the wire-identity part-a section of a ``dhyperplonk`` proof.

    Checks (same preconditions as :func:`verify_dhyperplonk_gate`):
    the two collaborative openings of the witness V (at r1 and r2)
    pairing-verify after unpacking; the distributed openings of s and
    of the 5-poly group (ssigma, sid, h, num, den at r2) pairing-verify;
    and the three direct-zerocheck transcripts bind to the opened
    h/num/den values and the public eq(r2, x) evaluation.  The layered
    zerocheck (wire part b) and the leader tree top (part c) are covered
    by :func:`verify_dhyperplonk_wire_layers` and
    :func:`verify_dhyperplonk_wire_top`; :func:`verify_dhyperplonk_wire`
    composes all three.
    """
    F = d_srs.curve.fr
    proofs, commits, opens = wire
    failures: List[str] = []
    p = F.p
    ch2 = [int(x) for x in F.array_to_ints(challenge_r2)]

    # V (opens[0], opens[1]) is opened but never committed in
    # the protocol (dhyperplonk.rs:296-325 — same placeholder structure
    # as the reference), so there is no commitment to pair its openings
    # against; their cost and comm are still exercised and counted.

    # d_open of s at r2 (opens[2]) pairs against d_commit(s) (commits[0])
    sval, spis = opens[2]
    sv = int(F.array_to_ints(sval[None] if sval.ndim == 1 else sval)[0])
    scom = jax.tree.map(lambda a: a[0], commits[0])
    if pairings and not d_srs.verify(scom, sv, spis, ch2):
        failures.append("d_open[s]: pairing check")

    # the 8-group commit (commits[1..8]) and 5-group open (opens[3..8])
    wnames = ("ssigma", "sid", "h", "num", "den")
    wvals = {}
    for i, name in enumerate(wnames):
        dval, dpis = opens[3 + i]
        val = int(F.array_to_ints(dval[None] if dval.ndim == 1 else dval)[0])
        com = jax.tree.map(lambda a: a[0], commits[1 + i])
        if pairings and not d_srs.verify(com, val, dpis, ch2):
            failures.append(f"d_open[{name}]: pairing check")
        wvals[name] = val

    eqv = eval_mle_ints(F, eq_r2, challenge_r2)
    # direct zerocheck: (den, eq_r2), (h, den), (num, eq_r2).  The
    # transcripts consume the challenge in d_sumcheck round order —
    # local rounds ch[s:] first, leader rounds ch[:s] last (the _dsum_ch
    # alignment, collaborative.py) — so round consistency checks against
    # that order while the final value binds to the openings at ch2.
    s = pp.n.bit_length() - 1
    chd = ch2[s:] + ch2[:s]
    expect = [
        wvals["den"] * eqv % p,
        wvals["h"] * wvals["den"] % p,
        wvals["num"] * eqv % p,
    ]
    for i, exp in enumerate(expect):
        _check_product_transcript(
            F, proofs[1 + i], chd, exp, failures, f"zerocheck[{i}]",
            has_final_row=False,
        )

    return not failures, failures


def verify_dhyperplonk_wire_layers(
    pp,
    wire,
    eq_r2: jnp.ndarray,
    challenge_r2: jnp.ndarray,
) -> Tuple[bool, List[str]]:
    """Verify the LAYERED zerocheck (wire part b, dhyperplonk.rs:415-478).

    Layer i (i = 1 .. n - log2(N)) runs three d_sumcheck_products on the
    halving tree slices — (eq_i, v1x_i), (eq_i, vx0_i), (vx0_i, vx1_i) —
    over challenge_r2[i:], and d_opens the three v-slices at the same
    point.  The tree slices are witness-derived and uncommitted (the
    reference opens them with no commitment either), so the check is
    ALGEBRAIC binding: each transcript must be round-consistent (in the
    _dsum_ch order, collaborative.py) and its final value must equal the
    product of the two constituent evaluations — the v-values taken from
    the layer's own d_opens, the eq value recomputed by the verifier
    from the public eq_r2 table by replaying the prover's slicing.
    """
    F = pp.field
    proofs, _commits, opens = wire
    failures: List[str] = []
    p = F.p
    N = pp.n
    s = N.bit_length() - 1
    layers = (len(proofs) - 7) // 3
    M = eq_r2.shape[-2] // N  # per-party block of the plain slices
    cur_eq = eq_r2.reshape(N, M, F.L)[:, : M // 2]
    for i in range(1, layers + 1):
        ch = challenge_r2[i:]
        ch_ints = [int(x) for x in F.array_to_ints(ch)]
        chd = ch_ints[s:] + ch_ints[:s]
        vals = []
        for b in range(3):  # d_open order: v1x, vx0, vx1
            dval, _dpis = opens[8 + 3 * (i - 1) + b]
            vals.append(
                int(F.array_to_ints(dval[None] if dval.ndim == 1 else dval)[0])
            )
        eqv = eval_mle_ints(F, cur_eq.reshape(-1, F.L), ch)
        expect = [eqv * vals[0] % p, eqv * vals[1] % p, vals[1] * vals[2] % p]
        for b, exp in enumerate(expect):
            _check_product_transcript(
                F, proofs[4 + 3 * (i - 1) + b], chd, exp, failures,
                f"layer[{i}][{b}]", has_final_row=False,
            )
        cur_eq = cur_eq[:, cur_eq.shape[1] // 2 :]
    return not failures, failures


def verify_dhyperplonk_wire_top(
    pp,
    d_srs: PolynomialCommitment,
    wire,
    eq_top: jnp.ndarray,
    challenge_r2: jnp.ndarray,
    pairings: bool = True,
) -> Tuple[bool, List[str]]:
    """Verify the leader tree-top section (wire part c, rs:480-511).

    The leader commits the three N-element tree-top slices (lt3 order:
    vx0, vx1, v1x), opens them at challenge_r2[:log2(N)], and runs three
    monolithic sumcheck_products against the public eq_top table.  All
    three openings pairing-verify against their commitments (an s-var
    poly under the full SRS uses level s = the TRAILING-variable tensor,
    so g2_offset = n_srs - s), and each transcript's final value binds
    to eq_top(ch_top) times the opened slice value.
    """
    F = d_srs.curve.fr
    proofs, commits, opens = wire
    failures: List[str] = []
    p = F.p
    s = pp.n.bit_length() - 1
    ch_top = challenge_r2[:s]
    ch_ints = [int(x) for x in F.array_to_ints(ch_top)]
    nvars = len(d_srs.powers_of_g2) - 1
    vals = {}
    for b, name in enumerate(("vx0", "vx1", "v1x")):
        dval, dpis = opens[-3 + b]
        val = int(F.array_to_ints(dval[None] if dval.ndim == 1 else dval)[0])
        com = commits[-3 + b]
        if pairings and not d_srs.verify(
            com, val, dpis, ch_ints, g2_offset=nvars - s
        ):
            failures.append(f"top open[{name}]: pairing check")
        vals[name] = val
    eqtv = eval_mle_ints(F, eq_top, ch_top)
    expect = [
        eqtv * vals["v1x"] % p,
        eqtv * vals["vx0"] % p,
        vals["vx0"] * vals["vx1"] % p,
    ]
    for b, exp in enumerate(expect):
        _check_product_transcript(
            F, proofs[-3 + b], ch_ints, exp, failures, f"top[{b}]"
        )
    return not failures, failures


def verify_dhyperplonk(
    pp,
    c_srs_plain: PolynomialCommitment,
    d_srs: PolynomialCommitment,
    proof,
    g: dict,
    challenge: jnp.ndarray,
    challenge_r2: jnp.ndarray,
    eq_top: jnp.ndarray,
    pairings: bool = True,
) -> Tuple[bool, List[str]]:
    """Verify a COMPLETE ``dhyperplonk`` proof bundle: the gate section
    (six transcripts + the a/b/c c_opens and I/S1/S2 d_opens, which are
    the protocol's final "Open" step) and the full wire section (parts
    a, b, c).  ``proof`` is dhyperplonk's return value; ``g`` the
    globals dict from ``consistent_proving_parameters`` (the verifier's
    public data: eq tables); ``eq_top`` the protocol's seed-derived
    tree-top eq table."""
    gate, wire = proof
    _, fg = verify_dhyperplonk_gate(
        pp, c_srs_plain, d_srs, gate, g["eq"], challenge, pairings=pairings
    )
    _, fw = verify_dhyperplonk_wire(
        pp, d_srs, wire, g["eq_r2"], eq_top, challenge_r2, pairings=pairings
    )
    fails = fg + fw
    return not fails, fails


def verify_dhyperplonk_wire(
    pp,
    d_srs: PolynomialCommitment,
    wire,
    eq_r2: jnp.ndarray,
    eq_top: jnp.ndarray,
    challenge_r2: jnp.ndarray,
    pairings: bool = True,
) -> Tuple[bool, List[str]]:
    """Verify the COMPLETE wire-identity section: part a (s/V/5-group
    openings + direct zerocheck), part b (layered zerocheck), and part c
    (leader tree top)."""
    _, fa = verify_dhyperplonk_wire_a(
        pp, d_srs, wire, eq_r2, challenge_r2, pairings=pairings
    )
    _, fb = verify_dhyperplonk_wire_layers(pp, wire, eq_r2, challenge_r2)
    _, fc = verify_dhyperplonk_wire_top(
        pp, d_srs, wire, eq_top, challenge_r2, pairings=pairings
    )
    fails = fa + fb + fc
    return not fails, fails
