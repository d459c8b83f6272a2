"""Multilinear-KZG ("cube") polynomial commitment: local, c_ and d_ ops.

Parity with /root/reference/dist-primitive/src/dpoly_comm.rs:

* SRS ``powers_of_g[k]`` = the 2^k tensor products of (1-s_j, s_j) over
  the *last* k variables (dpoly_comm.rs:37-67: level k+1 prepends factor
  s_{n-k-1} as the MSB dimension); ``powers_of_g2`` = [g2, g2^{s_0}, ...].
* ``commit``  = MSM(powers_of_g[k], evals)          (dpoly_comm.rs:237)
* ``open``    = n rounds of (q_i = hi - lo commit at level n-1-i, fold)
                                                    (dpoly_comm.rs:299)
* ``verify``  = e(C - v g, g2) == sum_i e(pi_i, g2^{s_i} - u_i g2)
                                                    (dpoly_comm.rs:466)
* ``c_commit``= batched d_msm over *packed* SRS share points
                                                    (dpoly_comm.rs:244)
* ``c_open``  = n local share rounds + ONE batched c_commit + pss2ss +
                log2(l) local small MSMs            (dpoly_comm.rs:401)
* ``d_commit``/``d_open`` = party-sliced evals, local MSM/open + leader
                sum / root-open                     (dpoly_comm.rs:276,355)

DOCUMENTED DEVIATION (honest distributed SRS): the reference hands every
party the *same* shared SRS levels (``new_ugly`` reorders variables but
parties still use identical bases, dpoly_comm.rs:69-113), so its
d_commit/d_open outputs are cost-faithful but not verifying.  Here the
SRS's tensor structure gives party p's slice of level k exactly
``w_p * level_{k - log N}`` with ``w_p`` the product of that party's
prefix factors — so we keep shared levels and scale each party's local
result by ``w_p`` (identical arithmetic cost, bit-identical result to
using true per-party slices), add the *root levels* (tensors over the
prefix variables) for the leader rounds, and the resulting d_commit
equals the monolithic commitment and d_open proofs pass pairing
verification (see tests).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import host_curve as hc
from ..curves.g1 import Curve, PointJ
from ..fields.fr import Field
from ..mpc.net import PartyNet
from ..pss.pss import PackedSharingParams
from .msm import msm, msm_ragged
from .unpack import pss2ss


@dataclasses.dataclass
class PolynomialCommitment:
    """Device SRS + host G2 powers for one max size 2^n."""

    curve: Curve
    powers_of_g: List[PointJ]  # level k: PointJ batch [2^k]
    powers_of_g2: List[tuple]  # host G2 affine points (len n+1)
    # distributed extension (None for purely local use).  Honest SRS
    # (srs_from_secret) keys weights/root-levels by the opened poly's
    # total variable count; the random benchmark SRS keeps flat forms
    # (weights all 1, one root-level list — values unverifiable anyway).
    party_weights: Optional[object] = None  # [N] object ints, or {m_total: [N]}
    root_levels: Optional[object] = None  # [PointJ...] or {m_total: [PointJ...]}
    # collaborative extension: packed SRS share points per level —
    # [N, 2^k/l] per-party shares (srs_packed) or flat [2^k/l]
    # party-invariant benchmark points (srs_random)
    packed_powers: Optional[List[PointJ]] = None
    # True once every stored level is batch-normalized to affine (z in
    # {0, 1}); lets each MSM skip its per-call batch inversion
    affine: bool = False

    def normalized(self) -> "PolynomialCommitment":
        """One-time batch normalization of every stored G1 level.

        MSM consumes affine bases (mixed adds); normalizing once at SRS
        build removes the per-commit/open batch inversion that round 1
        re-ran on every call (VERDICT item 1a)."""
        cv = self.curve

        def norm_lv(lvs):
            if lvs is None:
                return None
            if isinstance(lvs, dict):
                return {k: [cv.normalize(p) for p in v] for k, v in lvs.items()}
            return [cv.normalize(p) for p in lvs]

        return dataclasses.replace(
            self,
            powers_of_g=norm_lv(self.powers_of_g),
            root_levels=norm_lv(self.root_levels),
            packed_powers=norm_lv(self.packed_powers),
            affine=True,
        )

    # ------------------------------------------------------------------
    def commit(self, peval: jnp.ndarray, c: int = 8) -> PointJ:
        """evals [..., 2^k, L] (Montgomery) -> commitment point."""
        k = peval.shape[-2].bit_length() - 1
        F = self.curve.fr
        return msm(self.curve, self.powers_of_g[k], F.decode(peval), c=c,
                   affine=self.affine)

    def _fold_q(self, peval: jnp.ndarray, point: jnp.ndarray, start: int):
        """Shared opening fold: returns (q list per round, final value)."""
        F = self.curve.fr
        n = peval.shape[-2].bit_length() - 1
        cur = peval
        qs = []
        for i in range(n):
            half = cur.shape[-2] // 2
            lo, hi = cur[..., :half, :], cur[..., half:, :]
            q = F.sub(hi, lo)
            qs.append(q)
            cur = F.add(lo, F.mul(point[start + i], q))
        return qs, cur[..., 0, :]

    def open(self, peval: jnp.ndarray, point: jnp.ndarray, c: int = 8):
        """-> (value [..., L], proofs: list of n PointJ).

        Round i: q_i = hi - lo (committed at level n-1-i), table folds to
        lo + point_i * (hi - lo).  All n ragged per-level commitments run
        as ONE segmented bucket MSM (msm_ragged).
        """
        F = self.curve.fr
        qs, value = self._fold_q(peval, point, 0)
        bases = [self.powers_of_g[q.shape[-2].bit_length() - 1] for q in qs]
        proofs = msm_ragged(
            self.curve, bases, [F.decode(q) for q in qs], affine=self.affine
        )
        return value, proofs

    def verify(self, commitment: PointJ, value, proofs, point_ints,
               g2_offset: int = 0) -> bool:
        """Pairing check on the host oracle (BLS12-381 only).

        commitment/proofs: single points; value/point_ints: Python ints.
        ``g2_offset``: SRS level k of an n-variable SRS is the tensor over
        the *trailing* variables s_{n-k}..s_{n-1} (dpoly_comm.rs:37-67
        prepends factors), so verifying a sub-level opening must pair
        proof i with g2^{s_{offset+i}}, offset = n - k.  The reference's
        verify has no such parameter because its tests only open
        full-level polynomials (dpoly_comm.rs:533-583).
        """
        g1aff = self.curve.to_affine_ints(
            jax.tree.map(lambda a: a[None], self.powers_of_g[0])
        )[0]
        caff = self.curve.to_affine_ints(jax.tree.map(lambda a: a[None], commitment))[0]
        lhs_pt = hc.g1_add(caff, hc.g1_neg(hc.g1_mul(g1aff, value)))
        g2 = self.powers_of_g2[0]
        pairs = [(lhs_pt, g2)]
        # move RHS to LHS: product of e(pi_i, g2^{s_i} - u_i g2)^{-1}
        for i, pi in enumerate(proofs):
            piaff = self.curve.to_affine_ints(jax.tree.map(lambda a: a[None], pi))[0]
            rhs_g2 = hc.g2_add(
                self.powers_of_g2[g2_offset + i + 1],
                hc.g2_neg(hc.g2_mul(g2, point_ints[i])),
            )
            pairs.append((hc.g1_neg(piaff), rhs_g2))
        return hc.pairing_product_is_one(pairs)

    # ------------------------------------------------------------------
    # Distributed (d_) ops — evals sliced 1/N per party, party axis first
    # ------------------------------------------------------------------
    def _weights_for(self, m_total: int):
        w = self.party_weights
        return w[m_total] if isinstance(w, dict) else w

    def _root_levels_for(self, m_total: int):
        rl = self.root_levels
        return rl[m_total] if isinstance(rl, dict) else rl

    def _scale_by_weights(self, net: PartyNet, pts: PointJ, m_total: int) -> PointJ:
        """Multiply party p's point by w_p (the prefix-tensor factor of
        an m_total-variable polynomial).

        ``pts``: PointJ [P, ...] — weights broadcast over batch dims.
        """
        w = self._weights_for(m_total)
        P = net.local_parties
        if all(int(w[p]) == 1 for p in range(P)):
            return pts  # random benchmark SRS: weights are trivially 1
        extra = pts.x.ndim - 2  # batch dims beyond the party axis
        scal = np.asarray(
            [int(w[p]) for p in range(P)], dtype=object
        ).reshape((P,) + (1,) * extra)
        return self.curve.scalar_mul_int(pts, scal)

    def d_commit(self, net: PartyNet, peval: jnp.ndarray, c: int = 8) -> PointJ:
        """peval [P, ..., M_loc, L] -> the true commitment(s) [P, ...].

        Extra batch dims share the one leader round (round compression).
        """
        F = self.curve.fr
        k = peval.shape[-2].bit_length() - 1
        B = int(np.prod(peval.shape[1:-2], dtype=np.int64))
        local = msm(self.curve, self.powers_of_g[k], F.decode(peval), c=c,
                    affine=self.affine)  # [P, ...]
        local = self._scale_by_weights(net, local, k + net.n.bit_length() - 1)
        g = net.gather_to_root(local, "g1", count=B, vec=B > 1)  # [N, ...]
        total = self.curve.sum(g, axis=0)
        out = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (net.n,) + a.shape), total)
        return net.scatter_from_root(out, "g1", count=B, vec=B > 1)

    def d_open_many(self, net: PartyNet, items, c: int = 8):
        """k distributed opens with TWO fused MSM passes total.

        ``items``: list of (peval [P, B..., 2^m, L], point [n, L]) pairs
        sharing the same leading batch shape.  Byte counting and outputs
        are identical to k separate :meth:`d_open` calls, but all local
        q-vectors go through ONE ragged dense MSM and all root q-vectors
        through a second — the per-call fixed costs (sort, cross-lane
        scan, reduce) dominated the per-layer zerocheck opens."""
        F = self.curve.fr
        s = net.n.bit_length() - 1
        plans = []
        bases_all, qs_all = [], []
        for peval, point in items:
            m = peval.shape[-2].bit_length() - 1
            B = int(np.prod(peval.shape[1:-2], dtype=np.int64))
            qs, local_z = self._fold_q(peval, point, s)
            plans.append((point, m, B, local_z, len(qs)))
            bases_all.extend(
                self.powers_of_g[q.shape[-2].bit_length() - 1] for q in qs
            )
            qs_all.extend(F.decode(q) for q in qs)
        pis_flat = msm_ragged(self.curve, bases_all, qs_all, affine=self.affine)

        from ..mpc.net import VEC_PREFIX

        outs = []
        k = 0
        root_jobs = []
        for point, m, B, local_z, nq in plans:
            pis = pis_flat[k : k + nq]
            k += nq
            local_pis = [self._scale_by_weights(net, pi, m + s) for pi in pis]
            net._count_gather(
                B * (net.payload_bytes("fr", 1) + VEC_PREFIX
                     + net.payload_bytes("g1", m))
            )
            zg = net.gather_data_only(local_z)
            pig = [net.gather_data_only(pi) for pi in local_pis]
            summed = [self.curve.sum(p_, axis=0) for p_ in pig]
            cur = jnp.moveaxis(zg, 0, -2)
            root_qs = []
            for j in range(s):
                half = cur.shape[-2] // 2
                lo, hi = cur[..., :half, :], cur[..., half:, :]
                q = F.sub(hi, lo)
                root_qs.append(q)
                cur = F.add(lo, F.mul(point[j], q))
            rl = self._root_levels_for(m + s)
            root_jobs.append(
                (
                    [rl[q.shape[-2].bit_length() - 1] for q in root_qs],
                    [F.decode(q) for q in root_qs],
                )
            )
            value = cur[..., 0, :]
            net._count_scatter(
                B * (net.payload_bytes("fr", 1) + VEC_PREFIX
                     + net.payload_bytes("g1", s + m))
            )
            outs.append((value, summed))
        rb = [b for bs, _ in root_jobs for b in bs]
        rq = [q for _, qs_ in root_jobs for q in qs_]
        root_flat = msm_ragged(self.curve, rb, rq, affine=self.affine) if rb else []
        k = 0
        final = []
        for (value, summed), (bs, _) in zip(outs, root_jobs):
            root_pis = root_flat[k : k + len(bs)]
            k += len(bs)
            final.append((value, root_pis + summed))
        return final

    def d_open(self, net: PartyNet, peval: jnp.ndarray, point: jnp.ndarray,
               point_ints=None, c: int = 8):
        """peval [P, ..., 2^m, L], point [n, L] -> (value [..., L], proofs).

        Parties fold their local slice with point[s:] (suffix variables),
        pushing per-round local commitments; the leader sums them, then
        opens the root polynomial of the N local values over point[:s]
        with the root levels.  Proof order: root rounds first (pairs with
        g2^{s_0..s_{s-1}}), then local rounds — matching verify's slot
        order (dpoly_comm.rs:466-484).  Extra batch dims (same point)
        share the one leader round.
        """
        F = self.curve.fr
        s = net.n.bit_length() - 1
        m = peval.shape[-2].bit_length() - 1
        B = int(np.prod(peval.shape[1:-2], dtype=np.int64))
        qs, local_z = self._fold_q(peval, point, s)  # local_z [P, ..., L]
        bases = [self.powers_of_g[q.shape[-2].bit_length() - 1] for q in qs]
        pis = msm_ragged(
            self.curve, bases, [F.decode(q) for q in qs], affine=self.affine
        )  # list of [P, ...]
        local_pis = [self._scale_by_weights(net, pi, m + s) for pi in pis]
        # one leader round: each worker pushes (z, Vec<pi>) per slot —
        # count the payload once, move the data without re-counting
        from ..mpc.net import VEC_PREFIX

        net._count_gather(
            B * (net.payload_bytes("fr", 1) + VEC_PREFIX + net.payload_bytes("g1", m))
        )
        zg = net.gather_data_only(local_z)  # [N, ..., L]
        pig = [net.gather_data_only(pi) for pi in local_pis]
        summed = [self.curve.sum(p_, axis=0) for p_ in pig]  # local-round proofs
        # leader opens the root polynomial (values z over the party index)
        cur = jnp.moveaxis(zg, 0, -2)  # [..., N, L]
        root_qs = []
        for j in range(s):
            half = cur.shape[-2] // 2
            lo, hi = cur[..., :half, :], cur[..., half:, :]
            q = F.sub(hi, lo)
            root_qs.append(q)
            cur = F.add(lo, F.mul(point[j], q))
        rl = self._root_levels_for(m + s)
        root_bases = [rl[q.shape[-2].bit_length() - 1] for q in root_qs]
        root_pis = (
            msm_ragged(
                self.curve, root_bases, [F.decode(q) for q in root_qs],
                affine=self.affine,
            )
            if root_qs
            else []
        )
        value = cur[..., 0, :]
        # leader scatters the (real-to-leader, zero-to-worker) answer
        # (dpoly_comm.rs:386-391): count the scatter, return the real one
        net._count_scatter(
            B * (net.payload_bytes("fr", 1) + VEC_PREFIX + net.payload_bytes("g1", s + m))
        )
        return value, root_pis + summed


# ---------------------------------------------------------------------------
# SRS constructors (the reference's PolynomialCommitmentCub zoo)
# ---------------------------------------------------------------------------
def srs_from_secret(curve: Curve, g1_aff, g2_aff, s_ints, n_parties: int = 1):
    """Exact SRS from a (test) secret vector s — host-built, device-stored.

    Mirrors `PolynomialCommitmentCub::new` (dpoly_comm.rs:37-67); with
    n_parties > 1 also builds the honest distributed extension (party
    weights + root levels) described in the module docstring.
    """
    n = len(s_ints)
    r = curve.fr.p
    # host affine levels via iterative tensor doubling
    levels_host = [[g1_aff]]
    for i in range(n):
        f = s_ints[n - i - 1] % r
        prev = levels_host[i]
        nxt = [hc.g1_mul(pt, (1 - f) % r) for pt in prev] + [
            hc.g1_mul(pt, f) for pt in prev
        ]
        levels_host.append(nxt)
    powers_of_g = [curve.from_affine_ints(lv) for lv in levels_host]
    powers_of_g2 = [g2_aff] + [hc.g2_mul(g2_aff, si % r) for si in s_ints]

    party_weights = None
    root_levels = None
    if n_parties > 1:
        sbits = n_parties.bit_length() - 1
        # A d-committed poly with m_total <= n variables uses the SRS's
        # TRAILING m_total secrets (level construction prepends factors),
        # so its party-prefix variables are s_ints[base .. base+sbits]
        # with base = n - m_total.  Weights and root levels are therefore
        # keyed by m_total — round 1 built them for m_total = n only,
        # which made d_commit/d_open of smaller polys unverifiable.
        party_weights = {}
        root_levels = {}
        for m_total in range(sbits, n + 1):
            base = n - m_total
            w_arr = np.empty((n_parties,), dtype=object)
            for p in range(n_parties):
                w = 1
                for i in range(sbits):
                    bit = (p >> (sbits - 1 - i)) & 1
                    f = s_ints[base + i] % r
                    w = w * (f if bit else (1 - f) % r) % r
                w_arr[p] = w
            party_weights[m_total] = w_arr
            # root level j: tensor over s_ints[base+sbits-j .. base+sbits]
            rl_host = [[g1_aff]]
            for i in range(sbits):
                f = s_ints[base + sbits - i - 1] % r
                prev = rl_host[i]
                rl_host.append(
                    [hc.g1_mul(pt, (1 - f) % r) for pt in prev]
                    + [hc.g1_mul(pt, f) for pt in prev]
                )
            root_levels[m_total] = [
                curve.from_affine_ints(lv) for lv in rl_host[:sbits]
            ]
    # host-built levels arrive as affine ints (z in {0, 1}) already
    return PolynomialCommitment(
        curve, powers_of_g, powers_of_g2, party_weights, root_levels,
        affine=True,
    )


def srs_ugly(curve: Curve, g1_aff, g2_aff, s_ints, party_count: int):
    """Exact `new_ugly` variant (dpoly_comm.rs:69-113): the first
    log2(party_count) levels tensor over s[log_party-1], ..., s[0] (the
    FIRST secrets, consumed in reverse), then the chain continues with
    the standard factors s[n-i-1] for i >= log_party.

    The result reuses s[0..log_party] at the bottom levels and never
    consumes the top log_party secrets — so, like the reference's, it is
    **value-inconsistent by construction** (a d_open against these
    levels cannot pairing-verify; it exists purely to be size- and
    cost-faithful for distributed benchmarks).  The honest alternative
    is ``srs_from_secret(..., n_parties=party_count)``, whose per-party
    weights + root levels make d_commit/d_open actually verify; its
    prover work profile is identical (see srs_random's cost-parity
    note).
    """
    n = len(s_ints)
    r = curve.fr.p
    log_party = party_count.bit_length() - 1
    assert party_count == 1 << log_party
    levels_host = [[g1_aff]]
    for i in range(n):
        f = (
            s_ints[log_party - i - 1] if i < log_party else s_ints[n - i - 1]
        ) % r
        prev = levels_host[i]
        levels_host.append(
            [hc.g1_mul(pt, (1 - f) % r) for pt in prev]
            + [hc.g1_mul(pt, f) for pt in prev]
        )
    powers_of_g = [curve.from_affine_ints(lv) for lv in levels_host]
    powers_of_g2 = [g2_aff] + [hc.g2_mul(g2_aff, si % r) for si in s_ints]
    return PolynomialCommitment(
        curve, powers_of_g, powers_of_g2, affine=True
    )


def srs_packed(srs: PolynomialCommitment, pp: PackedSharingParams) -> PolynomialCommitment:
    """Pack the SRS points into PSS shares per party (`to_packed`,
    dpoly_comm.rs:164-194).  Levels shorter than l are zero-padded before
    packing, exactly like the reference (dpoly_comm.rs:179-183).
    Returns a PolynomialCommitment whose ``packed_powers[k]`` is
    PointJ [N, max(2^k / l, 1)]."""
    curve = srs.curve
    packed = []
    for lv in srs.powers_of_g:
        sz = lv.x.shape[0]
        if sz < pp.l:
            pad = curve.infinity((pp.l - sz,))
            lvp = jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0), lv, pad)
            chunks = jax.tree.map(lambda a: a.reshape(1, pp.l, -1), lvp)
        else:
            chunks = jax.tree.map(lambda a: a.reshape(sz // pp.l, pp.l, -1), lv)
        shares = pp.pack_from_public_group(curve, chunks)  # [chunks, n]
        lvl = jax.tree.map(lambda a: jnp.moveaxis(a, -2, 0), shares)  # [n, chunks]
        # packed shares come out projective; keep the SRS affine-invariant
        packed.append(curve.normalize(lvl) if srs.affine else lvl)
    return dataclasses.replace(srs, packed_powers=packed)


def srs_random(curve: Curve, n: int, seed: int, n_parties: int = 1,
               packed_parties: int = 0, max_level: int | None = None) -> PolynomialCommitment:
    """Benchmark SRS with random points (`new_toy`/`new_single`/`new_random`,
    dpoly_comm.rs:115-233): structure-free but size- and cost-faithful.

    Cost parity with `new_ugly` (dpoly_comm.rs:69-113): new_ugly bakes
    the party-bit factors into the level tensors (its only effect on the
    PROVER is that d_commit/d_open need no per-party weighting at run
    time) — here ``party_weights`` are all 1, so ``_scale_by_weights``
    is skipped at trace time and the benchmark's d_ ops execute the
    identical work profile.  The honest-weights SRS (srs_from_secret)
    carries real weights instead, which additionally makes d_open
    pairing-verify; new_ugly's exact variable-reorder is value-
    inconsistent by construction (it reuses s[0..log_p] and skips the
    top secrets) and exists only to be size-faithful.

    Points are generated on device as G * k_i for seeded random k_i.
    With packed_parties > 0 also fills ``packed_powers`` with random
    share points sized 2^k / l per party (`new_single` semantics).
    ``max_level`` caps the unpacked G1 levels, like ``new_random``'s
    ``len_log_2 - log2(party_count)`` truncation (dpoly_comm.rs:222).
    """
    F = curve.fr
    g = curve.from_affine_ints([hc.G1_GEN if curve.name == "bls12_381_g1" else hc.G1_GEN])

    def rand_points_flat(count, sd):
        """Structure-free valid G1 points via an outer sum A_i + B_j.

        Two small scalar_mul scans (O(sqrt(count)) lanes, 32-bit scalars)
        plus ONE batched point-add pass over all `count` lanes — ~30x
        fewer point-op passes than per-point double-and-add, which is all
        the reference's `new_toy/new_random` SRS constructors promise
        (dpoly_comm.rs:115-233).
        """
        if count == 0:
            return curve.infinity((0,))
        rng = np.random.RandomState(sd & 0x7FFFFFFF)
        side = min(max(int(np.ceil(np.sqrt(count))), 1), 4096)
        rows = (count + side - 1) // side
        ka = jnp.asarray(rng.randint(1, 1 << 16, size=(side, 2)).astype(np.uint32))
        kb = jnp.asarray(rng.randint(1, 1 << 16, size=(rows, 2)).astype(np.uint32))
        base_a = jax.tree.map(lambda a: jnp.broadcast_to(a, (side,) + a.shape[1:]), g)
        base_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (rows,) + a.shape[1:]), g)
        A = curve.scalar_mul(base_a, ka)  # [side]
        B = curve.scalar_mul(base_b, kb)  # [rows]
        grid = curve.add(
            jax.tree.map(lambda a: a[None, :, :], A),
            jax.tree.map(lambda a: a[:, None, :], B),
        )  # [rows, side]
        flat = jax.tree.map(lambda a: a.reshape(rows * side, -1)[:count], grid)
        # normalize HERE — one batch inversion over the flat points; the
        # old path normalized after the per-party broadcast, paying the
        # inversion n_parties times over identical rows (61 s of the 77 s
        # flagship setup at n=16, l=8)
        return curve.normalize(flat)

    def rand_levels(sizes, sd):
        """Random points for all levels from one flat generation, sliced."""
        total = sum(sizes)
        flat = rand_points_flat(total, sd)
        out, off = [], 0
        for s in sizes:
            out.append(jax.tree.map(lambda a: a[off : off + s], flat))
            off += s
        return out

    top = n if max_level is None else min(max_level, n)
    powers = rand_levels([1 << k for k in range(top + 1)], seed)
    g2s = [hc.G2_GEN] + [hc.g2_mul(hc.G2_GEN, seed * 7919 + i + 1) for i in range(n)]
    # rand_points_flat returns batch-normalized points, so every stored
    # level is affine already — no trailing .normalized() pass needed
    out = PolynomialCommitment(curve, powers, g2s, affine=True)
    if n_parties > 1:
        sbits = n_parties.bit_length() - 1
        out.party_weights = np.asarray([1] * n_parties, dtype=object)
        out.root_levels = rand_levels([1 << j for j in range(sbits)], seed + 101)
    if packed_parties:
        l = packed_parties // 8
        # stored FLAT (no party axis): the random benchmark levels are
        # party-invariant, and the MSM layers broadcast bases over batch
        # dims at trace time — materializing the [N, ...] broadcast here
        # cost N× device memory and N× the normalize work
        out.packed_powers = rand_levels(
            [max((1 << k) // l, 1) for k in range(n + 1)], seed + 211
        )
    return out


# ---------------------------------------------------------------------------
# Collaborative (c_) ops on PSS shares
# ---------------------------------------------------------------------------
def _d_msm_ragged(curve, pp, net, bases_list, scalars_list, c=8, affine=False,
                  round_batches=None):
    """d_msm for a ragged batch: ONE segmented bucket MSM for every
    entry, with the rank-1 leader reduce (dmsm.rs:29-40) folded into the
    MSM scalars by group linearity (see d_msm docstring — the explicit
    q ⊗ (w·x) ladder cost ~100 ms of sequential group-op depth per
    call).  ``round_batches``: per-logical-round entry counts for the
    byte/round accounting (default: everything in one round); the fused
    multi-open primitives pass one round per protocol-level call so
    totals stay identical to unfused execution.
    """
    from .msm import _dmsm_prescale, _dmsm_scale_consts

    F = curve.fr
    scaled = [_dmsm_prescale(pp, net, s) for s in scalars_list]
    locs = msm_ragged(curve, bases_list, scaled, affine=affine)  # [P, ...] each
    local = jax.tree.map(lambda *xs: jnp.stack(xs, axis=-2), *locs)  # [P, ..., B]
    B = len(locs) * int(np.prod(locs[0].x.shape[1:-1], dtype=np.int64))
    if round_batches is None:
        round_batches = [B]
    assert sum(round_batches) == B, (round_batches, B)
    for rb in round_batches:
        net._count_gather(net.payload_bytes("g1", rb, vec=True))
    if net.mode == "leader":
        for rb in round_batches:
            net._count_scatter(net.payload_bytes("g1", rb, vec=True))
        return local
    gathered = net.gather_data_only(local)
    t = curve.sum(gathered, axis=0)  # [..., B] = w·x
    _, _, q_std = _dmsm_scale_consts(pp)
    tb = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (net.n,) + a.shape), t
    )
    qb = jnp.asarray(q_std).reshape((net.n,) + (1,) * (tb.x.ndim - 2) + (F.L,))
    out = curve.scalar_mul(tb, qb)  # [N, ..., B]
    for rb in round_batches:
        net._count_scatter(net.payload_bytes("g1", rb, vec=True))
    return net.scatter_data_only(out)


def _tiny_msm_rounds(curve, bases_list, scals_list):
    """The log2(l) phase-2 proof MSMs of a c_open in ONE ladder launch.

    Each round's MSM is tiny (l/2^(i+1) points) and independent of the
    fold chain (the proofs never feed the next fold), but a per-round
    ``msm`` call pays the full 255-bit double-and-add ladder DEPTH
    (~100 ms on TPU regardless of lane count, docs/PERF.md) — the
    dominant cost of c_open at protocol sizes.  Concatenating every
    round's (base, q) pairs into one scalar_mul pays the depth once;
    per-round sums are a few tiny tree-add launches.

    ``scals_list[i]``: [..., S_i, L] standard-form; ``bases_list[i]``
    broadcastable to the same batch.  Returns a list of PointJ [...]."""
    sizes = [s.shape[-2] for s in scals_list]
    qcat = jnp.concatenate(scals_list, axis=-2)  # [..., S, L]
    bcat = jax.tree.map(
        lambda *xs: jnp.concatenate(xs, axis=-2), *bases_list
    )
    # batch dims align as PREFIXES (same convention as msm()): a [N, S]
    # per-party base level broadcasts over the scalars' trailing dims
    pb = bcat.x.shape[:-2]
    sb = qcat.shape[:-2]
    if len(sb) > len(pb):
        bcat = jax.tree.map(
            lambda a: a.reshape(pb + (1,) * (len(sb) - len(pb)) + a.shape[-2:]),
            bcat,
        )
    prods = curve.scalar_mul(bcat, qcat)  # [..., S]
    outs = []
    off = 0
    for sz in sizes:
        seg = jax.tree.map(lambda a: a[..., off : off + sz, :], prods)
        outs.append(curve.sum(seg, axis=-1))
        off += sz
    return outs


def c_commit(srs: PolynomialCommitment, pp: PackedSharingParams, net: PartyNet,
             pevals: list, c: int = 8) -> PointJ:
    """Batched collaborative commit (dpoly_comm.rs:244-267).

    ``pevals``: list of share tables [P, M_k, L]; entry k uses packed SRS
    level log2(M_k * l).  Returns PointJ [P, B] — shares of commitments.
    """
    curve = srs.curve
    F = curve.fr
    bases, scals = [], []
    for pe in pevals:
        level = (pe.shape[-2] * pp.l).bit_length() - 1
        b = srs.packed_powers[level]
        # per-party levels (srs_packed, [N, M, L]) slice to the one
        # materialized party in leader mode; flat party-invariant levels
        # (srs_random, [M, L]) broadcast over the batch dims downstream
        if b.x.ndim == 3 and net.mode == "leader":
            b = jax.tree.map(lambda a: a[:1], b)
        bases.append(b)
        scals.append(F.decode(pe))
    return _d_msm_ragged(curve, pp, net, bases, scals, c=c, affine=srs.affine)


def c_open(srs: PolynomialCommitment, pp: PackedSharingParams, net: PartyNet,
           peval: jnp.ndarray, point: jnp.ndarray, c: int = 8):
    """Collaborative open (dpoly_comm.rs:401-464).

    n_loc local share rounds collecting q_i vectors; ONE batched c_commit
    round for all of them; pss2ss; log2(l) rounds of small local MSMs
    over the packed base (the reference's stated simplification,
    dpoly_comm.rs:454-456).  Returns (value share [P, L], proofs
    PointJ [P, n_loc + log2(l)]).
    """
    curve = srs.curve
    F = curve.fr
    n_loc = peval.shape[-2].bit_length() - 1
    cur = peval
    qs = []
    for i in range(n_loc):
        half = cur.shape[-2] // 2
        lo, hi = cur[..., :half, :], cur[..., half:, :]
        q = F.sub(hi, lo)
        qs.append(q)
        cur = F.add(lo, F.mul(point[i], q))
    com_shares = c_commit(srs, pp, net, qs, c=c)  # [P, n_loc]
    ss = pss2ss(pp, net, cur[..., 0, :])  # [P, l, L]
    log_l = pp.l.bit_length() - 1
    cur2 = ss
    q2, b2 = [], []
    for i in range(log_l):
        half = cur2.shape[-2] // 2
        lo, hi = cur2[..., :half, :], cur2[..., half:, :]
        q = F.sub(hi, lo)
        level = (q.shape[-2] * pp.l).bit_length() - 1
        b = srs.packed_powers[level]
        if b.x.ndim == 3 and net.mode == "leader":
            b = jax.tree.map(lambda a: a[:1], b)
        q2.append(F.decode(q))
        b2.append(b)
        # NOTE: continuation challenges point[n_loc + i] (see sumcheck.py
        # DEVIATION note; reference reuses point[i], dpoly_comm.rs:442-459)
        cur2 = F.add(lo, F.mul(point[n_loc + i], q))
    extra = _tiny_msm_rounds(curve, b2, q2) if q2 else []  # each [P]
    if extra:
        extra_stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=-2), *extra)
        proofs = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=-2), com_shares, extra_stacked
        )
    else:
        proofs = com_shares
    return cur2[..., 0, :], proofs


def c_open_many(srs: PolynomialCommitment, pp: PackedSharingParams,
                net: PartyNet, items, c: int = 8):
    """k collaborative opens of same-size tables with ONE fused compute
    path: every item's q-vector commitments go through one segmented
    MSM + leader round, all pss2ss transitions move in one batch, and
    the log2(l) tail rounds fold all items together.  Byte and round
    accounting is identical to k separate :meth:`c_open` calls (each
    item counts its own c_commit round and pss2ss) — the same
    count-per-item / move-once pattern as d_open_many.

    ``items``: list of (peval [P, M, L], point [n, L]); no extra batch
    dims (use one c_open with a stacked batch axis for same-point
    groups).  Returns a list of (value [P, L], proofs [P, R]) pairs.
    """
    curve = srs.curve
    F = curve.fr
    bases_all, scals_all = [], []
    plans = []
    for peval, point in items:
        assert peval.ndim == 3, "c_open_many: no extra batch dims"
        n_loc = peval.shape[-2].bit_length() - 1
        cur = peval
        qs = []
        for i in range(n_loc):
            half = cur.shape[-2] // 2
            lo, hi = cur[..., :half, :], cur[..., half:, :]
            q = F.sub(hi, lo)
            qs.append(q)
            cur = F.add(lo, F.mul(point[i], q))
        for q in qs:
            level = (q.shape[-2] * pp.l).bit_length() - 1
            b = srs.packed_powers[level]
            if b.x.ndim == 3 and net.mode == "leader":
                b = jax.tree.map(lambda a: a[:1], b)
            bases_all.append(b)
            scals_all.append(F.decode(q))
        plans.append((point, n_loc, cur[..., 0, :]))
    com_flat = _d_msm_ragged(
        curve, pp, net, bases_all, scals_all, c=c, affine=srs.affine,
        round_batches=[n_loc for _, n_loc, _ in plans],
    )  # [P, sum n_loc]

    # batched pss2ss (data once, counted per item)
    for _ in plans:
        net._count_gather(net.payload_bytes("fr", 1))
    finals = jnp.stack([z for _, _, z in plans], axis=-2)  # [P, k, L]
    ss = pss2ss(pp, net, finals, count=False)  # [P, k, l, L]
    for _ in plans:
        net._count_scatter(net.payload_bytes("fr", pp.l, vec=True))

    # phase-2 folds: per-item continuation challenges, shared rounds;
    # the per-round proof MSMs batch into ONE ladder (_tiny_msm_rounds)
    log_l = pp.l.bit_length() - 1
    cur2 = ss
    q2, b2 = [], []
    for i in range(log_l):
        half = cur2.shape[-2] // 2
        lo, hi = cur2[..., :half, :], cur2[..., half:, :]
        q = F.sub(hi, lo)
        level = (q.shape[-2] * pp.l).bit_length() - 1
        b = srs.packed_powers[level]
        if b.x.ndim == 3 and net.mode == "leader":
            b = jax.tree.map(lambda a: a[:1], b)
        q2.append(F.decode(q))
        b2.append(b)
        ch = jnp.stack(
            [point[n_loc + i] for point, n_loc, _ in plans], axis=0
        )  # [k, L]
        cur2 = F.add(lo, F.mul(ch[None, :, None, :], q))
    extra = _tiny_msm_rounds(curve, b2, q2) if q2 else []  # each [P, k]
    outs = []
    off = 0
    for idx, (point, n_loc, _) in enumerate(plans):
        coms = jax.tree.map(lambda a: a[..., off : off + n_loc, :], com_flat)
        off += n_loc
        if extra:
            ex = jax.tree.map(
                lambda *xs: jnp.stack([x[..., idx, :] for x in xs], axis=-2),
                *extra,
            )
            proofs = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], axis=-2), coms, ex
            )
        else:
            proofs = coms
        outs.append((cur2[..., idx, 0, :], proofs))
    return outs