"""Multilinear-extension helpers (parity: dist-primitive/src/mle.rs)."""

from __future__ import annotations

import jax.numpy as jnp

from ..fields.fr import Field
from ..mpc.net import PartyNet
from ..pss.pss import PackedSharingParams
from .unpack import pss2ss


def fix_variable(F: Field, evals: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Partial evaluation fold (mle.rs:88-105): for each point p_i, table
    := lo + p_i * (hi - lo).  ``points`` is [k, L]; folds min(k, n) times.
    """
    n = evals.shape[-2].bit_length() - 1
    cur = evals
    for i in range(min(n, points.shape[0])):
        half = cur.shape[-2] // 2
        lo, hi = cur[..., :half, :], cur[..., half:, :]
        cur = F.add(lo, F.mul(points[i], F.sub(hi, lo)))
    return cur


def d_fix_variable(
    pp: PackedSharingParams, net: PartyNet, shares: jnp.ndarray, points: jnp.ndarray
) -> jnp.ndarray:
    """Two-phase partial evaluation on shares with a pss2ss boundary
    (mle.rs:51-86).  shares [P, 2^n, L]; returns [P, m, L]."""
    F = pp.field
    n = shares.shape[-2].bit_length() - 1
    k = points.shape[0]
    cur = fix_variable(F, shares, points[: min(n, k)])
    if k <= n:
        return cur
    ss = pss2ss(pp, net, cur[..., 0, :])  # [P, l, L]
    log_l = pp.l.bit_length() - 1
    # NOTE (parity): the reference indexes points[0..] again here
    # (mle.rs:76-84); we continue at points[n:] for the same reason as in
    # sumcheck phase 2 (see sumcheck.py DEVIATION note).
    cur2 = fix_variable(F, ss, points[n : n + min(k - n, log_l)])
    return cur2[..., :1, :]


def pack_vec(pp: PackedSharingParams, secrets: jnp.ndarray) -> jnp.ndarray:
    """[..., M, L] secrets -> [n, ..., M/l, L] per-party share tables.

    Chunk by l then pack each chunk (operator.rs:7-20); party axis first.
    """
    M = secrets.shape[-2]
    assert M % pp.l == 0
    chunks = secrets.reshape(secrets.shape[:-2] + (M // pp.l, pp.l, pp.field.L))
    shares = pp.pack_from_public(chunks)  # [..., M/l, n, L]
    return jnp.moveaxis(shares, -2, 0)  # [n, ..., M/l, L]


def unpack_vec(pp: PackedSharingParams, shares: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_vec: [n, ..., M/l, L] -> [..., M, L]."""
    cols = jnp.moveaxis(shares, 0, -2)  # [..., M/l, n, L]
    secrets = pp.unpack(cols)  # [..., M/l, l, L]
    return secrets.reshape(secrets.shape[:-3] + (-1, pp.field.L))


def unpack2_vec(pp: PackedSharingParams, shares: jnp.ndarray) -> jnp.ndarray:
    cols = jnp.moveaxis(shares, 0, -2)
    secrets = pp.unpack2(cols)
    return secrets.reshape(secrets.shape[:-3] + (-1, pp.field.L))
