"""Pallas TPU kernels for limb-vector field arithmetic.

Why kernels instead of the fused jnp forms (fr.py):

* **Compile time.**  An unrolled CIOS multiply is ~2k HLO ops; a curve
  group-law step contains dozens, and protocol graphs contain thousands
  — XLA:TPU compiles grow superlinearly (measured 16 min for one
  1024-point scalar_mul executable).  A ``pallas_call`` is ONE opaque op
  to XLA; Mosaic compiles the kernel body once per shape.
* **Lane efficiency.**  Elements are [..., L] u32 16-bit limb vectors;
  with L = 16/24 in the lane dimension only 16/128 lanes are active.
  In-kernel the tile is transposed to [L, M] — limbs on sublanes,
  batch on lanes — so every VPU lane does useful work.
* **Memory locality.**  The kernel keeps the full accumulator state in
  VMEM/registers; the scan form of the same loop pays an HBM round trip
  per limb step.

Layout contract at the boundary is unchanged: uint32 [..., L],
little-endian 16-bit limbs, Montgomery form.

Reference parity: this layer replaces arkworks' bigint backend
(reference dist-primitive/Cargo.toml:18-24) on the TPU execution path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .config import LIMB_BITS, LIMB_MASK, FieldSpec

MASK = jnp.uint32(LIMB_MASK)

# Lane width of one kernel block (batch elements per grid step).
BLOCK_M = 1024


def _mont_mul_tiles(at, bt, p_col, n0inv, L):
    """CIOS on transposed tiles: at/bt [L, M] -> list of L+1 [M] columns.

    Same column-redundant schedule as fr.Field._mul_unrolled (see the
    overflow analysis there), expressed as ONE lax.scan over the limb
    rows of ``at``: the body is ~12 tile ops, so a fused point kernel
    holds ~16 small loops instead of ~10k unrolled ops — executable
    metadata per pallas instance drops ~12x (a single wire-phase
    executable measured 2.69 GB unrolled, over PJRT's 2 GiB transfer
    cap).  ``p_col``: modulus limbs as a [L, 1] array operand (pallas
    kernels may not close over array constants).
    """
    M = at.shape[1]
    t0 = jnp.zeros((L + 1, M), jnp.uint32)

    # Mosaic supports neither scan-with-xs nor dynamic_slice on values
    # in-kernel, so the i-loop rotates `at` by one row per step (static
    # slices) instead of indexing row i.
    zrow = jnp.zeros((1, M), jnp.uint32)

    def addlo(t, v):  # t[:L] += v  (static slices; scatter unsupported)
        return jnp.concatenate([t[:L] + v, t[L:]], axis=0)

    def addhi(t, v):  # t[1:] += v
        return jnp.concatenate([t[:1], t[1:] + v], axis=0)

    def body(_, state):
        atr, t = state
        ai = atr[0:1, :]  # [1, M]
        prod = ai * bt  # [L, M] exact 32-bit products
        # m from ROW values before any tile-wide add (t0 + lo(a_i*b_0)
        # determines the Montgomery quotient), so the prod and m*p
        # contributions merge into ONE addlo/addhi pair — 2 fewer [L, M]
        # passes per limb row than adding them separately.
        m = (((t[0] + (prod[0] & LIMB_MASK)) & LIMB_MASK) * n0inv) & LIMB_MASK
        mp = m[None, :] * p_col  # [L, M]
        lo = (prod & LIMB_MASK) + (mp & LIMB_MASK)  # < 2^17
        hi = (prod >> LIMB_BITS) + (mp >> LIMB_BITS)
        t = addlo(t, lo)
        t = addhi(t, hi)
        carry = t[0:1] >> LIMB_BITS
        t = jnp.concatenate([t[1:2] + carry, t[2:], zrow], axis=0)
        atr = jnp.concatenate([atr[1:], atr[:1]], axis=0)
        return atr, t

    _, t = jax.lax.fori_loop(0, L, body, (at, t0))
    return [t[j] for j in range(L + 1)]


def _mont_mul_tiles2(at, bt, p_col, n0inv, L):
    """Two limb rows of ``at`` per iteration (L/2 iterations).

    Same arithmetic as :func:`_mont_mul_tiles` (so the result integer is
    identical), but the shift-down, carry fixup and operand rotation are
    paid once per TWO rows, and the two rows' contributions merge into
    three padded adds — ~10.5 tile ops per row vs ~13 for the
    single-row form.  Row i+1's quotient m chains through row-level
    ([1, M]) ops only.  ``t`` carries two overflow rows: columns stay
    < 2^24 (2 x the single-row redundancy bound), and the final value
    is < 2p, so the (L+2)-row total still reduces with one conditional
    subtract.  Requires L even (all shipped fields: 16 / 24 limbs).
    """
    M = at.shape[1]
    t0 = jnp.zeros((L + 2, M), jnp.uint32)
    zrow = jnp.zeros((1, M), jnp.uint32)
    z2 = jnp.zeros((2, M), jnp.uint32)

    def body(_, state):
        atr, t = state
        ai = atr[0:1, :]
        aj = atr[1:2, :]
        prod_i = ai * bt  # [L, M]
        m_i = (((t[0] + (prod_i[0] & LIMB_MASK)) & LIMB_MASK) * n0inv) & LIMB_MASK
        mp_i = m_i[None, :] * p_col
        lo_i = (prod_i & LIMB_MASK) + (mp_i & LIMB_MASK)  # < 2^17
        hi_i = (prod_i >> LIMB_BITS) + (mp_i >> LIMB_BITS)
        # row i+1's quotient needs t'[0] = t[1] + lo_i[1] + hi_i[0] +
        # carry_i (+ lo_{i+1}[0]) — all row-level values
        carry_i = (t[0] + lo_i[0]) >> LIMB_BITS
        prod_j = aj * bt
        tp0 = t[1] + lo_i[1] + hi_i[0] + carry_i + (prod_j[0] & LIMB_MASK)
        m_j = ((tp0 & LIMB_MASK) * n0inv) & LIMB_MASK
        mp_j = m_j[None, :] * p_col
        lo_j = (prod_j & LIMB_MASK) + (mp_j & LIMB_MASK)
        hi_j = (prod_j >> LIMB_BITS) + (mp_j >> LIMB_BITS)
        # contributions in t coordinates: lo_i @ 0.., hi_i + lo_j @ 1..,
        # hi_j @ 2..
        B = hi_i + lo_j  # < 2^18
        t = (
            t
            + jnp.concatenate([lo_i, z2], axis=0)
            + jnp.concatenate([zrow, B, zrow], axis=0)
            + jnp.concatenate([z2, hi_j], axis=0)
        )
        c0 = t[0:1] >> LIMB_BITS  # t[0] low16 == 0 by choice of m_i
        t1 = t[1:2] + c0
        c1 = t1 >> LIMB_BITS  # t[1] low16 == 0 by choice of m_j
        t = jnp.concatenate([t[2:3] + c1, t[3:], z2], axis=0)
        atr = jnp.concatenate([atr[2:], atr[:2]], axis=0)
        return atr, t

    _, t = jax.lax.fori_loop(0, L // 2, body, (at, t0))
    return [t[j] for j in range(L + 2)]


def _carry_rows(t_cols, L):
    """Propagate 16-bit carries over L column rows -> (limbs, carry)."""
    c = jnp.zeros_like(t_cols[0])
    limbs = []
    for j in range(L):
        s = t_cols[j] + c
        limbs.append(s & LIMB_MASK)
        c = s >> LIMB_BITS
    return limbs, c


def _cond_sub_p_rows(limbs, extra, p_np, L):
    """Reduce < 2p to canonical over rows: limbs list of [M]."""
    borrow = jnp.zeros_like(limbs[0])
    diff = []
    for j in range(L):
        d = limbs[j] - p_np[j] - borrow
        borrow = (d >> 31) & 1
        diff.append(d & LIMB_MASK)
    take = jnp.logical_or(extra > 0, borrow == 0)
    return [jnp.where(take, diff[j], limbs[j]) for j in range(L)]


def _mont_mul_rows(at, bt, p_col, n0inv, L):
    """Fully unrolled CIOS over per-row [M] arrays (no tile concats).

    REJECTED LEVER (kept opt-in via SCZK_CIOS_UNROLL=1 so the number can
    be re-checked on future hardware): measured 2.3x SLOWER than the
    loop form on v5e (100x add_reset_lazy [8192]: 164 ms vs 71 ms).
    Per-row [M] arrays occupy one sublane each, so the row arithmetic
    runs at ~1/8 VPU utilization; the [L, M] tile ops of
    :func:`_mont_mul_tiles2` fill all sublanes, which outweighs the
    concat/rotation copies this form eliminates.
    """
    a = [at[i] for i in range(L)]
    b = [bt[i] for i in range(L)]
    p = [p_col[i, 0] for i in range(L)]
    t = [jnp.zeros_like(a[0]) for _ in range(L + 2)]
    for i in range(0, L, 2):
        ai, aj = a[i], a[i + 1]
        prod_i = [ai * b[k] for k in range(L)]
        m_i = (((t[0] + (prod_i[0] & LIMB_MASK)) & LIMB_MASK) * n0inv) & LIMB_MASK
        mp_i = [m_i * p[k] for k in range(L)]
        lo_i = [(prod_i[k] & LIMB_MASK) + (mp_i[k] & LIMB_MASK) for k in range(L)]
        hi_i = [(prod_i[k] >> LIMB_BITS) + (mp_i[k] >> LIMB_BITS) for k in range(L)]
        carry_i = (t[0] + lo_i[0]) >> LIMB_BITS
        prod_j0 = aj * b[0]
        tp0 = t[1] + lo_i[1] + hi_i[0] + carry_i + (prod_j0 & LIMB_MASK)
        m_j = ((tp0 & LIMB_MASK) * n0inv) & LIMB_MASK
        prod_j = [prod_j0] + [aj * b[k] for k in range(1, L)]
        mp_j = [m_j * p[k] for k in range(L)]
        lo_j = [(prod_j[k] & LIMB_MASK) + (mp_j[k] & LIMB_MASK) for k in range(L)]
        hi_j = [(prod_j[k] >> LIMB_BITS) + (mp_j[k] >> LIMB_BITS) for k in range(L)]
        # t += lo_i @ 0.., (hi_i + lo_j) @ 1.., hi_j @ 2..
        nt = [None] * (L + 2)
        nt[0] = t[0] + lo_i[0]
        nt[1] = t[1] + lo_i[1] + hi_i[0] + lo_j[0]
        for k in range(2, L):
            nt[k] = t[k] + lo_i[k] + hi_i[k - 1] + lo_j[k - 1] + hi_j[k - 2]
        nt[L] = t[L] + hi_i[L - 1] + lo_j[L - 1] + hi_j[L - 2]
        nt[L + 1] = t[L + 1] + hi_j[L - 1]
        c0 = nt[0] >> LIMB_BITS
        t1 = nt[1] + c0
        c1 = t1 >> LIMB_BITS
        t = nt[2:] + [jnp.zeros_like(a[0]), jnp.zeros_like(a[0])]
        t[0] = t[0] + c1
    return t


# -- value-level tile helpers (shared with curves/pallas_g1.py) -----------
def mul_t(at, bt, p_np, n0inv, L, p_col=None):
    """[L, M] x [L, M] -> [L, M] Montgomery product (kernel-internal).

    ``p_np``: python-int limbs (for the scalar fixups); ``p_col``: the
    same limbs as a [L, 1] array operand for the scan body."""
    if p_col is None:
        raise ValueError("mul_t needs the p_col operand")
    import os

    if L % 2 == 0 and os.environ.get("SCZK_CIOS_UNROLL", "0") != "0":
        t = _mont_mul_rows(at, bt, p_col, n0inv, L)
        limbs, carry = _carry_rows(t[:L], L)
        carry = carry + t[L] + (t[L + 1] << LIMB_BITS)
    elif L % 2 == 0 and os.environ.get("SCZK_CIOS2", "1") != "0":
        t = _mont_mul_tiles2(at, bt, p_col, n0inv, L)
        limbs, carry = _carry_rows(t[:L], L)
        # overflow rows in 2^(16L) units; total < 2 since result < 2p
        carry = carry + t[L] + (t[L + 1] << LIMB_BITS)
    else:
        t = _mont_mul_tiles(at, bt, p_col, n0inv, L)
        limbs, carry = _carry_rows(t[:L], L)
        carry = carry + t[L]
    return jnp.stack(_cond_sub_p_rows(limbs, carry, p_np, L), axis=0)


def add_t(at, bt, p_np, L):
    cols = at + bt
    limbs, carry = _carry_rows([cols[j] for j in range(L)], L)
    return jnp.stack(_cond_sub_p_rows(limbs, carry, p_np, L), axis=0)


def sub_t(at, bt, p_np, L):
    c = jnp.zeros_like(at[0])
    limbs = []
    for j in range(L):
        s = at[j] + (p_np[j] + LIMB_MASK + 1) - bt[j] + c
        limbs.append(s & LIMB_MASK)
        c = (s >> LIMB_BITS) - 1
    return jnp.stack(_cond_sub_p_rows(limbs, c, p_np, L), axis=0)


def is_zero_t(at):
    """[L, M] -> [M] bool."""
    return jnp.all(at == 0, axis=0)


def _mul_kernel(a_ref, b_ref, p_ref, o_ref, *, p_np, n0inv, L):
    at = a_ref[:]  # [L, M] (transposed outside the kernel; XLA cancels
    bt = b_ref[:]  # back-to-back transposes between chained kernels)
    o_ref[:] = mul_t(at, bt, p_np, int(n0inv), L, p_col=p_ref[:])


def _add_kernel(a_ref, b_ref, p_ref, o_ref, *, p_np, L):
    at = a_ref[:]
    bt = b_ref[:]
    cols = at + bt  # [L, M], each < 2^17
    t = [cols[j] for j in range(L)]
    limbs, carry = _carry_rows(t, L)
    out = _cond_sub_p_rows(limbs, carry, p_np, L)
    o_ref[:] = jnp.stack(out, axis=0)


def _sub_kernel(a_ref, b_ref, p_ref, o_ref, *, p_np, L):
    at = a_ref[:]
    bt = b_ref[:]
    # (a + p) - b with +2^16 column bias, bias-corrected carries
    c = jnp.zeros_like(at[0])
    limbs = []
    for j in range(L):
        s = at[j] + (p_np[j] + LIMB_MASK + 1) - bt[j] + c
        limbs.append(s & LIMB_MASK)
        c = (s >> LIMB_BITS) - 1
    out = _cond_sub_p_rows(limbs, c, p_np, L)
    o_ref[:] = jnp.stack(out, axis=0)


@functools.lru_cache(maxsize=None)
def _bin_call(op: str, spec_name: str, m: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .config import FIELDS

    spec = FIELDS[spec_name]
    L = spec.num_limbs
    p_np = tuple(int(v) for v in spec.p_limbs)
    if op == "mul":
        kern = functools.partial(_mul_kernel, p_np=p_np, n0inv=spec.n0inv, L=L)
    elif op == "add":
        kern = functools.partial(_add_kernel, p_np=p_np, L=L)
    else:
        kern = functools.partial(_sub_kernel, p_np=p_np, L=L)
    grid = max(m // BLOCK_M, 1)
    bm = min(m, BLOCK_M)
    coord = pl.BlockSpec((L, bm), lambda i: (0, i), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((L, m), jnp.uint32),
        grid=(grid,),
        in_specs=[coord, coord, pspec],
        out_specs=coord,
        interpret=_interpret(),
    )


def binary(op: str, spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise field op via one pallas kernel; a, b same shape.

    The [.., L] -> [L, M] relayout happens OUTSIDE the kernel: XLA
    fuses it with neighboring ops and cancels the back-to-back
    transposes between chained field kernels (curve formulas).
    """
    shape = a.shape
    L = shape[-1]
    m = 1
    for d in shape[:-1]:
        m *= d
    mp = max(((m + 127) // 128) * 128, 128) if m < BLOCK_M else m + ((-m) % BLOCK_M)
    flat_a = jnp.moveaxis(a.reshape(m, L), -1, 0)  # [L, m]
    flat_b = jnp.moveaxis(b.reshape(m, L), -1, 0)
    if mp != m:
        z = jnp.zeros((L, mp - m), jnp.uint32)
        flat_a = jnp.concatenate([flat_a, z], axis=1)
        flat_b = jnp.concatenate([flat_b, z], axis=1)
    p_col = jnp.asarray(spec.p_limbs, dtype=jnp.uint32).reshape(L, 1)
    out = _bin_call(op, spec.name, mp)(flat_a, flat_b, p_col)  # [L, mp]
    return jnp.moveaxis(out[:, :m], 0, -1).reshape(shape)


def _interpret() -> bool:
    """Interpreter mode: runs the kernels on CPU for CI coverage."""
    import os

    return bool(os.environ.get("SCZK_PALLAS_INTERPRET"))


def available() -> bool:
    """Pallas TPU kernels need a real TPU backend (or interpret mode)."""
    import os

    if os.environ.get("SCZK_PALLAS_INTERPRET"):
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product via the pallas kernel; shapes must match."""
    return binary("mul", spec, a, b)
