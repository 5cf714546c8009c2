"""Bit-sliced small-integer arithmetic on packed uint32 cell planes.

The packed engines (ops/bitpack.py) already compute the Moore count
*bit-sliced*: an integer per CELL is stored as a list of uint32 bit-planes
(LSB first), so one VPU bitop processes 32 cells' worth of one bit
position.  This module generalises that trick into a small arithmetic
library — column/row tap shifts, ripple/carry-save adders, constant
multiplies, and per-instance max/min extraction over cell positions — so
wrappers whose math is "small integers per cell, then a reduction"
(e.g. MorphoBonus's ±1 pattern correlations, mcl/packed_stats.py) can run
directly on packed words without ever unpacking cells.

Representation: a *Num* is a tuple of uint32 planes ``(p0, p1, ...)``
LSB-first, all shaped like a packed grid ``[..., H, W/32]``; the encoded
per-cell value is ``sum_k 2^k * bit_k``.  All Nums here are non-negative;
subtraction callers add an offset first (see :func:`sub_offset`).

Layout matches ops/bitpack.py: bit j of word ``[..., k]`` is the cell in
column ``32*k + j``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .bitpack import WORD

Plane = jax.Array                    # uint32 [..., H, W/32]
Num = Tuple[jax.Array, ...]          # LSB-first bit-planes


# ---------------------------------------------------------------------------
# tap shifts (zero fill — callers mask to the valid region)
# ---------------------------------------------------------------------------

def shift_col(x: Plane, d: int) -> Plane:
    """y(i, j) = x(i, j + d) for d >= 0, zero-filled past the last column."""
    if d == 0:
        return x
    q, r = divmod(d, WORD)
    zeros = jnp.zeros_like(x[..., :1])

    def word_shift(a: Plane, n: int) -> Plane:  # whole words toward lower j
        if n == 0:
            return a
        pad = jnp.broadcast_to(zeros, a[..., :n].shape)
        return jnp.concatenate([a[..., n:], pad], axis=-1)

    x = word_shift(x, q)
    if r == 0:
        return x
    nxt = word_shift(x, 1)
    return (x >> jnp.uint32(r)) | (nxt << jnp.uint32(WORD - r))


def shift_row(x: Plane, d: int) -> Plane:
    """y(i, j) = x(i + d, j) for d >= 0, zero-filled past the last row."""
    if d == 0:
        return x
    pad = jnp.zeros_like(x[..., :d, :])
    return jnp.concatenate([x[..., d:, :], pad], axis=-2)


# ---------------------------------------------------------------------------
# adders
# ---------------------------------------------------------------------------

def add_plane(num: Sequence[Plane], p: Plane, width: int) -> Num:
    """num + binary plane ``p`` (half-adder carry chain), clipped to width."""
    out = []
    carry = p
    for a in num:
        out.append(a ^ carry)
        carry = a & carry
        if len(out) == width:
            return tuple(out)
    if len(out) < width:
        out.append(carry)
    return tuple(out[:width])


def add(a: Sequence[Plane], b: Sequence[Plane], width: int) -> Num:
    """Ripple-carry addition of two Nums, clipped to ``width`` planes."""
    out = []
    carry = None
    for k in range(width):
        pa = a[k] if k < len(a) else None
        pb = b[k] if k < len(b) else None
        terms = [t for t in (pa, pb, carry) if t is not None]
        if not terms:
            break
        if len(terms) == 1:
            out.append(terms[0])
            carry = None
        elif len(terms) == 2:
            out.append(terms[0] ^ terms[1])
            carry = terms[0] & terms[1]
        else:
            s = terms[0] ^ terms[1]
            out.append(s ^ terms[2])
            carry = (terms[0] & terms[1]) | (s & terms[2])
    if carry is not None and len(out) < width:
        out.append(carry)
    return tuple(out)


def shift_planes(num: Sequence[Plane], k: int) -> Num:
    """Multiply by 2^k: prepend k zero planes."""
    if not num:
        return tuple(num)
    zero = jnp.zeros_like(num[0])
    return (zero,) * k + tuple(num)


def mul_const(num: Sequence[Plane], c: int, width: int) -> Num:
    """Multiply a Num by a non-negative Python int (shift-and-add)."""
    if c == 0 or not num:
        return ()
    acc: Num = ()
    k = 0
    while c:
        if c & 1:
            acc = add(acc, shift_planes(num, k), width)
        c >>= 1
        k += 1
    return acc


def sub_offset(a: Sequence[Plane], b: Sequence[Plane], offset: int,
               width: int) -> Num:
    """``a - b + offset`` as a non-negative Num of ``width`` planes.

    Caller guarantees ``0 <= a - b + offset < 2**width``; computed as
    ``a + offset + (2**width - b)`` mod 2^width (two's complement)."""
    if not a and not b:
        raise ValueError("empty operands")
    ref = (a or b)[0]
    ones = jnp.full_like(ref, jnp.uint32(0xFFFFFFFF))
    zero = jnp.zeros_like(ref)
    # ~b sign-extended to width, then +1 and +offset folded into one constant
    notb = tuple(
        (ones ^ b[k]) if k < len(b) else ones for k in range(width)
    )
    const = (offset + 1) % (1 << width)
    cplanes = tuple(
        ones if (const >> k) & 1 else zero for k in range(width)
    )
    return add(add(tuple(a), notb, width), cplanes, width)


# ---------------------------------------------------------------------------
# windowed tap sums
# ---------------------------------------------------------------------------

def _width_for(n: int) -> int:
    return max(int(n).bit_length(), 1)


def tap_sum(x: Plane, offsets: Sequence[Tuple[int, int]]) -> Num:
    """Per-cell count of set bits of ``x`` at ``(dy, dx)`` tap offsets
    (all non-negative): ``N(i, j) = sum_t x(i+dy_t, j+dx_t)``.

    Taps are grouped by row so each row shift happens once."""
    width = _width_for(len(offsets))
    by_row = {}
    for dy, dx in offsets:
        by_row.setdefault(dy, []).append(dx)
    acc: Num = ()
    for dy in sorted(by_row):
        row = shift_row(x, dy) if dy else x
        for dx in sorted(by_row[dy]):
            acc = add_plane(acc, shift_col(row, dx), width)
    return acc


def window_sum(x: Plane, hh: int, ww: int) -> Num:
    """Per-cell count of set bits in the ``hh x ww`` window anchored at the
    cell: separable (rows of column-sums), ``ceil(log2(hh*ww+1))`` planes."""
    row_w = _width_for(ww)
    row: Num = ()
    for dx in range(ww):
        row = add_plane(row, shift_col(x, dx), row_w)
    width = _width_for(hh * ww)
    acc: Num = tuple(row)
    for dy in range(1, hh):
        shifted = tuple(shift_row(p, dy) for p in row)
        acc = add(acc, shifted, width)
    return acc


# ---------------------------------------------------------------------------
# per-instance max/min over cell positions (MSB-first greedy)
# ---------------------------------------------------------------------------

def _any_bits(x: Plane, batch_dims: int) -> jax.Array:
    axes = tuple(range(batch_dims, x.ndim))
    return jnp.sum(jax.lax.population_count(x), axis=axes) > 0


def max_over_cells(num: Sequence[Plane], valid: Plane,
                   batch_dims: int = 1) -> jax.Array:
    """Maximum encoded value over all VALID cell positions, per batch entry
    (int32 ``[batch...]``).  MSB-first greedy: keep only candidates whose
    current bit is set whenever any such candidate exists.

    ``valid`` must be non-empty per batch entry; planes are
    ``[batch..., H, W/32]`` with ``batch_dims`` leading batch axes."""
    cand = jnp.broadcast_to(valid, num[0].shape)
    val = jnp.zeros(num[0].shape[:batch_dims], jnp.int32)
    bshape = val.shape + (1,) * (num[0].ndim - batch_dims)
    for k in reversed(range(len(num))):
        t = cand & num[k]
        has = _any_bits(t, batch_dims)
        val = val + jnp.where(has, jnp.int32(1 << k), 0)
        cand = jnp.where(has.reshape(bshape), t, cand)
    return val


def min_over_cells(num: Sequence[Plane], valid: Plane,
                   batch_dims: int = 1) -> jax.Array:
    """Minimum encoded value over all VALID cell positions (int32)."""
    cand = jnp.broadcast_to(valid, num[0].shape)
    val = jnp.zeros(num[0].shape[:batch_dims], jnp.int32)
    bshape = val.shape + (1,) * (num[0].ndim - batch_dims)
    for k in reversed(range(len(num))):
        t = cand & ~num[k]
        has_zero = _any_bits(t, batch_dims)
        # no candidate with bit k clear -> every candidate has it set
        val = val + jnp.where(has_zero, 0, jnp.int32(1 << k))
        cand = jnp.where(has_zero.reshape(bshape), t, cand)
    return val
