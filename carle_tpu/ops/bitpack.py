"""Bit-packed CA engine — 32 cells per uint32 word.

The uint8 paths (ops/ca.py, ops/pallas_ca.py) spend one VPU lane per cell.
Packing 32 cells into each uint32 word turns the update into word-wide
bitwise logic: a carry-save adder tree produces the Moore-neighbour count
*bit-sliced* (four bit-planes n0..n3), and the B/S rule is applied with a
5-level binary multiplexer tree over (n0..n3, alive) whose leaves are the 18
bits of the rule mask — so rules remain DATA (no recompilation on rule
change) while every op processes 32 cells.

Cost per word: ~30 bitops for the counts + ~80 for the mux tree ≈ 3.5 ops
per cell, vs ~12 int32 ops per cell for the uint8 path — plus 8x less HBM
traffic.  Parity with ops/ca.py is bit-exact (tests/test_bitpack.py).

Layout: bit j of word [..., k] is the cell in column 32k + j.  The
horizontal torus neighbours come from cross-word carries with a circular
roll over the word axis; the vertical torus from a roll over rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

WORD = 32


def pack_grid(grid: jax.Array) -> jax.Array:
    """uint8/bool [..., H, W] -> uint32 [..., H, W//32] (W % 32 == 0)."""
    *lead, h, w = grid.shape
    assert w % WORD == 0, f"width {w} not a multiple of {WORD}"
    bits = grid.astype(jnp.uint32).reshape(*lead, h, w // WORD, WORD)
    weights = (jnp.uint32(1) << jnp.arange(WORD, dtype=jnp.uint32))
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)


def unpack_grid(packed: jax.Array, width: int) -> jax.Array:
    """uint32 [..., H, W//32] -> uint8 [..., H, W]."""
    shifts = jnp.arange(WORD, dtype=jnp.uint32)
    bits = (packed[..., None] >> shifts) & jnp.uint32(1)
    *lead, h, words, _ = bits.shape
    return bits.reshape(*lead, h, words * WORD).astype(jnp.uint8)[..., :width]


def pack_grid_cm(grid: jax.Array) -> jax.Array:
    """uint8/bool [..., H, W] -> uint32 [..., H//32, W]: bits along H
    (column-major packing, H % 32 == 0).

    Used by the "cm" Pallas kernels (ops/pallas_bitpack.py): with rows in
    the word axis the VERTICAL neighbours become in-word bit shifts (6 ALU
    ops + 2 sublane-roll carries) and the horizontal spread becomes pure
    lane slice+concat shifts with ZERO cross-word carry ops — removing the
    row-major layout's dominant remaining cost (the 12 carry bitops
    measured at ~12% of a generation by scripts/kernel_budget.py)."""
    *lead, h, w = grid.shape
    assert h % WORD == 0, f"height {h} not a multiple of {WORD}"
    bits = grid.astype(jnp.uint32).reshape(*lead, h // WORD, WORD, w)
    weights = (jnp.uint32(1) << jnp.arange(WORD, dtype=jnp.uint32))
    return jnp.sum(bits * weights[:, None], axis=-2, dtype=jnp.uint32)


def unpack_grid_cm(packed: jax.Array, height: int) -> jax.Array:
    """uint32 [..., H//32, W] -> uint8 [..., H, W]."""
    shifts = jnp.arange(WORD, dtype=jnp.uint32)
    bits = (packed[..., None, :] >> shifts[:, None]) & jnp.uint32(1)
    *lead, words, _, w = bits.shape
    return bits.reshape(*lead, words * WORD, w).astype(jnp.uint8)[
        ..., :height, :
    ]


def _csa(a, b, c):
    """Carry-save adder: three weight-k bit-planes -> (sum@k, carry@2k)."""
    ab = a ^ b
    return ab ^ c, (a & b) | (ab & c)


def _horizontal_planes(g: jax.Array):
    """Weight-1/weight-2 bit-planes of the left+right neighbour pair, with
    cross-word carries (torus over the word axis)."""
    left = (g << 1) | (jnp.roll(g, 1, axis=-1) >> 31)
    right = (g >> 1) | (jnp.roll(g, -1, axis=-1) << 31)
    return left ^ right, left & right


def _count_planes(a_t, b_t, m_t, a, b, a_b, b_b, m_b):
    """Carry-save adder tree for the Moore count given the three rows'
    horizontal pair-planes (a=weight1, b=weight2) and the vertical cells
    m_t/m_b.  N = (a_t + 2 b_t + m_t) + (a + 2 b) + (a_b + 2 b_b + m_b)."""
    s1, c1 = _csa(a_t, a, a_b)      # weight-1 triples
    s2, c2 = _csa(m_t, m_b, s1)     # + the two vertical cells
    n0 = s2

    s3, c3 = _csa(b_t, b, b_b)      # weight-2 triples
    s4, c4 = _csa(s3, c1, c2)
    n1 = s4

    n2 = c3 ^ c4
    n3 = c3 & c4
    return n0, n1, n2, n3


def _neighbor_bitplanes(g: jax.Array):
    """Bit-sliced Moore-neighbour count of a packed grid [..., H, W/32].

    Returns (n0, n1, n2, n3): bit-planes of the 0-8 count.
    """
    a, b = _horizontal_planes(g)

    up = partial(jnp.roll, shift=1, axis=-2)
    down = partial(jnp.roll, shift=-1, axis=-2)
    return _count_planes(up(a), up(b), up(g), a, b,
                         down(a), down(b), down(g))


def _neighbor_bitplanes_padded(padded: jax.Array):
    """Moore-count bit-planes for the middle rows of a grid carrying one
    explicit ghost row above and below ([..., h+2, W/32] -> planes for
    [..., h, W/32]).  The halo-exchange spatial paths use this instead of
    the torus row-rolls in :func:`_neighbor_bitplanes`."""
    a, b = _horizontal_planes(padded)
    return _count_planes(
        a[..., :-2, :], b[..., :-2, :], padded[..., :-2, :],
        a[..., 1:-1, :], b[..., 1:-1, :],
        a[..., 2:, :], b[..., 2:, :], padded[..., 2:, :],
    )


def _broadcast_rule_bit(rule_bits: jax.Array, k: int, like: jax.Array) -> jax.Array:
    """All-ones word where bit k of the rule mask is set, else zero.

    ``rule_bits`` may be a scalar or an [instances] vector (per-instance
    rulesets, matching ops/ca.py:apply_rule)."""
    bits = jnp.asarray(rule_bits).astype(jnp.uint32)
    bit = (bits >> k) & jnp.uint32(1)
    if bit.ndim == 1:
        if bit.shape[0] != like.shape[0]:
            raise ValueError(
                f"per-instance rule vector of length {bit.shape[0]} must "
                f"match grid dimension 0 ({like.shape[0]}) — the vector "
                "applies along dim 0"
            )
        bit = bit.reshape(bit.shape[0], *([1] * (like.ndim - 1)))
    return jnp.broadcast_to(jnp.uint32(0) - bit, like.shape)


def _rule_mux(g: jax.Array, counts, rule_bits: jax.Array) -> jax.Array:
    """Apply the 18-bit B/S rule mask (rules as data) to bit-sliced Moore
    counts: selects bit (count + 9*alive) via a binary mux tree."""
    n0, n1, n2, n3 = counts

    def select(planes, sel):
        """Mux pairs of bit-sliced leaves by one selector plane."""
        out = []
        for i in range(0, len(planes) - 1, 2):
            out.append((planes[i] & ~sel) | (planes[i + 1] & sel))
        if len(planes) % 2:
            out.append(planes[-1] & ~sel)  # odd tail: only reachable sel=0
        return out

    # leaves[v] = rule bit for count v (9 each for dead/alive branch)
    dead = [_broadcast_rule_bit(rule_bits, v, g) for v in range(9)]
    alive = [_broadcast_rule_bit(rule_bits, 9 + v, g) for v in range(9)]

    def fold(leaves):
        planes = select(leaves, n0)   # 9 -> 5
        planes = select(planes, n1)   # 5 -> 3
        planes = select(planes, n2)   # 3 -> 2
        planes = select(planes, n3)   # 2 -> 1
        return planes[0]

    return (fold(dead) & ~g) | (fold(alive) & g)


def bit_ca_step(packed: jax.Array, rule_bits: jax.Array) -> jax.Array:
    """One generation on a packed grid; rules are data (traced rule_bits)."""
    g = packed.astype(jnp.uint32)
    return _rule_mux(g, _neighbor_bitplanes(g), rule_bits)


def bit_multi_step(packed: jax.Array, rule_bits: jax.Array, num_steps: int) -> jax.Array:
    def body(p, _):
        return bit_ca_step(p, rule_bits), None

    return jax.lax.scan(body, packed, length=num_steps)[0]


# ---------------------------------------------------------------------------
# Rule-specialized variant: constant-fold the mux tree at trace time
# ---------------------------------------------------------------------------


def _fold_mux(a, b, sel):
    """Mux with trace-time constant folding.  Planes are either the string
    constants "0"/"1" or arrays; returns the same representation."""
    if isinstance(a, str) and isinstance(b, str):
        if a == b:
            return a
        return sel if a == "0" else ~sel
    if isinstance(a, str):
        return (b & sel) if a == "0" else (~sel | (b & sel))
    if isinstance(b, str):
        return (a & ~sel) if b == "0" else (sel | (a & ~sel))
    return (a & ~sel) | (b & sel)


def _fold_tail(a, sel):
    """Odd-tail node (only reachable when sel == 0)."""
    if isinstance(a, str):
        return a if a == "0" else ~sel
    return a & ~sel


def _fold_tree(leaves, selectors):
    planes = list(leaves)
    for sel in selectors:
        nxt = []
        for i in range(0, len(planes) - 1, 2):
            nxt.append(_fold_mux(planes[i], planes[i + 1], sel))
        if len(planes) % 2:
            nxt.append(_fold_tail(planes[-1], sel))
        planes = nxt
    return planes[0]


def _rule_mux_static(g: jax.Array, counts, birth, survive) -> jax.Array:
    """Trace-time-specialized rule application over bit-sliced counts."""
    n0, n1, n2, n3 = counts
    birth_set = set(int(d) for d in birth)
    survive_set = set(int(d) for d in survive)

    def fold(digit_set):
        leaves = ["1" if v in digit_set else "0" for v in range(9)]
        out = _fold_tree(leaves, [n0, n1, n2, n3])
        if isinstance(out, str):
            zero = jnp.zeros_like(g)
            return zero if out == "0" else ~zero
        return out

    return (fold(birth_set) & ~g) | (fold(survive_set) & g)


def bit_ca_step_static(packed: jax.Array, birth, survive) -> jax.Array:
    """One generation with the B/S rule fixed at TRACE time.

    The mux tree's leaves become 0/1 constants, so constant folding collapses
    it to a near-minimal boolean expression — for Life (B3/S23) the whole
    rule decision is ~5 bitops per word (next = ~n3 & ~n2 & n1 & (n0 | g))
    versus ~80 for the rules-as-data tree.  The price: changing the rule
    recompiles.  Use :func:`bit_ca_step` when rules must stay data.
    """
    g = packed.astype(jnp.uint32)
    return _rule_mux_static(g, _neighbor_bitplanes(g), birth, survive)


def bit_multi_step_static(packed: jax.Array, birth, survive,
                          num_steps: int) -> jax.Array:
    def body(p, _):
        return bit_ca_step_static(p, birth, survive), None

    return jax.lax.scan(body, packed, length=num_steps)[0]
