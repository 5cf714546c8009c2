"""Fused Pallas kernel for the bit-packed CA engine (ops/bitpack.py).

Combines the two throughput levers: 32 cells per uint32 word (bit-sliced
adder tree + rules-as-data mux, ~3.5 bitops/cell) AND VMEM residency across
K generations per launch (HBM traffic ~2*4/(32*K) bytes per cell-update).

Layout: the packed grid [inst, H, W/32] is transposed to [inst, W/32, H]
before the kernel so the last (lane) dimension is H (>=128 for the shipped
geometries) and the word axis sits on sublanes (W/32 = 8 words at W=256 —
exactly the int32 min sublane tile).  Cross-word carries are then sublane
rolls and vertical torus neighbours are lane rolls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .bitpack import _csa  # carry-save adder shared with the XLA engine
from .tiling import largest_divisor_tile


def _make_rule_plane(rule_bits, g, masks):
    """Leaf factory for the rules-as-data mux folds: the pre-broadcast
    ``masks`` (loop-invariant hoisting for per-instance rule vectors) or an
    on-the-fly all-0s/all-1s plane from bit k of the mask."""
    def rule_plane(k):
        if masks is not None:
            return masks[k]
        bit = (rule_bits >> k) & 1
        return jnp.broadcast_to(
            (jnp.uint32(0) - bit.astype(jnp.uint32)), g.shape
        )

    return rule_plane


def _mux_select(planes, sel):
    out = []
    for i in range(0, len(planes) - 1, 2):
        out.append((planes[i] & ~sel) | (planes[i + 1] & sel))
    if len(planes) % 2:
        out.append(planes[-1] & ~sel)
    return out


def _mux_fold(leaves, n0, n1, n2, n3):
    planes = _mux_select(leaves, n0)
    planes = _mux_select(planes, n1)
    planes = _mux_select(planes, n2)
    return _mux_select(planes, n3)[0]



def _static_rule_fold(g, counts, birth_set, survive_set,
                      count9: bool) -> jax.Array:
    """Shared trace-time rule fold for ALL static step variants: builds the
    dead/alive leaf tables (neighbour-count or count-including-centre
    semantics), constant-folds them through bitpack._fold_tree over the
    ``counts`` bit-planes, and combines.  One implementation so a future
    fix to the don't-care-leaf semantics cannot silently diverge between
    the five kernel schedules."""
    from .bitpack import _fold_tree

    def fold(leaves):
        out = _fold_tree(leaves, list(counts))
        if isinstance(out, str):
            zero = jnp.zeros_like(g)
            return zero if out == "0" else ~zero
        return out

    if count9:
        # count9 == 9 needs the centre alive (unreachable on the dead
        # branch); count9 == 0 is unreachable on the alive branch
        dead = fold(["1" if v in birth_set else "0" for v in range(9)]
                    + ["0"])
        alive = fold(["0"] + ["1" if (v - 1) in survive_set else "0"
                              for v in range(1, 10)])
    else:
        dead = fold(["1" if v in birth_set else "0" for v in range(9)])
        alive = fold(["1" if v in survive_set else "0" for v in range(9)])
    return (dead & ~g) | (alive & g)


def _bit_step_block(g: jax.Array, rule_bits: jax.Array,
                    masks=None) -> jax.Array:
    """One generation on a [tile, W/32, H] uint32 block (transposed layout).

    ``masks`` optionally supplies the 18 rule bit-masks pre-broadcast to
    ``g.shape`` (loop-invariant hoisting for per-instance rule vectors —
    see _multi_step_kernel_vec)."""
    nwords = g.shape[-2]
    h = g.shape[-1]
    word_ax, row_ax = g.ndim - 2, g.ndim - 1

    prev_word = pltpu.roll(g, 1, word_ax)
    next_word = pltpu.roll(g, nwords - 1, word_ax)
    left = (g << 1) | (prev_word >> 31)
    right = (g >> 1) | (next_word << 31)
    a = left ^ right
    b = left & right

    up = lambda x: pltpu.roll(x, 1, row_ax)
    down = lambda x: pltpu.roll(x, h - 1, row_ax)

    s1, c1 = _csa(up(a), a, down(a))
    s2, c2 = _csa(up(g), down(g), s1)
    n0 = s2
    s3, c3 = _csa(up(b), b, down(b))
    s4, c4 = _csa(s3, c1, c2)
    n1 = s4
    n2 = c3 ^ c4
    n3 = c3 & c4

    rule_plane = _make_rule_plane(rule_bits, g, masks)
    dead = _mux_fold([rule_plane(v) for v in range(9)], n0, n1, n2, n3)
    alive = _mux_fold([rule_plane(9 + v) for v in range(9)], n0, n1, n2, n3)
    return (dead & ~g) | (alive & g)


def _lane_shift_concat(x: jax.Array, amount: int) -> jax.Array:
    """Static torus shift along the last (lane) axis as slice+concat.

    ``pltpu.roll`` lowers to a dynamic lane rotate even for compile-time
    shifts; this spells the same ±1 shift as static slices so Mosaic can
    pick a cheaper shuffle if it has one (scheme "vc" measures the
    difference — the lane rolls are the kernel's dominant cost, see
    _static_step_block_v3's per-element finding)."""
    if amount == 1:
        return jnp.concatenate([x[..., -1:], x[..., :-1]], axis=-1)
    if amount == -1:
        return jnp.concatenate([x[..., 1:], x[..., :1]], axis=-1)
    raise ValueError(f"static lane shift only handles ±1, got {amount}")


def _word_shift_concat(x: jax.Array, amount: int) -> jax.Array:
    """Static torus shift along the word (sublane) axis as slice+concat."""
    if amount == 1:
        return jnp.concatenate([x[..., -1:, :], x[..., :-1, :]], axis=-2)
    if amount == -1:
        return jnp.concatenate([x[..., 1:, :], x[..., :1, :]], axis=-2)
    raise ValueError(f"static word shift only handles ±1, got {amount}")


def _count9_planes(g: jax.Array, concat_lane_shift: bool = False,
                   concat_word_shift: bool = False):
    """Vertical-first count-INCLUDING-centre bit-planes on a transposed
    [tile, W/32, H] block: the vertical triple collapses to two planes with
    two lane rolls, then spreads horizontally (four word rolls) — 6 rolls
    total.  Shared by every vertical-first step variant."""
    nwords = g.shape[-2]
    h = g.shape[-1]
    word_ax, row_ax = g.ndim - 2, g.ndim - 1

    if concat_lane_shift:
        u = _lane_shift_concat(g, 1)
        d = _lane_shift_concat(g, -1)
    else:
        u = pltpu.roll(g, 1, row_ax)
        d = pltpu.roll(g, h - 1, row_ax)
    ab = u ^ g
    p0 = ab ^ d                      # vertical-sum weight-1 plane
    p1 = (u & g) | (ab & d)          # vertical-sum weight-2 plane

    def lr(p):
        if concat_word_shift:
            pw = _word_shift_concat(p, 1)
            nw = _word_shift_concat(p, -1)
        else:
            pw = pltpu.roll(p, 1, word_ax)
            nw = pltpu.roll(p, nwords - 1, word_ax)
        return (p << 1) | (pw >> 31), (p >> 1) | (nw << 31)

    p0l, p0r = lr(p0)
    p1l, p1r = lr(p1)
    return _count9_from_triples(p0l, p0, p0r, p1l, p1, p1r)


def _count9_from_triples(p0l, p0, p0r, p1l, p1, p1r):
    s1, c1 = _csa(p0l, p0, p0r)      # weight-1 triple
    s2, c2 = _csa(p1l, p1, p1r)      # weight-2 triple
    n0 = s1
    n1 = c1 ^ s2
    cc = c1 & s2
    n2 = c2 ^ cc
    n3 = c2 & cc                     # count9 bit-planes (0..9)
    return n0, n1, n2, n3


def _bit_step_block_v2(g: jax.Array, rule_bits: jax.Array,
                       concat_lane: bool = False,
                       concat_word: bool = False,
                       masks=None) -> jax.Array:
    """Vertical-first rules-as-data step: 6 rolls/generation instead of 8
    (measured 1.42x on v5e — rolls dominate).  The count includes the
    centre cell, so the 10-leaf mux tables are the birth bits at count9
    (dead branch) and the survive bits at count9-1 (alive).
    ``concat_lane`` switches the lane shifts to slice+concat (the "vc"
    lowering, ~8% on the static kernel — see _make_static_step_vertical)."""
    n0, n1, n2, n3 = _count9_planes(g, concat_lane, concat_word)

    rule_plane = _make_rule_plane(rule_bits, g, masks)
    zero = jnp.zeros_like(g)
    # count9 == 9 unreachable on the dead branch; count9 == 0 on the alive
    dead = _mux_fold([rule_plane(v) for v in range(9)] + [zero],
                     n0, n1, n2, n3)
    alive = _mux_fold([zero] + [rule_plane(9 + v) for v in range(9)],
                      n0, n1, n2, n3)
    return (dead & ~g) | (alive & g)


def _bit_step_block_vd(g: jax.Array, rule_bits: jax.Array,
                       masks=None) -> jax.Array:
    """"vd" rules-as-data step (the measured default): vc's roll schedule
    with an n3-first XOR-mux rule fold — 1.52-1.58e12 cells/s on v5e vs
    vc's 1.34-1.36e12 (+14%, matching the traced-op count prediction).

    The vc fold is ~9 select-muxes + 2 masked ANDs per branch, each select
    spending 3 ops plus a shared ``~sel`` per level (~33 ops/branch).  Two
    structural savings: (a) ``mux(sel,a,b) = a ^ (sel & (a^b))`` is 3 ops
    with NO inverted selector since every leaf is an all-0s/all-1s plane;
    (b) count9 >= 8 iff n3 is set (counts stop at 9), so splitting on n3
    FIRST leaves a dense 8-leaf/3-bit tree (7 muxes) plus a 1-mux high
    branch instead of a ragged 10-leaf tree — ~24-27 ops/branch.  Count9
    semantics: dead branch indexes birth bits at count9 (centre
    contributes 0, count9 == 9 unreachable), alive branch survive bits at
    count9-1 (count9 == 0 unreachable, don't-care leaves reuse s0)."""
    n0, n1, n2, n3 = _count9_planes(g, concat_lane_shift=True)
    rule_plane = _make_rule_plane(rule_bits, g, masks)

    def mux(sel, a, b):  # sel=0 -> a, sel=1 -> b
        return a ^ (sel & (a ^ b))

    def tree8(leaves):
        l = [mux(n0, leaves[0], leaves[1]), mux(n0, leaves[2], leaves[3]),
             mux(n0, leaves[4], leaves[5]), mux(n0, leaves[6], leaves[7])]
        l = [mux(n1, l[0], l[1]), mux(n1, l[2], l[3])]
        return mux(n2, l[0], l[1])

    d = [rule_plane(v) for v in range(9)]
    s = [rule_plane(9 + v) for v in range(9)]

    dead = mux(n3, tree8(d[0:8]), d[8])  # count9==9 is a dead-branch dont-care
    alive_low = tree8([s[0], s[0], s[1], s[2], s[3], s[4], s[5], s[6]])
    alive = mux(n3, alive_low, mux(n0, s[7], s[8]))
    return (dead & ~g) | (alive & g)


_DATA_STEPS = {
    "h": _bit_step_block,
    "v": _bit_step_block_v2,
    "vc": functools.partial(_bit_step_block_v2, concat_lane=True),
    "vcc": functools.partial(_bit_step_block_v2, concat_lane=True,
                             concat_word=True),
    "vd": _bit_step_block_vd,
}


def _multi_step_kernel(rule_ref, steps_ref, grid_ref, out_ref, *, scheme="v"):
    if scheme in _VD_STREAMS:
        # MULTI-STREAM vd — same scheduling-slack trick as the static
        # "vc2"/"vc4" (see _static_multi_step_kernel): the tile's
        # halves/quarters run as independent dependency chains so Mosaic
        # can interleave adjacent crossbar and ALU ops across streams.
        streams = _VD_STREAMS[scheme]
        step = _DATA_STEPS["vd"]
        ts = grid_ref.shape[0] // streams

        def body_n(_, parts):
            return tuple(step(p, rule_ref[0]) for p in parts)

        parts = jax.lax.fori_loop(
            0, steps_ref[0], body_n,
            tuple(grid_ref[i * ts:(i + 1) * ts] for i in range(streams)))
        for i in range(streams):
            out_ref[i * ts:(i + 1) * ts] = parts[i]
        return
    step = _DATA_STEPS[scheme]

    def body(_, g):
        return step(g, rule_ref[0])

    out_ref[...] = jax.lax.fori_loop(0, steps_ref[0], body, grid_ref[...])


def _multi_step_kernel_vec(steps_ref, grid_ref, rule_ref, out_ref, *,
                           scheme="v"):
    """Per-instance rules: ``rule_ref`` is a [tile, 1, 1] VMEM block.  The
    step functions only touch ``rule_bits`` inside ``rule_plane`` (shift,
    mask, negate, broadcast_to(g.shape)), so a [tile, 1, 1] vector flows
    through the same bodies as a scalar — but the 18 full-size mask
    broadcasts are then re-issued EVERY generation (measured 36% slower
    than scalar rules on v5e: 8.7e11 vs 1.37e12).  The masks are
    loop-invariant, so hoist them out of the fori_loop; the dispatch picks
    a smaller instance tile to keep 18 resident planes inside VMEM."""
    rules = rule_ref[...]

    def hoisted_masks(r, shape):
        return [
            jnp.broadcast_to(
                jnp.uint32(0) - ((r >> k) & 1).astype(jnp.uint32), shape
            )
            for k in range(18)
        ]

    if scheme in _VD_STREAMS:
        # multi-stream vd with per-slice hoisted rule masks (see
        # _multi_step_kernel above for the scheduling rationale).  The
        # per-slice masks are SLICES of one logical 18-plane set — total
        # resident mask VMEM is 18 tile-sized planes at ANY stream count
        # — so the vector engine streams as freely as the scalar one.
        streams = _VD_STREAMS[scheme]
        step = _DATA_STEPS["vd"]
        ts = grid_ref.shape[0] // streams
        shp = (ts,) + grid_ref.shape[1:]
        rs = [rules[i * ts:(i + 1) * ts] for i in range(streams)]
        ms = [hoisted_masks(r, shp) for r in rs]

        def body_n(_, parts):
            return tuple(step(p, rs[i], masks=ms[i])
                         for i, p in enumerate(parts))

        parts = jax.lax.fori_loop(
            0, steps_ref[0], body_n,
            tuple(grid_ref[i * ts:(i + 1) * ts] for i in range(streams)))
        for i in range(streams):
            out_ref[i * ts:(i + 1) * ts] = parts[i]
        return

    step = _DATA_STEPS[scheme]
    masks = hoisted_masks(rules, grid_ref.shape)

    def body(_, g):
        return step(g, rules, masks=masks)

    out_ref[...] = jax.lax.fori_loop(0, steps_ref[0], body, grid_ref[...])


def _neighbor_planes_block(g: jax.Array):
    """Bit-sliced Moore count planes on a transposed [tile, W/32, H] block."""
    nwords = g.shape[-2]
    h = g.shape[-1]
    word_ax, row_ax = g.ndim - 2, g.ndim - 1

    prev_word = pltpu.roll(g, 1, word_ax)
    next_word = pltpu.roll(g, nwords - 1, word_ax)
    left = (g << 1) | (prev_word >> 31)
    right = (g >> 1) | (next_word << 31)
    a = left ^ right
    b = left & right

    up = lambda x: pltpu.roll(x, 1, row_ax)
    down = lambda x: pltpu.roll(x, h - 1, row_ax)

    s1, c1 = _csa(up(a), a, down(a))
    s2, c2 = _csa(up(g), down(g), s1)
    s3, c3 = _csa(up(b), b, down(b))
    s4, c4 = _csa(s3, c1, c2)
    return s2, s4, c3 ^ c4, c3 & c4


def _static_step_block(g: jax.Array, birth_set, survive_set) -> jax.Array:
    """Rule baked at trace time — the mux tree constant-folds to a minimal
    boolean expression (see ops/bitpack.py bit_ca_step_static)."""
    counts = _neighbor_planes_block(g)
    return _static_rule_fold(g, counts, birth_set, survive_set, count9=False)


def _make_static_step_vertical(concat_lane: bool, concat_word: bool):
    """Build a vertical-first static step with a choice of shift lowering
    per axis: ``pltpu.roll`` (dynamic rotate) or static slice+concat.

    MEASURED (v5e, 4096x256x256, same-session pairs): concat LANE shifts
    win ~4-8% over the dynamic rotate (static "vc" 1.98-2.03e12 cells/s vs
    "v" 1.81-2.0e12; rules-as-data 1.363e12 vs 1.317e12) — the rotate's
    dynamic shift amount costs even when the shift is a compile-time ±1.
    Word-axis concat ("vcc") TIES vc (2.022e12 vs 2.027e12): sublane
    rotates are cheap, only lane rotates pay the dynamic-shift tax.
    """

    def step(g: jax.Array, birth_set, survive_set) -> jax.Array:
        counts = _count9_planes(g, concat_lane, concat_word)
        return _static_rule_fold(g, counts, birth_set, survive_set,
                                 count9=True)

    return step


_static_step_block_vc = _make_static_step_vertical(True, False)
_static_step_block_vcc = _make_static_step_vertical(True, True)


def _static_step_block_v2(g: jax.Array, birth_set, survive_set) -> jax.Array:
    """Vertical-first variant: 6 rolls/generation instead of 8.

    Columns first — the vertical triple (up + center + down) collapses to two
    bit-planes p0/p1 with only TWO lane rolls; the horizontal spread then
    needs four word-axis rolls (cross-word carries for both planes).  The
    price is that the resulting count INCLUDES the centre cell, so the rule
    mux folds over count9 = neighbours + centre with shifted leaf tables
    (dead branch: birth[count9]; alive branch: survive[count9 - 1]).  Life
    folds to the classic "alive iff count9 == 3, or count9 == 4 and centre
    alive".  Net: ~8 more ALU bitops but 2 fewer cross-lane shuffles per
    generation — which side wins depends on the VPU's roll cost; bench.py
    measures both (--scheme)."""
    counts = _count9_planes(g)
    return _static_rule_fold(g, counts, birth_set, survive_set, count9=True)


def _static_step_block_v3(g: jax.Array, birth_set, survive_set) -> jax.Array:
    """v2 with the two vertical planes STACKED along the tile axis so both
    ride one word-axis roll per direction: 4 roll invocations/generation
    (2 lane + 2 sublane) instead of v2's 6.  Same rolled element count —
    this probes whether roll cost is per-invocation or per-element.

    MEASURED (v5e, 4096x256x256, after fixing a scheme-dispatch bug that
    originally made this path unreachable): 1.907e12 cells/s vs v2's
    1.899e12 in the same session — a TIE within the ±2% run-to-run noise
    (v2 spans 1.90-1.94e12 across sessions).  Roll cost is per-element:
    halving invocations while doubling their width buys nothing.  Kept as
    the recorded negative result; "v" stays the default."""

    nwords = g.shape[-2]
    h = g.shape[-1]
    word_ax, row_ax = g.ndim - 2, g.ndim - 1
    tile = g.shape[0]

    u = pltpu.roll(g, 1, row_ax)
    d = pltpu.roll(g, h - 1, row_ax)
    ab = u ^ g
    p0 = ab ^ d
    p1 = (u & g) | (ab & d)

    pp = jnp.concatenate([p0, p1], axis=0)        # [2*tile, W/32, H]
    pw = pltpu.roll(pp, 1, word_ax)
    nw = pltpu.roll(pp, nwords - 1, word_ax)
    lshift = (pp << 1) | (pw >> 31)
    rshift = (pp >> 1) | (nw << 31)
    p0l, p1l = lshift[:tile], lshift[tile:]
    p0r, p1r = rshift[:tile], rshift[tile:]

    n0, n1, n2, n3 = _count9_from_triples(p0l, p0, p0r, p1l, p1, p1r)

    return _static_rule_fold(g, (n0, n1, n2, n3), birth_set, survive_set,
                             count9=True)


def _count9_planes_cm(g: jax.Array):
    """Count-including-centre planes on a COLUMN-MAJOR packed block
    [tile, H/32, W] (bits along H — ops/bitpack.py:pack_grid_cm).

    The layout swap moves the carry burden off the word axis: vertical
    neighbours become in-word bit shifts (6 ALU ops + 2 sublane-shift
    carries) and the horizontal spread becomes four lane slice+concat
    shifts with NO cross-word carry ops.

    MEASURED NEGATIVE RESULT (v5e, 4096x256x256): 1.34e12 cells/s static /
    1.25e12 rules-as-data — 1.4x SLOWER than the row-major "vc" scheme
    (1.9-2.03e12), despite 6 fewer ALU ops and 2 fewer sublane rolls.  The
    difference is the lane-shift count (4 here vs 2 in vc): each ±1 LANE
    concat shift costs ~15-20% of a generation, far more than the
    kernel_budget.py `no_lane_shifts` ablation suggested (that probe is
    CSE-confounded — u = d = g collapses the two spreads into one).  The
    zero-lane-movement extreme ([W/32, H, inst] with instances on lanes,
    scripts/il_probe.py) is ALSO slower (1.43e12) — layout costs are not a
    simple per-shift model; "vc" is the measured optimum of the four
    layouts tried (row-major h/v/vc/vcc, u16, cm, instance-lanes).  Kept as
    a working, parity-tested record of the experiment."""
    pw = _word_shift_concat(g, 1)    # word k-1 at position k
    nw = _word_shift_concat(g, -1)   # word k+1 at position k
    u = (g << 1) | (pw >> 31)        # cell at row r-1, at position r
    d = (g >> 1) | (nw << 31)        # cell at row r+1
    ab = u ^ g
    p0 = ab ^ d                      # vertical-sum weight-1 plane
    p1 = (u & g) | (ab & d)          # vertical-sum weight-2 plane

    p0l = _lane_shift_concat(p0, 1)
    p0r = _lane_shift_concat(p0, -1)
    p1l = _lane_shift_concat(p1, 1)
    p1r = _lane_shift_concat(p1, -1)
    return _count9_from_triples(p0l, p0, p0r, p1l, p1, p1r)


def _static_step_block_cm(g: jax.Array, birth_set, survive_set) -> jax.Array:
    """Column-major static step (see _count9_planes_cm)."""
    counts = _count9_planes_cm(g)
    return _static_rule_fold(g, counts, birth_set, survive_set, count9=True)


def _bit_step_block_cm(g: jax.Array, rule_bits: jax.Array,
                       masks=None) -> jax.Array:
    """Column-major rules-as-data step (see _count9_planes_cm).  ``masks``
    optionally supplies the 18 pre-broadcast rule planes (loop-invariant
    hoisting for per-instance rule vectors, as in _multi_step_kernel_vec)."""
    n0, n1, n2, n3 = _count9_planes_cm(g)

    rule_plane = _make_rule_plane(rule_bits, g, masks)
    zero = jnp.zeros_like(g)
    dead = _mux_fold([rule_plane(v) for v in range(9)] + [zero],
                     n0, n1, n2, n3)
    alive = _mux_fold([zero] + [rule_plane(9 + v) for v in range(9)],
                      n0, n1, n2, n3)
    return (dead & ~g) | (alive & g)


_STATIC_STEPS = {
    "h": _static_step_block,
    "v": _static_step_block_v2,
    "v3": _static_step_block_v3,
    "vc": _static_step_block_vc,
    "vcc": _static_step_block_vcc,
}


_VC_STREAMS = {"vc2": 2, "vc4": 4, "vc8": 8, "vc16": 16, "vc32": 32}
_VD_STREAMS = {"vd2": 2, "vd4": 4, "vd8": 8, "vd16": 16}


def _static_multi_step_kernel(steps_ref, grid_ref, out_ref, *, birth, survive,
                              scheme="v"):
    if scheme in _VC_STREAMS:
        # MULTI-STREAM vc: the tile's halves (vc2) or quarters (vc4) run
        # as independent dependency chains inside one loop body, giving
        # the Mosaic scheduler adjacent independent crossbar and ALU ops
        # to interleave.  vc2 measured on v5e (scripts/overlap_probe.py,
        # two sessions): +5.2% / +6.2% over the single-chain vc at
        # 4096x256x256 — scheduling slack, not true crossbar/ALU overlap
        # (the probe's mix additivity is 0.95, and substituting the 2
        # lane shifts with 2 ALU ops measures SLOWER, so the crossbar
        # already pipelines under the ALU stream).  vc4 probes whether
        # more slack remains past two streams.
        streams = _VC_STREAMS[scheme]
        step = _STATIC_STEPS["vc"]
        ts = grid_ref.shape[0] // streams

        def body_n(_, parts):
            return tuple(step(p, birth, survive) for p in parts)

        parts = jax.lax.fori_loop(
            0, steps_ref[0], body_n,
            tuple(grid_ref[i * ts:(i + 1) * ts] for i in range(streams)))
        for i in range(streams):
            out_ref[i * ts:(i + 1) * ts] = parts[i]
        return
    step = _STATIC_STEPS[scheme]

    def body(_, g):
        return step(g, birth, survive)

    out_ref[...] = jax.lax.fori_loop(0, steps_ref[0], body, grid_ref[...])


def _tile(instances: int, nwords: int, h: int,
          budget_bytes: int = 8 * 2**20) -> int:
    # ~10 live uint32 planes per instance
    return largest_divisor_tile(instances, nwords * h * 4 * 10, budget_bytes)


@functools.partial(jax.jit, static_argnames=("scheme",))
def bit_multi_step_pallas(
    packed: jax.Array, rule_bits: jax.Array, num_steps: jax.Array,
    scheme: str = "vd8",
) -> jax.Array:
    """``num_steps`` generations on a packed [inst, H, W/32] grid.

    Default scheme "vd8" (r5: the "vd" n3-first XOR-mux fold run as EIGHT
    independent tile-slice streams — multi-stream scheduling slack, same
    trick as the static "vc16") measured 1.794e12 cells/s on v5e vs
    1.733e12 vd4 / 1.659e12 vd2 / 1.60e12 single-chain vd same-session
    (1.34-1.36e12 "vc" select-mux fold, 1.32e12 "v" dynamic rotates) —
    the serving-path default for the env/packed engines; vd16 regresses
    (1.74e12), and non-dividing tiles halve the stream count until it
    fits.  The per-instance rule-VECTOR engine caps at 2 streams (18
    hoisted masks per stream bound VMEM).

    ``rule_bits`` scalar or [instances] vector (per-instance rulesets in one
    launch — the fast path for mixed-rule batches like the eval battery)."""
    inst, h, nwords = packed.shape
    t = packed.transpose(0, 2, 1)  # [inst, W/32, H]
    tile = _tile(inst, nwords, h)
    while scheme in _VD_STREAMS and tile % _VD_STREAMS[scheme]:
        n = _VD_STREAMS[scheme] // 2
        scheme = "vd" if n < 2 else f"vd{n}"
    if scheme not in _DATA_STEPS and scheme not in _VD_STREAMS:
        raise ValueError(
            f"unknown scheme {scheme!r}; one of "
            f"{sorted(_DATA_STEPS) + sorted(_VD_STREAMS)}")
    rb = jnp.asarray(rule_bits, jnp.int32)
    if rb.ndim == 1:
        # ~10 live step planes + 18 hoisted rule masks resident: shrink the
        # tile so the working set still fits VMEM (tile 32 measured within
        # 2.5% of 64 for the static kernel — scripts/tile_probe.py)
        tile = _tile(inst, nwords, h,
                     budget_bytes=int(8 * 2**20 * 10 / 28))
        while scheme in _VD_STREAMS and tile % _VD_STREAMS[scheme]:
            n = _VD_STREAMS[scheme] // 2
            scheme = "vd" if n < 2 else f"vd{n}"
        out = pl.pallas_call(
            functools.partial(_multi_step_kernel_vec, scheme=scheme),
            out_shape=jax.ShapeDtypeStruct(t.shape, jnp.uint32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(inst // tile,),
                in_specs=[
                    pl.BlockSpec((tile, nwords, h), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, 1, 1), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tile, nwords, h),
                                       lambda i, *_: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
        )(
            jnp.asarray(num_steps, jnp.int32).reshape(1),
            t,
            rb.reshape(inst, 1, 1),
        )
        return out.transpose(0, 2, 1)
    out = pl.pallas_call(
        functools.partial(_multi_step_kernel, scheme=scheme),
        out_shape=jax.ShapeDtypeStruct(t.shape, jnp.uint32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(inst // tile,),
            in_specs=[
                pl.BlockSpec((tile, nwords, h), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, nwords, h), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(
        rb.reshape(1),
        jnp.asarray(num_steps, jnp.int32).reshape(1),
        t,
    )
    return out.transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=("birth", "survive", "scheme"))
def bit_multi_step_pallas_static(
    packed: jax.Array, birth, survive, num_steps: jax.Array,
    scheme: str = "vc16",
) -> jax.Array:
    """``num_steps`` generations with the rule baked into the kernel.

    ~3x fewer bitops per word than the rules-as-data kernel for sparse
    rulesets like Life; recompiles when (birth, survive) change — use for
    long fixed-rule runs and benchmarks.  ``scheme="vc16"`` (default,
    r5) runs the vc step as SIXTEEN independent tile-slice streams —
    multi-stream scheduling slack, measured 2.52-2.53e12 cells/s on v5e
    (same-session ladder: vc2 2.21e12, vc4 2.28-2.33e12, vc8 2.46e12,
    vc16 2.52-2.53e12, vc32 2.54e12 ~ ties vc16; identical checksums;
    non-dividing tiles halve the stream count).  ``"vc"`` is the
    single-chain vertical-first step with slice+concat lane shifts
    (2.03-2.10e12), ``"v"`` the same schedule with dynamic lane rotates
    (1.81-2.0e12, session-dependent), ``"h"`` the round-1
    horizontal-pair step (8 rolls, 1.36e12)."""
    inst, h, nwords = packed.shape
    t = packed.transpose(0, 2, 1)
    tile = _tile(inst, nwords, h)
    while scheme in _VC_STREAMS and tile % _VC_STREAMS[scheme]:
        # stream count must divide the tile; halve until it does
        n = _VC_STREAMS[scheme] // 2
        scheme = "vc" if n < 2 else f"vc{n}"
    if scheme not in _STATIC_STEPS and scheme not in _VC_STREAMS:
        raise ValueError(
            f"unknown scheme {scheme!r}; one of "
            f"{sorted(_STATIC_STEPS) + sorted(_VC_STREAMS)}")
    kernel = functools.partial(
        _static_multi_step_kernel,
        birth=frozenset(birth),
        survive=frozenset(survive),
        scheme=scheme,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(t.shape, jnp.uint32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(inst // tile,),
            in_specs=[
                pl.BlockSpec((tile, nwords, h), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, nwords, h), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(jnp.asarray(num_steps, jnp.int32).reshape(1), t)
    return out.transpose(0, 2, 1)


def _static_multi_step_kernel_cm(steps_ref, grid_ref, out_ref, *, birth,
                                 survive):
    out_ref[...] = jax.lax.fori_loop(
        0, steps_ref[0],
        lambda _, g: _static_step_block_cm(g, birth, survive),
        grid_ref[...],
    )


def _multi_step_kernel_cm(rule_ref, steps_ref, grid_ref, out_ref):
    out_ref[...] = jax.lax.fori_loop(
        0, steps_ref[0],
        lambda _, g: _bit_step_block_cm(g, rule_ref[0]),
        grid_ref[...],
    )


def _multi_step_kernel_vec_cm(steps_ref, grid_ref, rule_ref, out_ref):
    """Per-instance rules, column-major: the [tile, 1, 1] rule block
    broadcasts like a scalar; the 18 masks are hoisted out of the
    generation loop (see _multi_step_kernel_vec)."""
    rules = rule_ref[...]
    masks = [
        jnp.broadcast_to(
            jnp.uint32(0) - ((rules >> k) & 1).astype(jnp.uint32),
            grid_ref.shape,
        )
        for k in range(18)
    ]
    out_ref[...] = jax.lax.fori_loop(
        0, steps_ref[0],
        lambda _, g: _bit_step_block_cm(g, rules, masks=masks),
        grid_ref[...],
    )


@functools.partial(jax.jit, static_argnames=("birth", "survive"))
def bit_multi_step_pallas_static_cm(
    packed_cm: jax.Array, birth, survive, num_steps: jax.Array,
) -> jax.Array:
    """``num_steps`` generations on a COLUMN-MAJOR packed [inst, H/32, W]
    grid (ops/bitpack.py:pack_grid_cm) with the rule baked in.

    Carries live on the cheap axes: vertical neighbours are in-word bit
    shifts (+2 sublane concat shifts), the horizontal spread is pure lane
    slice+concat — no cross-word carry bitops.  No transpose is needed
    either (lane dim is W, already >=128 for the shipped geometries)."""
    inst, nwords, w = packed_cm.shape
    tile = _tile(inst, nwords, w)
    kernel = functools.partial(
        _static_multi_step_kernel_cm,
        birth=frozenset(birth),
        survive=frozenset(survive),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(packed_cm.shape, jnp.uint32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(inst // tile,),
            in_specs=[
                pl.BlockSpec((tile, nwords, w), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, nwords, w), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(jnp.asarray(num_steps, jnp.int32).reshape(1), packed_cm)


@jax.jit
def bit_multi_step_pallas_cm(
    packed_cm: jax.Array, rule_bits: jax.Array, num_steps: jax.Array,
) -> jax.Array:
    """Rules-as-data variant of :func:`bit_multi_step_pallas_static_cm`.

    ``rule_bits`` scalar or [instances] vector (per-instance rulesets in
    one launch, as in :func:`bit_multi_step_pallas`)."""
    inst, nwords, w = packed_cm.shape
    tile = _tile(inst, nwords, w)
    rb = jnp.asarray(rule_bits, jnp.int32)
    if rb.ndim == 1:
        # 18 hoisted rule masks resident next to ~10 live planes: shrink
        # the tile so the working set still fits VMEM
        tile = _tile(inst, nwords, w,
                     budget_bytes=int(8 * 2**20 * 10 / 28))
        return pl.pallas_call(
            _multi_step_kernel_vec_cm,
            out_shape=jax.ShapeDtypeStruct(packed_cm.shape, jnp.uint32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(inst // tile,),
                in_specs=[
                    pl.BlockSpec((tile, nwords, w), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, 1, 1), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tile, nwords, w),
                                       lambda i, *_: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
        )(
            jnp.asarray(num_steps, jnp.int32).reshape(1),
            packed_cm,
            rb.reshape(inst, 1, 1),
        )
    return pl.pallas_call(
        _multi_step_kernel_cm,
        out_shape=jax.ShapeDtypeStruct(packed_cm.shape, jnp.uint32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(inst // tile,),
            in_specs=[
                pl.BlockSpec((tile, nwords, w), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, nwords, w), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(
        jnp.asarray(rule_bits, jnp.int32).reshape(1),
        jnp.asarray(num_steps, jnp.int32).reshape(1),
        packed_cm,
    )
