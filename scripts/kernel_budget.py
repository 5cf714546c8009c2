"""Cost-budget probe for the static bit-packed Pallas kernel (vc scheme).

Benches ABLATED variants of the vertical-first static step — each drops one
component while keeping the rest of the dataflow live — to attribute the
per-generation time between the lane shifts, the word rolls (+ cross-word
bit carries), the CSA count network, and the rule fold.  The ablated
kernels are NOT correct CA steps; they exist only to measure.

Run on TPU: ``python scripts/kernel_budget.py``.  One JSON line per variant.

MEASURED (v5e, 4096x256x256): full_vc 2.02e12 cells/s; ablations save
no_lane 1.4% / no_word_rolls 4.0% / no_bit_carries 11.8% / no_rule_fold
9.8%; the movement-only skeleton runs 3.61e12 (44% of a generation is
ALU above the data-movement floor).

CAVEAT discovered via the cm experiment: the ``no_lane_shifts`` number is
CONFOUNDED — setting u = d = g collapses p0 = p1 = g, so the two ``lr``
spreads can CSE into one; the 1.4% is NOT the true lane-shift cost.  The
cm kernel (2 extra lane shifts, 6 fewer carry ops, 2 fewer sublane rolls)
measured 1.4x SLOWER than vc, implying each ±1 LANE concat shift costs
~15-20% of a generation — lane movement is the kernel's dominant single
cost, which motivated the instance-lanes probe (scripts/il_probe.py).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from carle_tpu.ops import pallas_bitpack as pb
from carle_tpu.ops.bitpack import pack_grid, _fold_tree
from carle_tpu.utils.cache import enable_compilation_cache

LIFE_B = frozenset({3})
LIFE_S = frozenset({2, 3})


def _fold_life(g, n0, n1, n2, n3):
    def fold(leaves):
        out = _fold_tree(leaves, [n0, n1, n2, n3])
        if isinstance(out, str):
            zero = jnp.zeros_like(g)
            return zero if out == "0" else ~zero
        return out

    dead = fold(["1" if v in LIFE_B else "0" for v in range(9)] + ["0"])
    alive = fold(["0"] + ["1" if (v - 1) in LIFE_S else "0"
                          for v in range(1, 10)])
    return (dead & ~g) | (alive & g)


def step_full(g):
    n0, n1, n2, n3 = pb._count9_planes(g, True, False)
    return _fold_life(g, n0, n1, n2, n3)


def step_no_lane(g):
    """Lane shifts replaced by identity: u = d = g."""
    nwords = g.shape[-2]
    word_ax = g.ndim - 2
    u = g
    d = g
    ab = u ^ g
    p0 = ab ^ d
    p1 = (u & g) | (ab & d)

    def lr(p):
        pw = pltpu.roll(p, 1, word_ax)
        nw = pltpu.roll(p, nwords - 1, word_ax)
        return (p << 1) | (pw >> 31), (p >> 1) | (nw << 31)

    p0l, p0r = lr(p0)
    p1l, p1r = lr(p1)
    n0, n1, n2, n3 = pb._count9_from_triples(p0l, p0, p0r, p1l, p1, p1r)
    return _fold_life(g, n0, n1, n2, n3)


def step_no_word(g):
    """Word rolls replaced by identity (bit shifts/ors kept)."""
    u = pb._lane_shift_concat(g, 1)
    d = pb._lane_shift_concat(g, -1)
    ab = u ^ g
    p0 = ab ^ d
    p1 = (u & g) | (ab & d)

    def lr(p):
        pw = p
        nw = p
        return (p << 1) | (pw >> 31), (p >> 1) | (nw << 31)

    p0l, p0r = lr(p0)
    p1l, p1r = lr(p1)
    n0, n1, n2, n3 = pb._count9_from_triples(p0l, p0, p0r, p1l, p1, p1r)
    return _fold_life(g, n0, n1, n2, n3)


def step_no_bitshift(g):
    """Cross-word bit carries dropped: horizontal spread = word rolls only."""
    u = pb._lane_shift_concat(g, 1)
    d = pb._lane_shift_concat(g, -1)
    nwords = g.shape[-2]
    word_ax = g.ndim - 2
    ab = u ^ g
    p0 = ab ^ d
    p1 = (u & g) | (ab & d)

    def lr(p):
        return (pltpu.roll(p, 1, word_ax),
                pltpu.roll(p, nwords - 1, word_ax))

    p0l, p0r = lr(p0)
    p1l, p1r = lr(p1)
    n0, n1, n2, n3 = pb._count9_from_triples(p0l, p0, p0r, p1l, p1, p1r)
    return _fold_life(g, n0, n1, n2, n3)


def step_no_fold(g):
    """Rule fold replaced by a 3-op combine of the count planes."""
    n0, n1, n2, n3 = pb._count9_planes(g, True, False)
    return (n0 ^ n1) ^ (n2 ^ n3)


def step_shifts_only(g):
    """Only the 6 data movements + minimal combine: the roll floor."""
    nwords = g.shape[-2]
    word_ax = g.ndim - 2
    u = pb._lane_shift_concat(g, 1)
    d = pb._lane_shift_concat(g, -1)
    p0 = u ^ d
    pw = pltpu.roll(p0, 1, word_ax)
    nw = pltpu.roll(p0, nwords - 1, word_ax)
    qw = pltpu.roll(u, 1, word_ax)
    rw = pltpu.roll(d, nwords - 1, word_ax)
    return pw ^ nw ^ qw ^ rw ^ g


VARIANTS = {
    "full_vc": step_full,
    "no_lane_shifts": step_no_lane,
    "no_word_rolls": step_no_word,
    "no_bit_carries": step_no_bitshift,
    "no_rule_fold": step_no_fold,
    "shifts_only": step_shifts_only,
}


def _kernel(steps_ref, grid_ref, out_ref, *, variant):
    step = VARIANTS[variant]
    out_ref[...] = jax.lax.fori_loop(
        0, steps_ref[0], lambda _, g: step(g), grid_ref[...]
    )


@functools.partial(jax.jit, static_argnames=("variant",))
def run_variant(packed, num_steps, variant):
    inst, h, nwords = packed.shape
    t = packed.transpose(0, 2, 1)
    tile = pb._tile(inst, nwords, h)
    out = pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        out_shape=jax.ShapeDtypeStruct(t.shape, jnp.uint32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(inst // tile,),
            in_specs=[pl.BlockSpec((tile, nwords, h), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, nwords, h), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(jnp.asarray(num_steps, jnp.int32).reshape(1), t)
    return out.transpose(0, 2, 1)


from carle_tpu.utils.sync import device_sync as _sync  # true axon barrier


def main():
    enable_compilation_cache()
    inst, size = 4096, 256
    steps_per_launch, launches = 128, 8
    key = jax.random.PRNGKey(0)
    grid = jax.random.bernoulli(key, 0.3, (inst, size, size)).astype(jnp.uint8)
    packed = pack_grid(grid)
    steps = jnp.asarray(steps_per_launch, jnp.int32)
    cells = inst * size * size * steps_per_launch * launches

    results = {}
    for name in VARIANTS:
        _sync(run_variant(packed, steps, name))   # compile + warm
        t0 = time.perf_counter()
        p = packed
        for _ in range(launches):
            p = run_variant(p, steps, name)
        _sync(p)
        dt = time.perf_counter() - t0
        rate = cells / dt
        results[name] = rate
        print(json.dumps({"variant": name, "cells_per_s": rate,
                          "dt": dt}), flush=True)

    full = results.get("full_vc")
    if full:
        for name, rate in results.items():
            if name != "full_vc":
                saved = 1.0 - full / rate
                print(json.dumps({"variant": name,
                                  "fraction_of_gen_cost": round(saved, 4)}),
                      flush=True)


if __name__ == "__main__":
    main()
