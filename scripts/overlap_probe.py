"""Crossbar/ALU overlap probe — the roofline's one unmeasured lever.

DESIGN.md §3's verdict leaves exactly one theoretical headroom between the
static vc kernel (measured 2.03-2.12e12 cells/s) and its 3.93e12 ALU-only
ceiling: *overlapping* the two ±1 lane shifts (crossbar traffic, ~3-4 ps
each ≈ 40% of a generation) with ALU issue.  That is a Mosaic scheduling
property no single-stream schedule can control — a generation's dataflow
is shift → ALU → shift — but TWO independent streams interleaved in one
kernel give the scheduler adjacent independent crossbar and ALU ops to
overlap if the hardware can dual-issue them (VERDICT r3 item 3; the probe
counterpart of reference env.py:555-556's throughput harness).

Variants (identical [tile, W/32, H] layout and fori_loop harness as the
production kernel, ops/pallas_bitpack.py):

  vc       the production static step (2 lane shifts + 4 sublane + ~50 ALU)
  noshift  the SAME op graph with the 2 lane shifts replaced by XOR against
           distinct constants (1 ALU op each; distinct results so CSE can't
           collapse the up/down planes — the kernel_budget no_lane ablation's
           confound) — the ALU-only analogue
  split2   two half-tile streams, BOTH running vc — does merely splitting
           the chain let Mosaic overlap stream A's shifts with stream B's?
  mix      two half-tile streams, one vc + one noshift — maximal ALU filler
           under the shift stream

Readout: additivity = t_mix / (0.5·(t_vc + t_noshift)).  ≈1 → crossbar and
ALU issue serially (no overlap; the roofline verdict gets its measurement
and 2.03e12 stands as speed-of-light).  Substantially <1 → overlap exists
and a production two-stream kernel should chase the ALU ceiling.

  python scripts/overlap_probe.py [--instances 4096 --size 256 --steps 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(variant: str, inst: int, h: int, nwords: int, tile: int,
          interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from carle_tpu.ops.pallas_bitpack import (
        _count9_from_triples,
        _lane_shift_concat,
        _static_rule_fold,
        _word_shift_concat,
    )

    BIRTH, SURVIVE = frozenset({3}), frozenset({2, 3})

    def count9(g, lane_shifts: bool):
        if lane_shifts:
            u = _lane_shift_concat(g, 1)
            d = _lane_shift_concat(g, -1)
        else:
            # data-dependent, non-foldable fillers: one ALU op each, zero
            # crossbar.  NOT xor-by-constant — that makes the next step's
            # ``ab = u ^ g`` collapse to a constant and rewrites the whole
            # CSA tree (the first probe run measured the xor variant 1.5x
            # SLOWER than vc, which is impossible for a true ALU-only
            # analogue: the fold had mangled the graph)
            u = g + jnp.uint32(1)
            d = g + jnp.uint32(0x9E3779B9)
        ab = u ^ g
        p0 = ab ^ d
        p1 = (u & g) | (ab & d)

        def lr(p):
            pw = _word_shift_concat(p, 1)
            nw = _word_shift_concat(p, -1)
            return (p << 1) | (pw >> 31), (p >> 1) | (nw << 31)

        p0l, p0r = lr(p0)
        p1l, p1r = lr(p1)
        return _count9_from_triples(p0l, p0, p0r, p1l, p1, p1r)

    def step(g, lane_shifts: bool):
        return _static_rule_fold(g, count9(g, lane_shifts), BIRTH, SURVIVE,
                                 count9=True)

    def kernel(steps_ref, grid_ref, out_ref):
        if variant in ("vc", "noshift"):
            lane = variant == "vc"
            out_ref[...] = jax.lax.fori_loop(
                0, steps_ref[0], lambda _, g: step(g, lane), grid_ref[...])
            return
        t2 = tile // 2
        a0, b0 = grid_ref[:t2], grid_ref[t2:]
        lane_b = variant == "split2"  # mix: stream B is the ALU filler

        def body(_, ab):
            a, b = ab
            return step(a, True), step(b, lane_b)

        a, b = jax.lax.fori_loop(0, steps_ref[0], body, (a0, b0))
        out_ref[:t2] = a
        out_ref[t2:] = b

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((inst, nwords, h), jnp.uint32),
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
        interpret=(pltpu.InterpretParams() if interpret else False),
    )
    return jax.jit(lambda steps, t: fn(steps.reshape(1), t))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--instances", type=int, default=4096)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--steps", type=int, default=2048)
    parser.add_argument("--tile", type=int, default=64)
    parser.add_argument("--repeats", type=int, default=7)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from carle_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from carle_tpu.utils.sync import device_sync

    inst, h = args.instances, args.size
    nwords = args.size // 32
    rng = np.random.RandomState(0)
    grid = jnp.asarray(
        rng.randint(0, 2**32, (inst, nwords, h), dtype=np.uint32))
    steps = jnp.asarray(args.steps, jnp.int32)
    cells = float(inst) * h * (nwords * 32) * args.steps

    results = {}
    interpret = jax.devices()[0].platform != "tpu"
    for variant in ("vc", "noshift", "split2", "mix"):
        fn = build(variant, inst, h, nwords, args.tile, interpret=interpret)
        out = fn(steps, grid)          # compile + warm
        device_sync(out)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            out = fn(steps, grid)
            device_sync(out)
            best = min(best, time.time() - t0)
        results[variant] = {"t": best, "cells_per_s": cells / best}
        print(json.dumps({"variant": variant, "t_s": best,
                          "cells_per_s": cells / best}), flush=True)

    t_vc, t_ns = results["vc"]["t"], results["noshift"]["t"]
    t_mix, t_s2 = results["mix"]["t"], results["split2"]["t"]
    summary = {
        "alu_only_vs_vc": t_vc / t_ns,           # crossbar share of a gen
        "split2_vs_vc": results["split2"]["cells_per_s"]
        / results["vc"]["cells_per_s"],
        "mix_additivity": t_mix / (0.5 * (t_vc + t_ns)),
        "interpretation": "additivity ~1 -> no crossbar/ALU overlap; "
                          "<1 -> overlap exists",
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
