"""VPU roofline for the packed CA kernels (VERDICT r2 item 2).

Two parts:

1. **Exact op schedules.** Each kernel step body is traced to a jaxpr and its
   per-word-per-generation ops are counted mechanically (so the count can
   never drift from the code) and bucketed: full-block VPU-ALU bitops,
   ±1 LANE shifts (crossbar), word/sublane shifts.  Scalar rule arithmetic
   and broadcasts are free (hoisted / scalar unit).

2. **Cost-model fit + ceiling.** With six kernel variants measured on the
   same v5e chip (static vc/v/h/cm, data vd/vc), the per-event costs
   t_alu, t_lane(concat), t_lane(dynamic rotate), t_sub are over-determined:
   least-squares fit t_word = N_alu*t_alu + N_lane*t_lane + N_sub*t_sub
   against the measured rates.  The fitted t_alu is then compared with the
   machine peak 1/(4096 * 1.5GHz) — v5e TensorCore: 4 MXUs of 128x128 at
   ~1.5 GHz (197e12 bf16 flops/s back-solves the clock), VPU (8,128) x 4
   ALUs = 4096 i32 lane-ops/cycle.  If the fitted t_alu matches the 4-issue
   peak, the ALUs are saturated and the only headroom is removing ops —
   the layout/schedule sweep (STATUS) already closed that.

Run anywhere (counts are trace-time; measurements are pinned v5e numbers):

  python scripts/vpu_roofline.py
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

ALU = {
    "and", "or", "xor", "not", "add", "sub", "mul",
    "shift_left", "shift_right_logical", "shift_right_arithmetic",
    "select_n", "ne", "eq",
}
FREE = {"broadcast_in_dim", "convert_element_type", "reshape", "constant",
        "squeeze", "transpose", "bitcast_convert_type", "slice", "jit",
        "pjit"}

# measured v5e rates (cells/s) per kernel variant — STATUS.md measured table
MEASURED = {
    "static_vc": 2.03e12,   # vertical-first, concat lane shifts
    "static_v": 1.90e12,    # same schedule, dynamic lane rotates (1.81-2.0)
    "static_h": 1.36e12,    # round-1 horizontal-pair schedule (8 rolls)
    "static_cm": 1.34e12,   # column-major (4 concat lane shifts)
    "data_vd": 1.60e12,     # n3-first XOR-mux fold (r4 re-stamp 1.600-1.606;
    #                         1.52-1.58 in its landing session)
    "data_vc": 1.35e12,     # select-mux fold (1.34-1.36)
}

# Two-stream variants: SAME per-word schedule as their single-chain base —
# the rate delta is pure Mosaic scheduling slack (independent dependency
# chains interleave crossbar and ALU issue), so they are reported against
# the base's ceiling but EXCLUDED from the per-event fit (identical rows
# with different rates would force the fit to absorb scheduling quality
# into per-event costs — the exact confound the overlap probe exposed).
MEASURED_TWO_STREAM = {
    "static_vc2": ("static_vc", 2.19e12),   # r4 default (2.187-2.229)
    "static_vc4": ("static_vc", 2.30e12),   # r5 ladder (2.275-2.326)
    "static_vc8": ("static_vc", 2.458e12),
    "static_vc16": ("static_vc", 2.53e12),  # r5 DEFAULT (2.52-2.533;
    #   vc32 2.543 ties — the multi-stream slack plateaus at ~16 chains)
    "data_vd2": ("data_vd", 1.6575e12),     # r4 tail (1.655-1.660)
    "data_vd4": ("data_vd", 1.733e12),
    "data_vd8": ("data_vd", 1.794e12),      # r5 DEFAULT (vd16 regresses
    #   to 1.74)
    "data_vd2_rulevec": ("data_vd", 1.593e12),  # per-instance rule VECTOR
    #   (18 masks hoisted per slice; final-code hw_smoke re-stamp)
    "data_vd8_rulevec": ("data_vd", 1.656e12),  # r5: the vector engine
    #   multi-streams too (mask slices cost no extra VMEM)
}
WORD = 32


def count_ops(fn, *args):
    """Count (alu, lane_moves, sub_moves) full-block ops in fn's jaxpr."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    c: Counter = Counter()
    lane = sub = 0

    def walk(jpr):
        nonlocal lane, sub
        for eqn in jpr.eqns:
            name = eqn.primitive.name
            out_aval = next(
                (v.aval for v in eqn.outvars if hasattr(v, "aval")), None
            )
            for p in eqn.params.values():
                if hasattr(p, "jaxpr"):
                    walk(p.jaxpr)
            if out_aval is None or out_aval.size < 1024:
                continue  # scalar/rule arithmetic: hoisted, not VPU issue
            if name == "concatenate":
                # one movement event per shift (the paired slices are free —
                # they address the same vreg read)
                if eqn.params["dimension"] == out_aval.ndim - 1:
                    lane += 1
                else:
                    sub += 1
            elif name in ALU:
                c[name] += 1
            elif name not in FREE:
                c["?" + name] += 1
    walk(jaxpr.jaxpr)
    unknown = {k: v for k, v in c.items() if k.startswith("?")}
    assert not unknown, f"unclassified full-block ops: {unknown}"
    return sum(c.values()), lane, sub


def main() -> int:
    import carle_tpu.ops.pallas_bitpack as mod

    # pltpu.roll cannot abstract-eval outside a kernel; patch to jnp.roll
    # (static shift -> same single movement event, emitted as concat)
    real_pltpu = mod.pltpu
    mod.pltpu = type("P", (), {"roll": staticmethod(
        lambda x, amt, axis: jnp.roll(x, -amt if False else amt, axis))})()

    g = jnp.zeros((64, 8, 256), dtype=jnp.uint32)       # [tile, W/32, H]
    g_cm = jnp.zeros((64, 8, 256), dtype=jnp.uint32)    # [tile, H/32, W]
    life = (frozenset({3}), frozenset({2, 3}))

    try:
        schedules = {
            # name: (alu, lane, sub, lane_kind)
            "static_vc": count_ops(
                lambda x: mod._static_step_block_vc(x, *life), g) + ("c",),
            "static_v": count_ops(
                lambda x: mod._static_step_block_v2(x, *life), g) + ("d",),
            "static_h": count_ops(
                lambda x: mod._static_step_block(x, *life), g) + ("d",),
            "static_cm": count_ops(
                lambda x: mod._static_step_block_cm(x, *life), g_cm) + ("c",),
            "data_vd": count_ops(
                lambda x: mod._bit_step_block_vd(x, jnp.int32(0)), g) + ("c",),
            "data_vc": count_ops(
                lambda x: mod._bit_step_block_v2(
                    x, jnp.int32(0), concat_lane=True), g) + ("c",),
        }
    finally:
        mod.pltpu = real_pltpu

    # --- least-squares fit: t_word = alu*t_a + lane*t_lc|t_ld + sub*t_s ----
    names = list(schedules)
    A, b = [], []
    for n in names:
        alu, lane, sub, kind = schedules[n]
        t_word_ps = 1e12 * WORD / MEASURED[n]  # ps per word-generation
        A.append([alu,
                  lane if kind == "c" else 0,
                  lane if kind == "d" else 0,
                  sub])
        b.append(t_word_ps)
    A, b = np.asarray(A, float), np.asarray(b, float)
    (t_a, t_lc, t_ld, t_s), res, *_ = np.linalg.lstsq(A, b, rcond=None)
    pred = A @ np.asarray([t_a, t_lc, t_ld, t_s])

    CLOCK = 1.5e9
    ALU_WORDS = 8 * 128 * 4
    t_a_peak = 1e12 / (ALU_WORDS * CLOCK)  # ps/word at 4-issue peak

    out = {"schedules": {}, "fit_ps": {
        "t_alu": t_a, "t_lane_concat": t_lc, "t_lane_dynrot": t_ld,
        "t_sublane": t_s,
        "t_alu_peak_4issue": t_a_peak,
        "alu_issue_utilization": t_a_peak / t_a if t_a > 0 else None,
    }}
    for i, n in enumerate(names):
        alu, lane, sub, kind = schedules[n]
        ceiling_alu_only = WORD * ALU_WORDS * CLOCK / alu
        out["schedules"][n] = {
            "alu_ops": alu, "lane_shifts": lane, "sublane_shifts": sub,
            "lane_kind": {"c": "concat", "d": "dynamic-rotate"}[kind],
            "measured_cells_per_s": MEASURED[n],
            "alu_only_ceiling_cells_per_s": ceiling_alu_only,
            "fraction_of_alu_only": MEASURED[n] / ceiling_alu_only,
            "t_word_measured_ps": float(b[i]),
            "t_word_fit_ps": float(pred[i]),
            "fit_residual_pct": float(100 * (pred[i] - b[i]) / b[i]),
        }
    # two-stream rows: base schedule's counts/ceiling, measured rate, and
    # the scheduling-slack gain over the single chain
    for n, (base, rate) in MEASURED_TWO_STREAM.items():
        alu, lane, sub, kind = schedules[base]
        ceiling_alu_only = WORD * ALU_WORDS * CLOCK / alu
        out["schedules"][n] = {
            "alu_ops": alu, "lane_shifts": lane, "sublane_shifts": sub,
            "lane_kind": {"c": "concat", "d": "dynamic-rotate"}[kind],
            "streams": (int(n.rsplit("vc", 1)[-1].rsplit("vd", 1)[-1])
                        if n[-1].isdigit() else 2),
            "base": base, "fit_excluded": True,
            "measured_cells_per_s": rate,
            "alu_only_ceiling_cells_per_s": ceiling_alu_only,
            "fraction_of_alu_only": rate / ceiling_alu_only,
            "gain_over_single_chain": rate / MEASURED[base],
        }
    out["machine_model"] = {
        "clock_hz": CLOCK, "alu_words_per_cycle": ALU_WORDS,
        "note": "v5e: 4 MXU x 128x128 x 2 x clock = 197e12 -> clock 1.5GHz; "
                "VPU (8,128) x 4 ALUs",
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
