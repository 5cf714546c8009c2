"""Pin the kernel op schedules the VPU roofline (docs/DESIGN.md §3) counts.

If a kernel edit changes its per-word-per-generation schedule, this fails —
update scripts/vpu_roofline.py's analysis and the DESIGN table together.
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def _counts(fn, g):
    import vpu_roofline

    return vpu_roofline.count_ops(fn, g)


def test_kernel_op_schedules_pinned():
    import carle_tpu.ops.pallas_bitpack as mod

    real = mod.pltpu
    mod.pltpu = type("P", (), {"roll": staticmethod(
        lambda x, amt, axis: jnp.roll(x, amt, axis))})()
    try:
        g = jnp.zeros((64, 8, 256), dtype=jnp.uint32)
        life = (frozenset({3}), frozenset({2, 3}))
        assert _counts(
            lambda x: mod._static_step_block_vc(x, *life), g
        ) == (50, 2, 4)  # ALU bitops, lane shifts, sublane shifts
        assert _counts(
            lambda x: mod._bit_step_block_vd(x, jnp.int32(0)), g
        ) == (86, 2, 4)
    finally:
        mod.pltpu = real
