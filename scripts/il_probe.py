"""Instance-lanes layout probe for the static bit-packed kernel.

Hypothesis from the cm negative result: LANE-axis data movement is the
expensive operation (cm added 2 lane shifts and lost 1.4x; vc pays 2).
Layout [W/32, H, inst] puts the INSTANCE batch on lanes — instances are
independent, so NOTHING ever moves across lanes: vertical neighbours are
sublane concat shifts, horizontal word spreads are axis-0 moves between
whole vregs.  If lane movement is the cost, this wins big.

One JSON line per (lane_tile) config; compare against the vc number from
the same session (bench.py).
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

from carle_tpu.ops.bitpack import pack_grid, _fold_tree
from carle_tpu.ops import pallas_bitpack as pb
from carle_tpu.utils.cache import enable_compilation_cache

LIFE_B = frozenset({3})
LIFE_S = frozenset({2, 3})


def _sub_shift(x, amount):
    """Torus shift along the sublane (-2) axis as slice+concat."""
    if amount == 1:
        return jnp.concatenate([x[..., -1:, :], x[..., :-1, :]], axis=-2)
    return jnp.concatenate([x[..., 1:, :], x[..., :1, :]], axis=-2)


def _word_shift0(x, amount):
    """Torus shift along the leading word axis (whole-vreg moves)."""
    if amount == 1:
        return jnp.concatenate([x[-1:], x[:-1]], axis=0)
    return jnp.concatenate([x[1:], x[:1]], axis=0)


def _step_il(g):
    """[W/32, H, L] block: zero lane movement."""
    u = _sub_shift(g, 1)             # row r-1 at position r
    d = _sub_shift(g, -1)
    ab = u ^ g
    p0 = ab ^ d
    p1 = (u & g) | (ab & d)

    def lr(p):
        pw = _word_shift0(p, 1)
        nw = _word_shift0(p, -1)
        return (p << 1) | (pw >> 31), (p >> 1) | (nw << 31)

    p0l, p0r = lr(p0)
    p1l, p1r = lr(p1)
    n0, n1, n2, n3 = pb._count9_from_triples(p0l, p0, p0r, p1l, p1, p1r)

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


def _kernel(steps_ref, grid_ref, out_ref):
    out_ref[...] = jax.lax.fori_loop(
        0, steps_ref[0], lambda _, g: _step_il(g), grid_ref[...]
    )


@functools.partial(jax.jit, static_argnames=("lane_tile",))
def run(packed, num_steps, lane_tile):
    inst, h, nwords = packed.shape
    t = packed.transpose(2, 1, 0)    # [W/32, H, inst]
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(t.shape, jnp.uint32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(inst // lane_tile,),
            in_specs=[pl.BlockSpec((nwords, h, lane_tile),
                                   lambda i, *_: (0, 0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((nwords, h, lane_tile),
                                   lambda i, *_: (0, 0, i),
                                   memory_space=pltpu.VMEM),
        ),
    )(jnp.asarray(num_steps, jnp.int32).reshape(1), t)
    return out.transpose(2, 1, 0)


from carle_tpu.utils.sync import device_sync as _sync  # true axon barrier


def main():
    enable_compilation_cache()
    inst, size = 4096, 256
    steps_per_launch, launches = 128, 8
    grid = jax.random.bernoulli(
        jax.random.PRNGKey(0), 0.3, (inst, size, size)).astype(jnp.uint8)
    packed = pack_grid(grid)
    steps = jnp.asarray(steps_per_launch, jnp.int32)
    cells = inst * size * size * steps_per_launch * launches

    # correctness vs the XLA engine first (3 generations, small slice)
    from carle_tpu.ops.bitpack import bit_multi_step_static, unpack_grid
    small = packed[:256]
    ref = unpack_grid(bit_multi_step_static(small, (3,), (2, 3), 3), size)
    out = unpack_grid(run(small, jnp.asarray(3, jnp.int32), 128), size)
    import numpy as np
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    print(json.dumps({"parity": "ok"}), flush=True)

    for lane_tile in (128, 256, 512):
        _sync(run(packed, steps, lane_tile))
        t0 = time.perf_counter()
        p = packed
        for _ in range(launches):
            p = run(p, steps, lane_tile)
        _sync(p)
        dt = time.perf_counter() - t0
        print(json.dumps({"lane_tile": lane_tile, "cells_per_s": cells / dt,
                          "dt": dt}), flush=True)


if __name__ == "__main__":
    main()
