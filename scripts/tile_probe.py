"""Tile-size probe for the static bit-packed kernel (vc scheme).

At the default 8 MB VMEM budget the instance tile is 64, so every live
bit-plane is a [64, 8, 256] array — ~128 vregs — and ~10 planes are live at
once: far beyond the register file.  If Mosaic spills intermediates to
VMEM, the kernel is VMEM-bandwidth-bound and SMALLER tiles (fewer live
vregs) could win.  One JSON line per tile size.
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
from carle_tpu.ops.bitpack import pack_grid
from carle_tpu.utils.cache import enable_compilation_cache


def _kernel(steps_ref, grid_ref, out_ref):
    out_ref[...] = jax.lax.fori_loop(
        0, steps_ref[0],
        lambda _, g: pb._static_step_block_vc(g, frozenset({3}),
                                              frozenset({2, 3})),
        grid_ref[...],
    )


@functools.partial(jax.jit, static_argnames=("tile",))
def run(packed, num_steps, tile):
    inst, h, nwords = packed.shape
    t = packed.transpose(0, 2, 1)
    out = pl.pallas_call(
        _kernel,
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
    grid = jax.random.bernoulli(
        jax.random.PRNGKey(0), 0.3, (inst, size, size)).astype(jnp.uint8)
    packed = pack_grid(grid)
    steps = jnp.asarray(steps_per_launch, jnp.int32)
    cells = inst * size * size * steps_per_launch * launches

    for tile in (1, 2, 4, 8, 16, 32, 64, 128, 256):
        # tile=256 is a known scoped-VMEM OOM (17.9M > 16M: in+out blocks
        # plus the live-plane stack must fit) — report the failure as data
        # instead of crashing the sweep on its last config
        try:
            _sync(run(packed, steps, tile))
            t0 = time.perf_counter()
            p = packed
            for _ in range(launches):
                p = run(p, steps, tile)
            _sync(p)
            dt = time.perf_counter() - t0
            print(json.dumps({"tile": tile, "cells_per_s": cells / dt,
                              "dt": dt}), flush=True)
        except Exception as e:  # Mosaic compile errors (VMEM budget etc.)
            msg = (str(e).splitlines() or [type(e).__name__])[0][:200]
            print(json.dumps({"tile": tile, "error": msg}), flush=True)


if __name__ == "__main__":
    main()
