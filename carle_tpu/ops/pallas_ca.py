"""Fused Pallas TPU kernels for the CA hot loop.

Two kernels behind the same math as ops/ca.py (parity-tested against it):

* :func:`ca_step_pallas` — one generation, fused action-XOR + neighbour sum +
  rule lookup.  Grids are tiled over instances; each block holds a slab of
  whole [H, W] universes in VMEM, so HBM traffic is exactly one uint8 read and
  one uint8 write per cell per step (the XLA path materializes intermediates
  unless fusion wins; this makes the fusion structural).
* :func:`ca_multi_step_pallas` — K generations per kernel launch with the grid
  resident in VMEM throughout: HBM traffic amortizes to 2/K bytes per cell per
  generation, moving the kernel from bandwidth- to VPU-bound.  Used by the
  action-free inner segments of rollouts and by the benchmark.

The torus boundary uses ``pltpu.roll`` (circular lane/sublane shifts), so no
halo handling is needed on-chip; cross-chip spatial sharding does halos with
collectives instead (parallel/spatial.py).

Why no MXU: the Moore sum could be written as a 3x3 conv, but a 9-tap conv on
a 1-channel uint8 grid wastes a 128x128 systolic array (ratio of useful
contraction depth 9/128); the separable roll-sum on the VPU is strictly less
work and keeps everything in integer dtypes.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EnvConfig


def _neighbor_rule(g: jax.Array, rule_bits: jax.Array) -> jax.Array:
    """Separable Moore sum + 18-bit rule shift on one [..., H, W] uint8 block.

    Mosaic vector arithmetic supports only i16/i32 lanes, so the block is
    upcast to int32 for the sums (HBM traffic stays uint8; the upcast lives
    in VMEM/registers).  ``pltpu.roll`` requires non-negative shifts, so the
    -1 circular shift is expressed as size-1 (identical on a ring)."""
    h, w = g.shape[-2], g.shape[-1]
    ax_h, ax_w = g.ndim - 2, g.ndim - 1
    gi = g.astype(jnp.int32)
    rows = gi + pltpu.roll(gi, 1, ax_h) + pltpu.roll(gi, h - 1, ax_h)
    counts = (
        rows + pltpu.roll(rows, 1, ax_w) + pltpu.roll(rows, w - 1, ax_w) - gi
    )
    idx = counts + 9 * gi
    return ((rule_bits >> idx) & 1).astype(jnp.uint8)


def _step_kernel(rule_ref, grid_ref, action_ref, out_ref):
    """Action arrives pre-padded to full [tile, H, W] (Mosaic has no
    dynamic_slice lowering; a plain XOR fuses with the stencil anyway)."""
    out_ref[...] = _neighbor_rule(
        grid_ref[...] ^ action_ref[...], rule_ref[0]
    )


def _step_kernel_vec(grid_ref, action_ref, rule_ref, out_ref):
    """Per-instance rules: ``rule_ref`` is a [tile, 1, 1] VMEM block that
    broadcasts against the [tile, H, W] rule-index plane inside
    :func:`_neighbor_rule` — different universes in one batch can run
    different rulesets at full kernel speed (e.g. the whole eval battery
    as one launch)."""
    out_ref[...] = _neighbor_rule(
        grid_ref[...] ^ action_ref[...], rule_ref[...]
    )


def _multi_step_kernel(rule_ref, steps_ref, grid_ref, out_ref):
    def body(_, g):
        return _neighbor_rule(g, rule_ref[0])

    out_ref[...] = jax.lax.fori_loop(0, steps_ref[0], body, grid_ref[...])


def _multi_step_kernel_vec(steps_ref, grid_ref, rule_ref, out_ref):
    rules = rule_ref[...]

    def body(_, g):
        return _neighbor_rule(g, rules)

    out_ref[...] = jax.lax.fori_loop(0, steps_ref[0], body, grid_ref[...])


def _instance_tile(instances: int, h: int, w: int, budget_bytes: int = 6 * 2**20) -> int:
    """Pick an instance-slab size whose working set fits VMEM.

    Arithmetic runs in int32 (Mosaic lane constraint): ~4 int32 live buffers
    (gi, rows, counts/idx, shifted temp) + uint8 in/out per cell."""
    from .tiling import largest_divisor_tile

    return largest_divisor_tile(instances, h * w * (4 * 4 + 2), budget_bytes)


@functools.partial(jax.jit, static_argnames=("config",))
def ca_step_pallas(
    grid: jax.Array, action: jax.Array, rule_bits: jax.Array, *, config: EnvConfig
) -> jax.Array:
    """One fused CA generation with the action XOR'd into the centred window.

    grid:   uint8 [instances, H, W]
    action: uint8 [instances, AH, AW]

    ``rule_bits`` may be a scalar (one rule per launch, SMEM-prefetched) or
    an [instances] vector (per-instance rulesets: the vector rides along as
    a [tile, 1, 1] VMEM block and broadcasts inside the kernel).
    """
    from .ca import pad_action

    inst, h, w = grid.shape
    tile = _instance_tile(inst, h, w)
    action_full = pad_action(action, config)
    rb = jnp.asarray(rule_bits, jnp.int32)
    if rb.ndim == 1:
        return pl.pallas_call(
            _step_kernel_vec,
            out_shape=jax.ShapeDtypeStruct(grid.shape, jnp.uint8),
            grid=(inst // tile,),
            in_specs=[
                pl.BlockSpec((tile, h, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, h, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, h, w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(grid, action_full, rb.reshape(inst, 1, 1))
    return pl.pallas_call(
        _step_kernel,
        out_shape=jax.ShapeDtypeStruct(grid.shape, jnp.uint8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(inst // tile,),
            in_specs=[
                pl.BlockSpec((tile, h, w), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, h, w), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, h, w), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(jnp.asarray(rule_bits, jnp.int32).reshape(1), grid, action_full)


@jax.jit
def ca_multi_step_pallas(
    grid: jax.Array, rule_bits: jax.Array, num_steps: jax.Array
) -> jax.Array:
    """``num_steps`` action-free generations with the grid VMEM-resident.

    ``rule_bits`` scalar or [instances] vector (per-instance rulesets)."""
    inst, h, w = grid.shape
    tile = _instance_tile(inst, h, w)
    rb = jnp.asarray(rule_bits, jnp.int32)
    if rb.ndim == 1:
        return pl.pallas_call(
            _multi_step_kernel_vec,
            out_shape=jax.ShapeDtypeStruct(grid.shape, jnp.uint8),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(inst // tile,),
                in_specs=[
                    pl.BlockSpec((tile, h, w), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, 1, 1), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tile, h, w), lambda i, *_: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
        )(
            jnp.asarray(num_steps, jnp.int32).reshape(1),
            grid,
            rb.reshape(inst, 1, 1),
        )
    return pl.pallas_call(
        _multi_step_kernel,
        out_shape=jax.ShapeDtypeStruct(grid.shape, jnp.uint8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(inst // tile,),
            in_specs=[
                pl.BlockSpec((tile, h, w), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, h, w), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(
        jnp.asarray(rule_bits, jnp.int32).reshape(1),
        jnp.asarray(num_steps, jnp.int32).reshape(1),
        grid,
    )
