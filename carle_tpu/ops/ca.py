"""Life-like CA update — XLA implementation.

The reference computes the Moore-neighbourhood sum with a float32 3x3
``nn.Conv2d`` in 'circular' padding mode and applies rules by folding
``count == digit`` comparisons over Python digit lists (env.py:219-227).
Neighbour counts of a binary grid are exact small integers, so integer
semantics are identical; here the whole update is integer arithmetic on
uint8 grids:

  * the neighbour sum is separable — 3 row-shifted adds then 3 column-shifted
    adds minus the centre (6 circular rolls instead of 8), with circular
    rolls giving the torus topology for free;
  * the birth/survive decision is one shift of an 18-bit rule mask:
    ``(rule_bits >> (count + 9*alive)) & 1`` (see rules.py for the layout),
    so rules are data and rule changes never retrace.

Everything here is shape-polymorphic over leading batch dims and fuses into
a handful of VPU ops under jit; the Pallas kernel in pallas_ca.py implements
the same function tiled through VMEM for the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import EnvConfig


def neighbor_counts(grid: jax.Array) -> jax.Array:
    """Count live Moore neighbours of each cell on a torus.

    ``grid`` is uint8 (0/1) with shape [..., H, W]; returns uint8 counts 0-8.
    Separable form: 6 rolls + 5 adds instead of 8 rolls + 7 adds.
    """
    rows = grid + jnp.roll(grid, 1, axis=-2) + jnp.roll(grid, -1, axis=-2)
    return rows + jnp.roll(rows, 1, axis=-1) + jnp.roll(rows, -1, axis=-1) - grid


def apply_rule(grid: jax.Array, counts: jax.Array, rule_bits: jax.Array) -> jax.Array:
    """Next cell state from the packed 18-bit rule mask.

    ``rule_bits`` is a traced int32/uint32 — either a scalar (one rule for
    the whole batch) or shape [instances] (PER-INSTANCE rulesets, a
    beyond-reference capability: e.g. the whole eval battery as one batch);
    bit ``count`` governs birth and bit ``9 + count`` survival
    (rules.py:pack_rule_bits).
    """
    idx = counts.astype(jnp.int32) + 9 * grid.astype(jnp.int32)
    bits = jnp.asarray(rule_bits, dtype=jnp.int32)
    if bits.ndim == 1:
        # the vector applies along DIMENSION 0 of the grid — check it, or a
        # [T, inst, H, W] trajectory with T == inst would silently apply
        # rule[t] to all instances at step t
        if bits.shape[0] != grid.shape[0]:
            raise ValueError(
                f"per-instance rule vector of length {bits.shape[0]} must "
                f"match grid dimension 0 ({grid.shape[0]}) — the vector "
                "applies along dim 0"
            )
        bits = bits.reshape(bits.shape[0], *([1] * (grid.ndim - 1)))
    return ((bits >> idx) & 1).astype(jnp.uint8)


def ca_step_grid(grid: jax.Array, rule_bits: jax.Array) -> jax.Array:
    """One CA generation: neighbour count + rule table, torus boundary."""
    return apply_rule(grid, neighbor_counts(grid), rule_bits)


def is_tpu_platform() -> bool:
    """True when device 0 runs Mosaic kernels natively.  The tunneled chip
    can report its platform as "axon" rather than "tpu" (plugin-dependent),
    so every TPU gate in the package must go through this helper — a bare
    ``platform == "tpu"`` check silently routes axon devices onto CPU
    fallbacks."""
    return jax.devices()[0].platform in ("tpu", "axon")


def resolve_backend(backend: str) -> str:
    """Resolve the EnvConfig.backend selector ("auto" -> platform choice)."""
    if backend != "auto":
        return backend
    return "pallas" if is_tpu_platform() else "xla"


def ca_step_with_action(
    grid: jax.Array, action: jax.Array, rule_bits: jax.Array, config: EnvConfig
) -> jax.Array:
    """Toggle (XOR the centred action window) + one CA generation, dispatched
    to the configured backend.  The pallas path fuses the XOR into the kernel
    (ops/pallas_ca.py); the XLA path pads and XORs explicitly."""
    if resolve_backend(config.backend) == "pallas":
        from .pallas_ca import ca_step_pallas

        return ca_step_pallas(grid, action, rule_bits, config=config)
    return ca_step_grid(grid ^ pad_action(action, config), rule_bits)


def pad_action(action: jax.Array, config: EnvConfig) -> jax.Array:
    """Zero-pad an [inst, AH, AW] action patch into the centred action window
    of a full [inst, H, W] grid (reference: set_action_padding, env.py:119-132;
    floor-centred with the extra row/column below/right)."""
    r0 = config.action_row_offset
    c0 = config.action_col_offset
    ah = config.eff_action_height
    aw = config.eff_action_width
    pad_rows = (r0, config.height - r0 - ah)
    pad_cols = (c0, config.width - c0 - aw)
    return jnp.pad(action, ((0, 0), pad_rows, pad_cols))
