"""Packed-state environment core — universes stored 32 cells per word.

The north-star scale config (BASELINE.md: 65k envs of 512x512 across hosts)
needs 17 GB per copy as uint8 grids but 2.1 GB packed — and XLA wants ~2-3
live copies during a scan.  This module keeps the environment state packed
END TO END: toggles XOR into packed words, the CA update runs the bit-sliced
engine (ops/bitpack.py), and observations unpack lazily only when something
(a bonus network, a logger) actually consumes cells.

Trajectory-parity with the uint8 core is bit-exact (tests/test_packed.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .config import EnvConfig
from .env import EnvState
from .ops.bitpack import WORD, bit_ca_step, bit_multi_step, pack_grid, unpack_grid
from .ops.ca import pad_action


class PackedEnvState(NamedTuple):
    """Environment state with the universe packed [inst, H, W//32] uint32."""

    grid: jax.Array                # uint32 [instances, H, W//32]
    rule_bits: jax.Array           # int32 scalar
    step_num: jax.Array            # int32 scalar
    steps_since_action: jax.Array  # int32 scalar


def init_packed_state(config: EnvConfig, rule_bits: int) -> PackedEnvState:
    assert config.width % WORD == 0, (
        f"packed core needs width % {WORD} == 0, got {config.width}"
    )
    return PackedEnvState(
        grid=jnp.zeros(
            (config.instances, config.height, config.width // WORD),
            dtype=jnp.uint32,
        ),
        rule_bits=jnp.asarray(rule_bits, dtype=jnp.int32),
        step_num=jnp.asarray(0, dtype=jnp.int32),
        steps_since_action=jnp.asarray(0, dtype=jnp.int32),
    )


def pack_state(state: EnvState) -> PackedEnvState:
    return PackedEnvState(
        grid=pack_grid(state.grid),
        rule_bits=state.rule_bits,
        step_num=state.step_num,
        steps_since_action=state.steps_since_action,
    )


def unpack_state(state: PackedEnvState, config: EnvConfig) -> EnvState:
    return EnvState(
        grid=unpack_grid(state.grid, config.width),
        rule_bits=state.rule_bits,
        step_num=state.step_num,
        steps_since_action=state.steps_since_action,
    )


def observe(state: PackedEnvState, config: EnvConfig) -> jax.Array:
    """Lazy observation: unpack to float32 [inst, 1, H, W] only on demand."""
    return unpack_grid(state.grid, config.width).astype(jnp.float32)[:, None]


def pack_action(action_bits: jax.Array, config: EnvConfig) -> jax.Array:
    """[inst, AH, AW] toggle patch -> uint32 [inst, H, W//32] with the patch
    packed into the centred action window.

    Packs ONLY the window's words (word-aligning the column offset with a
    lead pad) and writes them into a packed-size zeros plane — O(cells/32)
    instead of the O(cells) of ``pack_grid(pad_action(...))``, which
    materialised a full uint8 universe per step just to carry a 64x64
    patch."""
    inst, ah, aw = action_bits.shape
    # fail as loudly as the pack_grid(pad_action(...)) path this replaces:
    # a wrong-sized patch would otherwise be silently anchored at the
    # window origin instead of centred
    assert (ah, aw) == (config.eff_action_height, config.eff_action_width), (
        f"action patch is {ah}x{aw}, config window is "
        f"{config.eff_action_height}x{config.eff_action_width}"
    )
    r0 = config.action_row_offset
    c0 = config.action_col_offset
    w0 = c0 // WORD
    lead = c0 - w0 * WORD
    nw = -(-(lead + aw) // WORD)  # ceil
    patch = jnp.pad(
        action_bits.astype(jnp.uint8),
        ((0, 0), (0, 0), (lead, nw * WORD - lead - aw)),
    )
    words = pack_grid(patch)  # [inst, AH, nw]
    out = jnp.zeros((inst, config.height, config.width // WORD),
                    dtype=jnp.uint32)
    return out.at[:, r0: r0 + ah, w0: w0 + nw].set(words)


def packed_env_step(
    state: PackedEnvState, action: jax.Array, *, config: EnvConfig
) -> Tuple[PackedEnvState, jax.Array]:
    """Pure transition on packed state (mirrors env.env_step semantics:
    XOR toggle, batch-global master reset on all-ones, CA update).

    ``action`` is [instances, AH, AW]; the returned observation is the PACKED
    grid — call :func:`observe` for cells.
    """
    action_bits = (action != 0).astype(jnp.uint8)
    action_packed = pack_action(action_bits, config)

    # reference env.py:208 semantics: reset iff mean of the VALUES == 1.0
    do_reset = jnp.mean(action.astype(jnp.float32)) == 1.0
    any_action = jnp.any(action_bits != 0)

    toggled = state.grid ^ action_packed
    stepped = bit_ca_step(toggled, state.rule_bits)

    new_grid = jnp.where(do_reset, jnp.zeros_like(stepped), stepped)
    new_step = jnp.where(do_reset, 0, state.step_num + 1).astype(jnp.int32)
    new_ssa = jnp.where(
        do_reset, 0, state.steps_since_action + jnp.where(any_action, 0, 1)
    ).astype(jnp.int32)
    return (
        PackedEnvState(
            grid=new_grid,
            rule_bits=state.rule_bits,
            step_num=new_step,
            steps_since_action=new_ssa,
        ),
        new_grid,
    )


def packed_multi_step(
    state: PackedEnvState, num_steps: int, *, config: EnvConfig
) -> PackedEnvState:
    """``num_steps`` action-free generations, state packed throughout.

    On TPU ("auto"/"pallas" backends) this is a single VMEM-resident kernel
    launch with NO pack/unpack at all — the 1.5e12 cell-updates/s path
    applied directly to the persistent state."""
    from .ops.ca import resolve_backend

    if resolve_backend(config.backend) in ("pallas", "bitpack-pallas"):
        from .ops.pallas_bitpack import bit_multi_step_pallas

        grid = bit_multi_step_pallas(
            state.grid, state.rule_bits, jnp.asarray(num_steps, jnp.int32)
        )
    else:
        grid = bit_multi_step(state.grid, state.rule_bits, num_steps)
    return state._replace(grid=grid, step_num=state.step_num + num_steps)
