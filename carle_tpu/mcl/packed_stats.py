"""Packed-native statistic wrappers — popcounts instead of cell unpacking.

Speed/Puffer/Corner consume only *reductions* of the universe (live counts,
index-weighted sums, masked sums — reference mcl.py:730-799, 804-853,
197-231).  On the packed stacks (parallel/packed_env.py) those reductions
can be computed directly on the uint32 words with `lax.population_count`,
never materialising the float32 cell observation:

* live count          = popcount(g)
* masked count        = popcount(g & mask_words)
* row-weighted sum    = sum_r r * rowcount_r
* column-weighted sum = 32 * sum_w w * popcount(word_w)
                        + sum_k 2^k * popcount(g & M_k)
  where M_k has bit b set iff bit k of b is set (M_0 = 0xAAAAAAAA,
  M_1 = 0xCCCCCCCC, ... M_4 = 0xFFFF0000) — the bit-index binary expansion,
  5 masked popcounts for any word width.

The popcounts themselves are integer-exact; the f32 weighted sums are
exact through ~4096² geometries (products < 2^24) and correctly rounded
above — in every case at least as accurate as the dense f32 path, which
sums the same magnitudes from individual cells (parity is tested to float
tolerance).  When a packed stack's wrapper list is entirely
packed-native, nothing consumes ``ctx.obs`` and XLA dead-code-eliminates
the unpack from the compiled step — the wrapped env then runs at packed
rates (measured at 8192²: see STATUS).

These defs require a packed stack (``ctx.packed`` is None on the uint8
path — they raise at trace time with a clear error).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig
from ..ops.bitpack import WORD, pack_grid
from .base import StepCtx, WrapperDef, default_on_reset
from .corner import _build_masks


def _pack_mask(mask: np.ndarray) -> jnp.ndarray:
    """bool/0-1 [H, W] -> uint32 [H, W/32] (same bit layout as pack_grid)."""
    return pack_grid(jnp.asarray(mask[None] != 0, dtype=jnp.uint8))[0]


_BIT_MASKS = tuple(
    int(sum(1 << b for b in range(WORD) if (b >> k) & 1))
    for k in range(5)  # 0xAAAAAAAA, 0xCCCCCCCC, 0xF0F0F0F0, 0xFF00FF00, 0xFFFF0000
)


def _pc(x: jax.Array) -> jax.Array:
    return jax.lax.population_count(x)


def _require_packed(ctx: StepCtx) -> jax.Array:
    if ctx.packed is None:
        raise ValueError(
            "packed-native stat wrappers need a packed stack "
            "(parallel/packed_env.PackedSpatialStack) — ctx.packed is None "
            "on the uint8 path; use the dense defs there"
        )
    return ctx.packed


def _live_count(g: jax.Array) -> jax.Array:
    """Total live cells per instance, integer-exact.  [inst, H, W/32] -> f32
    [inst]."""
    return jnp.sum(_pc(g), axis=(1, 2)).astype(jnp.float32)


def _row_weighted(g: jax.Array) -> jax.Array:
    """sum_cells row_index, per instance (f32 [inst]).

    Elementwise multiply + sum, NOT a matmul: a dot_general at default
    precision runs ONE bf16 pass on TPU (CLAUDE.md), which would shave the
    integer row counts/indices to 8-bit mantissas.  The f32 products here
    are exact whenever count*index < 2^24 (through ~4096² geometries) and
    correctly rounded above — never worse than the dense f32 path."""
    rows = jnp.sum(_pc(g), axis=2).astype(jnp.float32)       # [inst, H]
    r = jnp.arange(g.shape[1], dtype=jnp.float32)
    return jnp.sum(rows * r[None, :], axis=1)


def _col_weighted(g: jax.Array) -> jax.Array:
    """sum_cells column_index, per instance (f32 [inst]).  Same
    no-matmul rule as :func:`_row_weighted`."""
    words = jnp.sum(_pc(g), axis=1).astype(jnp.float32)      # [inst, W/32]
    w = WORD * jnp.arange(g.shape[2], dtype=jnp.float32)
    total = jnp.sum(words * w[None, :], axis=1)
    for k, m in enumerate(_BIT_MASKS):
        total = total + float(1 << k) * jnp.sum(
            _pc(g & jnp.uint32(m)), axis=(1, 2)
        ).astype(jnp.float32)
    return total


def speed_def_packed(
    config: EnvConfig,
    reward_scale: float = 1.0,
    per_instance: bool = False,
    **kwargs: Any,
) -> WrapperDef:
    """SpeedDetector on packed words (semantics of mcl/speed.py:speed_def:
    action-window-masked CoM numerators, unmasked denominator, first step
    records only).  State shape matches :class:`SpeedState` (the weight
    planes are replaced by the packed exclusion mask)."""
    h, w = config.height, config.width
    excl = np.ones((h, w), dtype=np.uint8)
    r0, c0 = config.action_row_offset, config.action_col_offset
    excl[r0: r0 + config.eff_action_height,
         c0: c0 + config.eff_action_width] = 0

    class PackedSpeedState(NamedTuple):
        reward_scale: jax.Array
        center_of_mass: jax.Array  # f32 [2, instances]
        has_com: jax.Array
        excl_words: jax.Array      # uint32 [H, W/32] action-window complement

    def init(key: jax.Array) -> PackedSpeedState:
        return PackedSpeedState(
            reward_scale=jnp.asarray(reward_scale, dtype=jnp.float32),
            center_of_mass=jnp.zeros((2, config.instances), jnp.float32),
            has_com=jnp.asarray(False),
            excl_words=_pack_mask(excl),
        )

    def apply(state, ctx: StepCtx, reward: jax.Array):
        g = _require_packed(ctx)
        mg = g & state.excl_words[None]
        live = _live_count(g)                      # unmasked denominator
        com_h = _row_weighted(mg) / (live + 1e-7)
        com_w = _col_weighted(mg) / (live + 1e-7)
        com = jnp.stack([com_h, com_w])

        velocity = state.center_of_mass - com
        if per_instance:
            speed = jnp.sqrt(jnp.sum(velocity**2, axis=0))[:, None]
        else:
            speed = jnp.sqrt(jnp.sum(velocity**2))
        new_reward = jnp.where(state.has_com, reward + speed, reward)
        return (
            state._replace(center_of_mass=com, has_com=jnp.asarray(True)),
            new_reward,
        )

    return WrapperDef(
        name="SpeedDetector(packed)", init=init, apply=apply,
        on_reset=default_on_reset,
    )


def puffer_def_packed(
    config: EnvConfig,
    reward_scale: float = 1.0,
    growth_threshold: int = 512,
    per_instance: bool = False,
    **kwargs: Any,
) -> WrapperDef:
    """PufferDetector on packed words: the live-cell count feeding the
    sliding window comes from popcounts; the ring-buffer / slope /
    toggle-clear semantics are mcl/puffer.py's ONE implementation (the
    ``cells_fn`` hook)."""
    from .puffer import puffer_def

    dense = puffer_def(
        config, reward_scale, growth_threshold, per_instance,
        cells_fn=lambda ctx: _live_count(_require_packed(ctx)), **kwargs
    )
    return dense._replace(name="PufferDetector(packed)")


def corner_def_packed(
    config: EnvConfig, reward_scale: float = 1.0, **kwargs: Any
) -> WrapperDef:
    """CornerBonus on packed words: bonus = popcount(g & plus) -
    popcount(g & minus), integer-exact (mask values are +1/0/-1)."""
    mask = _build_masks(config.height, config.width)

    class PackedCornerState(NamedTuple):
        reward_scale: jax.Array
        plus_words: jax.Array   # uint32 [H, W/32]
        minus_words: jax.Array  # uint32 [H, W/32]

    def init(key: jax.Array) -> PackedCornerState:
        return PackedCornerState(
            reward_scale=jnp.asarray(reward_scale, dtype=jnp.float32),
            plus_words=_pack_mask(mask > 0),
            minus_words=_pack_mask(mask < 0),
        )

    def apply(state, ctx: StepCtx, reward: jax.Array):
        g = _require_packed(ctx)
        plus = _live_count(g & state.plus_words[None])
        minus = _live_count(g & state.minus_words[None])
        bonus = (plus - minus)[:, None]
        return state, reward + state.reward_scale * bonus

    return WrapperDef(
        name="CornerBonus(packed)", init=init, apply=apply,
        on_reset=default_on_reset,
    )
