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


def parsimony_def_packed(**kwargs: Any) -> WrapperDef:
    """ParsimonyBonus is ALREADY packed-native: it consumes only
    ``ctx.action_sum`` (the raw action-value sum the packed stack computes
    from the action patch, reference mcl.py:102) and never touches
    ``ctx.obs`` — so the dense def keeps an all-packed stack off the unpack
    path.  Provided under the packed-stats name for stack-builder symmetry."""
    from .parsimony import parsimony_def

    return parsimony_def(**kwargs)._replace(name="ParsimonyBonus(packed)")


def morpho_def_packed(
    config: EnvConfig,
    reward_scale: float = 1.0,
    rle_paths: Any = (),
    dim: int = 8,
    seed_rate: float = 0.005,
    **kwargs: Any,
) -> WrapperDef:
    """MorphoBonus on packed words — the ±1-normalised pattern correlation
    as bit-sliced window counts (ops/bitsliced.py), no cell unpack.

    Reference math (mcl.py:144-183): each kernel has live cells of equal
    weight ``w = 15/n`` (n live cells) and -1 everywhere else on the
    ``dim x dim`` canvas; the bonus is ``max + min`` over all kernels and
    VALID positions of the correlation with ``|universe - action|``.
    Since universe and action are binary, ``|u - a| = u XOR a`` — one
    packed word op — and the response decomposes into two small-integer
    per-cell counts:

        response = w*N_live - (N_all - N_live) = (w+1)*N_live - N_all

    where ``N_all`` is the dim×dim window popcount (shared by every
    kernel) and ``N_live`` the count at the kernel's live offsets.  Scaled
    by ``n`` this is integer: ``g = (15+n)*N_live - n*N_all``; ``g`` is
    computed bit-sliced with an offset making it non-negative, its
    per-instance max/min over valid positions extracted MSB-first
    (~9 masked-popcount rounds), and the float division by ``n`` happens
    once per kernel on a scalar.  Exact — integer arithmetic throughout —
    where the dense def's f32 conv merely rounds correctly; parity is
    tested against the dense def."""
    from .morpho import build_kernel_bank
    from .patterns import pattern_path
    from ..ops import bitsliced as bs

    if not rle_paths:
        rle_paths = (pattern_path("glider_1"), pattern_path("glider_2"))
    bank = build_kernel_bank(rle_paths, dim)[:, 0]  # [K, dim, dim]

    # per-kernel live offsets + live count (symmetry variants of one
    # pattern share n but not offsets)
    kernels = []
    for k in range(bank.shape[0]):
        live = np.argwhere(bank[k] > 0)
        kernels.append(tuple((int(r), int(c)) for r, c in live))
    win = dim * dim

    h, w = config.height, config.width
    valid_np = np.zeros((h, w), dtype=np.uint8)
    valid_np[: h - dim + 1, : w - dim + 1] = 1  # VALID correlation anchors

    class PackedMorphoState(NamedTuple):
        reward_scale: jax.Array
        valid_words: jax.Array  # uint32 [H, W/32]

    def init(key: jax.Array) -> PackedMorphoState:
        return PackedMorphoState(
            reward_scale=jnp.asarray(reward_scale, dtype=jnp.float32),
            valid_words=_pack_mask(valid_np),
        )

    def apply(state, ctx: StepCtx, reward: jax.Array):
        if ctx.packed_prev is None or ctx.packed_action is None:
            raise ValueError(
                "morpho_def_packed needs a packed stack populating "
                "ctx.packed_prev/ctx.packed_action; use mcl.morpho.morpho_def "
                "on the uint8 path"
            )
        x = ctx.packed_prev ^ ctx.packed_action  # |u - a| for binary u, a
        n_all = bs.window_sum(x, dim, dim)       # shared across kernels
        best_max = None
        best_min = None
        for offsets in kernels:
            n = len(offsets)
            if n == 0:
                # all-dead kernel: response = -N_all exactly
                gmax = -bs.min_over_cells(n_all, state.valid_words)
                gmin = -bs.max_over_cells(n_all, state.valid_words)
                fmax = gmax.astype(jnp.float32)
                fmin = gmin.astype(jnp.float32)
            else:
                width = int((15 + n) * n + n * win).bit_length()
                offset = n * win
                a_num = bs.mul_const(bs.tap_sum(x, offsets), 15 + n, width)
                b_num = bs.mul_const(n_all, n, width)
                g = bs.sub_offset(a_num, b_num, offset, width)
                gmax = bs.max_over_cells(g, state.valid_words) - offset
                gmin = bs.min_over_cells(g, state.valid_words) - offset
                fmax = gmax.astype(jnp.float32) / jnp.float32(n)
                fmin = gmin.astype(jnp.float32) / jnp.float32(n)
            best_max = fmax if best_max is None else jnp.maximum(best_max, fmax)
            best_min = fmin if best_min is None else jnp.minimum(best_min, fmin)
        bonus = (best_max + best_min)[:, None]
        return state, reward + state.reward_scale * bonus

    def on_reset(state, key: jax.Array, grid: jax.Array):
        # identical nucleation-noise semantics to the dense def
        # (mcl.py:185-195); packed stacks run reset hooks in the cell domain
        noise = jax.random.bernoulli(key, seed_rate, grid.shape)
        return state, (grid | noise.astype(jnp.uint8))

    return WrapperDef(
        name="MorphoBonus(packed)", init=init, apply=apply, on_reset=on_reset
    )


def prediction_def_packed(config: EnvConfig, **kwargs: Any) -> WrapperDef:
    """PredictionBonus with a bit-packed frame ring ([inst, K, H, W/32]
    uint32 — 32x less carry than the reference's f32 list, mcl.py:577).
    The ring stores ``ctx.packed`` directly (no pack cost on a packed
    stack); with a fused head both the prediction source and the loss
    target are consumed as words in VMEM, so ``ctx.obs`` stays dead and
    liveness comes from the words too (mcl/prediction.py)."""
    from .prediction import prediction_def

    return prediction_def(
        config, buffer_dtype="packed", **kwargs
    )._replace(name="PredictionBonus(packed)")


def surprise_def_packed(config: EnvConfig, **kwargs: Any) -> WrapperDef:
    """SurpriseBonus on the packed frame ring (see
    :func:`prediction_def_packed`; sign-flipped bonus, mcl.py:708-727)."""
    from .prediction import surprise_def

    return surprise_def(
        config, buffer_dtype="packed", **kwargs
    )._replace(name="SurpriseBonus(packed)")


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
