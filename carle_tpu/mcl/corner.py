"""CornerBonus — static spatial shaping masks (mcl.py:197-231).

Reward mask: the 16x16 top-left square plus a diagonal band of 8x8 squares
along (ii-4:ii+4, ii-4:ii+4) for ii in 4..95 (the reference loop runs ii from
0, but Python slice semantics make ii<4 a no-op — replicated exactly by using
the same slicing).  Punish mask: -1 over the bottom-right and top-right 64x64
corners.  Bonus = scale * sum((reward_mask + punish_mask) * obs).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig
from .base import Motivator, StepCtx, WrapperDef, default_on_reset


def _build_masks(height: int, width: int) -> np.ndarray:
    reward_mask = np.zeros((height, width), dtype=np.float32)
    punish_mask = np.zeros((height, width), dtype=np.float32)

    reward_mask[:16, :16] = 1.0
    for ii in range(96):
        # identical slice arithmetic to mcl.py:213 — negative starts for ii<4
        # produce empty slices, exactly as in the reference
        reward_mask[ii - 4 : ii + 4, ii - 4 : ii + 4] = 1.0

    punish_mask[-64:, -64:] = -1.0
    punish_mask[:64, -64:] = -1.0
    return reward_mask + punish_mask


class CornerState(NamedTuple):
    reward_scale: jax.Array  # f32 scalar
    mask: jax.Array          # f32 [H, W]


def corner_def(config: EnvConfig, reward_scale: float = 1.0, **kwargs: Any) -> WrapperDef:
    mask_np = _build_masks(config.height, config.width)

    def init(key: jax.Array) -> CornerState:
        return CornerState(
            reward_scale=jnp.asarray(reward_scale, dtype=jnp.float32),
            mask=jnp.asarray(mask_np),
        )

    def apply(
        state: CornerState, ctx: StepCtx, reward: jax.Array
    ) -> Tuple[CornerState, jax.Array]:
        bonus = jnp.sum(state.mask[None, None] * ctx.obs, axis=(2, 3))
        return state, reward + state.reward_scale * bonus

    return WrapperDef(
        name="CornerBonus", init=init, apply=apply, on_reset=default_on_reset
    )


class CornerBonus(Motivator):
    my_name = "CornerBonus"

    def _make_def(self, **kwargs: Any) -> WrapperDef:
        return corner_def(self._config, **kwargs)
