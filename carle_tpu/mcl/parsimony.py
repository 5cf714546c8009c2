"""ParsimonyBonus — rescale reward by action frugality (mcl.py:86-105).

``reward *= 100 / max(sum(action), 100)`` per instance; a multiplicative
transform of whatever the inner wrappers produced.  The reference's
``parsimony_threshold = 128`` attribute is declared but never used
(mcl.py:96) — kept for attribute parity only.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .base import Motivator, StepCtx, WrapperDef, default_on_reset


class ParsimonyState(NamedTuple):
    pass


def parsimony_def(**kwargs: Any) -> WrapperDef:
    def init(key: jax.Array) -> ParsimonyState:
        return ParsimonyState()

    def apply(
        state: ParsimonyState, ctx: StepCtx, reward: jax.Array
    ) -> Tuple[ParsimonyState, jax.Array]:
        # the reference divides by the sum of the RAW action VALUES
        # (mcl.py:102 — an agent toggling 200 cells with value 2.0 is
        # scaled by 100/400, not 100/200); ctx.action_sum carries that raw
        # sum, with the binarised toggle count as the fallback for custom
        # ctx builders that do not populate it
        if ctx.action_sum is not None:
            toggles = ctx.action_sum
        else:
            toggles = jnp.sum(
                ctx.action.astype(jnp.float32), axis=(1, 2), keepdims=False
            )[:, None]
        return state, 100.0 * reward / jnp.maximum(toggles, 100.0)

    return WrapperDef(
        name="ParsimonyBonus", init=init, apply=apply, on_reset=default_on_reset
    )


class ParsimonyBonus(Motivator):
    my_name = "ParsimonyBonus"

    def __init__(self, env: Any, **kwargs: Any) -> None:
        super().__init__(env, **kwargs)
        self.parsimony_threshold = 128  # declared-but-unused, mcl.py:96

    def _make_def(self, **kwargs: Any) -> WrapperDef:
        return parsimony_def(**kwargs)
