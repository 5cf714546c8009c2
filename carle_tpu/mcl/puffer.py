"""PufferDetector — detects unbounded growth absent actions (mcl.py:804-853).

Reference mechanics: a sliding window of live-cell counts, appended only on
action-free steps and cleared by any toggle; once the window exceeds
``growth_threshold`` (512) entries, slope = newest - oldest and reward += 1
when slope > 0.01.  The count is the **batch-global** universe sum
(mcl.py:832 pulls a scalar via ``.cpu().numpy()``), so the +1 broadcasts to
every instance — replicated by default; ``per_instance=True`` gives the
vectorization-correct variant (per-instance windows and rewards).

The Python list becomes a fixed ring buffer in the carried state: ``buf``
holds the last ``window`` counts, ``head`` the oldest slot, ``count`` the
fill level — jit/scan-compatible with zero host traffic.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import EnvConfig
from .base import Motivator, StepCtx, WrapperDef, default_on_reset


class PufferState(NamedTuple):
    reward_scale: jax.Array  # f32 scalar (attribute parity; unused in step)
    buf: jax.Array           # f32 [lanes, window] ring buffer of counts
    head: jax.Array          # int32 [lanes] oldest slot
    count: jax.Array         # int32 [lanes] fill level
    window: jax.Array        # int32 scalar = growth_threshold


def puffer_def(
    config: EnvConfig,
    reward_scale: float = 1.0,
    growth_threshold: int = 512,
    per_instance: bool = False,
    cells_fn: Any = None,
    **kwargs: Any,
) -> WrapperDef:
    """``cells_fn(ctx) -> f32 [instances]`` overrides how the live-cell
    count is computed (default: sum of the dense obs) — the packed-native
    variant (mcl/packed_stats.py) supplies popcounts so the ring-buffer /
    slope / toggle-clear semantics live in exactly one place."""
    lanes = config.instances if per_instance else 1
    if cells_fn is None:
        cells_fn = lambda ctx: jnp.sum(ctx.obs, axis=(1, 2, 3))  # noqa: E731

    def init(key: jax.Array) -> PufferState:
        return PufferState(
            reward_scale=jnp.asarray(reward_scale, dtype=jnp.float32),
            buf=jnp.zeros((lanes, growth_threshold), dtype=jnp.float32),
            head=jnp.zeros((lanes,), dtype=jnp.int32),
            count=jnp.zeros((lanes,), dtype=jnp.int32),
            window=jnp.asarray(growth_threshold, dtype=jnp.int32),
        )

    def apply(
        state: PufferState, ctx: StepCtx, reward: jax.Array
    ) -> Tuple[PufferState, jax.Array]:
        cells_vec = cells_fn(ctx)                                  # [inst]
        if per_instance:
            cells = cells_vec
            acted = jnp.sum(ctx.action, axis=(1, 2)) != 0          # [inst]
        else:
            cells = jnp.sum(cells_vec)[None]                       # [1]
            acted = (jnp.sum(ctx.action) != 0)[None]               # [1]

        # list semantics: append, and once len > window compute slope over the
        # (window+1)-long view then drop the oldest — equivalently: when the
        # ring is full, slope = incoming - evicted.
        full = state.count >= state.window
        oldest = jnp.take_along_axis(state.buf, state.head[:, None], axis=1)[:, 0]
        slope = cells - oldest
        fire = jnp.logical_and(jnp.logical_and(full, slope > 0.01), ~acted)

        write_idx = jnp.where(full, state.head, state.count)
        new_buf = jax.vmap(
            lambda row, idx, val: jax.lax.dynamic_update_index_in_dim(
                row, val, idx, 0
            )
        )(state.buf, write_idx, cells)
        new_head = jnp.where(full, (state.head + 1) % state.window, state.head)
        new_count = jnp.minimum(state.count + 1, state.window)

        # any toggle clears the window (mcl.py:846-848)
        new_buf = jnp.where(acted[:, None], 0.0, new_buf)
        new_head = jnp.where(acted, 0, new_head)
        new_count = jnp.where(acted, 0, new_count)

        if per_instance:
            bonus = fire.astype(jnp.float32)[:, None]              # [inst, 1]
        else:
            bonus = fire.astype(jnp.float32)[0]                    # scalar

        new_state = state._replace(buf=new_buf, head=new_head, count=new_count)
        return new_state, reward + bonus

    return WrapperDef(
        name="PufferDetector", init=init, apply=apply, on_reset=default_on_reset
    )


class PufferDetector(Motivator):
    my_name = "PufferDetector"

    def __init__(self, env: Any, **kwargs: Any) -> None:
        super().__init__(env, **kwargs)
        self.growth_threshold = kwargs.get("growth_threshold", 512)
        self.growing_steps = 0  # attribute parity (mcl.py:824)

    def _make_def(self, **kwargs: Any) -> WrapperDef:
        return puffer_def(self._config, **kwargs)
