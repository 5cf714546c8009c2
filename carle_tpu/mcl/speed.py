"""SpeedDetector — rewards moving patterns via center-of-mass velocity
(mcl.py:730-799).

Mechanics replicated exactly:

* row/column index weights are masked to EXCLUDE the centred action window
  (mcl.py:749-758) — movement only counts outside it;
* live-cell count in the denominator is NOT masked (mcl.py:771);
* the first step only records the CoM; afterwards
  ``speed = sqrt(sum(velocity**2))`` where velocity is the [2, instances]
  CoM delta — a **batch-global scalar** added to every instance's reward
  (reference semantics, mcl.py:786-792).  Set ``per_instance=True`` for the
  vectorization-correct variant (per-instance speed).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig
from .base import Motivator, StepCtx, WrapperDef, default_on_reset


class SpeedState(NamedTuple):
    reward_scale: jax.Array    # f32 scalar (attribute exists, unused in the
                               # reference step — kept for parity, mcl.py:734)
    center_of_mass: jax.Array  # f32 [2, instances]
    has_com: jax.Array         # bool scalar — torch's `center_of_mass is None`
    weight_h: jax.Array        # f32 [H, W] masked row-index weights
    weight_w: jax.Array        # f32 [H, W] masked column-index weights


def _masked_weights(config: EnvConfig) -> Tuple[np.ndarray, np.ndarray]:
    h, w = config.height, config.width
    # mcl.py:739-742 builds mass_weight_w from arange(height) and
    # mass_weight_h from arange(width) — an h/w swap that is identical for
    # the square universes the reference ships and crashes it otherwise.
    # Size each index vector to its own axis instead: bit-identical on
    # square grids, and SpeedDetector works on the non-square universes the
    # rest of this package supports.
    weight_w = np.broadcast_to(np.arange(w, dtype=np.float32)[None, :], (h, w))
    weight_h = np.broadcast_to(np.arange(h, dtype=np.float32)[:, None], (h, w))

    mask = np.ones((h, w), dtype=np.float32)
    r0, c0 = config.action_row_offset, config.action_col_offset
    mask[r0 : r0 + config.eff_action_height, c0 : c0 + config.eff_action_width] = 0.0
    return weight_h * mask, weight_w * mask


def speed_def(
    config: EnvConfig,
    reward_scale: float = 1.0,
    per_instance: bool = False,
    **kwargs: Any,
) -> WrapperDef:
    wh, ww = _masked_weights(config)

    def init(key: jax.Array) -> SpeedState:
        return SpeedState(
            reward_scale=jnp.asarray(reward_scale, dtype=jnp.float32),
            center_of_mass=jnp.zeros((2, config.instances), dtype=jnp.float32),
            has_com=jnp.asarray(False),
            weight_h=jnp.asarray(wh),
            weight_w=jnp.asarray(ww),
        )

    def apply(
        state: SpeedState, ctx: StepCtx, reward: jax.Array
    ) -> Tuple[SpeedState, jax.Array]:
        live = jnp.sum(ctx.obs, axis=(1, 2, 3))  # unmasked denominator
        com_h = jnp.sum(ctx.obs * state.weight_h[None, None], axis=(1, 2, 3)) / (
            live + 1e-7
        )
        com_w = jnp.sum(ctx.obs * state.weight_w[None, None], axis=(1, 2, 3)) / (
            live + 1e-7
        )
        com = jnp.stack([com_h, com_w])  # [2, instances]

        velocity = state.center_of_mass - com
        if per_instance:
            speed = jnp.sqrt(jnp.sum(velocity**2, axis=0))[:, None]  # [inst, 1]
        else:
            speed = jnp.sqrt(jnp.sum(velocity**2))  # batch-global scalar
        new_reward = jnp.where(state.has_com, reward + speed, reward)

        new_state = state._replace(center_of_mass=com, has_com=jnp.asarray(True))
        return new_state, new_reward

    return WrapperDef(
        name="SpeedDetector", init=init, apply=apply, on_reset=default_on_reset
    )


class SpeedDetector(Motivator):
    my_name = "SpeedDetector"

    def __init__(self, env: Any, **kwargs: Any) -> None:
        super().__init__(env, **kwargs)
        self.speed_modulator = 32.0  # declared-but-unused (mcl.py:737)

    def _make_def(self, **kwargs: Any) -> WrapperDef:
        return speed_def(self._config, **kwargs)
