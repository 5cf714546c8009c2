"""PredictionBonus / SurpriseBonus — forward-model bonuses (mcl.py:558-728).

PredictionBonus rewards *predictability*: the AE-architecture predictor maps
the frame from ``prediction_steps`` (5) ago to the current frame via a frame
ring buffer; bonus = ``0.1 - prediction_error``, zeroed for dead universes
(mcl.py:679-699).  SurpriseBonus is the sign flip: bonus = +error, also
zeroed for dead universes (mcl.py:708-727).

The reference's Python-list ``grid_buffer`` (append, predict from
``buffer[0]``, pop when len > 5) becomes a fixed [inst, K, 1, H, W] ring in
the carried state (instances on dim 0 like every batched leaf, so the mesh
layer's dim-0 sharding rule applies) with identical source-frame semantics,
including the
warm-up phase where the source stays the first frame.  The reference's
duplicated method definitions (mcl.py:609-677) resolve to the same behaviour
implemented here (last definition wins in Python).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import EnvConfig
from ._online import (
    REFERENCE_EFFECTIVE_LR,
    LearnerState,
    init_learner,
    learner_apply,
    make_optimizer,
)
from .ae import AE2D, ae_forward, init_ae_params
from .base import WrapperDef, default_on_reset

DECLARED_LR = 3e-4  # mcl.py:563; see _online.py — effectively 6e-2 upstream


class FrameBuffer(NamedTuple):
    frames: jax.Array  # f32 [inst, K, 1, H, W]
    count: jax.Array   # int32 scalar


def _push(buf: FrameBuffer, obs: jax.Array, k: int) -> Tuple[jax.Array, FrameBuffer]:
    """Reference list semantics (mcl.py:581-599): the prediction source is
    ``buffer[0]`` after appending (== obs while the buffer is empty); once
    len exceeds K the oldest frame is dropped."""
    src = jnp.where(buf.count == 0, obs, buf.frames[:, 0])
    # lax.cond executes ONE branch: the old where(shifted, appended) form
    # materialised both candidate rings every step (~3x the buffer's HBM
    # traffic per step at [inst, K, 1, H, W] scale)
    frames = jax.lax.cond(
        buf.count >= k,
        lambda f: jnp.roll(f, -1, axis=1).at[:, k - 1].set(obs),
        lambda f: jax.lax.dynamic_update_index_in_dim(
            f, obs, jnp.minimum(buf.count, k - 1), 1
        ),
        buf.frames,
    )
    count = jnp.minimum(buf.count + 1, k)
    return src, FrameBuffer(frames=frames, count=count)


def _make_def(
    config: EnvConfig,
    name: str,
    surprise: bool,
    reward_scale: float = 1.0,
    batch_size: int = 64,
    lr: Optional[float] = None,
    prediction_steps: int = 5,
    train: bool = True,
    dropout: Optional[bool] = None,
    remat: bool = False,
    fused_head: Any = False,
    **kwargs: Any,
) -> WrapperDef:
    use_dropout = train if dropout is None else dropout
    opt = make_optimizer(REFERENCE_EFFECTIVE_LR if lr is None else lr)
    k = prediction_steps

    def init(key: jax.Array) -> LearnerState:
        buf = FrameBuffer(
            frames=jnp.zeros(
                (config.instances, k, 1, config.height, config.width),
                dtype=jnp.float32,
            ),
            count=jnp.asarray(0, dtype=jnp.int32),
        )
        return init_learner(
            reward_scale, batch_size, init_ae_params(key, config), {}, opt, extra=buf
        )

    def loss_fn(params, state: LearnerState, ctx):
        # the frame ring buffer carries f32 frames (reference list
        # semantics, mcl.py:577), so this wrapper stays on ctx.obs
        obs = ctx.obs
        src, new_buf = _push(state.extra, obs, k)
        prediction = ae_forward(params, jax.lax.stop_gradient(src), ctx.key,
                                use_dropout, fused_head=fused_head)
        # target is the current frame; error mean over C,H,W (mcl.py:596-598)
        per_inst = jnp.mean((obs - prediction) ** 2, axis=(1, 2, 3))
        return per_inst, new_buf

    def bonus_fn(per_inst, obs):
        raw = per_inst if surprise else (0.1 - per_inst)
        alive = jnp.mean(obs, axis=(1, 2, 3)) > 0.0  # dead universes earn 0
        return jnp.where(alive, raw, 0.0)[:, None]

    return WrapperDef(
        name=name,
        init=init,
        apply=learner_apply(loss_fn, bonus_fn, opt, train, remat),
        on_reset=default_on_reset,
    )


def prediction_def(config: EnvConfig, **kwargs: Any) -> WrapperDef:
    return _make_def(config, "PredictionBonus", surprise=False, **kwargs)


def surprise_def(config: EnvConfig, **kwargs: Any) -> WrapperDef:
    return _make_def(config, "SurpriseBonus", surprise=True, **kwargs)


class PredictionBonus(AE2D):
    my_name = "PredictionBonus"

    def __init__(self, env: Any, **kwargs: Any) -> None:
        super().__init__(env, **kwargs)
        self.prediction_steps = kwargs.get("prediction_steps", 5)

    def _make_def(self, **kwargs: Any) -> WrapperDef:
        self._def_kwargs = dict(kwargs)
        return prediction_def(self._config, train=self._train, **kwargs)

    def _def_factory(self):
        return prediction_def


class SurpriseBonus(AE2D):
    my_name = "SurpriseBonus"

    def __init__(self, env: Any, **kwargs: Any) -> None:
        super().__init__(env, **kwargs)
        self.ca_steps = 3  # declared-but-unused (mcl.py:705)

    def _make_def(self, **kwargs: Any) -> WrapperDef:
        self._def_kwargs = dict(kwargs)
        return surprise_def(self._config, train=self._train, **kwargs)

    def _def_factory(self):
        return surprise_def
