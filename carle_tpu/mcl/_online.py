"""Online-learning machinery for bonus wrappers.

The reference trains its predictor networks *inside* ``env.step`` by
accumulating a mean loss for ``batch_size`` (64) steps, then calling
``loss.backward(); Adam.step()`` (mcl.py:333-341, 368-386).  Because
parameters don't change between optimizer steps, accumulating the loss and
backpropagating once is exactly equivalent to accumulating per-step gradients
— which is how it must be expressed under ``lax.scan``: the gradient
accumulator and counter ride in the carried state, and the Adam update is a
``lax.cond``-gated branch.

A faithful quirk worth documenting: every learned wrapper in the reference
*declares* its own learning rate (RND 6e-2, AE 9e-2, Prediction 3e-4,
mcl.py:243/429/563) but the optimizer is constructed inside
``initialize_predictor`` during ``RND2D.__init__`` — BEFORE the subclass
assignments run — so the effective lr is always 6e-2.  ``lr=None`` here means
"reference-effective" (6e-2); pass the declared value explicitly to get the
intended behaviour.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

REFERENCE_EFFECTIVE_LR = 6e-2   # what the reference actually uses everywhere
DECLARED_LR = {"RND2D": 6e-2, "AE2D": 9e-2, "PredictionBonus": 3e-4,
               "SurpriseBonus": 3e-4}


class LearnerState(NamedTuple):
    """Carried state of one online-learning wrapper."""

    reward_scale: jax.Array   # f32 scalar
    batch_size: jax.Array     # int32 scalar — mutable data, not a trace const
    params: Any               # predictor param pytree
    target_params: Any        # frozen-net params ({} when none)
    opt_state: Any            # optax.adam state
    grad_accum: Any           # same structure as params
    buffer_length: jax.Array  # int32 scalar
    updates: jax.Array        # int32 scalar
    extra: Any                # wrapper-specific carry (e.g. frame buffer)


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """torch.optim.Adam defaults: betas (0.9, 0.999), eps 1e-8."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def init_learner(
    reward_scale: float,
    batch_size: int,
    params: Any,
    target_params: Any,
    opt: optax.GradientTransformation,
    extra: Any = (),
) -> LearnerState:
    return LearnerState(
        reward_scale=jnp.asarray(reward_scale, dtype=jnp.float32),
        batch_size=jnp.asarray(batch_size, dtype=jnp.int32),
        params=params,
        target_params=target_params,
        opt_state=opt.init(params),
        grad_accum=jax.tree.map(jnp.zeros_like, params),
        buffer_length=jnp.asarray(0, dtype=jnp.int32),
        updates=jnp.asarray(0, dtype=jnp.int32),
        extra=extra,
    )


def accumulate_and_maybe_update(
    state: LearnerState,
    grads: Any,
    opt: optax.GradientTransformation,
) -> LearnerState:
    """Reference ``get_bonus_accumulate`` semantics (mcl.py:368-386): add this
    step's gradients, bump the counter, and when it reaches ``batch_size``
    apply Adam on the batch-mean gradient and clear the accumulator."""
    accum = jax.tree.map(jnp.add, state.grad_accum, grads)
    count = state.buffer_length + 1
    do_update = count >= state.batch_size

    def updated(_):
        mean_grads = jax.tree.map(
            lambda g: g / state.batch_size.astype(jnp.float32), accum
        )
        updates, new_opt = opt.update(mean_grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        zeroed = jax.tree.map(jnp.zeros_like, accum)
        return (new_params, new_opt, zeroed,
                jnp.asarray(0, jnp.int32), state.updates + 1)

    def carried(_):
        return (state.params, state.opt_state, accum, count, state.updates)

    params, opt_state, accum, count, updates = jax.lax.cond(
        do_update, updated, carried, operand=None
    )
    return state._replace(
        params=params,
        opt_state=opt_state,
        grad_accum=accum,
        buffer_length=count,
        updates=updates,
    )


def net_input(ctx: Any, fused_head: Any) -> jax.Array:
    """The observation a wrapper net should consume.  Fused kernels take
    the PACKED universe directly when the stack carries one (expanded to
    cell planes in VMEM — neither the f32 obs nor the u8 cells, nor even
    the XLA unpack's u32 temps, ever exist in HBM; those temps were
    2 MB/env at 512², the r4 envs/chip ladder's residual binder), else
    the uint8 cells (upcast in VMEM), else the float32 obs.  The
    space-sharded tier stays on cells: its halo'd reductions run in XLA.
    ``fused_head`` follows the defs' convention: False = unfused,
    True/Mesh/SpaceSharding = fused."""
    if fused_head is False:
        return ctx.obs
    from ..nets import SpaceSharding

    if (not isinstance(fused_head, SpaceSharding)
            and getattr(ctx, "packed", None) is not None):
        return ctx.packed[:, None]
    if getattr(ctx, "obs_cells", None) is not None:
        return ctx.obs_cells
    return ctx.obs


def learner_apply(
    loss_fn: Callable[[Any, LearnerState, Any], Tuple[jax.Array, Any]],
    bonus_fn: Callable[[jax.Array, jax.Array], jax.Array],
    opt: optax.GradientTransformation,
    train: bool,
    remat: bool = False,
):
    """Build a WrapperDef.apply for an online learner.

    ``loss_fn(params, state, ctx) -> (per_instance_loss [inst], new_extra)``
    defines the objective over the step context (obs via ``ctx.obs`` or —
    fused nets — the uint8 ``ctx.obs_cells``; dropout key via ``ctx.key``);
    ``bonus_fn(per_instance_loss, ctx) -> [inst, 1]`` maps it to the reward
    bonus (identity for RND/AE, ``0.1 - loss`` masked for PredictionBonus —
    which reads liveness from the cheapest ctx view so packed stacks never
    unpack for it, ...).  With ``train=False`` this is the reference's ``get_bonus_only``
    (mcl.py:389-395): forward pass only, dropout off, no gradient or
    optimizer work at all.

    ``remat=True`` wraps the loss in ``jax.checkpoint`` so the backward pass
    recomputes activations instead of storing them — trades ~1 extra forward
    per step for O(layers) less live memory, which is what lets huge env
    batches (4096+ of 256x256) train without spilling HBM.
    """

    def apply(state: LearnerState, ctx: Any, reward: jax.Array):
        if train:
            def scalar_loss(params):
                per_inst, new_extra = loss_fn(params, state, ctx)
                return jnp.mean(per_inst), (per_inst, new_extra)

            if remat:
                scalar_loss = jax.checkpoint(scalar_loss)
            grads, (per_inst, new_extra) = jax.grad(
                scalar_loss, has_aux=True
            )(state.params)
            state = state._replace(extra=new_extra)
            state = accumulate_and_maybe_update(state, grads, opt)
        else:
            # loss_fn reads ctx.key itself: dropout=True with train=False
            # (the decoupled flags the defs expose) must SAMPLE dropout,
            # not crash on key=None inside nets.dropout
            per_inst, new_extra = loss_fn(state.params, state, ctx)
            state = state._replace(extra=new_extra)

        bonus = bonus_fn(per_inst, ctx)
        return state, reward + state.reward_scale * bonus

    return apply
