"""Wrapper protocol + composition + the reference-compatible Motivator shell.

Reference design (mcl.py:29-84): wrappers are ``nn.Module`` objects composed
by ``env = Wrapper(env)``; each ``step`` calls the inner env's step and adds
its bonus to the reward bubbling outward, with Python-side mutable state
(loss buffers, frame buffers, optimizers) updated *inside* the step.

TPU design: a wrapper is data + pure functions —

* ``init(key) -> state`` builds the wrapper's state pytree (params,
  optimizer state, carried statistics);
* ``apply(state, ctx, reward) -> (state', reward')`` consumes a
  :class:`StepCtx` describing one environment transition and transforms the
  reward (usually ``reward + scale * bonus``);
* ``on_reset(state, key, grid) -> (state', grid')`` hooks environment resets
  (only MorphoBonus uses it, to seed nucleation noise — mcl.py:185-195).

A :class:`WrapperStack` folds the env transition and every wrapper apply into
ONE pure function, so a whole rollout segment — actions, CA updates, bonus
networks, gradient accumulation, optimizer steps — compiles to a single XLA
program with no host round-trips (the reference re-enters Python every step).

Wrapper order follows reference composition: the first wrapper listed is the
innermost (applied first, reward flows outward through the rest).
"""

from __future__ import annotations

from typing import Any, Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig
from ..env import CARLE, EnvState, env_step, reset_state
from ..ops.ca import pad_action


# Every cell-sized StepCtx field: the serialize barrier must pin ALL heavy
# inputs the next wrapper might consume, not just the learner-net trio —
# packed stat wrappers read packed_prev/packed_action (morpho) and dense
# stacks expose prev_grid/action_full (advisor r4: a barrier that skips a
# consumed field leaves that wrapper free to overlap the previous one).
# action_sum is [inst, 1] — negligible, deliberately left out.
_BARRIER_FIELDS = ("obs", "obs_cells", "packed", "packed_prev",
                   "packed_action", "prev_grid", "action_full")


def _barrier_ctx(ws, ctx: "StepCtx", reward: jax.Array):
    """Identity that pins scheduling: the returned ctx's net-input fields
    cannot be consumed before EVERY output of the previous wrapper — its
    updated state ``ws`` included — is produced.  Tying only ``reward``
    is not enough: reward depends just on the forward pass, so the
    previous learner's backward+Adam chain (where the heavy transients
    live) would still overlap the next learner's compute (measured: the
    reward-only barrier did not stop the 5632-instance worker fault).
    See WrapperStack._apply_wrappers."""
    present = [f for f in _BARRIER_FIELDS
               if getattr(ctx, f, None) is not None]
    ws, reward, *fields = jax.lax.optimization_barrier(
        (ws, reward) + tuple(getattr(ctx, f) for f in present))
    return ws, ctx._replace(**dict(zip(present, fields))), reward


class StepCtx(NamedTuple):
    """Everything a wrapper may observe about one env transition."""

    prev_grid: jax.Array    # uint8 [inst, H, W] universe BEFORE toggle+update
    obs: jax.Array          # float32 [inst, 1, H, W] universe AFTER the update
    action: jax.Array       # uint8 [inst, AH, AW] raw toggle patch
    action_full: jax.Array  # uint8 [inst, H, W] patch padded to universe size
    key: jax.Array          # per-step PRNG key (dropout, exploration noise)
    packed: Any = None      # uint32 [inst, H, W/32] universe AFTER the update
                            # (set by the packed stacks; packed-native stat
                            # wrappers consume it via popcounts — and when NO
                            # wrapper touches ``obs``, XLA dead-code-eliminates
                            # the unpack entirely, mcl/packed_stats.py)
    action_sum: Any = None  # f32 [inst, 1] per-instance sum of the RAW
                            # action VALUES (pre-binarisation; in the class
                            # shell, pre-crop) — ParsimonyBonus divides by
                            # this sum, reference mcl.py:102
    packed_prev: Any = None    # uint32 [inst, H, W/32] universe BEFORE
                               # toggle+update (packed stacks only) —
                               # morpho_def_packed correlates against it
    packed_action: Any = None  # uint32 [inst, H, W/32] toggle patch padded
                               # to universe extent (packed stacks only)
    obs_cells: Any = None   # uint8 [inst, 1, H, W] — the SAME observation
                            # as ``obs`` pre-float-cast.  The fused Pallas
                            # nets consume this directly (upcast in VMEM),
                            # which lets XLA DCE the f32 obs — the largest
                            # per-env HBM transient of fused training
                            # (1 MB/env at 512²)


class WrapperDef(NamedTuple):
    """A reward wrapper as pure functions over an explicit state pytree."""

    name: str
    init: Callable[[jax.Array], Any]
    apply: Callable[[Any, StepCtx, jax.Array], Tuple[Any, jax.Array]]
    on_reset: Callable[[Any, jax.Array, jax.Array], Tuple[Any, jax.Array]]


def default_on_reset(
    state: Any, key: jax.Array, grid: jax.Array
) -> Tuple[Any, jax.Array]:
    """Wrapper states deliberately survive resets — the reference never clears
    frame/statistics buffers in ``reset`` (mcl.py:66-70, 408-421)."""
    return state, grid


class StackState(NamedTuple):
    env: EnvState
    wrappers: Tuple[Any, ...]


class WrapperStack:
    """Composes ``env_step`` with an ordered wrapper list into pure functions.

    ``step(state, action, key)`` is the fused hot path: env transition + all
    bonuses + all online learning, jittable and scannable.  ``reward`` starts
    at zero (base env emits none — reference env.py:237) and is transformed by
    each wrapper in order.
    """

    def __init__(self, config: EnvConfig, wrappers: Sequence[WrapperDef] = (),
                 serialize: bool = False):
        self.config = config
        self.wrappers = tuple(wrappers)
        # serialize=True re-issues each wrapper's heavy inputs through an
        # optimization_barrier tied to the previous wrapper's full outputs
        # (see _apply_wrappers) — identical math, bounded peak memory
        self.serialize = serialize

    # --- state accessors (overridable: the packed spatial stack stores the
    # universe as uint32 words — parallel/packed_env.py) --------------------
    def universe(self, state: StackState, instance: int = None) -> jax.Array:
        """uint8 [inst, H, W] universe view of a stack state (or one
        instance's [H, W] — packed stacks then decode only that instance,
        which matters at huge-universe geometries)."""
        g = state.env.grid
        return g if instance is None else g[instance]

    def observe(self, state: StackState) -> jax.Array:
        """float32 [inst, 1, H, W] observation (the agent/net input)."""
        return self.universe(state).astype(jnp.float32)[:, None]

    def init(self, key: jax.Array, rule_bits: int) -> StackState:
        from ..env import init_state

        keys = jax.random.split(key, max(len(self.wrappers), 1))
        wstates = tuple(
            w.init(k) for w, k in zip(self.wrappers, keys)
        )
        return StackState(env=init_state(self.config, rule_bits), wrappers=wstates)

    def step(
        self, state: StackState, action: jax.Array, key: jax.Array
    ) -> Tuple[StackState, Tuple[jax.Array, jax.Array]]:
        """One fused transition.  ``action`` is uint8/float [inst, AH, AW]."""
        action_bits = (action != 0).astype(jnp.uint8)
        prev_grid = state.env.grid
        # pass the RAW action: env_step binarises for the toggle itself but
        # the master-reset predicate is the reference's mean(values) == 1.0
        env_state, grid = env_step(state.env, action, config=self.config)
        ctx = StepCtx(
            prev_grid=prev_grid,
            obs=grid.astype(jnp.float32)[:, None],
            obs_cells=grid[:, None],
            action=action_bits,
            action_full=pad_action(action_bits, self.config),
            key=key,
            action_sum=jnp.sum(
                action.astype(jnp.float32), axis=(1, 2)
            )[:, None],
        )
        reward = jnp.zeros((self.config.instances, 1), dtype=jnp.float32)
        new_wstates, reward = self._apply_wrappers(state.wrappers, ctx, reward)
        return (
            StackState(env=env_state, wrappers=new_wstates),
            (ctx.obs, reward),
        )

    def _apply_wrappers(self, wstates, ctx: "StepCtx", reward: jax.Array):
        """Apply the wrapper chain to one step context.

        With ``serialize=True`` every wrapper after the first consumes its
        heavy inputs (obs / obs_cells / packed) through an
        ``optimization_barrier`` tied to ALL of the previous wrapper's
        outputs — updated learner state included, so its whole
        forward+backward+Adam chain completes first — and XLA cannot
        overlap two online learners' transients: peak temp memory becomes
        max-of-wrappers instead of sum.  Identical math (the barrier is an
        identity); motivation: each learner alone trains at 6144 instances
        of 512² but the overlapped pair kills the TPU worker
        (scripts/fault_probe.py, round 4)."""
        new_wstates = []
        n = len(self.wrappers)
        for i, (w, ws) in enumerate(zip(self.wrappers, wstates)):
            ws, reward = w.apply(ws, ctx, reward)
            if self.serialize and i + 1 < n:
                ws, ctx, reward = _barrier_ctx(ws, ctx, reward)
            new_wstates.append(ws)
        return tuple(new_wstates), reward

    def reset(self, state: StackState, key: jax.Array) -> Tuple[StackState, jax.Array]:
        """Zero the universe, run wrapper reset hooks (in order) over the grid."""
        env_state = reset_state(state.env)
        grid = env_state.grid
        keys = jax.random.split(key, max(len(self.wrappers), 1))
        new_wstates = []
        for w, ws, k in zip(self.wrappers, state.wrappers, keys):
            ws, grid = w.on_reset(ws, k, grid)
            new_wstates.append(ws)
        env_state = env_state._replace(grid=grid)
        return (
            StackState(env=env_state, wrappers=tuple(new_wstates)),
            grid.astype(jnp.float32)[:, None],
        )


# ---------------------------------------------------------------------------
# Reference-compatible class shell
# ---------------------------------------------------------------------------


class Motivator:
    """Class shell matching the reference wrapper surface (mcl.py:29-84):
    ``env = Wrapper(env)``, ``step``/``reset`` forwarded inward, ``inner_env``
    always the raw CARLE, rule setters proxied.

    Subclasses define ``_make_def() -> WrapperDef`` and get a jitted
    single-wrapper apply; reward bubbles outward exactly as in the reference
    (inner wrappers' bonuses are applied first).
    """

    my_name = "Motivator"

    def __init__(self, env: Any, **kwargs: Any) -> None:
        inner = getattr(env, "inner_env", None)
        self.inner_env: CARLE = env if inner is None else inner
        self.env = env

        self.height = self.inner_env.height
        # reference quirk preserved: width copies height (mcl.py:42); square
        # universes (the only shipped configs) are unaffected
        self.width = self.inner_env.height
        self.action_height = self.inner_env.action_height
        self.action_width = self.inner_env.action_width
        self.my_device = self.inner_env.my_device  # mcl.py:46 parity
        self._reward_scale_attr = kwargs.get("reward_scale", 1.0)

        self._config: EnvConfig = self.inner_env.config
        self._key = jax.random.PRNGKey(kwargs.get("seed", 0))
        self._train = True
        self._wdef: Optional[WrapperDef] = None
        self._wstate: Any = None
        self._jit_apply: Any = None
        self._build(**kwargs)

    # -- subclass hooks ----------------------------------------------------
    def _make_def(self, **kwargs: Any) -> Optional[WrapperDef]:
        return None

    def _build(self, **kwargs: Any) -> None:
        kwargs.pop("seed", None)  # consumed by the shell's own PRNG key
        self._wdef = self._make_def(**kwargs)
        if self._wdef is not None:
            self._key, sub = jax.random.split(self._key)
            self._wstate = self._wdef.init(sub)
            self._jit_apply = jax.jit(self._wdef.apply)

    # -- tunables that live inside jitted state ----------------------------
    # The eval harness mutates reward_scale / batch_size AFTER construction
    # (eval.py:43-45); both are data in the wrapper state pytree so the
    # mutation is a state update, never a retrace.
    @property
    def reward_scale(self) -> float:
        if self._wstate is not None and hasattr(self._wstate, "reward_scale"):
            return float(self._wstate.reward_scale)
        return self._reward_scale_attr

    @reward_scale.setter
    def reward_scale(self, value: float) -> None:
        if self._wstate is not None and hasattr(self._wstate, "reward_scale"):
            self._wstate = self._wstate._replace(
                reward_scale=jnp.asarray(value, dtype=jnp.float32)
            )
        else:
            self._reward_scale_attr = value

    @property
    def batch_size(self) -> int:
        if self._wstate is not None and hasattr(self._wstate, "batch_size"):
            return int(self._wstate.batch_size)
        if hasattr(self, "_batch_size_attr"):
            return self._batch_size_attr
        raise AttributeError(f"{type(self).__name__} has no batch_size")

    @batch_size.setter
    def batch_size(self, value: int) -> None:
        if self._wstate is not None and hasattr(self._wstate, "batch_size"):
            self._wstate = self._wstate._replace(
                batch_size=jnp.asarray(value, dtype=jnp.int32)
            )
        else:
            # non-learning wrappers have no batch_size in their state; keep
            # the assignment as an inert attribute — torch modules accept
            # arbitrary attributes, and the reference eval harness sets
            # batch_size on EVERY wrapper in the stack (eval.py:45)
            self._batch_size_attr = int(value)

    # -- rule proxies (mcl.py:49-64) --------------------------------------
    @property
    def birth(self) -> List[int]:
        return self.inner_env.birth

    @birth.setter
    def birth(self, digits: List[int]) -> None:
        self.inner_env.birth = digits

    @property
    def survive(self) -> List[int]:
        return self.inner_env.survive

    @survive.setter
    def survive(self, digits: List[int]) -> None:
        self.inner_env.survive = digits

    def rules_from_string(self, my_string: str = "B3/S23") -> None:
        self.inner_env.rules_from_string(my_string)

    def birth_rule_from_string(self, my_string: str = "b3") -> None:
        self.inner_env.birth_rule_from_string(my_string)

    def survive_rule_from_string(self, my_string: str = "s23") -> None:
        self.inner_env.survive_rule_from_string(my_string)

    # -- gym API -----------------------------------------------------------
    def reset(self) -> jax.Array:
        obs = self.env.reset()
        if self._wdef is not None:
            self._key, sub = jax.random.split(self._key)
            grid = self.inner_env.state.grid
            self._wstate, new_grid = self._wdef.on_reset(self._wstate, sub, grid)
            if new_grid is not grid:
                self.inner_env.state = self.inner_env.state._replace(
                    grid=jnp.asarray(new_grid, dtype=jnp.uint8)
                )
                obs = self.inner_env.universe
        return obs

    def _raw_action_sums(self, action: Any) -> jax.Array:
        """Per-instance sum of the RAW action VALUES — uncropped, exactly
        the tensor the reference wrapper receives (ParsimonyBonus divides
        by ``action.sum(axis=[1,2,3])``, mcl.py:102; a [1, 1, H, W] action
        broadcasts its single sum across the batch like torch does)."""
        if hasattr(action, "detach"):
            action = action.detach().cpu().numpy()
        arr = np.asarray(
            jax.device_get(action) if isinstance(action, jax.Array)
            else action, dtype=np.float32,
        )
        inst = self._config.instances
        if arr.ndim >= 3 and arr.shape[0] == inst:
            sums = arr.reshape(inst, -1).sum(axis=1)
        else:
            sums = np.full((inst,), float(arr.sum()), dtype=np.float32)
        return jnp.asarray(sums, jnp.float32)[:, None]

    def _make_ctx(self, prev_grid: jax.Array, obs: jax.Array,
                  action_patch: np.ndarray, key: jax.Array,
                  action_sum: Any = None) -> StepCtx:
        action_bits = jnp.asarray(action_patch != 0, dtype=jnp.uint8)
        return StepCtx(
            prev_grid=prev_grid,
            obs=jnp.asarray(obs, dtype=jnp.float32),
            action=action_bits,
            action_full=pad_action(action_bits, self._config),
            key=key,
            action_sum=action_sum,
        )

    def step(self, action: Any) -> Tuple[jax.Array, jax.Array, jax.Array, Any]:
        prev_grid = self.inner_env.state.grid
        obs, reward, done, info = self.env.step(action)
        if self._wdef is not None:
            patch = self.inner_env._coerce_action(action)
            self._key, sub = jax.random.split(self._key)
            ctx = self._make_ctx(prev_grid, obs, patch, sub,
                                 action_sum=self._raw_action_sums(action))
            # the inner env may be a torch-returning compat facade
            # (carle_tpu/compat): coerce its reward before the jitted apply
            # (jax arrays pass through untouched — no host sync)
            if hasattr(reward, "detach"):
                reward = jnp.asarray(
                    reward.detach().cpu().numpy(), jnp.float32
                )
            self._wstate, reward = self._jit_apply(self._wstate, ctx, reward)
        return obs, reward, done, info

    # -- torch-compat shims -------------------------------------------------
    def eval(self) -> "Motivator":
        self._train = False
        self._rebuild_mode()
        return self

    def train(self) -> "Motivator":
        self._train = True
        self._rebuild_mode()
        return self

    def _rebuild_mode(self) -> None:
        """Hook for learning wrappers to swap train/eval apply functions."""

    def to(self, *a: Any, **k: Any) -> "Motivator":
        return self

    def set_grad(self) -> None:
        pass

    def set_no_grad(self) -> None:
        pass

    def state_dict(self) -> Any:
        """Reference-compatible ``state_dict`` of this wrapper stack — torch
        tensors, reference key layout/nesting, loadable into the matching
        reference class with ``strict=True``; ``torch.save(env.state_dict(),
        path)`` works verbatim (train_mcl.py:80-84).  See mcl/export.py."""
        from .export import to_state_dict

        return to_state_dict(self)
