"""Fused rollout driver — agent + env + wrapper stack in ONE jitted scan.

The reference's hot loop re-enters Python every step (train_mcl.py:64-68:
``action = agent(obs); env.step(action)``), paying host-device latency per
step.  Here the whole segment is a single ``lax.scan`` under ``jit``: the
policy forward, the CA update, every bonus network, gradient accumulation and
optimizer updates all compile into one XLA program; the only host traffic is
the carry in and the stacked rewards out.

This is the primary training/eval path on TPU; the class shells exist for
API compatibility and interactive use.

NOTE: ``run``/``run_actions`` DONATE their input carry (zero-copy updates of
multi-hundred-MB grid/param states).  A carry passed in must not be reused —
copy first (``jax.tree.map(jnp.copy, carry)``) to branch trajectories.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .agents import Agent
from .config import EnvConfig
from .mcl.base import StackState, WrapperDef, WrapperStack


class RolloutCarry(NamedTuple):
    stack: StackState
    agent_params: Any
    key: jax.Array


class Rollout:
    """Binds (config, wrappers, agent) into jitted segment runners."""

    def __init__(
        self,
        config: EnvConfig,
        wrappers: Sequence[WrapperDef] = (),
        agent: Optional[Agent] = None,
    ) -> None:
        self.config = config
        self.stack = WrapperStack(config, wrappers)
        self.agent = agent
        self._run = jax.jit(self._run_impl, static_argnames=("num_steps",),
                            donate_argnames=("carry",))
        self._run_actions = jax.jit(self._run_actions_impl,
                                    donate_argnames=("carry",))

    # -- construction --------------------------------------------------------
    def init(
        self, key: jax.Array, rule_bits: int, agent_params: Any = None
    ) -> RolloutCarry:
        """Build the carry.  ``agent_params`` (e.g. a trained policy or a
        converted submission) overrides the agent's own ``init``."""
        k_stack, k_agent, k_run = jax.random.split(key, 3)
        if agent_params is None:
            agent_params = self.agent.init(k_agent) if self.agent else None
        return RolloutCarry(
            stack=self.stack.init(k_stack, rule_bits),
            agent_params=agent_params,
            key=k_run,
        )

    def reset(self, carry: RolloutCarry) -> Tuple[RolloutCarry, jax.Array]:
        key, sub = jax.random.split(carry.key)
        stack, obs = self.stack.reset(carry.stack, sub)
        return carry._replace(stack=stack, key=key), obs

    def with_rules(self, carry: RolloutCarry, rule_bits: int) -> RolloutCarry:
        """Swap rulesets — a state update, never a retrace (rules are data)."""
        env = carry.stack.env._replace(
            rule_bits=jnp.asarray(rule_bits, dtype=jnp.int32)
        )
        return carry._replace(stack=carry.stack._replace(env=env))

    # -- policy-driven segments ----------------------------------------------
    def _step(self, carry: RolloutCarry, _) -> Tuple[RolloutCarry, jax.Array]:
        key, k_act, k_step = jax.random.split(carry.key, 3)
        obs = carry.stack.env.grid.astype(jnp.float32)[:, None]
        action = self.agent.apply(carry.agent_params, k_act, obs)
        patch = action.reshape(
            self.config.instances,
            self.config.eff_action_height,
            self.config.eff_action_width,
        )
        stack, (_, reward) = self.stack.step(carry.stack, patch, k_step)
        return (
            RolloutCarry(stack=stack, agent_params=carry.agent_params, key=key),
            reward,
        )

    def _run_impl(self, carry: RolloutCarry, num_steps: int):
        return jax.lax.scan(self._step, carry, length=num_steps)

    def run(self, carry: RolloutCarry, num_steps: int):
        """Run ``num_steps`` policy steps; returns (carry, rewards
        [steps, inst, 1])."""
        if self.agent is None:
            raise ValueError("rollout has no agent; use run_actions")
        return self._run(carry, num_steps=num_steps)

    # -- fixed action streams (parity tests, canned demos) --------------------
    def _action_step(self, carry: RolloutCarry, action: jax.Array):
        key, k_step = jax.random.split(carry.key)
        stack, (_, reward) = self.stack.step(carry.stack, action, k_step)
        return carry._replace(stack=stack, key=key), reward

    def _run_actions_impl(self, carry: RolloutCarry, actions: jax.Array):
        return jax.lax.scan(self._action_step, carry, actions)

    def run_actions(self, carry: RolloutCarry, actions: jax.Array):
        """Drive a pre-built action stream [steps, inst, AH, AW]."""
        return self._run_actions(carry, jnp.asarray(actions))
