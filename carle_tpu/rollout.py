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

import os
import time
from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
        stack: Optional[WrapperStack] = None,
    ) -> None:
        self.config = config
        # ``stack`` swaps the state representation (e.g. the bit-packed
        # row-sharded PackedSpatialStack, parallel/packed_env.py) while the
        # rollout machinery stays unchanged — it only touches the stack
        # through step/reset/observe.
        self.stack = WrapperStack(config, wrappers) if stack is None else stack
        self.agent = agent
        self._run = jax.jit(self._run_impl, static_argnames=("num_steps",),
                            donate_argnames=("carry",))
        self._run_actions = jax.jit(self._run_actions_impl,
                                    donate_argnames=("carry",))
        self._run_traced = jax.jit(
            self._run_traced_impl,
            static_argnames=("num_steps", "instance"),
            donate_argnames=("carry",),
        )
        self._run_framed = jax.jit(
            self._run_framed_impl,
            static_argnames=("num_steps", "instance"),
            donate_argnames=("carry",),
        )

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
        obs = self.stack.observe(carry.stack)
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

    # -- logged segments: fused speed + reference episode artifacts ----------
    def _traced_step(self, carry: RolloutCarry, _, instance: int):
        key, k_act, k_step = jax.random.split(carry.key, 3)
        obs = self.stack.observe(carry.stack)
        action = self.agent.apply(carry.agent_params, k_act, obs)
        patch = action.reshape(
            self.config.instances,
            self.config.eff_action_height,
            self.config.eff_action_width,
        )
        stack, (_, reward) = self.stack.step(carry.stack, patch, k_step)
        new_carry = RolloutCarry(
            stack=stack, agent_params=carry.agent_params, key=key
        )
        return new_carry, (reward, (patch[instance] != 0).astype(jnp.uint8))

    def _run_traced_impl(self, carry: RolloutCarry, num_steps: int,
                         instance: int):
        return jax.lax.scan(
            lambda c, x: self._traced_step(c, x, instance),
            carry, length=num_steps,
        )

    def run_logged(
        self,
        carry: RolloutCarry,
        num_steps: int,
        snapshot_every: int = 256,
        instance: int = 0,
        directory: str = "./logs",
        save_png: bool = False,
    ) -> Tuple[RolloutCarry, jax.Array, str]:
        """Fused run with periodic episode artifacts (the observability the
        per-step shell gets from ``logging=True`` — reference env.py:466-513
        — without dropping to the dispatch-bound path).

        Runs in jitted chunks of ``snapshot_every`` steps; after each chunk
        the logged instance's universe and its most recent action patch are
        pulled to the host and RLE-encoded as one log entry.  Writes the
        reference's CSV episode-log format (plus optional PNG frames) and
        returns (carry, rewards [steps, inst, 1], log_path).

        Chunk length is a static jit argument: when ``num_steps`` is not a
        multiple of ``snapshot_every`` the trailing partial chunk compiles
        a SECOND program — keep them divisible on the tunneled TPU, where a
        fused-program compile costs minutes.
        """
        from . import rle as rle_codec
        from . import rules as rules_mod

        if self.agent is None:
            raise ValueError("rollout has no agent; use run_actions")
        exp_id = str(int(time.time()))
        os.makedirs(directory, exist_ok=True)
        entries: List[List[str]] = []
        rewards_chunks: List[np.ndarray] = []
        done = 0
        while done < num_steps:
            k = int(min(snapshot_every, num_steps - done))
            carry, (rewards, actions) = self._run_traced(
                carry, num_steps=k, instance=instance
            )
            done += k
            grid = np.asarray(
                jax.device_get(self.stack.universe(carry.stack, instance))
            )
            last_action = np.asarray(jax.device_get(actions[-1]))
            rb = np.asarray(jax.device_get(carry.stack.env.rule_bits))
            # per-instance rule vectors: log the logged instance's rule
            birth, survive = rules_mod.unpack_rule_bits(
                int(rb[instance] if rb.ndim == 1 else rb)
            )
            entries.append([
                rle_codec.encode_grid(
                    last_action, birth, survive,
                    exp_id=exp_id, step=done, action=True,
                    torus=last_action.shape,
                ),
                rle_codec.encode_grid(
                    grid, birth, survive, exp_id=exp_id, step=done,
                    torus=grid.shape,
                ),
            ])
            if save_png:
                from .utils.png import write_png

                write_png(
                    os.path.join(directory,
                                 f"frame{exp_id}_step{done}.png"),
                    (255 * grid).astype(np.uint8),
                )
            rewards_chunks.append(np.asarray(rewards))

        log_path = os.path.join(directory, f"carle_log{exp_id}.csv")
        with open(log_path, "w") as f:
            f.write("action,universe,\n")
            for entry in entries:
                for item in entry:
                    f.write('"' + item + '"' + ",")
                f.write("\n")
        return carry, np.concatenate(rewards_chunks), log_path

    # -- animated episodes ---------------------------------------------------
    def _framed_step(self, carry: RolloutCarry, _, instance: int):
        new_carry, (reward, action_bits) = self._traced_step(carry, _, instance)
        frame = self.stack.universe(new_carry.stack, instance).astype(jnp.uint8)
        return new_carry, (reward, action_bits, frame)

    def _run_framed_impl(self, carry: RolloutCarry, num_steps: int,
                         instance: int):
        return jax.lax.scan(
            lambda c, x: self._framed_step(c, x, instance),
            carry, length=num_steps,
        )

    def run_gif(
        self,
        carry: RolloutCarry,
        num_steps: int,
        path: str = "./logs/episode.gif",
        every: int = 1,
        instance: int = 0,
        fps: float = 20.0,
        scale: int = 1,
        chunk: int = 256,
        mark_actions: bool = True,
    ) -> Tuple[RolloutCarry, jax.Array, str]:
        """Fused run that also writes the episode as an animated GIF.

        The per-step universe of ``instance`` is stacked inside the scan
        (uint8, [steps, H, W] — 64 KB/step at 256²) and written host-side by
        the dependency-free encoder in utils/gif.py, keeping the whole run
        on the fused path (the reference can only produce per-step PNG
        frames from its dispatch-bound loop, env.py:504-513).  ``every``
        downsamples frames; with ``mark_actions`` cells the agent toggled
        this step render in the palette's highlight colour.  Returns
        (carry, rewards [steps, inst, 1], path).  Same chunking caveat as
        :meth:`run_logged` — keep ``num_steps`` divisible by ``chunk``.
        """
        from .utils.gif import write_gif

        if self.agent is None:
            raise ValueError("rollout has no agent; use run_actions")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        frames: List[np.ndarray] = []
        rewards_chunks: List[np.ndarray] = []
        done = 0
        while done < num_steps:
            k = int(min(chunk, num_steps - done))
            carry, (rewards, action_bits, grids) = self._run_framed(
                carry, num_steps=k, instance=instance
            )
            done += k
            rewards_chunks.append(np.asarray(rewards))
            g = np.asarray(jax.device_get(grids))          # [k, H, W] 0/1
            if mark_actions:
                a = np.asarray(jax.device_get(action_bits))  # [k, AH, AW] 0/1
                co = self.config
                top, left = co.action_row_offset, co.action_col_offset
                overlay = np.zeros_like(g)
                overlay[:, top:top + co.eff_action_height,
                        left:left + co.eff_action_width] = a
                g = np.where(overlay != 0, np.uint8(2), g)
            # phase-correct downsample across chunk boundaries
            start = (-(done - k)) % max(1, every)
            frames.append(g[start::max(1, every)])
        write_gif(path, np.concatenate(frames), fps=fps, scale=scale)
        return carry, np.concatenate(rewards_chunks), path

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
