"""Packed spatial ENV mode — full environment semantics at packed-engine rates.

The GSPMD spatial env mode (spatial_env.py) gives full ``env_step`` semantics
on row-sharded universes but is pinned to the uint8 XLA engine (~60x under
the packed engines: a ``pallas_call`` is opaque to the GSPMD partitioner).
The explicit-halo packed path (spatial.py: ``bit_spatial_multi_step``) has
the speed but is bare-CA only.  This module closes that gap — the VERDICT r2
top item: the complete environment transition

* centred action-window XOR toggle            (reference env.py:150-182)
* batch-global master reset on all-ones       (reference env.py:208-216)
* the CA generation                           (reference env.py:219-227)
* every wrapper bonus incl. online learning   (reference mcl.py:398-407)

on a universe stored 32 cells/word and row-sharded over a ``space`` mesh
axis.  The hot CA update runs inside an explicit ``shard_map``: ghost rows
ride the ring as uint32 words (8x smaller than uint8 halos) and the
row-local update is the carry-save-adder engine (ops/bitpack.py) — on TPU
hardware the same arithmetic the 1.5e12 cells/s kernels run.  Everything
around it (action packing, lazy observation unpacking, wrapper networks)
stays ordinary XLA on row-sharded operands, so GSPMD inserts the wrapper
collectives while the stencil's halo traffic is explicit and minimal.

Observations unpack lazily, shard-local: ``unpack_grid`` expands the word
axis in place, so each device materialises only ITS rows as cells — the
full-resolution float32 obs exists only as a row-sharded transient consumed
by the bonus nets, never as a replicated array.

Usage (drop-in for the uint8 spatial mode)::

    mesh = make_mesh(jax.devices(), axis_name="space")
    stack = PackedSpatialStack(config, wrappers, mesh)
    ro = Rollout(config, agent=agent, stack=stack)
    carry = shard_carry_packed(ro.init(key, rule_bits), mesh, config)
    carry, rewards = ro.run(carry, num_steps)      # full env, packed + sharded

Trajectory parity vs the single-device uint8 env is bit-exact, including
toggles, master resets and online-learning wrapper stacks
(tests/test_packed_spatial.py, which also runs a >= 2048^2 universe over the
8-device CPU mesh).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EnvConfig
from ..mcl.base import StackState, StepCtx, WrapperDef, WrapperStack
from ..ops.bitpack import WORD, pack_grid, unpack_grid
from ..ops.ca import pad_action
from ..packed import PackedEnvState, init_packed_state
from .spatial import _bit_local_step
from .spatial_env import spatial_sharding


def _local_env_ca(
    grid: jax.Array,
    action_packed: jax.Array,
    rule_bits: jax.Array,
    do_reset: jax.Array,
    *,
    axis_name: str,
) -> jax.Array:
    """Row-shard-local env transition core: XOR toggle, one packed CA
    generation with ring halos, batch-global master reset.  Runs under
    shard_map on [inst, H_local, W/32] uint32 blocks."""
    toggled = grid ^ action_packed
    stepped = _bit_local_step(toggled, rule_bits, axis_name)
    return jnp.where(do_reset, jnp.zeros_like(stepped), stepped)


class PackedSpatialStack(WrapperStack):
    """WrapperStack whose universe is bit-packed and row-sharded.

    Same public contract as :class:`~carle_tpu.mcl.base.WrapperStack`
    (``init``/``step``/``reset``/``observe``), so :class:`Rollout`, the
    drivers and the eval harness compose with it unchanged.  ``init`` splits
    keys identically to the base class — a parity run can share wrapper
    params with a single-device stack by passing the same key.

    Constraints: ``width % 32 == 0`` (word packing) and
    ``height % mesh.shape[axis_name] == 0`` (row sharding).  Learned
    wrappers run fused here too: build their defs with
    ``fused_head=nets.SpaceSharding(mesh, axis_name, env_axis)`` and the
    kernels shard_map over the space axis with explicit row-halo exchange
    (parallel/spatial_heads.py — lifts the r3 plain-XLA-only constraint);
    with ``fused_head=False`` the wrapper nets run as ordinary XLA convs
    under GSPMD.
    """

    def __init__(
        self,
        config: EnvConfig,
        wrappers: Sequence[WrapperDef] = (),
        mesh: Mesh = None,
        axis_name: str = "space",
        env_axis: str = None,
        serialize: bool = False,
    ) -> None:
        super().__init__(config, wrappers, serialize=serialize)
        assert config.width % WORD == 0, (
            f"packed spatial env needs width % {WORD} == 0, got {config.width}"
        )
        self.mesh = mesh
        self.axis_name = axis_name
        # optional 2-D env x space mesh: instances shard over ``env_axis``
        # AND rows over ``axis_name`` in the same program (the packed
        # counterpart of spatial_env.shard_carry_2d) — the space-axis
        # ppermute ring then runs independently per env-slice
        self.env_axis = env_axis
        self._ca_cache = {}
        if mesh is not None:
            n = mesh.shape[axis_name]
            assert config.height % n == 0, (
                f"height {config.height} not divisible by the space axis ({n})"
            )
            if env_axis is not None:
                assert config.instances % mesh.shape[env_axis] == 0, (
                    f"instances {config.instances} not divisible by the env "
                    f"axis ({mesh.shape[env_axis]})"
                )

    def _ca(self, grid, action_packed, rule_bits, do_reset):
        if self.mesh is None:
            # single-device fallback (one chip / tests): the same packed
            # semantics without the ring
            from ..ops.bitpack import bit_ca_step

            return jnp.where(
                do_reset, jnp.zeros_like(grid),
                bit_ca_step(grid ^ action_packed, rule_bits),
            )
        rb_ndim = jnp.ndim(rule_bits)
        fn = self._ca_cache.get(rb_ndim)
        if fn is None:
            spec = P(self.env_axis, self.axis_name, None)
            rb_spec = P(self.env_axis) if rb_ndim == 1 else P()
            # jit the cached instance: a bare shard_map re-traces (and on
            # the tunneled TPU re-hits the remote compiler) EVERY eager
            # call — CLAUDE.md's ~70x footgun.  Inside Rollout's jitted
            # entry points the inner jit inlines for free.
            fn = jax.jit(shard_map(
                partial(_local_env_ca, axis_name=self.axis_name),
                mesh=self.mesh,
                in_specs=(spec, spec, rb_spec, P()),
                out_specs=spec,
            ))
            self._ca_cache[rb_ndim] = fn
        return fn(grid, action_packed, rule_bits, do_reset)

    # --- state accessors ----------------------------------------------------
    def universe(self, state: StackState, instance: int = None) -> jax.Array:
        g = state.env.grid
        if instance is not None:
            g = g[instance]  # decode ONE instance, not the whole batch
        return unpack_grid(g, self.config.width)

    def init(self, key: jax.Array, rule_bits: int) -> StackState:
        keys = jax.random.split(key, max(len(self.wrappers), 1))
        wstates = tuple(w.init(k) for w, k in zip(self.wrappers, keys))
        return StackState(
            env=init_packed_state(self.config, rule_bits), wrappers=wstates
        )

    # --- the fused transition ------------------------------------------------
    def step(
        self, state: StackState, action: jax.Array, key: jax.Array
    ) -> Tuple[StackState, Tuple[jax.Array, jax.Array]]:
        cfg = self.config
        action_bits = (action != 0).astype(jnp.uint8)
        # reference env.py:208 semantics: reset iff mean of the VALUES == 1.0
        do_reset = jnp.mean(action.astype(jnp.float32)) == 1.0
        any_action = jnp.any(action_bits != 0)

        from ..packed import pack_action

        action_packed = pack_action(action_bits, cfg)  # u32 [inst, H, W/32]
        # full-size uint8 patch for wrappers that read ctx.action_full —
        # dead code (DCE'd) when none in the stack does
        action_full = pad_action(action_bits, cfg)     # uint8 [inst, H, W]

        env = state.env
        prev_packed = env.grid
        new_packed = self._ca(prev_packed, action_packed, env.rule_bits,
                              do_reset)

        new_env = PackedEnvState(
            grid=new_packed,
            rule_bits=env.rule_bits,
            step_num=jnp.where(do_reset, 0, env.step_num + 1).astype(
                jnp.int32
            ),
            steps_since_action=jnp.where(
                do_reset,
                0,
                env.steps_since_action + jnp.where(any_action, 0, 1),
            ).astype(jnp.int32),
        )

        # lazy, shard-local unpack: cells exist only row-sharded + transient —
        # and if every wrapper is packed-native (mcl/packed_stats.py) the
        # unpacks below are dead code XLA removes from the compiled program
        obs_cells = unpack_grid(new_packed, cfg.width)[:, None]
        obs = obs_cells.astype(jnp.float32)
        ctx = StepCtx(
            prev_grid=unpack_grid(prev_packed, cfg.width),
            obs=obs,
            obs_cells=obs_cells,
            action=action_bits,
            action_full=action_full,
            key=key,
            packed=new_packed,
            action_sum=jnp.sum(
                action.astype(jnp.float32), axis=(1, 2)
            )[:, None],
            packed_prev=prev_packed,
            packed_action=action_packed,
        )
        reward = jnp.zeros((cfg.instances, 1), dtype=jnp.float32)
        new_wstates, reward = self._apply_wrappers(state.wrappers, ctx, reward)
        return (
            StackState(env=new_env, wrappers=new_wstates),
            (obs, reward),
        )

    def reset(
        self, state: StackState, key: jax.Array
    ) -> Tuple[StackState, jax.Array]:
        cfg = self.config
        env = PackedEnvState(
            grid=jnp.zeros_like(state.env.grid),
            rule_bits=state.env.rule_bits,
            step_num=jnp.zeros_like(state.env.step_num),
            steps_since_action=jnp.zeros_like(state.env.steps_since_action),
        )
        # wrapper reset hooks operate in the cell domain (MorphoBonus seeds
        # nucleation noise — mcl.py:185-195); resets are rare, repack after
        grid = unpack_grid(env.grid, cfg.width)
        keys = jax.random.split(key, max(len(self.wrappers), 1))
        new_wstates = []
        for w, ws, k in zip(self.wrappers, state.wrappers, keys):
            ws, grid = w.on_reset(ws, k, grid)
            new_wstates.append(ws)
        env = env._replace(grid=pack_grid(grid))
        return (
            StackState(env=env, wrappers=tuple(new_wstates)),
            grid.astype(jnp.float32)[:, None],
        )

    # --- beyond-parity: action-free fast path --------------------------------
    def free_steps(self, state: StackState, num_steps: int) -> StackState:
        """``num_steps`` action-free generations at the bare packed-halo rate
        (no unpack, no wrapper work — for burn-in / serving rollouts).
        On a 2-D env x space mesh this path's shard_map replicates the
        instance axis (bit_spatial_multi_step is space-only), so the grid
        is gathered over ``env_axis`` for the burst — prefer it for
        space-dominant meshes."""
        from .spatial import bit_spatial_multi_step

        if self.mesh is None:
            from ..ops.bitpack import bit_multi_step

            grid = bit_multi_step(state.env.grid, state.env.rule_bits,
                                  num_steps)
        else:
            grid = bit_spatial_multi_step(
                state.env.grid, state.env.rule_bits, num_steps, self.mesh,
                self.axis_name,
            )
        env = state.env._replace(
            grid=grid,
            step_num=state.env.step_num + num_steps,
            # an action-free burst advances steps_since_action too, matching
            # CARLE.multi_step (env.py:387) — state read after the burst must
            # not see a stale counter.
            steps_since_action=state.env.steps_since_action + num_steps,
        )
        return state._replace(env=env)


def packed_spatial_sharding(
    mesh: Mesh, leaf: Any, config: EnvConfig, axis_name: str = "space",
    env_axis: str = None,
) -> NamedSharding:
    """Sharding for one packed-spatial state leaf: packed universes
    [inst, H, W/32] shard rows (and, with ``env_axis`` on a 2-D mesh,
    instances too); universe-extent cell leaves (wrapper frame rings etc.)
    shard via :func:`spatial_sharding`; the rest replicate."""
    shape = np.shape(leaf)
    n = mesh.shape[axis_name]
    if (
        len(shape) >= 2
        and shape[-2] == config.height
        and shape[-1] == config.width // WORD
        and config.height % n == 0
    ):
        axes = [None] * len(shape)
        axes[-2] = axis_name
        if (
            env_axis is not None
            and env_axis in mesh.shape
            and len(shape) >= 3
            and shape[0] == config.instances
            and config.instances % mesh.shape[env_axis] == 0
        ):
            axes[0] = env_axis
        return NamedSharding(mesh, P(*axes))
    return spatial_sharding(mesh, leaf, config, axis_name, env_axis=env_axis)


def shard_carry_packed(
    carry: Any, mesh: Mesh, config: EnvConfig, axis_name: str = "space",
    env_axis: str = None,
) -> Any:
    """Commit a packed-spatial rollout carry: packed universes (and any
    cell-extent wrapper buffers) row-sharded, params/opt-state replicated.
    With ``env_axis`` on a 2-D ``Mesh(devs.reshape(n_env, n_space),
    ("env", "space"))``, instance-batched leaves additionally shard dim 0 —
    pass the same axes to :class:`PackedSpatialStack`.  No backend
    restriction — the CA runs in an explicit shard_map, not under GSPMD,
    so this mode is not pinned to the uint8 XLA engine."""
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf,
            packed_spatial_sharding(mesh, leaf, config, axis_name,
                                    env_axis=env_axis),
        ),
        carry,
    )
