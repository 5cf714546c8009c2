"""Packed spatial ENV mode (parallel/packed_env.py) — parity + semantics.

VERDICT r2 top item: full env_step semantics (centred action XOR,
batch-global master reset, wrapper bonuses incl. online learning) on a
row-sharded bit-packed universe, bit-exact against the single-device uint8
env.  The conftest provides the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carle_tpu import EnvConfig, rules
from carle_tpu.mcl.puffer import puffer_def
from carle_tpu.mcl.speed import speed_def
from carle_tpu.ops.bitpack import pack_grid, unpack_grid
from carle_tpu.parallel import (
    PackedSpatialStack,
    make_mesh,
    shard_carry_packed,
)
from carle_tpu.rollout import Rollout


def _run_pair(cfg, wrappers_fn, actions, key=0, packed_mesh=True):
    """Run the same action stream through the single-device uint8 stack and
    the packed (optionally row-sharded) stack; return (grid, rewards) pairs."""

    def run(packed):
        if packed:
            mesh = (
                make_mesh(jax.devices(), axis_name="space")
                if packed_mesh
                else None
            )
            stack = PackedSpatialStack(cfg, wrappers_fn(), mesh)
            ro = Rollout(cfg, stack=stack)
            carry = ro.init(jax.random.PRNGKey(key), rules.LIFE)
            if mesh is not None:
                carry = shard_carry_packed(carry, mesh, cfg)
        else:
            ro = Rollout(cfg, wrappers_fn())
            carry = ro.init(jax.random.PRNGKey(key), rules.LIFE)
        carry, rewards = ro.run_actions(carry, actions)
        grid = np.asarray(ro.stack.universe(carry.stack))
        return grid, np.asarray(rewards)

    return run(packed=False), run(packed=True)


def test_packed_spatial_wrapped_rollout_parity_2048():
    """>= 2048^2 on the 8-device mesh (the VERDICT 'done' bar): wrapped
    rollout with toggles must match the single-device env bit-exactly."""
    cfg = EnvConfig(height=2048, width=2048, action_height=64,
                    action_width=64, instances=1)
    rng = np.random.RandomState(7)
    actions = (rng.rand(4, 1, 64, 64) < 0.15).astype(np.uint8)

    def wrappers():
        return [speed_def(cfg, reward_scale=1e-2),
                puffer_def(cfg, reward_scale=1e-3)]

    (grid_1, rewards_1), (grid_8, rewards_8) = _run_pair(
        cfg, wrappers, actions
    )
    np.testing.assert_array_equal(grid_8, grid_1)
    np.testing.assert_allclose(rewards_8, rewards_1, rtol=1e-5, atol=1e-7)


def test_packed_spatial_online_learning_parity():
    """RND2D online learning (grad accumulation + Adam INSIDE the scanned
    step) on the packed row-sharded stack matches the uint8 stack."""
    from carle_tpu.mcl.rnd import rnd2d_def

    cfg = EnvConfig(height=64, width=64, action_height=16, action_width=16,
                    instances=2)
    rng = np.random.RandomState(3)
    actions = (rng.rand(6, 2, 16, 16) < 0.2).astype(np.uint8)

    def wrappers():
        return [rnd2d_def(cfg, batch_size=2)]

    (grid_1, rewards_1), (grid_8, rewards_8) = _run_pair(
        cfg, wrappers, actions
    )
    np.testing.assert_array_equal(grid_8, grid_1)
    np.testing.assert_allclose(rewards_8, rewards_1, rtol=2e-5, atol=1e-6)
    assert np.any(rewards_8 != 0.0)


def test_packed_spatial_master_reset():
    """An all-ones action fires the batch-global master reset in-graph."""
    cfg = EnvConfig(height=128, width=128, action_height=16, action_width=16,
                    instances=2)
    mesh = make_mesh(jax.devices(), axis_name="space")
    stack = PackedSpatialStack(cfg, [], mesh)
    ro = Rollout(cfg, stack=stack)
    carry = ro.init(jax.random.PRNGKey(0), rules.LIFE)
    carry = shard_carry_packed(carry, mesh, cfg)

    rng = np.random.RandomState(0)
    seed_actions = (rng.rand(3, 2, 16, 16) < 0.4).astype(np.uint8)
    carry, _ = ro.run_actions(carry, seed_actions)
    assert np.asarray(stack.universe(carry.stack)).sum() > 0
    assert int(carry.stack.env.step_num) == 3

    ones = np.ones((1, 2, 16, 16), dtype=np.uint8)
    carry, _ = ro.run_actions(carry, ones)
    assert np.asarray(stack.universe(carry.stack)).sum() == 0
    assert int(carry.stack.env.step_num) == 0


def test_packed_spatial_reset_hooks():
    """reset() runs wrapper on_reset hooks in the cell domain (MorphoBonus
    nucleation noise) and repacks — parity with the uint8 stack."""
    from carle_tpu.mcl.morpho import morpho_def

    cfg = EnvConfig(height=64, width=64, action_height=16, action_width=16,
                    instances=1)
    mesh = make_mesh(jax.devices(), axis_name="space")

    ro_p = Rollout(cfg, stack=PackedSpatialStack(cfg, [morpho_def(cfg)], mesh))
    ro_u = Rollout(cfg, [morpho_def(cfg)])
    carry_p = ro_p.init(jax.random.PRNGKey(5), rules.LIFE)
    carry_u = ro_u.init(jax.random.PRNGKey(5), rules.LIFE)
    carry_p, obs_p = ro_p.reset(carry_p)
    carry_u, obs_u = ro_u.reset(carry_u)
    np.testing.assert_array_equal(np.asarray(obs_p), np.asarray(obs_u))
    assert np.asarray(obs_p).sum() > 0  # noise was seeded


def test_packed_spatial_free_steps():
    """free_steps runs bare packed generations at the halo-engine rate and
    matches per-step env transitions with zero actions."""
    cfg = EnvConfig(height=128, width=128, action_height=16, action_width=16,
                    instances=1)
    mesh = make_mesh(jax.devices(), axis_name="space")
    stack = PackedSpatialStack(cfg, [], mesh)

    rng = np.random.RandomState(11)
    grid = (rng.rand(1, 128, 128) < 0.3).astype(np.uint8)

    state = stack.init(jax.random.PRNGKey(0), rules.LIFE)
    state = state._replace(env=state.env._replace(grid=pack_grid(grid)))
    fast = stack.free_steps(state, 8)

    slow_state = stack.init(jax.random.PRNGKey(0), rules.LIFE)
    slow_state = slow_state._replace(
        env=slow_state.env._replace(grid=pack_grid(grid))
    )
    zero = np.zeros((1, 16, 16), dtype=np.uint8)
    for i in range(8):
        slow_state, _ = stack.step(slow_state, zero, jax.random.PRNGKey(i))

    np.testing.assert_array_equal(
        np.asarray(unpack_grid(fast.env.grid, cfg.width)),
        np.asarray(unpack_grid(slow_state.env.grid, cfg.width)),
    )
    assert int(fast.env.step_num) == 8
    # action-free bursts advance steps_since_action like CARLE.multi_step
    # (advisor r3): state read after the burst must not be stale.
    assert int(fast.env.steps_since_action) == int(
        slow_state.env.steps_since_action
    ) == 8


def test_packed_spatial_single_device_mode():
    """mesh=None: same packed semantics without the ring (one-chip use)."""
    cfg = EnvConfig(height=64, width=64, action_height=16, action_width=16,
                    instances=2)
    rng = np.random.RandomState(9)
    actions = (rng.rand(4, 2, 16, 16) < 0.2).astype(np.uint8)

    def wrappers():
        return [speed_def(cfg, reward_scale=1e-2)]

    (grid_1, rewards_1), (grid_p, rewards_p) = _run_pair(
        cfg, wrappers, actions, packed_mesh=False
    )
    np.testing.assert_array_equal(grid_p, grid_1)
    np.testing.assert_allclose(rewards_p, rewards_1, rtol=1e-5, atol=1e-7)


def test_packed_spatial_per_instance_rule_vector():
    """Per-instance rule vectors ride through the packed spatial CA."""
    cfg = EnvConfig(height=128, width=128, action_height=16, action_width=16,
                    instances=2)
    mesh = make_mesh(jax.devices(), axis_name="space")
    stack = PackedSpatialStack(cfg, [], mesh)

    rng = np.random.RandomState(2)
    grid = (rng.rand(2, 128, 128) < 0.3).astype(np.uint8)
    rule_vec = np.asarray(
        [rules.LIFE, rules.pack_rule_bits([3, 6, 8], [2, 4, 5])],
        dtype=np.int32,
    )

    state = stack.init(jax.random.PRNGKey(0), rules.LIFE)
    state = state._replace(env=state.env._replace(
        grid=pack_grid(grid), rule_bits=jax.numpy.asarray(rule_vec)
    ))
    zero = np.zeros((2, 16, 16), dtype=np.uint8)
    state, _ = stack.step(state, zero, jax.random.PRNGKey(1))
    got = np.asarray(unpack_grid(state.env.grid, cfg.width))

    from carle_tpu.ops.ca import ca_step_grid

    want0 = np.asarray(ca_step_grid(grid[:1], int(rule_vec[0])))
    want1 = np.asarray(ca_step_grid(grid[1:], int(rule_vec[1])))
    np.testing.assert_array_equal(got[0], want0[0])
    np.testing.assert_array_equal(got[1], want1[0])


def test_packed_spatial_width_must_be_word_multiple():
    cfg = EnvConfig(height=64, width=48, action_height=16, action_width=16,
                    instances=1)
    with pytest.raises(AssertionError, match="width"):
        PackedSpatialStack(cfg, [], None)


def test_packed_spatial_2d_env_space_mesh():
    """2-D env x space mesh: instances AND rows shard in one packed program
    (the packed counterpart of shard_carry_2d) — parity vs single device,
    including an online-learning wrapper."""
    from jax.sharding import Mesh

    from carle_tpu.mcl.rnd import rnd2d_def

    cfg = EnvConfig(height=128, width=128, action_height=16, action_width=16,
                    instances=4)
    rng = np.random.RandomState(13)
    actions = (rng.rand(4, 4, 16, 16) < 0.2).astype(np.uint8)

    ro_u = Rollout(cfg, [rnd2d_def(cfg, batch_size=2)])
    carry_u = ro_u.init(jax.random.PRNGKey(1), rules.LIFE)
    carry_u, rewards_u = ro_u.run_actions(carry_u, actions)
    grid_u = np.asarray(ro_u.stack.universe(carry_u.stack))

    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("env", "space"))
    from carle_tpu.parallel import shard_carry_packed

    stack = PackedSpatialStack(cfg, [rnd2d_def(cfg, batch_size=2)], mesh,
                               env_axis="env")
    ro_p = Rollout(cfg, stack=stack)
    carry_p = ro_p.init(jax.random.PRNGKey(1), rules.LIFE)
    carry_p = shard_carry_packed(carry_p, mesh, cfg, env_axis="env")
    carry_p, rewards_p = ro_p.run_actions(carry_p, actions)
    grid_p = np.asarray(stack.universe(carry_p.stack))

    np.testing.assert_array_equal(grid_p, grid_u)
    np.testing.assert_allclose(np.asarray(rewards_p), np.asarray(rewards_u),
                               rtol=2e-5, atol=1e-6)


def test_packed_stat_wrappers_match_dense():
    """Packed-native Speed/Puffer/Corner (popcounts on words,
    mcl/packed_stats.py) match the dense defs through the packed stack —
    integer counts are exact, so only f32 accumulation order differs."""
    from carle_tpu.mcl import (
        corner_def,
        corner_def_packed,
        puffer_def,
        puffer_def_packed,
        speed_def,
        speed_def_packed,
    )

    cfg = EnvConfig(height=256, width=256, action_height=64, action_width=64,
                    instances=2)
    rng = np.random.RandomState(21)
    actions = (rng.rand(6, 2, 64, 64) < 0.1).astype(np.uint8)
    mesh = make_mesh(jax.devices(), axis_name="space")

    def run(defs):
        stack = PackedSpatialStack(cfg, defs, mesh)
        ro = Rollout(cfg, stack=stack)
        carry = ro.init(jax.random.PRNGKey(3), rules.LIFE)
        carry = shard_carry_packed(carry, mesh, cfg)
        carry, rewards = ro.run_actions(carry, actions)
        return np.asarray(rewards)

    dense = run([speed_def(cfg, reward_scale=1e-2, per_instance=True),
                 puffer_def(cfg, reward_scale=1e-3, growth_threshold=3,
                            per_instance=True),
                 corner_def(cfg, reward_scale=1e-3)])
    packed = run([speed_def_packed(cfg, reward_scale=1e-2,
                                   per_instance=True),
                  puffer_def_packed(cfg, reward_scale=1e-3,
                                    growth_threshold=3, per_instance=True),
                  corner_def_packed(cfg, reward_scale=1e-3)])
    assert np.any(dense != 0.0)
    np.testing.assert_allclose(packed, dense, rtol=1e-4, atol=1e-4)


def test_packed_stat_wrappers_batch_global_modes():
    """The reference's batch-global Speed/Puffer semantics hold on the
    packed-native defs too (per_instance=False default)."""
    from carle_tpu.mcl import (
        puffer_def,
        puffer_def_packed,
        speed_def,
        speed_def_packed,
    )

    cfg = EnvConfig(height=128, width=128, action_height=16, action_width=16,
                    instances=3)
    rng = np.random.RandomState(8)
    actions = (rng.rand(5, 3, 16, 16) < 0.15).astype(np.uint8)
    mesh = make_mesh(jax.devices(), axis_name="space")

    def run(defs):
        stack = PackedSpatialStack(cfg, defs, mesh)
        ro = Rollout(cfg, stack=stack)
        carry = ro.init(jax.random.PRNGKey(4), rules.LIFE)
        carry = shard_carry_packed(carry, mesh, cfg)
        carry, rewards = ro.run_actions(carry, actions)
        return np.asarray(rewards)

    dense = run([speed_def(cfg, reward_scale=1e-2),
                 puffer_def(cfg, reward_scale=1e-3, growth_threshold=2)])
    packed = run([speed_def_packed(cfg, reward_scale=1e-2),
                  puffer_def_packed(cfg, reward_scale=1e-3,
                                    growth_threshold=2)])
    np.testing.assert_allclose(packed, dense, rtol=1e-4, atol=1e-4)


def test_packed_stat_wrappers_require_packed_stack():
    from carle_tpu.mcl import speed_def_packed
    from carle_tpu.mcl.base import WrapperStack

    cfg = EnvConfig(height=64, width=64, action_height=16, action_width=16,
                    instances=1)
    stack = WrapperStack(cfg, [speed_def_packed(cfg)])
    state = stack.init(jax.random.PRNGKey(0), rules.LIFE)
    with pytest.raises(ValueError, match="packed-native"):
        stack.step(state, np.zeros((1, 16, 16), np.uint8),
                   jax.random.PRNGKey(1))


def test_packed_morpho_parsimony_match_dense():
    """Packed-native MorphoBonus (bit-sliced ±1 pattern correlation,
    ops/bitsliced.py — integer-exact) and ParsimonyBonus match the dense
    defs through the packed stack, composed so Parsimony rescales Morpho's
    contribution (reference ordering mcl.py:86-195)."""
    from carle_tpu.mcl import (
        morpho_def,
        morpho_def_packed,
        parsimony_def,
        parsimony_def_packed,
    )

    cfg = EnvConfig(height=128, width=128, action_height=32, action_width=32,
                    instances=2)
    rng = np.random.RandomState(31)
    # mix sparse toggle steps with a heavy-toggle step so Parsimony's
    # 100/max(sum,100) branch exercises both sides
    actions = (rng.rand(5, 2, 32, 32) < 0.1).astype(np.uint8)
    actions[3] = (rng.rand(2, 32, 32) < 0.5).astype(np.uint8)
    mesh = make_mesh(jax.devices(), axis_name="space")

    def run(defs):
        stack = PackedSpatialStack(cfg, defs, mesh)
        ro = Rollout(cfg, stack=stack)
        carry = ro.init(jax.random.PRNGKey(7), rules.LIFE)
        carry = shard_carry_packed(carry, mesh, cfg)
        carry, rewards = ro.run_actions(carry, actions)
        return np.asarray(rewards)

    dense = run([morpho_def(cfg, reward_scale=1.0),
                 parsimony_def()])
    packed = run([morpho_def_packed(cfg, reward_scale=1.0),
                  parsimony_def_packed()])
    assert np.any(dense != 0.0)
    np.testing.assert_allclose(packed, dense, rtol=1e-4, atol=1e-4)


def test_packed_morpho_seeded_reset_parity():
    """morpho_def_packed's on_reset seeds the same nucleation noise as the
    dense def (cell-domain hook through the packed stack's unpack/repack)."""
    from carle_tpu.mcl import morpho_def, morpho_def_packed
    from carle_tpu.mcl.base import WrapperStack

    cfg = EnvConfig(height=64, width=64, action_height=16, action_width=16,
                    instances=2)
    pstack = PackedSpatialStack(cfg, [morpho_def_packed(cfg)], mesh=None)
    dstack = WrapperStack(cfg, [morpho_def(cfg)])
    sp = pstack.init(jax.random.PRNGKey(5), rules.LIFE)
    sd = dstack.init(jax.random.PRNGKey(5), rules.LIFE)
    sp, obs_p = pstack.reset(sp, jax.random.PRNGKey(9))
    sd, obs_d = dstack.reset(sd, jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(obs_p), np.asarray(obs_d))
    assert np.asarray(obs_p).sum() > 0


def test_packed_all_native_stack_has_no_unpack():
    """With Speed+Puffer+Corner+Morpho+Parsimony all packed-native (5 of
    the 10 wrapper classes), the compiled scan step contains NO unpack —
    the [inst, H, W] cell tensor never materialises (the DCE the 8192²
    wrapped-rate headline relies on)."""
    from carle_tpu.mcl import (
        corner_def_packed, morpho_def_packed, parsimony_def_packed,
        puffer_def_packed, speed_def_packed)

    cfg = EnvConfig(height=256, width=256, action_height=64, action_width=64,
                    instances=2)
    defs = [speed_def_packed(cfg), puffer_def_packed(cfg),
            corner_def_packed(cfg), morpho_def_packed(cfg),
            parsimony_def_packed()]
    stack = PackedSpatialStack(cfg, defs, mesh=None)
    carry = stack.init(jax.random.PRNGKey(0), rules.LIFE)

    import jax.numpy as jnp

    def body(c, _):
        c, (obs, r) = stack.step(
            c, jnp.zeros((2, 64, 64), jnp.uint8), jax.random.PRNGKey(1))
        return c, r

    def scan_fn(c):
        return jax.lax.scan(body, c, None, length=4)

    text = jax.jit(scan_fn).lower(carry).compile().as_text()
    # the unpack materialises an [inst, H, W] = [2, 256, 256] cell tensor;
    # its fingerprint in the compiled HLO is a 256x256-shaped operand
    assert "2,256,256" not in text.replace(" ", ""), (
        "cell-domain tensor survived DCE in the all-packed-native stack"
    )


def test_packed_prediction_ring_matches_dense():
    """VERDICT r4 item 4: PredictionBonus/SurpriseBonus with the bit-packed
    frame ring ([inst, K, H, W/32] u32, 32x less carry) through the
    row-sharded packed stack match the dense uint8-ring defs through the
    dense stack — same online-learning trajectory (f32 conv accumulation
    order is the only difference)."""
    from carle_tpu.mcl.base import WrapperStack
    from carle_tpu.mcl.packed_stats import (
        prediction_def_packed,
        surprise_def_packed,
    )
    from carle_tpu.mcl.prediction import prediction_def, surprise_def

    cfg = EnvConfig(height=64, width=64, action_height=16, action_width=16,
                    instances=2)
    rng = np.random.RandomState(11)
    actions = (rng.rand(14, 2, 16, 16) < 0.15).astype(np.uint8)

    dense_defs = [prediction_def(cfg, batch_size=2),
                  surprise_def(cfg, batch_size=2)]
    ro_d = Rollout(cfg, dense_defs, stack=WrapperStack(cfg, dense_defs))
    carry_d = ro_d.init(jax.random.PRNGKey(9), rules.LIFE)
    carry_d, rewards_d = ro_d.run_actions(carry_d, actions)

    mesh = make_mesh(jax.devices(), axis_name="space")
    packed_defs = [prediction_def_packed(cfg, batch_size=2),
                   surprise_def_packed(cfg, batch_size=2)]
    stack = PackedSpatialStack(cfg, packed_defs, mesh)
    ro_p = Rollout(cfg, stack=stack)
    carry_p = ro_p.init(jax.random.PRNGKey(9), rules.LIFE)
    carry_p = shard_carry_packed(carry_p, mesh, cfg)
    carry_p, rewards_p = ro_p.run_actions(carry_p, actions)

    # carry-size assertion: packed ring carries words, 32x fewer bits
    ring_p = carry_p.stack.wrappers[0].extra
    ring_d = carry_d.stack.wrappers[0].extra
    assert ring_p.frames.dtype == jnp.uint32
    assert ring_p.frames.nbytes * 8 == ring_d.frames.nbytes  # u32 words vs u8 cells
    # the ring contents themselves are bit-exact vs the dense cells
    np.testing.assert_array_equal(
        np.asarray(unpack_grid(ring_p.frames, cfg.width)),
        np.asarray(ring_d.frames[:, :, 0]))
    assert np.any(np.asarray(rewards_d) != 0.0)
    # non-mesh packed run is bit-exact vs dense; the 8-device row-sharded
    # convs reassociate the f32 reductions (measured 3.5e-6 at ~0.097)
    np.testing.assert_allclose(np.asarray(rewards_p), np.asarray(rewards_d),
                               rtol=1e-4, atol=2e-6)
