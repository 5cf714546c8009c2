"""Multi-device tests on the 8-device CPU fake mesh (conftest.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from carle_tpu import EnvConfig, rules
from carle_tpu.agents import make_random_agent
from carle_tpu.mcl.rnd import rnd2d_def
from carle_tpu.ops.ca import ca_step_grid
from carle_tpu.parallel import (
    make_mesh,
    shard_carry,
    spatial_ca_step,
    spatial_multi_step,
)
from carle_tpu.rollout import Rollout


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


def test_spatial_sharded_step_matches_single_device():
    mesh = make_mesh(axis_name="space")
    rng = np.random.RandomState(0)
    grid = (rng.rand(2, 64, 128) < 0.3).astype(np.uint8)

    expected = np.asarray(ca_step_grid(jnp.asarray(grid), rules.LIFE))
    sharded = np.asarray(spatial_ca_step(jnp.asarray(grid), rules.LIFE, mesh))
    np.testing.assert_array_equal(sharded, expected)


def test_spatial_multi_step_matches_single_device():
    mesh = make_mesh(axis_name="space")
    rng = np.random.RandomState(1)
    grid = (rng.rand(1, 64, 64) < 0.25).astype(np.uint8)

    ref = jnp.asarray(grid)
    for _ in range(8):
        ref = ca_step_grid(ref, rules.MORLEY)
    out = spatial_multi_step(jnp.asarray(grid), rules.MORLEY, 8, mesh)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sharded_rollout_matches_unsharded():
    """The jitted rollout on a sharded carry must produce the same rewards
    as the single-device run — sharding is placement, not semantics."""
    config = EnvConfig(height=64, width=64, action_height=16, action_width=16,
                       instances=8)
    ro = Rollout(config, wrappers=[rnd2d_def(config, batch_size=4)],
                 agent=make_random_agent(16, 16))

    carry = ro.init(jax.random.PRNGKey(0), rules.LIFE)
    base = jax.tree.map(jnp.copy, carry)
    _, rewards_single = ro.run(base, num_steps=8)

    mesh = make_mesh(axis_name="env")
    sharded = shard_carry(jax.tree.map(jnp.copy, carry), mesh, config)
    _, rewards_sharded = ro.run(sharded, num_steps=8)

    np.testing.assert_allclose(
        np.asarray(rewards_single), np.asarray(rewards_sharded),
        rtol=1e-6, atol=1e-6,
    )


def test_shard_carry_places_grid_across_devices():
    config = EnvConfig(height=64, width=64, action_height=16, action_width=16,
                       instances=8)
    ro = Rollout(config, wrappers=[], agent=make_random_agent(16, 16))
    carry = ro.init(jax.random.PRNGKey(0), rules.LIFE)
    mesh = make_mesh(axis_name="env")
    sharded = shard_carry(carry, mesh, config)
    grid_sharding = sharded.stack.env.grid.sharding
    assert grid_sharding.spec == jax.sharding.PartitionSpec("env", None, None)
    # params-free agent + rule bits stay replicated
    assert sharded.stack.env.rule_bits.sharding.spec == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("rule_bits", [rules.LIFE, rules.DAY_AND_NIGHT])
def test_pallas_halo_step_matches_single_device(rule_bits):
    """Explicit-RDMA halo kernel (interpreted, race detection ON) must match
    the single-device update bit-exactly."""
    from carle_tpu.parallel.pallas_halo import spatial_ca_step_pallas

    mesh = make_mesh(axis_name="space")
    rng = np.random.RandomState(4)
    grid = (rng.rand(2, 64, 128) < 0.3).astype(np.uint8)

    expected = np.asarray(ca_step_grid(jnp.asarray(grid), rule_bits))
    out = spatial_ca_step_pallas(
        jnp.asarray(grid), rule_bits, mesh, interpret=True, detect_races=True
    )
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_pallas_halo_multiple_steps_chain():
    """Chained halo steps keep parity (semaphore/barrier reuse is clean)."""
    from carle_tpu.parallel.pallas_halo import spatial_ca_step_pallas

    mesh = make_mesh(axis_name="space")
    rng = np.random.RandomState(5)
    grid = (rng.rand(1, 32, 64) < 0.35).astype(np.uint8)

    ref = jnp.asarray(grid)
    out = jnp.asarray(grid)
    for _ in range(3):
        ref = ca_step_grid(ref, rules.LIFE)
        out = spatial_ca_step_pallas(out, rules.LIFE, mesh, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_halo_multi_step_kernel():
    """K generations per launch with per-generation in-kernel RDMA must
    match the single-device multi-step bit-exactly (race detection ON)."""
    from carle_tpu.parallel.pallas_halo import spatial_multi_step_pallas

    mesh = make_mesh(axis_name="space")
    rng = np.random.RandomState(6)
    grid = (rng.rand(2, 64, 128) < 0.3).astype(np.uint8)

    ref = jnp.asarray(grid)
    for _ in range(5):
        ref = ca_step_grid(ref, rules.LIFE)
    out = spatial_multi_step_pallas(
        jnp.asarray(grid), rules.LIFE, 5, mesh,
        interpret=True, detect_races=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
