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


def test_spatial_env_mode_wrapped_rollout_parity_1024():
    """The FULL env as a spatial mode (VERDICT round-1 item 3): a wrapped
    rollout — action XOR in the centred window, CA update, Speed/Puffer
    bonuses — on a 1024x1024 row-sharded universe over the 8-device mesh
    must match the single-device env exactly."""
    from carle_tpu.mcl.puffer import puffer_def
    from carle_tpu.mcl.speed import speed_def
    from carle_tpu.parallel import make_mesh, shard_carry_spatial

    cfg = EnvConfig(height=1024, width=1024, action_height=64,
                    action_width=64, instances=1)
    rng = np.random.RandomState(7)
    actions = (rng.rand(4, 1, 64, 64) < 0.15).astype(np.uint8)

    def run(spatial):
        ro = Rollout(cfg, [speed_def(cfg, reward_scale=1e-2),
                           puffer_def(cfg, reward_scale=1e-3)])
        carry = ro.init(jax.random.PRNGKey(0), rules.LIFE)
        if spatial:
            mesh = make_mesh(jax.devices(), axis_name="space")
            carry = shard_carry_spatial(carry, mesh, cfg)
        carry, rewards = ro.run_actions(carry, actions)
        return np.asarray(carry.stack.env.grid), np.asarray(rewards)

    grid_1, rewards_1 = run(spatial=False)
    grid_8, rewards_8 = run(spatial=True)
    np.testing.assert_array_equal(grid_8, grid_1)
    np.testing.assert_allclose(rewards_8, rewards_1, rtol=1e-5, atol=1e-7)


def test_spatial_env_mode_master_reset_and_learning():
    """Spatial mode keeps full env semantics: the all-ones master reset
    clears the sharded universe, and a learning wrapper (RND2D) updates
    in-graph on the row-sharded observation."""
    from carle_tpu.parallel import make_mesh, shard_carry_spatial

    cfg = EnvConfig(height=128, width=128, action_height=32,
                    action_width=32, instances=2)
    mesh = make_mesh(jax.devices(), axis_name="space")
    ro = Rollout(cfg, [rnd2d_def(cfg, batch_size=2)],
                 agent=make_random_agent(32, 32))
    carry = ro.init(jax.random.PRNGKey(1), rules.LIFE)
    carry = shard_carry_spatial(carry, mesh, cfg)

    carry, rewards = ro.run(carry, num_steps=4)
    assert int(carry.stack.wrappers[0].updates) == 2  # Adam ran in-graph
    assert np.all(np.isfinite(np.asarray(rewards)))
    assert np.asarray(carry.stack.env.grid).sum() > 0

    ones = np.ones((1, 2, 32, 32), dtype=np.uint8)  # [steps=1, inst, AH, AW]
    carry, _ = ro.run_actions(carry, ones)  # one all-ones step

    assert np.asarray(carry.stack.env.grid).sum() == 0  # master reset fired


def test_spatial_env_mode_rejects_pallas_backend():
    from carle_tpu.parallel import make_mesh, shard_carry_spatial

    cfg = EnvConfig(height=64, width=64, instances=1, backend="pallas")
    mesh = make_mesh(jax.devices(), axis_name="space")
    with pytest.raises(ValueError, match="spatial env mode"):
        shard_carry_spatial({"x": np.zeros((1, 64, 64))}, mesh, cfg)


@pytest.mark.parametrize("static", [False, True])
def test_bit_spatial_multi_step_matches_single_device(static):
    """Bit-packed halo path (VERDICT round-1 item 4): packed row-sharded
    generations over the 8-device mesh match the single-device packed
    engine bit-for-bit."""
    from carle_tpu.ops.bitpack import bit_multi_step, pack_grid, unpack_grid
    from carle_tpu.parallel import bit_spatial_multi_step, make_mesh

    rng = np.random.RandomState(11)
    grid = (rng.rand(2, 64, 128) < 0.35).astype(np.uint8)
    packed = pack_grid(jnp.asarray(grid))
    bits = rules.pack_rule_bits([3, 6, 8], [2, 4, 5])

    ref = bit_multi_step(packed, jnp.asarray(bits), 6)

    mesh = make_mesh(jax.devices(), axis_name="space")
    out = bit_spatial_multi_step(
        packed, bits, 6, mesh,
        static_rules=([3, 6, 8], [2, 4, 5]) if static else None,
    )
    np.testing.assert_array_equal(
        np.asarray(unpack_grid(out, 128)), np.asarray(unpack_grid(ref, 128))
    )


def test_multiprocess_mesh_rollout(tmp_path):
    """TRUE multi-process mesh (the multi-host code path): two processes x 4
    virtual CPU devices each, glued by jax.distributed into one 8-device
    global mesh, running the sharded fused rollout AND a row-sharded
    spatial CA whose ppermute halos cross the process boundary — each
    worker checks replicated scalars against its single-device oracle."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    worker = os.path.join(os.path.dirname(__file__), "_multiprocess_worker.py")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid)],
            env=env, cwd=os.path.dirname(os.path.dirname(worker)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid}/2: OK" in out


def test_bit_pallas_halo_multi_step_kernel():
    """Packed RDMA halo kernel (race detection ON): K packed generations
    with per-generation ghost-row DMA match the single-device packed engine
    bit-for-bit — the last cell of the uint8/packed x ppermute/RDMA
    spatial matrix."""
    from carle_tpu.ops.bitpack import bit_multi_step, pack_grid, unpack_grid
    from carle_tpu.parallel import bit_spatial_multi_step_pallas

    mesh = make_mesh(axis_name="space")
    rng = np.random.RandomState(13)
    grid = (rng.rand(2, 64, 128) < 0.3).astype(np.uint8)
    packed = pack_grid(jnp.asarray(grid))
    bits = rules.pack_rule_bits([3, 6, 8], [2, 4, 5])

    ref = bit_multi_step(packed, jnp.asarray(bits), 5)
    out = bit_spatial_multi_step_pallas(
        packed, bits, 5, mesh, interpret=True, detect_races=True,
    )
    np.testing.assert_array_equal(
        np.asarray(unpack_grid(out, 128)), np.asarray(unpack_grid(ref, 128))
    )


def test_shard_carry_2d_rollout_parity():
    """2-D env x space mesh: instances shard over "env" while universe rows
    shard over "space" IN THE SAME program — a wrapped rollout must match
    the single-device run exactly (SCALING.md §1 "both" row)."""
    from jax.sharding import Mesh

    from carle_tpu.mcl.speed import speed_def
    from carle_tpu.parallel import shard_carry_2d

    cfg = EnvConfig(height=64, width=64, action_height=16, action_width=16,
                    instances=4)
    rng = np.random.RandomState(3)
    actions = (rng.rand(5, 4, 16, 16) < 0.2).astype(np.uint8)

    def run(two_d):
        ro = Rollout(cfg, [speed_def(cfg, per_instance=True,
                                     reward_scale=1e-2)])
        carry = ro.init(jax.random.PRNGKey(0), rules.LIFE)
        if two_d:
            devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
            mesh = Mesh(devs, ("env", "space"))
            carry = shard_carry_2d(carry, mesh, cfg)
            grid = carry.stack.env.grid
            # the universes really are sharded on BOTH axes
            spec = grid.sharding.spec
            assert tuple(spec) == ("env", "space", None), spec
        carry, rewards = ro.run_actions(carry, actions)
        return np.asarray(carry.stack.env.grid), np.asarray(rewards)

    grid_1, rewards_1 = run(two_d=False)
    grid_2d, rewards_2d = run(two_d=True)
    np.testing.assert_array_equal(grid_2d, grid_1)
    np.testing.assert_allclose(rewards_2d, rewards_1, rtol=1e-5, atol=1e-7)


def test_shard_carry_2d_indivisible_axes_replicate():
    """Leaves failing a divisibility check replicate on that axis instead of
    erroring (documented contract)."""
    from jax.sharding import Mesh

    from carle_tpu.parallel import shard_carry_2d

    cfg = EnvConfig(height=64, width=64, action_height=16, action_width=16,
                    instances=3)  # 3 % 2 != 0 -> no env sharding
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("env", "space"))
    out = shard_carry_2d({"g": np.zeros((3, 64, 64), np.uint8)}, mesh, cfg)
    assert tuple(out["g"].sharding.spec) == (None, "space", None)
