"""Regression tests for the round-2 code-review findings.

Each test pins a defect the high-effort review confirmed by reproduction:
the reference read_rle -> rle_to_grid chain, 3-D batched actions through
the shell, silently-dropped eval params, non-square SpeedDetector, aliased
per-instance info dicts, and shard_map program caching in the spatial
layer.
"""

import os

import numpy as np
import pytest

import jax

from carle_tpu import CARLE, EnvConfig
from carle_tpu.mcl.patterns import pattern_path


def test_read_rle_returns_body_text_for_reference_chain():
    """The reference's MorphoBonus does `env.rle_to_grid(env.read_rle(p))`
    (mcl.py:148-149): read_rle must return body TEXT, not a pattern
    object."""
    env = CARLE(instances=1)
    body = env.read_rle(pattern_path("glider_1"))
    assert isinstance(body, str)
    assert body.splitlines()  # str API the reference relies on
    grid = env.rle_to_grid(body)
    assert grid.sum() == 5  # a glider has five live cells
    # the decoded pattern (with header metadata) stays available
    assert env._last_pattern.grid.sum() == 5


def test_rle_to_grid_accepts_parsed_pattern():
    from carle_tpu import rle

    env = CARLE(instances=1)
    pat = rle.read_rle(pattern_path("glider_1"))
    np.testing.assert_array_equal(env.rle_to_grid(pat), pat.grid)


def test_load_universe_still_works_after_body_return(tmp_path):
    env = CARLE(instances=1, height=64, width=64)
    env.reset()
    g = np.zeros((1, 64, 64), dtype=np.uint8)
    g[0, 10, 10:13] = 1  # blinker
    env.universe = g
    path = env.save_rle(env.get_rle(env.state.grid[0]), str(tmp_path))
    env2 = CARLE(instances=1, height=64, width=64)
    env2.load_universe(path)
    np.testing.assert_array_equal(np.asarray(env2.state.grid), g)


def test_coerce_action_3d_batched():
    """[instances, AH, AW] — the functional core's own layout — must coerce
    through the shell at instances > 1 (previously reshaped to garbage)."""
    env = CARLE(instances=4, action_height=16, action_width=16,
                height=64, width=64)
    env.reset()
    act = np.zeros((4, 16, 16), dtype=np.float32)
    act[2, 0:2, 0:2] = 1.0  # 2x2 block: a still life that survives the step
    obs, *_ = env.step(act)
    grid = np.asarray(env.state.grid)
    # the block landed in instance 2 only, at the window origin (24, 24)
    assert grid[2].sum() == 4 and grid[2, 24:26, 24:26].all()
    assert grid[[0, 1, 3]].sum() == 0
    patch = env._coerce_action(act)
    assert patch.shape == (4, 16, 16)
    assert patch[2, 0, 0] == 1 and patch.sum() == 4


def test_coerce_action_3d_single_instance_broadcast():
    env = CARLE(instances=3, action_height=8, action_width=8,
                height=32, width=32)
    patch = env._coerce_action(np.ones((1, 8, 8)))
    assert patch.shape == (3, 8, 8)
    assert patch.all()


def test_step_info_dicts_are_independent():
    env = CARLE(instances=3, height=32, width=32, action_height=8,
                action_width=8)
    env.reset()
    *_, info = env.step(np.zeros((3, 8, 8)))
    info[0]["k"] = 1
    assert "k" not in info[1] and "k" not in info[2]


def test_speed_detector_non_square_universe():
    """SpeedDetector previously crashed at construction for h != w; the
    index weights are now sized per-axis (bit-identical on square grids)."""
    from carle_tpu import rules as rules_mod
    from carle_tpu.mcl.speed import speed_def
    from carle_tpu.rollout import Rollout

    cfg = EnvConfig(height=64, width=128, action_height=16, action_width=16,
                    instances=1)
    ro = Rollout(cfg, [speed_def(cfg, per_instance=True)])
    carry = ro.init(jax.random.PRNGKey(0), rules_mod.LIFE)
    acts = np.zeros((20, 1, 16, 16), dtype=np.uint8)
    acts[0, 0, 4, 5] = 1
    acts[0, 0, 5, 5:7] = 1
    acts[0, 0, 6, 4] = 1
    acts[0, 0, 6, 6] = 1
    carry, rewards = ro.run_actions(carry, acts)
    assert np.asarray(rewards)[2:, 0].mean() > 0.05  # glider moves, scores


def test_speed_weights_square_unchanged():
    """The per-axis weight fix must be a no-op on square universes (the
    reference-parity geometry)."""
    from carle_tpu.mcl.speed import _masked_weights

    cfg = EnvConfig(height=64, width=64, action_height=16, action_width=16)
    wh, ww = _masked_weights(cfg)
    mask = np.ones((64, 64), dtype=np.float32)
    r0, c0 = cfg.action_row_offset, cfg.action_col_offset
    mask[r0:r0 + 16, c0:c0 + 16] = 0.0
    np.testing.assert_array_equal(
        wh, np.broadcast_to(np.arange(64, dtype=np.float32)[:, None],
                            (64, 64)) * mask)
    np.testing.assert_array_equal(
        ww, np.broadcast_to(np.arange(64, dtype=np.float32)[None, :],
                            (64, 64)) * mask)


def test_evaluate_fused_rejects_dropped_params():
    """params_path/agent_params must never be silently ignored — the score
    would be computed for the wrong agent."""
    from carle_tpu.agents import make_random_agent
    from carle_tpu.evaluation.eval import evaluate_fused

    with pytest.raises(ValueError, match="random baseline"):
        evaluate_fused(Agent=None, params_path="/tmp/nope.npz", steps=1)

    fn_agent = make_random_agent(16, 16, 0.1)
    with pytest.raises(ValueError, match="agent_params"):
        evaluate_fused(Agent=fn_agent, params_path="/tmp/nope.npz", steps=1)

    with pytest.raises(ValueError, match="one source of parameters"):
        evaluate_fused(Agent=(fn_agent, None), agent_params={"w": 1},
                       steps=1)


def test_spatial_step_program_is_cached():
    """Repeated spatial calls must reuse one jitted shard_map instance
    (CLAUDE.md: a fresh shard_map per call re-traces every invocation)."""
    from carle_tpu.parallel import spatial
    from carle_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(axis_name="space")
    n = mesh.devices.size
    from carle_tpu import rules as rules_mod

    g = np.zeros((1, 8 * n, 32), dtype=np.uint8)
    rule = rules_mod.LIFE

    # hits-delta assertions: equal meshes hash equal, so other tests may
    # already have seeded the cache — only the *reuse* is order-independent
    out1 = spatial.spatial_ca_step(g, rule, mesh)
    h0 = spatial._jitted_spatial_step.cache_info().hits
    spatial.spatial_ca_step(np.asarray(out1), rule, mesh)
    assert spatial._jitted_spatial_step.cache_info().hits == h0 + 1

    spatial.spatial_multi_step(g, rule, 3, mesh)
    m0 = spatial._jitted_spatial_multi.cache_info().hits
    spatial.spatial_multi_step(g, rule, 3, mesh)
    assert spatial._jitted_spatial_multi.cache_info().hits == m0 + 1


def test_spatial_rule_change_does_not_grow_cache():
    from carle_tpu.parallel import spatial
    from carle_tpu.parallel.mesh import make_mesh
    from carle_tpu import rules as rules_mod

    mesh = make_mesh(axis_name="space")
    n = mesh.devices.size
    g = np.zeros((1, 8 * n, 32), dtype=np.uint8)
    spatial.spatial_multi_step(g, rules_mod.LIFE, 2, mesh)
    size = spatial._jitted_spatial_multi.cache_info().currsize
    spatial.spatial_multi_step(g, rules_mod.pack_rule_bits([3, 6, 8],
                                                           [2, 4, 5]), 2, mesh)
    assert spatial._jitted_spatial_multi.cache_info().currsize == size


def test_parse_rle_text_skips_preamble_before_header():
    """Non-comment preamble lines before the header must not decode as body
    (their 'b'/'o' letters would corrupt row 0); headerless body-only text
    still parses entirely as body."""
    from carle_tpu import rle

    headered = "Generated by tool\nx = 3, y = 3, rule = B3/S23\nbob$2bo$3o!"
    pat = rle.parse_rle_text(headered)
    assert pat.grid.sum() == 5
    np.testing.assert_array_equal(
        pat.grid, rle.parse_rle_text("bob$2bo$3o!").grid)


def test_evaluate_fused_rejects_agent_params_for_none_agent():
    from carle_tpu.evaluation.eval import evaluate_fused

    with pytest.raises(ValueError, match="random baseline"):
        evaluate_fused(Agent=None, agent_params={"w": 1}, steps=1)


def test_supervisor_rejects_abbreviated_owned_flags(tmp_path):
    """argparse prefix abbreviation must not smuggle an owned flag past the
    supervisor's guard (--progress resolves to --progress-file in the
    child and silently disables crash recovery)."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "scripts/train_supervisor.py",
         "--log-dir", str(tmp_path), "--progress", "/tmp/x"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True,
    )
    assert proc.returncode != 0
    assert "managed by the supervisor" in proc.stderr


def test_rule_vector_dim0_mismatch_raises():
    """A per-instance rule vector must match grid dim 0 — a [T, inst, H, W]
    stack with T == inst would otherwise silently apply rule[t] to all
    instances at step t."""
    import jax.numpy as jnp

    from carle_tpu import rules as rules_mod
    from carle_tpu.ops.bitpack import bit_ca_step, pack_grid
    from carle_tpu.ops.ca import ca_step_grid

    grid = jnp.zeros((3, 16, 32), jnp.uint8)
    bad = jnp.asarray([rules_mod.LIFE] * 4, jnp.int32)
    with pytest.raises(ValueError, match="dimension 0"):
        ca_step_grid(grid, bad)
    with pytest.raises(ValueError, match="dimension 0"):
        bit_ca_step(pack_grid(grid), bad)


def test_conv_head_requires_key_when_training_with_dropout():
    """The fused path must raise like the unfused one instead of silently
    seeding the hardware PRNG with 0 (fixed, cross-step-correlated masks)."""
    import jax.numpy as jnp

    from carle_tpu import nets

    x = jnp.zeros((2, 1, 16, 16), jnp.float32)
    p = nets.conv_init(jax.random.PRNGKey(0), 4, 1, 3)
    with pytest.raises(ValueError, match="PRNG key"):
        nets.conv_head(x, p, None, pool=2, drop_p=0.1, train=True,
                       force_kernel=True)


def test_conv_head_fallback_supports_pow2_pools():
    """The off-TPU fallback previously hardcoded pools {2, 4} while the
    kernel path accepts any power of two."""
    import jax.numpy as jnp

    from carle_tpu import nets

    x = jnp.ones((1, 1, 16, 16), jnp.float32)
    p = nets.conv_init(jax.random.PRNGKey(0), 4, 1, 3)
    out = nets.conv_head(x, p, None, pool=8, drop_p=0.0, train=False)
    assert out.shape == (1, 4, 2, 2)
    with pytest.raises(ValueError, match="power of two"):
        nets.conv_head(x, p, None, pool=3, drop_p=0.0, train=False)
