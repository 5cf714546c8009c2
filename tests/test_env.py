"""Environment behaviour tests: golden Life patterns (absent from the
reference suite — SURVEY §4), master reset, action geometry, rule dynamics."""

import jax.numpy as jnp
import numpy as np

from carle_tpu import rules
from carle_tpu.config import EnvConfig
from carle_tpu.env import CARLE, env_step, init_state
from carle_tpu.ops.ca import ca_step_grid


def _life_step_np(grid):
    """Straightforward numpy oracle for B3/S23 on a torus."""
    n = sum(
        np.roll(np.roll(grid, dr, 0), dc, 1)
        for dr in (-1, 0, 1)
        for dc in (-1, 0, 1)
        if (dr, dc) != (0, 0)
    )
    return ((n == 3) | ((grid == 1) & (n == 2))).astype(np.uint8)


def test_blinker_period_2():
    g = np.zeros((1, 16, 16), dtype=np.uint8)
    g[0, 7, 6:9] = 1
    out1 = np.asarray(ca_step_grid(jnp.asarray(g), jnp.int32(rules.LIFE)))
    out2 = np.asarray(ca_step_grid(jnp.asarray(out1), jnp.int32(rules.LIFE)))
    expected_vert = np.zeros_like(g)
    expected_vert[0, 6:9, 7] = 1
    np.testing.assert_array_equal(out1, expected_vert)
    np.testing.assert_array_equal(out2, g)


def test_glider_period_4_displacement():
    g = np.zeros((1, 32, 32), dtype=np.uint8)
    # canonical glider
    g[0, 10, 11] = 1
    g[0, 11, 12] = 1
    g[0, 12, 10:13] = 1
    cur = jnp.asarray(g)
    for _ in range(4):
        cur = ca_step_grid(cur, jnp.int32(rules.LIFE))
    shifted = np.roll(np.roll(g, 1, axis=1), 1, axis=2)
    np.testing.assert_array_equal(np.asarray(cur), shifted)


def test_random_soup_vs_numpy_oracle():
    rng = np.random.RandomState(0)
    g = (rng.rand(3, 48, 48) < 0.4).astype(np.uint8)
    cur = jnp.asarray(g)
    ref = g.copy()
    for _ in range(8):
        cur = ca_step_grid(cur, jnp.int32(rules.LIFE))
        ref = np.stack([_life_step_np(r) for r in ref])
    np.testing.assert_array_equal(np.asarray(cur), ref)


def test_torus_wraparound():
    g = np.zeros((1, 8, 8), dtype=np.uint8)
    # blinker straddling the boundary
    g[0, 0, 7] = 1
    g[0, 0, 0] = 1
    g[0, 0, 1] = 1
    out = np.asarray(ca_step_grid(jnp.asarray(g), jnp.int32(rules.LIFE)))
    expected = np.zeros_like(g)
    expected[0, 7, 0] = 1
    expected[0, 0, 0] = 1
    expected[0, 1, 0] = 1
    np.testing.assert_array_equal(out, expected)


def test_master_reset():
    """All-ones action performs a reset; near-all-ones does not
    (reference tests/test_env.py:42-67)."""
    env = CARLE()
    reset_obs = env.reset()

    action = np.ones((env.instances, 1, env.action_height, env.action_width))
    toggle_obs = env.step(action)[0]

    action[:, :, 0:10, 0:10] = 0.0
    normal_obs = env.step(action)[0]

    assert float(jnp.mean(toggle_obs)) == 0.0
    assert float(jnp.mean(reset_obs)) == 0.0
    assert float(jnp.mean(1.0 * (reset_obs == toggle_obs))) == 1.0
    assert float(jnp.mean(1.0 * (toggle_obs == normal_obs))) != 1.0
    # reset zeroed the step counter
    assert env.step_number == 1  # reset step + one normal step


def test_action_window_centered():
    env = CARLE()
    env.reset()
    action = np.zeros((1, 1, 64, 64))
    action[0, 0, 0, 0] = 1.0  # top-left of the action window
    # use B-none/S-all so toggled cells persist verbatim
    env.birth = []
    env.survive = list(range(9))
    obs, *_ = env.step(action)
    grid = np.asarray(obs)[0, 0]
    assert grid[96, 96] == 1.0  # (256-64)//2 = 96
    assert grid.sum() == 1.0


def test_env_step_counts():
    env = CARLE(instances=2)
    env.reset()
    zero = np.zeros((2, 1, 64, 64))
    one = zero.copy()
    one[0, 0, 3, 3] = 1.0
    env.step(one)
    env.step(zero)
    env.step(zero)
    assert env.step_number == 3
    assert env.steps_since_action == 2
    assert int(env.state.step_num) == 3
    assert int(env.state.steps_since_action) == 2


def test_functional_step_shapes():
    cfg = EnvConfig(height=64, width=64, action_height=16, action_width=16, instances=4)
    state = init_state(cfg)
    action = jnp.zeros(cfg.action_shape, dtype=jnp.uint8)
    new_state, obs = env_step(state, action, config=cfg)
    assert obs.shape == (4, 64, 64)
    assert obs.dtype == jnp.uint8
    assert int(new_state.step_num) == 1


def test_b0_rule_all_born():
    """B012345678/S012345678 turns an empty universe all-alive in one step."""
    cfg = EnvConfig(height=32, width=32, action_height=8, action_width=8)
    bits = rules.pack_rule_bits(list(range(9)), list(range(9)))
    state = init_state(cfg, bits)
    _, obs = env_step(state, jnp.zeros(cfg.action_shape, jnp.uint8), config=cfg)
    assert int(obs.sum()) == 32 * 32


def test_odd_universe_geometry():
    """Odd-sized universes shrink the action window by one, as the reference
    does (env.py:124-125)."""
    env = CARLE(height=65, width=65, action_height=16, action_width=16)
    assert env.action_height == 15
    assert env.action_width == 15
    env.reset()
    obs, *_ = env.step(np.zeros((1, 1, 15, 15)))
    assert obs.shape == (1, 1, 65, 65)


def test_rle_to_grid_and_action_padding_api():
    """Reference-surface methods used by wrapper internals/user code."""
    import numpy as np

    from carle_tpu import CARLE

    env = CARLE(height=64, width=64, action_height=16, action_width=16)
    grid = env.rle_to_grid("x = 3, y = 3, rule = B3/S23\nbob$2bo$3o!")
    assert grid.shape == (3, 3) and grid.sum() == 5

    act = np.ones((1, 1, 16, 16), dtype=np.float32)
    padded = env.action_padding(act)
    assert padded.shape == (1, 1, 64, 64)
    assert padded.sum() == 256
    assert padded[0, 0, 24:40, 24:40].sum() == 256  # centred window


def test_torch_tensor_actions_accepted():
    """Drop-in compat: reference user code passes torch tensors to step()."""
    import pytest

    torch = pytest.importorskip("torch")

    env = CARLE(height=64, width=64, action_height=16, action_width=16)
    env.reset()
    act = torch.zeros(1, 1, 16, 16)
    act[0, 0, 7, 6:9] = 1.0
    obs, reward, done, info = env.step(act)
    assert float(np.asarray(obs).sum()) == 3.0  # blinker formed


def test_single_action_broadcasts_over_instances():
    """A [1,1,AH,AW] action applied to a multi-instance env broadcasts, as
    torch broadcasting does in the reference XOR (env.py:182)."""
    env = CARLE(height=64, width=64, action_height=16, action_width=16,
                instances=3)
    env.reset()
    act = np.zeros((1, 1, 16, 16), dtype=np.float32)
    act[0, 0, 7, 6:9] = 1.0
    obs, *_ = env.step(act)
    grids = np.asarray(obs)[:, 0]
    assert (grids[0] == grids[1]).all() and (grids[1] == grids[2]).all()
    assert grids[0].sum() == 3


def test_intermediate_size_action_cropped():
    """Actions strictly between window and universe size centre-crop from
    their own extent (the reference slices out of range there,
    env.py:164-169)."""
    env = CARLE(height=64, width=64, action_height=16, action_width=16)
    env.reset()
    act = np.zeros((1, 1, 32, 32), dtype=np.float32)
    # a 2x2 block (still life) at the centre of the 32x32 patch
    act[0, 0, 16:18, 16:18] = 1.0
    env.step(act)
    grid = np.asarray(env.state.grid[0])
    # the crop keeps rows/cols 8..24 of the patch; local (8,8) maps to the
    # window offset 24, so the block lands at universe rows/cols 32..34
    assert grid[32:34, 32:34].sum() == 4
    assert grid.sum() == 4


def test_shell_multi_step_matches_step_loop():
    """CARLE.multi_step (fused action-free burst) equals N zero-action
    steps, and keeps the host bookkeeping in sync."""
    import numpy as np

    from carle_tpu.env import CARLE

    a = np.zeros((1, 1, 16, 16), np.float32)
    a[0, 0, 4, 5:8] = 1.0  # blinker

    env1 = CARLE(height=64, width=64, action_height=16, action_width=16)
    env1.reset(); env1.step(a)
    env2 = CARLE(height=64, width=64, action_height=16, action_width=16)
    env2.reset(); env2.step(a)

    obs1 = env1.multi_step(5)
    for _ in range(5):
        obs2, *_ = env2.step(np.zeros_like(a))
    np.testing.assert_array_equal(np.asarray(obs1), np.asarray(obs2))
    assert env1.step_number == env2.step_number == 6


def test_config_rejects_degenerate_action_windows():
    import pytest

    from carle_tpu.config import EnvConfig

    with pytest.raises(ValueError, match="degenerate"):
        EnvConfig(action_height=0).validate()
    with pytest.raises(ValueError, match="degenerate"):
        # the reference-parity odd-size shrink makes a 1-wide window 0-wide
        EnvConfig(height=255, action_height=1, action_width=1).validate()
    with pytest.raises(ValueError, match="universe"):
        EnvConfig(height=0).validate()
    EnvConfig(height=255, action_height=2, action_width=2).validate()  # ok
