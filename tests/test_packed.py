"""Packed-state env core: bit-exact trajectory parity with the uint8 core."""

import numpy as np
import jax
import jax.numpy as jnp

from carle_tpu import EnvConfig, rules
from carle_tpu.env import env_step, init_state
from carle_tpu.packed import (
    init_packed_state,
    observe,
    pack_state,
    packed_env_step,
    packed_multi_step,
    unpack_state,
)


CFG = EnvConfig(height=64, width=64, action_height=16, action_width=16,
                instances=2)


def test_packed_trajectory_parity():
    rng = np.random.RandomState(0)
    s_u8 = init_state(CFG, rules.DAY_AND_NIGHT)
    s_pk = init_packed_state(CFG, rules.DAY_AND_NIGHT)

    step_u8 = jax.jit(lambda s, a: env_step(s, a, config=CFG))
    step_pk = jax.jit(lambda s, a: packed_env_step(s, a, config=CFG))

    for t in range(12):
        act = (rng.rand(2, 16, 16) < (0.15 if t % 3 else 0.0)).astype(np.uint8)
        s_u8, _ = step_u8(s_u8, jnp.asarray(act))
        s_pk, _ = step_pk(s_pk, jnp.asarray(act))
        np.testing.assert_array_equal(
            np.asarray(unpack_state(s_pk, CFG).grid), np.asarray(s_u8.grid)
        )


def test_packed_master_reset():
    s_pk = init_packed_state(CFG, rules.LIFE)
    act = (np.random.RandomState(1).rand(2, 16, 16) < 0.4).astype(np.uint8)
    s_pk, _ = packed_env_step(s_pk, jnp.asarray(act), config=CFG)
    # (population may legitimately be zero here — no liveness assert)
    s_pk, _ = packed_env_step(
        s_pk, jnp.ones((2, 16, 16), np.uint8), config=CFG
    )
    assert int(jnp.sum(s_pk.grid)) == 0
    assert int(s_pk.step_num) == 0


def test_packed_multi_step_and_observe():
    rng = np.random.RandomState(2)
    grid = (rng.rand(2, 64, 64) < 0.3).astype(np.uint8)
    s_u8 = init_state(CFG, rules.LIFE)._replace(grid=jnp.asarray(grid))
    s_pk = pack_state(s_u8)

    from carle_tpu.env import multi_step

    s_u8 = multi_step(s_u8, 6, config=CFG)
    s_pk = packed_multi_step(s_pk, 6, config=CFG)
    np.testing.assert_array_equal(
        np.asarray(unpack_state(s_pk, CFG).grid), np.asarray(s_u8.grid)
    )
    obs = observe(s_pk, CFG)
    assert obs.shape == (2, 1, 64, 64)
    assert obs.dtype == jnp.float32


def test_pack_action_matches_pack_pad_fuzz():
    """pack_action (word-aligned window packing, O(cells/32)) must equal
    pack_grid(pad_action(...)) for every geometry/offset — fuzz the
    word-offset arithmetic (lead bits, straddled words, odd windows)."""
    from carle_tpu.ops.bitpack import pack_grid
    from carle_tpu.ops.ca import pad_action
    from carle_tpu.packed import pack_action

    rng = np.random.RandomState(0)
    cases = [(64, 64, 16, 16), (64, 96, 7, 31), (32, 64, 5, 33),
             (96, 128, 64, 64), (64, 64, 1, 1), (48, 160, 11, 63)]
    for h, w, ah, aw in cases:
        cfg = EnvConfig(height=h, width=w, action_height=ah, action_width=aw,
                        instances=2)
        patch = (rng.rand(2, cfg.eff_action_height, cfg.eff_action_width)
                 < 0.4).astype(np.uint8)
        want = np.asarray(pack_grid(pad_action(jnp.asarray(patch), cfg)))
        got = np.asarray(pack_action(jnp.asarray(patch), cfg))
        np.testing.assert_array_equal(got, want, err_msg=str((h, w, ah, aw)))
