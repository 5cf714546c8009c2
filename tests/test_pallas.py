"""Pallas kernel parity vs the XLA reference path (interpret mode on CPU).

The kernels must compute exactly the math of ops/ca.py; on CPU they run
through the Pallas interpreter, on TPU compiled — same code path shape-wise.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from carle_tpu import EnvConfig, rules
from carle_tpu.ops.ca import ca_step_grid, pad_action
from carle_tpu.ops import pallas_ca


@pytest.mark.parametrize("rule_bits", [rules.LIFE, rules.DAY_AND_NIGHT])
def test_multi_step_kernel_parity(rule_bits):
    rng = np.random.RandomState(0)
    grid = (rng.rand(2, 64, 128) < 0.4).astype(np.uint8)

    ref = jnp.asarray(grid)
    for _ in range(5):
        ref = ca_step_grid(ref, rule_bits)

    with pltpu.force_tpu_interpret_mode():
        out = pallas_ca.ca_multi_step_pallas(
            jnp.asarray(grid), jnp.asarray(rule_bits), jnp.asarray(5)
        )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_step_kernel_parity_with_action():
    config = EnvConfig(height=64, width=128, action_height=16,
                       action_width=16, instances=2)
    rng = np.random.RandomState(1)
    grid = (rng.rand(2, 64, 128) < 0.3).astype(np.uint8)
    action = (rng.rand(2, 16, 16) < 0.2).astype(np.uint8)

    toggled = jnp.asarray(grid) ^ pad_action(jnp.asarray(action), config)
    ref = ca_step_grid(toggled, rules.LIFE)

    with pltpu.force_tpu_interpret_mode():
        out = pallas_ca.ca_step_pallas(
            jnp.asarray(grid), jnp.asarray(action),
            jnp.asarray(rules.LIFE), config=config,
        )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_instance_tile_divides():
    for inst in (1, 3, 8, 4096):
        tile = pallas_ca._instance_tile(inst, 256, 256)
        assert inst % tile == 0
        assert tile >= 1


def test_env_step_pallas_backend_matches_xla():
    """backend='pallas' must be a drop-in for the XLA env step."""
    from carle_tpu.env import env_step, init_state

    cfg_x = EnvConfig(height=64, width=128, action_height=16,
                      action_width=16, instances=2, backend="xla")
    cfg_p = EnvConfig(height=64, width=128, action_height=16,
                      action_width=16, instances=2, backend="pallas")
    rng = np.random.RandomState(3)
    action = (rng.rand(2, 16, 16) < 0.2).astype(np.uint8)

    sx = init_state(cfg_x, rules.LIFE)
    sx, ox = env_step(sx, jnp.asarray(action), config=cfg_x)

    with pltpu.force_tpu_interpret_mode():
        sp = init_state(cfg_p, rules.LIFE)
        sp, op = env_step(sp, jnp.asarray(action), config=cfg_p)
    np.testing.assert_array_equal(np.asarray(ox), np.asarray(op))


@pytest.mark.parametrize("rules_bs", [([3], [2, 3]), ([3, 6, 8], [2, 4, 5]),
                                      ([2], [0])])
def test_static_kernel_vertical_scheme_parity(rules_bs):
    """The vertical-first static kernel (6 rolls/gen, count9 rule folding)
    must match the horizontal-pair scheme and the XLA packed engine."""
    import numpy as np

    from carle_tpu.ops.bitpack import bit_multi_step, pack_grid, unpack_grid
    from carle_tpu.ops.pallas_bitpack import bit_multi_step_pallas_static
    from carle_tpu import rules as rules_mod

    birth, survive = rules_bs
    rng = np.random.RandomState(20)
    grid = (rng.rand(2, 128, 128) < 0.33).astype(np.uint8)
    packed = pack_grid(jnp.asarray(grid))
    bits = rules_mod.pack_rule_bits(birth, survive)
    ref = bit_multi_step(packed, jnp.asarray(bits), 5)

    with pltpu.force_tpu_interpret_mode():
        out_v = bit_multi_step_pallas_static(
            packed, tuple(birth), tuple(survive), jnp.asarray(5), scheme="v"
        )
        out_h = bit_multi_step_pallas_static(
            packed, tuple(birth), tuple(survive), jnp.asarray(5), scheme="h"
        )
        out_v3 = bit_multi_step_pallas_static(
            packed, tuple(birth), tuple(survive), jnp.asarray(5), scheme="v3"
        )
        out_vc = bit_multi_step_pallas_static(
            packed, tuple(birth), tuple(survive), jnp.asarray(5), scheme="vc"
        )
        out_vcc = bit_multi_step_pallas_static(
            packed, tuple(birth), tuple(survive), jnp.asarray(5), scheme="vcc"
        )
    np.testing.assert_array_equal(np.asarray(unpack_grid(out_vcc, 128)),
                                  np.asarray(unpack_grid(ref, 128)))
    np.testing.assert_array_equal(np.asarray(unpack_grid(out_v3, 128)),
                                  np.asarray(unpack_grid(ref, 128)))
    np.testing.assert_array_equal(np.asarray(unpack_grid(out_vc, 128)),
                                  np.asarray(unpack_grid(ref, 128)))
    np.testing.assert_array_equal(np.asarray(unpack_grid(out_v, 128)),
                                  np.asarray(unpack_grid(ref, 128)))
    np.testing.assert_array_equal(np.asarray(unpack_grid(out_h, 128)),
                                  np.asarray(unpack_grid(ref, 128)))


@pytest.mark.parametrize("rules_bs", [([3], [2, 3]), ([3, 6, 7, 8], [3, 4, 6, 7, 8])])
def test_data_kernel_vertical_scheme_parity(rules_bs):
    """The vertical-first rules-as-data kernel (now the default) must match
    the XLA packed engine for arbitrary rule bitmasks."""
    import numpy as np

    from carle_tpu.ops.bitpack import bit_multi_step, pack_grid, unpack_grid
    from carle_tpu.ops.pallas_bitpack import bit_multi_step_pallas
    from carle_tpu import rules as rules_mod

    birth, survive = rules_bs
    rng = np.random.RandomState(21)
    grid = (rng.rand(2, 128, 128) < 0.4).astype(np.uint8)
    packed = pack_grid(jnp.asarray(grid))
    bits = jnp.asarray(rules_mod.pack_rule_bits(birth, survive))
    ref = bit_multi_step(packed, bits, 5)

    with pltpu.force_tpu_interpret_mode():
        out_v = bit_multi_step_pallas(packed, bits, jnp.asarray(5), scheme="v")
        out_h = bit_multi_step_pallas(packed, bits, jnp.asarray(5), scheme="h")
        out_vc = bit_multi_step_pallas(packed, bits, jnp.asarray(5),
                                       scheme="vc")
        out_vcc = bit_multi_step_pallas(packed, bits, jnp.asarray(5),
                                        scheme="vcc")
    np.testing.assert_array_equal(np.asarray(unpack_grid(out_v, 128)),
                                  np.asarray(unpack_grid(ref, 128)))
    np.testing.assert_array_equal(np.asarray(unpack_grid(out_h, 128)),
                                  np.asarray(unpack_grid(ref, 128)))
    np.testing.assert_array_equal(np.asarray(unpack_grid(out_vc, 128)),
                                  np.asarray(unpack_grid(ref, 128)))
    np.testing.assert_array_equal(np.asarray(unpack_grid(out_vcc, 128)),
                                  np.asarray(unpack_grid(ref, 128)))


@pytest.mark.parametrize("rules_bs", [([3], [2, 3]), ([3, 6, 8], [2, 4, 5]),
                                      ([2], [0])])
def test_cm_kernel_parity(rules_bs):
    """The column-major kernels (bits packed along H, carries on the cheap
    axes) must match the row-major XLA packed engine bit for bit."""
    import numpy as np

    from carle_tpu.ops.bitpack import (
        bit_multi_step, pack_grid, pack_grid_cm, unpack_grid, unpack_grid_cm,
    )
    from carle_tpu.ops.pallas_bitpack import (
        bit_multi_step_pallas_cm, bit_multi_step_pallas_static_cm,
    )
    from carle_tpu import rules as rules_mod

    birth, survive = rules_bs
    rng = np.random.RandomState(23)
    grid = (rng.rand(2, 128, 256) < 0.33).astype(np.uint8)
    bits = rules_mod.pack_rule_bits(birth, survive)
    ref = unpack_grid(
        bit_multi_step(pack_grid(jnp.asarray(grid)), jnp.asarray(bits), 5),
        256,
    )

    pcm = pack_grid_cm(jnp.asarray(grid))
    np.testing.assert_array_equal(  # pack/unpack round-trip
        np.asarray(unpack_grid_cm(pcm, 128)), grid)
    with pltpu.force_tpu_interpret_mode():
        out_s = bit_multi_step_pallas_static_cm(
            pcm, tuple(birth), tuple(survive), jnp.asarray(5)
        )
        out_d = bit_multi_step_pallas_cm(pcm, jnp.asarray(bits),
                                         jnp.asarray(5))
    np.testing.assert_array_equal(np.asarray(unpack_grid_cm(out_s, 128)),
                                  np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(unpack_grid_cm(out_d, 128)),
                                  np.asarray(ref))


def test_cm_kernel_vector_rules_parity():
    """Per-instance rule VECTORS through the column-major data kernel: each
    instance must evolve under its own rule, matching per-instance runs of
    the row-major XLA packed engine."""
    import numpy as np

    from carle_tpu.ops.bitpack import (
        bit_multi_step, pack_grid, pack_grid_cm, unpack_grid, unpack_grid_cm,
    )
    from carle_tpu.ops.pallas_bitpack import bit_multi_step_pallas_cm
    from carle_tpu import rules as rules_mod

    battery = [([3], [2, 3]), ([3, 6, 8], [2, 4, 5]), ([2], [0])]
    rng = np.random.RandomState(7)
    grid = (rng.rand(3, 128, 256) < 0.33).astype(np.uint8)
    bits_vec = jnp.asarray(
        [rules_mod.pack_rule_bits(b, s) for b, s in battery], jnp.int32
    )

    refs = [
        np.asarray(unpack_grid(
            bit_multi_step(
                pack_grid(jnp.asarray(grid[i:i + 1])),
                jnp.asarray(rules_mod.pack_rule_bits(b, s)), 5,
            ),
            256,
        ))[0]
        for i, (b, s) in enumerate(battery)
    ]
    with pltpu.force_tpu_interpret_mode():
        out = bit_multi_step_pallas_cm(
            pack_grid_cm(jnp.asarray(grid)), bits_vec, jnp.asarray(5)
        )
    np.testing.assert_array_equal(
        np.asarray(unpack_grid_cm(out, 128)), np.stack(refs)
    )


def test_step_kernel_vector_rules_parity():
    """Per-instance rule vectors run through the fused per-step kernel
    (vector rules used to fall back to the XLA roll-sum path)."""
    config = EnvConfig(height=64, width=128, action_height=16,
                       action_width=16, instances=3)
    rng = np.random.RandomState(5)
    grid = (rng.rand(3, 64, 128) < 0.3).astype(np.uint8)
    action = (rng.rand(3, 16, 16) < 0.2).astype(np.uint8)
    bits = jnp.asarray(
        [rules.pack_rule_bits([3], [2, 3]),
         rules.pack_rule_bits([3, 6, 8], [2, 4, 5]),
         rules.pack_rule_bits([2], [0])],
        dtype=jnp.int32,
    )

    toggled = jnp.asarray(grid) ^ pad_action(jnp.asarray(action), config)
    ref = ca_step_grid(toggled, bits)

    with pltpu.force_tpu_interpret_mode():
        out = pallas_ca.ca_step_pallas(
            jnp.asarray(grid), jnp.asarray(action), bits, config=config,
        )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_multi_step_kernel_vector_rules_parity():
    rng = np.random.RandomState(6)
    grid = (rng.rand(4, 64, 128) < 0.4).astype(np.uint8)
    bits = jnp.asarray(
        [rules.pack_rule_bits([3], [2, 3]),
         rules.pack_rule_bits([3, 6, 7, 8], [3, 4, 6, 7, 8]),
         rules.pack_rule_bits([2], [0]),
         rules.pack_rule_bits([3, 6], [2, 3])],
        dtype=jnp.int32,
    )

    ref = jnp.asarray(grid)
    for _ in range(5):
        ref = ca_step_grid(ref, bits)

    with pltpu.force_tpu_interpret_mode():
        out = pallas_ca.ca_multi_step_pallas(
            jnp.asarray(grid), bits, jnp.asarray(5)
        )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
