"""Bit-packed CA engine: bit-exact parity with the uint8 path."""

import numpy as np
import pytest
import jax.numpy as jnp

from carle_tpu import rules
from carle_tpu.ops.bitpack import (
    bit_ca_step,
    bit_multi_step,
    pack_grid,
    unpack_grid,
)
from carle_tpu.ops.ca import ca_step_grid


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("rule_bits", [
    rules.LIFE, rules.MORLEY, rules.DAY_AND_NIGHT, rules.LIVE_FREE_OR_DIE,
])
def test_bit_step_parity(seed, rule_bits):
    rng = np.random.RandomState(seed)
    grid = (rng.rand(2, 64, 128) < 0.4).astype(np.uint8)

    expected = np.asarray(ca_step_grid(jnp.asarray(grid), rule_bits))
    packed = pack_grid(jnp.asarray(grid))
    out = unpack_grid(bit_ca_step(packed, jnp.asarray(rule_bits)), 128)
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_pack_roundtrip():
    rng = np.random.RandomState(2)
    grid = (rng.rand(3, 16, 96) < 0.5).astype(np.uint8)
    np.testing.assert_array_equal(
        np.asarray(unpack_grid(pack_grid(jnp.asarray(grid)), 96)), grid
    )


def test_bit_multi_step_glider():
    """A glider under the packed engine translates by (1,1) every 4 steps."""
    grid = np.zeros((1, 32, 64), dtype=np.uint8)
    grid[0, 1, 2] = 1
    grid[0, 2, 3] = 1
    grid[0, 3, 1:4] = 1

    packed = pack_grid(jnp.asarray(grid))
    out = unpack_grid(bit_multi_step(packed, jnp.asarray(rules.LIFE), 4), 64)
    expected = np.roll(np.roll(grid, 1, axis=1), 1, axis=2)
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_bit_step_count_edge_all_alive():
    """All-alive grid: every cell has count 8 — exercises the n3 plane."""
    grid = np.ones((1, 8, 32), dtype=np.uint8)
    # B3/S23: count 8 kills everything
    out = unpack_grid(bit_ca_step(pack_grid(jnp.asarray(grid)),
                                  jnp.asarray(rules.LIFE)), 32)
    assert np.asarray(out).sum() == 0
    # survive-8 rule keeps everything
    s8 = rules.pack_rule_bits([3], [8])
    out = unpack_grid(bit_ca_step(pack_grid(jnp.asarray(grid)),
                                  jnp.asarray(s8)), 32)
    assert np.asarray(out).sum() == grid.sum()


def test_bit_multi_step_pallas_parity():
    """Pallas bit-packed kernel (interpret mode) vs the XLA packed path."""
    from jax.experimental.pallas import tpu as pltpu

    from carle_tpu.ops.pallas_bitpack import bit_multi_step_pallas

    rng = np.random.RandomState(5)
    grid = (rng.rand(2, 128, 256) < 0.35).astype(np.uint8)
    packed = pack_grid(jnp.asarray(grid))

    expected = bit_multi_step(packed, jnp.asarray(rules.DAY_AND_NIGHT), 3)
    with pltpu.force_tpu_interpret_mode():
        out = bit_multi_step_pallas(
            packed, jnp.asarray(rules.DAY_AND_NIGHT), jnp.asarray(3)
        )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expected))


@pytest.mark.parametrize("rule_bits,birth,survive", [
    (rules.LIFE, (3,), (2, 3)),
    (rules.MORLEY, (3, 6, 8), (2, 4, 5)),
    (rules.DAY_AND_NIGHT, (3, 6, 7, 8), (3, 4, 6, 7, 8)),
    (rules.LIVE_FREE_OR_DIE, (2,), (0,)),
])
def test_static_rule_fold_parity(rule_bits, birth, survive):
    """The constant-folded static-rule step must equal the rules-as-data
    step bit-for-bit."""
    from carle_tpu.ops.bitpack import bit_ca_step_static

    rng = np.random.RandomState(11)
    grid = (rng.rand(2, 64, 96) < 0.4).astype(np.uint8)
    packed = pack_grid(jnp.asarray(grid))

    a = bit_ca_step(packed, jnp.asarray(rule_bits))
    b = bit_ca_step_static(packed, birth, survive)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_static_pallas_kernel_parity():
    from jax.experimental.pallas import tpu as pltpu

    from carle_tpu.ops.pallas_bitpack import bit_multi_step_pallas_static

    rng = np.random.RandomState(12)
    grid = (rng.rand(2, 128, 256) < 0.35).astype(np.uint8)
    packed = pack_grid(jnp.asarray(grid))

    expected = bit_multi_step(packed, jnp.asarray(rules.LIFE), 4)
    with pltpu.force_tpu_interpret_mode():
        out = bit_multi_step_pallas_static(packed, (3,), (2, 3),
                                           jnp.asarray(4))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expected))


def test_bitpack_per_instance_rules():
    """The packed engine accepts an [instances] rule vector like the uint8
    engine (per-instance rulesets)."""
    from carle_tpu import rules as rules_mod
    from carle_tpu.ops.bitpack import bit_ca_step, pack_grid, unpack_grid
    from carle_tpu.ops.ca import ca_step_grid

    rng = np.random.RandomState(9)
    grid = (rng.rand(3, 32, 64) < 0.4).astype(np.uint8)
    bits = jnp.asarray(
        [rules_mod.pack_rule_bits([3], [2, 3]),
         rules_mod.pack_rule_bits([3, 6, 8], [2, 4, 5]),
         rules_mod.pack_rule_bits([2], [0])],
        dtype=jnp.int32,
    )
    ref = np.asarray(ca_step_grid(jnp.asarray(grid), bits))
    out = np.asarray(unpack_grid(bit_ca_step(pack_grid(jnp.asarray(grid)),
                                             bits), 64))
    np.testing.assert_array_equal(out, ref)


def test_r_pentomino_census_golden():
    """Long-horizon golden test (SURVEY §4): the R-pentomino stabilizes at
    generation 1103 with a population of 116 (8 gliders still in flight) —
    the published census, reproduced by the packed engine on a 1024² torus
    large enough that nothing wraps into the debris."""
    from carle_tpu import rules as rules_mod
    from carle_tpu.ops.bitpack import bit_multi_step, pack_grid, unpack_grid

    g = np.zeros((1, 1024, 1024), dtype=np.uint8)
    r, c = 512, 512
    g[0, r, c + 1 : c + 3] = 1
    g[0, r + 1, c : c + 2] = 1
    g[0, r + 2, c + 1] = 1
    assert g.sum() == 5

    p = bit_multi_step(pack_grid(jnp.asarray(g)),
                       jnp.asarray(rules_mod.LIFE), 1103)
    assert int(np.asarray(unpack_grid(p, 1024)).sum()) == 116
    # stabilized: population is conserved afterwards (still lifes, period-2
    # oscillators, and the eight escaping gliders)
    p2 = bit_multi_step(p, jnp.asarray(rules_mod.LIFE), 4)
    assert int(np.asarray(unpack_grid(p2, 1024)).sum()) == 116


def test_bitpack_pallas_vector_rules_parity():
    """Per-instance rule vectors through the PACKED Pallas kernel: every
    scheme's rule_plane broadcasts a [tile,1,1] rule block like a scalar."""
    from carle_tpu import rules as rules_mod
    from jax.experimental.pallas import tpu as pltpu

    from carle_tpu.ops.bitpack import pack_grid, unpack_grid
    from carle_tpu.ops.ca import ca_step_grid
    from carle_tpu.ops.pallas_bitpack import bit_multi_step_pallas

    rng = np.random.RandomState(11)
    grid = (rng.rand(4, 128, 256) < 0.4).astype(np.uint8)
    bits = jnp.asarray(
        [rules_mod.pack_rule_bits([3], [2, 3]),
         rules_mod.pack_rule_bits([3, 6, 8], [2, 4, 5]),
         rules_mod.pack_rule_bits([2], [0]),
         rules_mod.pack_rule_bits([3, 6, 7, 8], [3, 4, 6, 7, 8])],
        dtype=jnp.int32,
    )

    ref = jnp.asarray(grid)
    for _ in range(4):
        ref = ca_step_grid(ref, bits)

    packed = pack_grid(jnp.asarray(grid))
    for scheme in ("h", "v", "vc", "vcc", "vd", "vd2"):
        with pltpu.force_tpu_interpret_mode():
            out = bit_multi_step_pallas(packed, bits, jnp.asarray(4),
                                        scheme=scheme)
        np.testing.assert_array_equal(
            np.asarray(unpack_grid(out, 256)), np.asarray(ref),
            err_msg=f"scheme {scheme}",
        )


@pytest.mark.parametrize("rule_seed", [11, 22, 33, 44])
def test_random_rule_cross_engine_fuzz(rule_seed):
    """Random 18-bit rules (the FULL B/S space, including B0 and S8 edge
    semantics) through every engine: uint8 XLA oracle vs packed XLA vs the
    packed Pallas kernels (data + static, row-major and column-major), all
    bit-exact over multi-step runs."""
    from jax.experimental.pallas import tpu as pltpu

    from carle_tpu.ops.bitpack import (
        bit_multi_step_static, pack_grid_cm, unpack_grid_cm,
    )
    from carle_tpu.ops.ca import ca_step_grid
    from carle_tpu.ops.pallas_bitpack import (
        bit_multi_step_pallas,
        bit_multi_step_pallas_cm,
        bit_multi_step_pallas_static,
        bit_multi_step_pallas_static_cm,
    )

    rng = np.random.RandomState(rule_seed)
    bits = int(rng.randint(0, 1 << 18))
    birth, survive = rules.unpack_rule_bits(bits)
    grid = (rng.rand(2, 64, 128) < 0.4).astype(np.uint8)
    steps = 4

    # uint8 XLA oracle
    g = jnp.asarray(grid)
    for _ in range(steps):
        g = ca_step_grid(g, bits)
    oracle = np.asarray(g)

    packed = pack_grid(jnp.asarray(grid))
    outs = {
        "bitpack-xla": unpack_grid(
            bit_multi_step(packed, jnp.asarray(bits), steps), 128),
        "bitpack-xla-static": unpack_grid(
            bit_multi_step_static(packed, tuple(birth), tuple(survive),
                                  steps), 128),
    }
    pcm = pack_grid_cm(jnp.asarray(grid))
    with pltpu.force_tpu_interpret_mode():
        outs["pallas-data-vc"] = unpack_grid(
            bit_multi_step_pallas(packed, jnp.asarray(bits),
                                  jnp.asarray(steps), scheme="vc"), 128)
        outs["pallas-data-vd"] = unpack_grid(
            bit_multi_step_pallas(packed, jnp.asarray(bits),
                                  jnp.asarray(steps), scheme="vd"), 128)
        outs["pallas-static-vc"] = unpack_grid(
            bit_multi_step_pallas_static(packed, tuple(birth),
                                         tuple(survive), jnp.asarray(steps),
                                         scheme="vc"), 128)
        outs["pallas-data-cm"] = unpack_grid_cm(
            bit_multi_step_pallas_cm(pcm, jnp.asarray(bits),
                                     jnp.asarray(steps)), 64)
        outs["pallas-static-cm"] = unpack_grid_cm(
            bit_multi_step_pallas_static_cm(pcm, tuple(birth),
                                            tuple(survive),
                                            jnp.asarray(steps)), 64)
    for name, out in outs.items():
        np.testing.assert_array_equal(
            np.asarray(out), oracle, err_msg=f"{name} rule={bits:#x}"
        )


def test_gosper_gun_population_golden():
    """Gosper glider gun (shipped patterns/gosper_gun.rle): 36 cells, and
    the population grows by EXACTLY 5 per 30-generation period (one glider
    per period, no collisions at this placement) — an external-truth golden
    for long-horizon dynamics, checked through the packed engine."""
    from carle_tpu.mcl.patterns import pattern_path
    from carle_tpu.rle import read_rle

    pat = read_rle(pattern_path("gosper_gun"))
    assert int(pat.grid.sum()) == 36
    full = np.zeros((1, 256, 256), np.uint8)
    full[0, 30:30 + pat.grid.shape[0], 30:30 + pat.grid.shape[1]] = pat.grid
    packed = pack_grid(jnp.asarray(full))
    for t in (30, 150, 300):
        out = unpack_grid(
            bit_multi_step(packed, jnp.asarray(rules.LIFE), t), 256
        )
        assert int(np.asarray(out).sum()) == 36 + 5 * (t // 30), t


def test_static_pallas_vc2_two_stream_parity():
    """The two-stream "vc2" scheme (tile halves as independent dependency
    chains — measured +5-6% on v5e, scripts/overlap_probe.py) is bit-exact
    vs the packed reference, including at an ODD tile where it must fall
    back to single-chain vc."""
    from jax.experimental.pallas import tpu as pltpu

    from carle_tpu.ops.pallas_bitpack import bit_multi_step_pallas_static

    rng = np.random.RandomState(21)
    grid = (rng.rand(4, 128, 256) < 0.35).astype(np.uint8)
    packed = pack_grid(jnp.asarray(grid))
    expected = bit_multi_step(packed, jnp.asarray(rules.LIFE), 5)
    with pltpu.force_tpu_interpret_mode():
        out = bit_multi_step_pallas_static(packed, (3,), (2, 3),
                                           jnp.asarray(5), scheme="vc2")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expected))

    # odd instance count -> odd tile -> silent single-chain fallback
    grid3 = (rng.rand(3, 128, 256) < 0.35).astype(np.uint8)
    packed3 = pack_grid(jnp.asarray(grid3))
    expected3 = bit_multi_step(packed3, jnp.asarray(rules.LIFE), 3)
    with pltpu.force_tpu_interpret_mode():
        out3 = bit_multi_step_pallas_static(packed3, (3,), (2, 3),
                                            jnp.asarray(3), scheme="vc2")
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(expected3))


def test_data_pallas_vd2_two_stream_parity():
    """The two-stream "vd2" rules-as-data scheme is bit-exact vs the packed
    XLA reference for scalar rules, per-instance rule VECTORS (per-half
    hoisted masks), and at an odd tile (single-chain vd fallback)."""
    from jax.experimental.pallas import tpu as pltpu

    from carle_tpu.ops.pallas_bitpack import bit_multi_step_pallas

    rng = np.random.RandomState(22)
    grid = (rng.rand(4, 128, 256) < 0.35).astype(np.uint8)
    packed = pack_grid(jnp.asarray(grid))

    # scalar rule
    expected = bit_multi_step(packed, jnp.asarray(rules.LIFE), 5)
    with pltpu.force_tpu_interpret_mode():
        out = bit_multi_step_pallas(packed, jnp.asarray(rules.LIFE),
                                    jnp.asarray(5), scheme="vd2")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expected))

    # per-instance rule vector: each half-stream carries its own rules
    bits = jnp.asarray(
        [rules.pack_rule_bits([3], [2, 3]),
         rules.pack_rule_bits([3, 6, 8], [2, 4, 5]),
         rules.pack_rule_bits([2], [0]),
         rules.pack_rule_bits([3, 6, 7, 8], [3, 4, 6, 7, 8])],
        dtype=jnp.int32,
    )
    expected_v = bit_multi_step(packed, bits, 4)
    with pltpu.force_tpu_interpret_mode():
        out_v = bit_multi_step_pallas(packed, bits, jnp.asarray(4),
                                      scheme="vd2")
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(expected_v))

    # odd instance count -> odd tile -> silent single-chain fallback
    grid3 = (rng.rand(3, 128, 256) < 0.35).astype(np.uint8)
    packed3 = pack_grid(jnp.asarray(grid3))
    expected3 = bit_multi_step(packed3, jnp.asarray(rules.LIFE), 3)
    with pltpu.force_tpu_interpret_mode():
        out3 = bit_multi_step_pallas(packed3, jnp.asarray(rules.LIFE),
                                     jnp.asarray(3), scheme="vd2")
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(expected3))


def test_static_pallas_vc4_four_stream_parity():
    """The experimental four-stream "vc4" scheme is bit-exact vs the
    packed reference, including the tile%4 fallback chain (vc4 -> vc2)."""
    from jax.experimental.pallas import tpu as pltpu

    from carle_tpu.ops.pallas_bitpack import bit_multi_step_pallas_static

    rng = np.random.RandomState(23)
    grid = (rng.rand(8, 128, 256) < 0.35).astype(np.uint8)
    packed = pack_grid(jnp.asarray(grid))
    expected = bit_multi_step(packed, jnp.asarray(rules.LIFE), 5)
    with pltpu.force_tpu_interpret_mode():
        out = bit_multi_step_pallas_static(packed, (3,), (2, 3),
                                           jnp.asarray(5), scheme="vc4")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expected))

    grid6 = (rng.rand(6, 128, 256) < 0.35).astype(np.uint8)  # tile % 4 != 0
    packed6 = pack_grid(jnp.asarray(grid6))
    expected6 = bit_multi_step(packed6, jnp.asarray(rules.LIFE), 3)
    with pltpu.force_tpu_interpret_mode():
        out6 = bit_multi_step_pallas_static(packed6, (3,), (2, 3),
                                            jnp.asarray(3), scheme="vc4")
    np.testing.assert_array_equal(np.asarray(out6), np.asarray(expected6))


def test_multi_stream_schemes_parity():
    """vc8 (static) and vd4 (rules-as-data) multi-stream schemes are
    bit-exact vs the packed XLA reference, including fallback chains."""
    from jax.experimental.pallas import tpu as pltpu

    from carle_tpu.ops.pallas_bitpack import (bit_multi_step_pallas,
                                              bit_multi_step_pallas_static)

    rng = np.random.RandomState(29)
    grid = (rng.rand(8, 128, 256) < 0.35).astype(np.uint8)
    packed = pack_grid(jnp.asarray(grid))
    expected = bit_multi_step(packed, jnp.asarray(rules.LIFE), 4)
    with pltpu.force_tpu_interpret_mode():
        out8 = bit_multi_step_pallas_static(packed, (3,), (2, 3),
                                            jnp.asarray(4), scheme="vc8")
        outd4 = bit_multi_step_pallas(packed, jnp.asarray(rules.LIFE),
                                      jnp.asarray(4), scheme="vd4")
    np.testing.assert_array_equal(np.asarray(out8), np.asarray(expected))
    np.testing.assert_array_equal(np.asarray(outd4), np.asarray(expected))

    # per-instance rule VECTOR with vd4: the vector engine caps at 2
    # streams (per-stream hoisted masks) — must still be exact
    vec = jnp.full((8,), rules.LIFE, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        outv = bit_multi_step_pallas(packed, vec, jnp.asarray(4),
                                     scheme="vd4")
    np.testing.assert_array_equal(np.asarray(outv), np.asarray(expected))
