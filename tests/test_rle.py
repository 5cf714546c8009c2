"""RLE codec tests: round-trips, reference-file compatibility, header parsing."""

import numpy as np

from carle_tpu import rle
from carle_tpu.env import CARLE


def _random_grid(h, w, p=0.3, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w) < p).astype(np.uint8)


def test_encode_decode_roundtrip():
    for seed in range(4):
        grid = _random_grid(64, 64, seed=seed)
        text = rle.encode_grid(grid, [3], [2, 3])
        pattern = rle.parse_rle_text(text)
        assert pattern.birth == [3]
        assert pattern.survive == [2, 3]
        assert pattern.torus == (64, 64)
        np.testing.assert_array_equal(pattern.grid, grid)


def test_roundtrip_trailing_live_rows():
    # the reference's encoder drops unflushed trailing rows (env.py:455-462);
    # ours must not
    grid = np.zeros((32, 32), dtype=np.uint8)
    grid[-1, -1] = 1
    text = rle.encode_grid(grid, [3], [2, 3])
    np.testing.assert_array_equal(rle.parse_rle_text(text).grid, grid)


def test_decode_golly_reference_file():
    # shipped reference pattern (carle/spaceship_duck.rle) uses bare 'b'/'o'
    # runs and multiple headers; we decode the first pattern
    pattern = rle.read_rle("/root/reference/carle/spaceship_duck.rle")
    assert pattern.birth == [3]
    assert pattern.survive == [2, 3]
    assert pattern.grid.sum() > 0
    assert pattern.grid.shape == (4, 6)


def test_decode_row_skip():
    body = "2o$3$2o!"
    grid = rle.decode_body(body, 5, 4)
    expected = np.zeros((5, 4), dtype=np.uint8)
    expected[0, :2] = 1
    expected[4, :2] = 1  # '$' then '3$' advances 1 + 3 rows
    np.testing.assert_array_equal(grid, expected)


def test_env_save_load_roundtrip(tmp_path):
    env = CARLE(height=64, width=64, action_height=16, action_width=16)
    env.reset()
    # place a glider mid-grid through the universe setter
    grid = np.zeros((1, 64, 64), dtype=np.uint8)
    grid[0, 30, 31] = 1
    grid[0, 31, 31:33] = 1
    grid[0, 32, 30] = 1
    grid[0, 32, 32] = 1
    env.universe = grid

    text = env.get_rle(env.state.grid[0])
    path = tmp_path / "u.rle"
    path.write_text(text)

    env2 = CARLE(height=64, width=64, action_height=16, action_width=16)
    env2.reset()
    env2.load_universe(str(path))
    np.testing.assert_array_equal(
        np.asarray(env2.state.grid[0]), grid[0]
    )
    assert env2.birth == [3] and env2.survive == [2, 3]


def test_rule_adopted_from_header(tmp_path):
    grid = _random_grid(16, 16, seed=1)
    text = rle.encode_grid(grid, [3, 6, 8], [2, 4, 5])
    p = tmp_path / "morley.rle"
    p.write_text(text)
    pattern = rle.read_rle(str(p))
    assert pattern.birth == [3, 6, 8]
    assert pattern.survive == [2, 4, 5]


def test_episode_log_roundtrip(tmp_path):
    """save_log -> read_csv round trip: logged universes decode back."""
    import numpy as np
    from carle_tpu import CARLE
    from carle_tpu import rle as rle_codec

    env = CARLE(height=64, width=64, action_height=16, action_width=16,
                logging=True)
    env.reset()
    act = np.zeros((1, 1, 16, 16), dtype=np.float32)
    act[0, 0, 7, 6:9] = 1.0
    env.step(act)
    env.step(np.zeros_like(act))
    path = env.save_log(directory=str(tmp_path))

    pairs = env.read_csv(path)
    assert len(pairs) == 2
    action_rle, universe_rle = pairs[1]
    decoded = rle_codec.parse_rle_text(universe_rle)
    assert decoded.grid.shape == (64, 64)
    # the logged universe is the PRE-step state of step 2 == post-step of 1
    blinker = rle_codec.parse_rle_text(action_rle)
    assert blinker.grid.sum() == 0  # second action was empty


def test_shipped_spaceship_assets():
    """The two .rle assets the reference actually ships
    (carle/spaceship_duck.rle, carle/spaceship_step.rle) are replicated in
    carle_tpu/patterns/ — and really are one generation apart under B3/S23."""
    import numpy as np

    from carle_tpu.mcl.patterns import pattern_path
    from carle_tpu.ops.ca import ca_step_grid
    from carle_tpu import rle, rules

    duck = rle.read_rle(pattern_path("spaceship_duck"))
    step = rle.read_rle(pattern_path("spaceship_step"))
    assert duck.birth == [3] and duck.survive == [2, 3]
    assert duck.grid.sum() > 0 and step.grid.sum() > 0

    # embed the duck in a comfortable grid, advance one generation, and find
    # the step pattern in the result (the reference files are offset/cropped)
    g = np.zeros((1, 32, 32), dtype=np.uint8)
    g[0, 12 : 12 + duck.grid.shape[0], 12 : 12 + duck.grid.shape[1]] = duck.grid
    out = np.asarray(ca_step_grid(g, rules.LIFE))[0]
    live = np.argwhere(out)
    r0, c0 = live.min(axis=0)
    h, w = step.grid.shape
    cropped = out[r0 : r0 + h, c0 : c0 + w]
    np.testing.assert_array_equal(cropped, step.grid)


def test_headerless_body_roundtrip_shape():
    """encode_grid writes '$' after EVERY row (reference byte parity), so a
    headerless body parse must not infer a phantom extra row — the
    reference chain rle_to_grid(env.read_rle(path)) depends on it
    (review-fix regression pin)."""
    rng = np.random.RandomState(3)
    for h, w in ((5, 8), (16, 16), (7, 31)):
        g = (rng.rand(h, w) < 0.4).astype(np.uint8)
        g[h - 1, w - 1] = 1  # content reaches the last row/col
        text = rle.encode_grid(g, [3], [2, 3])
        body = text.split("rule =")[1].split("\n", 1)[1]  # headerless body
        pat = rle.parse_rle_text(body)
        assert pat.grid.shape == (h, w), (h, w, pat.grid.shape)
        np.testing.assert_array_equal(pat.grid, g)


def test_headerless_trailing_blank_rows_kept():
    """A foreign headerless body that deliberately ends with blank rows
    ('o2$!' = live cell then one trailing empty row) must infer the full
    encoded height: only the single encoder-terminator '$' is dropped
    (advisor r3)."""
    pat = rle.parse_rle_text("o2$!")
    assert pat.grid.shape == (2, 1), pat.grid.shape
    assert pat.grid[0, 0] == 1 and pat.grid[1, 0] == 0
    # encoder-produced single trailing '$' still infers no phantom row
    pat2 = rle.parse_rle_text("o$!")
    assert pat2.grid.shape == (1, 1)
    # multiple separate trailing '$' chars collapse into one pending run
    pat3 = rle.parse_rle_text("o$$$!")
    assert pat3.grid.shape == (3, 1)


def test_decode_hostile_run_counts_clip():
    """Corrupt/hostile RLE counts (beyond int32) must clip like any other
    out-of-bounds content — never wrap to negative offsets (the native C
    decoder heap-OOB fixed in round 3); native and Python paths agree."""
    body = "2147483648$1o!"
    got = rle.decode_body(body, 4, 4)
    assert got.shape == (4, 4) and got.sum() == 0
    body2 = "1o4294967296b1o$!"
    got2 = rle.decode_body(body2, 4, 8)
    assert got2[0, 0] == 1 and got2.sum() == 1
