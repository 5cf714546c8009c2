"""Property-based fuzzing (hypothesis) of the host-side layers.

The fixed-seed fuzz tests elsewhere pin specific regressions; these state
the actual invariants and let hypothesis hunt the input space: RLE
encode/decode round trips for arbitrary grids, native/Python codec byte
parity, GIF LZW round trips, rulestring parsing robustness on arbitrary
junk, and bitpack pack/unpack round trips.
"""

import numpy as np
import pytest

pytest.importorskip("hypothesis")  # optional test dep — skip, don't error
from hypothesis import given, settings, strategies as st  # noqa: E402

from carle_tpu import native, rle
from carle_tpu.rules import (
    pack_rule_bits,
    parse_digits,
    parse_rulestring,
    unpack_rule_bits,
)

# jit-free host code: keep hypothesis deadlines off anyway (CI boxes vary).
# HYP_EXAMPLES=1000 turns this into a soak run (default stays CI-fast).
import os

_SETTINGS = dict(deadline=None,
                 max_examples=int(os.environ.get("HYP_EXAMPLES", "60")))


grids = st.tuples(
    st.integers(min_value=1, max_value=40),   # height
    st.integers(min_value=1, max_value=40),   # width
    st.integers(min_value=0, max_value=2**31 - 1),  # seed
    st.floats(min_value=0.0, max_value=1.0),  # density
).map(lambda t: (np.random.RandomState(t[2]).rand(t[0], t[1]) < t[3])
      .astype(np.uint8))


@settings(**_SETTINGS)
@given(grids)
def test_rle_roundtrip_arbitrary_grids(grid):
    text = rle.encode_grid(grid, [3], [2, 3], torus=grid.shape)
    pat = rle.parse_rle_text(text)
    np.testing.assert_array_equal(pat.grid, grid)
    assert pat.birth == [3] and pat.survive == [2, 3]


@settings(**_SETTINGS)
@given(grids)
def test_rle_native_python_byte_parity(grid):
    if not native.available():
        return
    import unittest.mock as mock

    with mock.patch.object(native, "encode_body", lambda *a, **k: None):
        py = rle.encode_grid(grid, [3], [2, 3])
    assert rle.encode_grid(grid, [3], [2, 3]) == py

    # body = everything after the 'x = ..., y = ...' header line (a wrong
    # split leaks header digits into the first run count and corrupts BOTH
    # decoders identically, making the parity assert vacuous)
    lines = py.split("\n")
    start = next(i for i, l in enumerate(lines)
                 if l.lstrip().lower().startswith("x")) + 1
    body = "\n".join(lines[start:])
    with mock.patch.object(native, "decode_body", lambda *a, **k: None):
        py_grid = rle.decode_body(body, *grid.shape)
    np.testing.assert_array_equal(
        rle.decode_body(body, *grid.shape), py_grid)


@settings(**_SETTINGS)
@given(st.binary(max_size=400))
def test_rle_decode_never_crashes_on_junk(raw):
    """decode_body clips out-of-range content and ignores junk characters —
    arbitrary bytes must never raise or return an out-of-shape grid."""
    body = raw.decode("latin-1")
    grid = rle.decode_body(body, 16, 16)
    assert grid.shape == (16, 16)
    assert grid.dtype == np.uint8
    assert set(np.unique(grid)) <= {0, 1}


@settings(**_SETTINGS)
@given(st.text(max_size=60))
def test_parse_digits_junk_robust(junk):
    """The reference tolerates junk rulestrings (tests/test_env.py:17-39 in
    the reference suite): any text parses to a sorted digit subset of 0-8
    without raising."""
    ds = parse_digits(junk)
    assert ds == sorted(set(ds))
    assert all(0 <= d <= 8 for d in ds)


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=8), max_size=9),
    st.lists(st.integers(min_value=0, max_value=8), max_size=9),
)
def test_rule_bitmask_roundtrip(birth, survive):
    b, s = sorted(set(birth)), sorted(set(survive))
    bits = pack_rule_bits(b, s)
    assert unpack_rule_bits(bits) == (b, s)
    # the rulestring codec agrees
    rb, rs = parse_rulestring(
        "B" + "".join(map(str, b)) + "/S" + "".join(map(str, s)))
    assert (rb, rs) == (b, s)


@settings(**_SETTINGS)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=0, max_value=5000),
    st.sampled_from([(2, 2), (4, 2), (16, 4)]),  # (n_symbols, min_code_size)
)
def test_gif_lzw_roundtrip(seed, n, sym_mcs):
    from carle_tpu.utils.gif import _lzw_decode, _lzw_encode, _lzw_encode_py

    nsym, mcs = sym_mcs
    idx = np.random.RandomState(seed).randint(0, nsym, size=n).astype(np.uint8)
    enc = _lzw_encode(idx, mcs)
    assert enc == _lzw_encode_py(idx, mcs)  # native parity (no-op if absent)
    np.testing.assert_array_equal(_lzw_decode(enc, mcs, n), idx)


@settings(**_SETTINGS)
@given(
    st.integers(min_value=1, max_value=4),    # instances
    st.integers(min_value=1, max_value=6),    # height
    st.integers(min_value=1, max_value=4),    # width words
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bitpack_roundtrip(inst, h, wwords, seed):
    import jax.numpy as jnp

    from carle_tpu.ops.bitpack import pack_grid, unpack_grid

    w = 32 * wwords
    grid = (np.random.RandomState(seed).rand(inst, h, w) < 0.4).astype(np.uint8)
    out = np.asarray(unpack_grid(pack_grid(jnp.asarray(grid)), w))
    np.testing.assert_array_equal(out, grid)


@settings(**_SETTINGS)
@given(
    st.integers(min_value=8, max_value=40),
    st.integers(min_value=8, max_value=40),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.floats(min_value=0.0, max_value=0.5),
)
def test_extract_objects_partition_invariants(h, w, seed, density):
    """Objects partition the live cells: per-object counts sum to the grid
    population, every returned coordinate set is non-empty and 0-anchored."""
    from carle_tpu.analysis import extract_objects

    grid = (np.random.RandomState(seed).rand(h, w) < density).astype(np.uint8)
    objs = extract_objects(grid)
    assert sum(len(o) for o in objs) == int(grid.sum())
    for o in objs:
        assert len(o) > 0
        assert o.min(axis=0).tolist() == [0, 0]  # bbox-anchored


@settings(**_SETTINGS)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=1, max_value=10),
)
def test_population_curve_matches_stepped_oracle(seed, steps):
    from carle_tpu.analysis import population_curve
    from carle_tpu.ops.ca import ca_step_grid
    import jax.numpy as jnp

    from carle_tpu.rules import LIFE

    grid = (np.random.RandomState(seed).rand(1, 32, 32) < 0.3).astype(np.uint8)
    curve = population_curve(grid, LIFE, steps)
    g = jnp.asarray(grid)
    expect = []
    for _ in range(steps):
        g = ca_step_grid(g, LIFE)
        expect.append(int(np.asarray(g).sum()))
    assert curve[:, 0].tolist() == expect
