"""Native C RLE codec: byte-parity with the Python codec + round trips."""

import subprocess
import sys

import numpy as np
import pytest

from carle_tpu import native, rle


needs_native = pytest.mark.skipif(
    not native.available(), reason="librle.so not built"
)


def _python_encode(grid, **kw):
    """Force the pure-Python encoder by bypassing the native hook."""
    import importlib
    import unittest.mock as mock

    with mock.patch.object(native, "encode_body", lambda *a, **k: None):
        return rle.encode_grid(grid, [3], [2, 3], **kw)


@needs_native
@pytest.mark.parametrize("seed,shape,p", [
    (0, (64, 64), 0.3), (1, (256, 256), 0.05), (2, (17, 33), 0.5),
    (3, (8, 8), 0.0), (4, (8, 8), 1.0),
])
def test_native_encode_byte_parity(seed, shape, p):
    rng = np.random.RandomState(seed)
    grid = (rng.rand(*shape) < p).astype(np.uint8)
    native_text = rle.encode_grid(grid, [3], [2, 3])
    python_text = _python_encode(grid)
    assert native_text == python_text


@needs_native
def test_native_decode_parity():
    rng = np.random.RandomState(7)
    grid = (rng.rand(64, 64) < 0.25).astype(np.uint8)
    text = rle.encode_grid(grid, [3], [2, 3])
    pattern = rle.parse_rle_text(text)
    np.testing.assert_array_equal(pattern.grid, grid)

    # decode through both paths explicitly
    body = text.split("\n", 3)[3]
    nat = native.decode_body(body, 64, 64)
    np.testing.assert_array_equal(nat, grid)


@needs_native
def test_native_roundtrip_reference_file():
    """Native decoder must read reference-authored pattern files."""
    from carle_tpu.mcl.patterns import pattern_path

    p = rle.read_rle(pattern_path("glider_1"))
    assert p.grid.sum() == 5


def test_python_fallback_works_without_native():
    import unittest.mock as mock

    rng = np.random.RandomState(9)
    grid = (rng.rand(32, 32) < 0.3).astype(np.uint8)
    with mock.patch.object(native, "encode_body", lambda *a, **k: None), \
         mock.patch.object(native, "decode_body", lambda *a, **k: None):
        text = rle.encode_grid(grid, [3], [2, 3])
        decoded = rle.parse_rle_text(text)
    np.testing.assert_array_equal(decoded.grid, grid)
