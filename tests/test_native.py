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


# --- native GIF LZW encoder (libgif.so) ------------------------------------

needs_gif_native = pytest.mark.skipif(
    not native.gif_available(), reason="libgif.so not built"
)


@needs_gif_native
@pytest.mark.parametrize("seed,n,nsym,mcs", [
    (0, 1000, 2, 2),       # binary CA frames, the common case
    (1, 65536, 2, 2),      # one 256x256 frame
    (2, 200000, 4, 2),     # long stream: forces 4096-code table resets
    (3, 50000, 16, 4),     # wider palette / code size
    (4, 1, 2, 2),          # single pixel
    (5, 0, 2, 2),          # empty stream
])
def test_gif_lzw_native_byte_parity(seed, n, nsym, mcs):
    """The C++ encoder must be byte-identical to the Python loop across
    stream lengths that exercise width growth and table resets."""
    from carle_tpu.utils.gif import _lzw_encode_py

    rng = np.random.RandomState(seed)
    idx = rng.randint(0, nsym, size=n).astype(np.uint8)
    assert native.lzw_encode(idx, mcs) == _lzw_encode_py(idx, mcs)


@needs_gif_native
def test_gif_lzw_native_roundtrip_and_writer():
    """Native-encoded frames decode back exactly, and write_gif emits a
    valid GIF89a through the native path."""
    import os
    import tempfile

    from carle_tpu.utils.gif import _lzw_decode, write_gif

    rng = np.random.RandomState(7)
    frames = (rng.rand(5, 32, 48) < 0.35).astype(np.uint8)
    enc = native.lzw_encode(frames[0].reshape(-1), 2)
    dec = _lzw_decode(enc, 2, frames[0].size)
    np.testing.assert_array_equal(dec, frames[0].reshape(-1))

    with tempfile.TemporaryDirectory() as tmp:
        path = write_gif(os.path.join(tmp, "ep.gif"), frames, fps=10)
        with open(path, "rb") as f:
            data = f.read()
    assert data.startswith(b"GIF89a") and data.endswith(b"\x3b")


@needs_gif_native
def test_gif_lzw_native_rejects_out_of_palette():
    idx = np.asarray([0, 1, 7], dtype=np.uint8)  # 7 >= 1<<2
    # validated input error SURFACES (a silent None used to route the same
    # invalid stream into the Python encoder, which crashes/corrupts)
    with pytest.raises(ValueError, match="palette index"):
        native.lzw_encode(idx, 2)
