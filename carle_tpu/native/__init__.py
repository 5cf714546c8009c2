"""ctypes bindings for the native RLE codec (rle_codec.cpp).

Loads ``librle.so`` if present (build with ``make -C carle_tpu/native``); on
import failure every symbol is None and rle.py silently uses its numpy
implementation — the wire format is identical either way (parity-tested in
tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "librle.so")
_lib: Optional[ctypes.CDLL] = None

if os.path.exists(_LIB_PATH):
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.rle_encode.restype = ctypes.c_int
        _lib.rle_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_long,
        ]
        _lib.rle_decode.restype = ctypes.c_int
        _lib.rle_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
    except OSError:
        _lib = None


def available() -> bool:
    return _lib is not None


def encode_body(grid: np.ndarray, wrap: int = 69) -> Optional[str]:
    """Encode a 2-D 0/1 grid to an RLE body string, or None if the native
    library is unavailable."""
    if _lib is None:
        return None
    g = np.ascontiguousarray(grid != 0, dtype=np.uint8)
    h, w = g.shape
    cap = 16 * h * w + 1024  # worst case: alternating cells
    buf = ctypes.create_string_buffer(cap)
    n = _lib.rle_encode(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, wrap, buf, cap,
    )
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")


def decode_body(body: str, height: int, width: int) -> Optional[np.ndarray]:
    """Decode an RLE body into a uint8 grid, or None if unavailable."""
    if _lib is None:
        return None
    grid = np.zeros((height, width), dtype=np.uint8)
    raw = body.encode("ascii", errors="ignore")
    _lib.rle_decode(
        raw, len(raw),
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        height, width,
    )
    return grid


# --- GIF LZW (libgif.so) ---------------------------------------------------

_GIF_LIB_PATH = os.path.join(os.path.dirname(__file__), "libgif.so")
_gif_lib: Optional[ctypes.CDLL] = None

if os.path.exists(_GIF_LIB_PATH):
    try:
        _gif_lib = ctypes.CDLL(_GIF_LIB_PATH)
        _gif_lib.gif_lzw_encode.restype = ctypes.c_long
        _gif_lib.gif_lzw_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ]
    except OSError:
        _gif_lib = None


def gif_available() -> bool:
    return _gif_lib is not None


def lzw_encode(indices: np.ndarray, min_code_size: int) -> Optional[bytes]:
    """GIF-variant LZW compression of a flat uint8 index stream —
    byte-identical to utils/gif.py:_lzw_encode — or None if libgif.so is
    unavailable (build with ``make -C carle_tpu/native``)."""
    if _gif_lib is None:
        return None
    arr = np.ascontiguousarray(indices, dtype=np.uint8).reshape(-1)
    # worst case: one 12-bit code per pixel plus CLEAR/END and slack
    cap = 2 * max(arr.size, 1) + 1024
    buf = (ctypes.c_uint8 * cap)()
    n = _gif_lib.gif_lzw_encode(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        arr.size, min_code_size, buf, cap,
    )
    if n == -2:
        # validated input error — surface it; silently falling back would
        # make the Python encoder crash (or emit a corrupt GIF) on the
        # same out-of-range palette indices
        raise ValueError(
            f"palette index out of range for min_code_size={min_code_size}"
        )
    if n < 0:
        return None  # buffer/availability problem: Python fallback
    return bytes(bytearray(buf[:n]))
