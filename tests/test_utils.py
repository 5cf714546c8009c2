"""utils: PNG writer, throughput counter, compilation cache helper."""

import os
import struct
import zlib

import numpy as np

from carle_tpu.utils.png import write_png
from carle_tpu.utils.profiling import Throughput


def test_png_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = (rng.rand(32, 48) * 255).astype(np.uint8)
    path = str(tmp_path / "frame.png")
    write_png(path, img)

    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # parse IHDR dims
    w, h = struct.unpack(">II", data[16:24])
    assert (h, w) == img.shape
    # decode IDAT and compare pixels (grayscale, no filter per scanline)
    idat = b""
    off = 8
    while off < len(data):
        length, = struct.unpack(">I", data[off:off + 4])
        ctype = data[off + 4:off + 8]
        if ctype == b"IDAT":
            idat += data[off + 8:off + 8 + length]
        off += 12 + length
    raw = zlib.decompress(idat)
    rows = np.frombuffer(raw, np.uint8).reshape(h, w + 1)
    assert (rows[:, 0] == 0).all()  # filter byte 0
    np.testing.assert_array_equal(rows[:, 1:], img)


def test_throughput_counter():
    t = Throughput(instances=4, cells_per_instance=100)
    t.add(10)
    sps = t.steps_per_second
    assert sps > 0
    # properties re-read the clock; compare loosely
    assert abs(t.cell_updates_per_second / (t.steps_per_second * 100) - 1) < 0.5
    assert "steps / second" in t.report()


def test_compilation_cache_helper(tmp_path):
    import jax

    from carle_tpu.utils.cache import enable_compilation_cache

    # jax.config.update is process-global: restore the previous cache dir so
    # the rest of the suite doesn't silently compile into this tmp dir
    prev = jax.config.jax_compilation_cache_dir
    try:
        target = str(tmp_path / "cache")
        enable_compilation_cache(target)
        assert os.path.isdir(target)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
