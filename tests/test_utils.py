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


def test_profiler_trace_writes_artifacts(tmp_path):
    """The trace context manager produces a TensorBoard-loadable trace dir
    (op-level timeline — SURVEY §5's tracing subsystem)."""
    import jax.numpy as jnp

    from carle_tpu.utils.profiling import trace

    d = str(tmp_path / "trace")
    with trace(d):
        jnp.ones((8, 8)).sum().block_until_ready()
    files = [p for p in __import__("pathlib").Path(d).rglob("*") if p.is_file()]
    assert files, "no trace artifacts written"


def test_ascii_render(monkeypatch, capsys):
    """render() draws instance 0 ('o' = alive) without clearing the test
    terminal or sleeping."""
    import carle_tpu.env as env_mod
    from carle_tpu import CARLE

    monkeypatch.setattr(env_mod.os, "system", lambda *_: 0)
    monkeypatch.setattr(env_mod.time, "sleep", lambda *_: None)
    env = CARLE(instances=1, height=8, width=8, action_height=4,
                action_width=4)
    env.reset()
    g = np.zeros((1, 8, 8), dtype=np.uint8)
    g[0, 3, 2:5] = 1
    env.universe = g
    env.render()
    out = capsys.readouterr().out
    assert "CA Universe" in out
    assert "ooo" in out
