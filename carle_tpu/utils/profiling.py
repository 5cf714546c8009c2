"""Tracing / profiling (SURVEY.md §5: reference has only time.time() spans).

Two tools:

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (op-level TPU timeline);
* :class:`Throughput` — the reference's steps/s counter (train_mcl.py:72-74)
  as a reusable object with cell-updates/s derived.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/carle_tpu_trace") -> Iterator[None]:
    """Profile a block on-device: ``with trace("/tmp/t"): run(...)`` then
    inspect with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Wall-clock steps/s + cell-updates/s counter."""

    def __init__(self, instances: int, cells_per_instance: int = 0) -> None:
        self.instances = instances
        self.cells_per_instance = cells_per_instance
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def add(self, steps: int) -> None:
        self._steps += steps

    @property
    def seconds(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def steps_per_second(self) -> float:
        return self._steps * self.instances / max(self.seconds, 1e-9)

    @property
    def cell_updates_per_second(self) -> float:
        return self.steps_per_second * self.cells_per_instance

    def report(self) -> str:
        msg = f"steps / second = {self.steps_per_second:.3f}"
        if self.cells_per_instance:
            msg += f" ({self.cell_updates_per_second:.3e} cell updates/s)"
        return msg
