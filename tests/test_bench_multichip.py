"""Smoke tests for the multi-chip scaling benchmark harness.

Tiny shapes on the virtual 8-device CPU mesh (conftest) — the point is that
both measurement modes (fused env-batch rollout, row-sharded spatial
universe in uint8 AND packed form) run end-to-end at more than one device
count and return sane throughputs.
"""

import numpy as np
import pytest

import bench_multichip


@pytest.mark.parametrize("n_devices", [1, 2])
def test_measure_env_batch(n_devices):
    v = bench_multichip.measure(
        n_devices=n_devices, instances_per_device=2, size=64, steps=4,
        wrapped=True, seed=0,
    )
    assert np.isfinite(v) and v > 0


@pytest.mark.parametrize("packed", [False, True])
def test_measure_spatial(packed):
    v = bench_multichip.measure_spatial(
        n_devices=2, rows_per_device=32, width=64, steps=4, instances=1,
        packed=packed,
    )
    assert np.isfinite(v) and v > 0
