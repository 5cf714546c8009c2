"""Test-suite configuration.

Tests run on a virtual 8-device CPU mesh so the multi-chip sharding paths are
exercised without TPU hardware (the JAX-native stand-in for multi-host runs).
Environment variables must be set before jax initializes its backends, hence
the module-level assignment here — conftest is imported before any test
module.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()
