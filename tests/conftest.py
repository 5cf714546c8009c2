"""Test-suite configuration.

Tests run on a virtual 8-device CPU mesh so the multi-chip sharding paths are
exercised without TPU hardware (the JAX-native stand-in for multi-host runs).

The bench image pins ``JAX_PLATFORMS=axon`` (TPU) via sitecustomize, so an
environment-variable default is not enough — the platform must be forced
through ``jax.config`` after import (backends initialize lazily, so this is
safe as long as it happens before any array op, which conftest import order
guarantees).  CPU also keeps convs in f32 (TPU lowers them to bf16, breaking
the exact-parity tests).
"""

import os
import re

# force EXACTLY 8 virtual devices: a leftover different count in the
# inherited XLA_FLAGS (e.g. =4 from a multichip experiment shell) must be
# replaced, not kept — the sharding tests assume the documented 8-device
# mesh and would otherwise fail with confusing mesh-shape errors
prev = os.environ.get("XLA_FLAGS", "")
prev = re.sub(r"--xla_force_host_platform_device_count=\d+", "", prev)
os.environ["XLA_FLAGS"] = (
    prev + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The PyTorch reference at /root/reference is importable for parity tests;
# stub its scikit-image dependency (only used for PNG export) once, centrally.
import sys  # noqa: E402
import types  # noqa: E402

if "skimage" not in sys.modules:
    _sk = types.ModuleType("skimage")
    _sk_io = types.ModuleType("skimage.io")
    _sk_io.imsave = lambda *a, **k: None
    _sk.io = _sk_io
    sys.modules["skimage"] = _sk
    sys.modules["skimage.io"] = _sk_io

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")
