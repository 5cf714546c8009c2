"""Persistent XLA compilation cache.

Compiles through the bench image's remote-compile tunnel take minutes; the
persistent cache makes repeat invocations (across processes) near-instant.
Enabled by the CLI entry points (bench.py, train_mcl, evaluation.eval).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "") -> None:
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement


def force_cpu_when_virtual_devices() -> None:
    """If XLA_FLAGS requests virtual host devices, force the CPU platform.

    The bench image's TPU plugin overrides the JAX_PLATFORMS env var, so
    the config knob is the only reliable switch; a no-op failure (backend
    already initialized) is tolerated.  Shared by dryrun_multichip and
    bench_multichip — the virtual-mesh entry points."""
    import jax

    if "xla_force_host_platform_device_count" in os.environ.get(
        "XLA_FLAGS", ""
    ):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
