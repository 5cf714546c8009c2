"""Multi-chip scaling benchmark — env-steps/s vs device count.

Weak scaling of the fused rollout (agent + env + wrapper stack in one scan):
instances-per-device held constant while the mesh grows; the BASELINE.md
target is >=90% linear scaling.  On a machine without a pod slice, run on
the virtual CPU mesh to validate the harness shape:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_multichip.py --devices 1 2 4 8 --steps 64

On a real pod slice, run as-is (add `jax.distributed.initialize()` via
--multihost for multi-host).  Prints one JSON line per device count plus a
scaling-efficiency summary line.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


from carle_tpu.utils.sync import device_sync as _sync  # true axon barrier


def measure(n_devices: int, instances_per_device: int, size: int, steps: int,
            wrapped: bool, seed: int) -> float:
    """Return fused env-steps/s on an ``n_devices`` mesh."""
    import jax.numpy as jnp

    from carle_tpu import EnvConfig, rules
    from carle_tpu.agents import make_random_agent
    from carle_tpu.mcl.ae import ae2d_def
    from carle_tpu.mcl.rnd import rnd2d_def
    from carle_tpu.parallel import make_mesh, shard_carry
    from carle_tpu.rollout import Rollout

    config = EnvConfig(
        height=size, width=size, action_height=min(64, size // 4),
        action_width=min(64, size // 4),
        instances=instances_per_device * n_devices,
    )
    wrappers = (
        [rnd2d_def(config, batch_size=64), ae2d_def(config, batch_size=64)]
        if wrapped else []
    )
    ro = Rollout(config, wrappers, make_random_agent(
        config.eff_action_width, config.eff_action_height
    ))
    mesh = make_mesh(jax.devices()[:n_devices], axis_name="env")
    carry = shard_carry(
        ro.init(jax.random.PRNGKey(seed), rules.LIFE), mesh, config
    )

    carry, rewards = ro.run(carry, num_steps=steps)  # compile + warm
    _sync(rewards)
    t0 = time.perf_counter()
    carry, rewards = ro.run(carry, num_steps=steps)
    _sync(rewards)
    dt = time.perf_counter() - t0
    return steps * config.instances / dt


def measure_spatial(n_devices: int, rows_per_device: int, width: int,
                    steps: int, instances: int, packed: bool) -> float:
    """Cell-updates/s of a row-sharded universe on an ``n_devices`` mesh
    (weak scaling over rows; ghost rows ride the ring each generation)."""
    import jax.numpy as jnp

    from carle_tpu import rules
    from carle_tpu.parallel import (
        bit_spatial_multi_step,
        make_mesh,
        spatial_multi_step,
    )

    h = rows_per_device * n_devices
    mesh = make_mesh(jax.devices()[:n_devices], axis_name="space")
    rng = np.random.RandomState(0)
    grid = (rng.rand(instances, h, width) < 0.4).astype(np.uint8)

    if packed:
        from carle_tpu.ops.bitpack import pack_grid

        state = pack_grid(jnp.asarray(grid))
        fn = jax.jit(
            lambda s: bit_spatial_multi_step(s, rules.LIFE, steps, mesh)
        )
    else:
        state = jnp.asarray(grid)
        fn = jax.jit(
            lambda s: spatial_multi_step(s, rules.LIFE, steps, mesh)
        )

    _sync(fn(state))  # compile + warm (ONE jit instance — reused below)
    t0 = time.perf_counter()
    _sync(fn(state))
    dt = time.perf_counter() - t0
    return instances * h * width * steps / dt


def main() -> int:
    from carle_tpu.utils.cache import (enable_compilation_cache,
                                       force_cpu_when_virtual_devices)

    enable_compilation_cache()
    force_cpu_when_virtual_devices()
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, nargs="+", default=None,
                        help="device counts to sweep (default: 1..all by 2x)")
    parser.add_argument("--instances-per-device", type=int, default=16)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--steps", type=int, default=128)
    parser.add_argument("--no-wrappers", action="store_true",
                        help="bare env rollout (no RND/AE learning)")
    parser.add_argument("--spatial", choices=("off", "uint8", "packed"),
                        default="off",
                        help="measure the row-sharded-universe path instead "
                             "of the env-batch rollout")
    parser.add_argument("--rows-per-device", type=int, default=512)
    parser.add_argument("--width", type=int, default=1024)
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() first")
    args = parser.parse_args()

    if args.multihost:
        jax.distributed.initialize()

    total = len(jax.devices())
    counts = args.devices
    if counts is None:
        counts, n = [], 1
        while n <= total:
            counts.append(n)
            n *= 2

    results = {}
    for n in counts:
        if n > total:
            print(f"# skipping {n} devices (only {total} available)")
            continue
        if args.spatial != "off":
            cps = measure_spatial(n, args.rows_per_device, args.width,
                                  args.steps, instances=1,
                                  packed=args.spatial == "packed")
            results[n] = cps
            print(json.dumps({
                "metric": "spatial_cell_updates_per_s", "devices": n,
                "value": cps, "unit": "cells/s",
                "config": {"rows_per_device": args.rows_per_device,
                           "width": args.width, "engine": args.spatial},
            }))
            continue
        sps = measure(n, args.instances_per_device, args.size, args.steps,
                      wrapped=not args.no_wrappers, seed=0)
        results[n] = sps
        print(json.dumps({
            "metric": "env_steps_per_s", "devices": n, "value": sps,
            "unit": "env-steps/s",
            "config": {"instances_per_device": args.instances_per_device,
                       "size": args.size,
                       "wrapped": not args.no_wrappers},
        }))

    if len(results) > 1:
        base_n = min(results)
        per_dev_base = results[base_n] / base_n
        eff = {
            n: results[n] / (n * per_dev_base) for n in results
        }
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": min(eff.values()),
            "unit": "fraction_of_linear",
            "per_device_count": {str(n): round(e, 4) for n, e in eff.items()},
        }))
        if jax.devices()[0].platform == "cpu":
            # Virtual CPU devices share the host's cores, so weak scaling
            # cannot exceed flat total throughput; the meaningful number is
            # the *overhead-adjusted* efficiency — total env-steps/s at N
            # devices vs at 1 (== 1.0 iff sharding/collectives add zero
            # cost on a fixed compute budget).
            veff = {n: results[n] / results[base_n] for n in results}
            print(json.dumps({
                "metric": "scaling_efficiency_virtual_adjusted",
                "value": min(veff.values()),
                "unit": "fraction_of_zero_overhead",
                "note": f"virtual CPU mesh: N devices share one host's "
                        f"cores; baseline is the {base_n}-device run; 1.0 "
                        f"= sharding adds no overhead as device count (and "
                        f"total work) scales",
                "per_device_count": {str(n): round(e, 4)
                                     for n, e in veff.items()},
            }))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
