"""Packed spatial env + PredictionBonus at >=2048² (VERDICT r4 item 4).

Runs the bit-packed spatial env with the packed-ring PredictionBonus
(mcl/packed_stats.prediction_def_packed: [inst, K, H, W/32] u32 frames —
32x less carry than the reference's f32 list) with fused whole-AE kernels
consuming the packed source/target directly, asserts the carry layout, and
reports env-steps/s + carry bytes.

  python scripts/pred_ring_probe.py                   # TPU, 2048²
  python scripts/pred_ring_probe.py --size 256 --steps 8 --platform cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=2048)
    parser.add_argument("--steps", type=int, default=64)
    parser.add_argument("--instances", type=int, default=1)
    parser.add_argument("--platform", default=None)
    parser.add_argument("--fused", action="store_true", default=None,
                        help="fused kernels (default: on TPU)")
    parser.add_argument("--bands", type=int, default=None,
                        help="row bands for the fused nets (default: "
                             "whole-AE single kernel up to 512², band "
                             "tiling above — the whole-AE tile working "
                             "set exceeds VMEM past ~512²)")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from carle_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    import jax.numpy as jnp
    import numpy as np

    from carle_tpu import EnvConfig, rules
    from carle_tpu.mcl.packed_stats import prediction_def_packed
    from carle_tpu.ops.ca import is_tpu_platform
    from carle_tpu.parallel.packed_env import PackedSpatialStack
    from carle_tpu.rollout import Rollout
    from carle_tpu.utils.sync import device_sync

    fused = is_tpu_platform() if args.fused is None else args.fused
    size, inst = args.size, args.instances
    if fused:
        bands = args.bands if args.bands is not None else (
            0 if size <= 512 else max(size // 64, 1))
        if bands:
            from carle_tpu.nets import BandTiling

            fused = BandTiling(bands)
    cfg = EnvConfig(height=size, width=size, action_height=64,
                    action_width=64, instances=inst)
    stack = PackedSpatialStack(
        cfg, [prediction_def_packed(cfg, batch_size=64, fused_head=fused)],
        mesh=None)
    ro = Rollout(cfg, stack=stack)
    carry = ro.init(jax.random.PRNGKey(0), rules.LIFE)

    ring = carry.stack.wrappers[0].extra
    assert ring.frames.dtype == jnp.uint32, ring.frames.dtype
    assert ring.frames.shape == (inst, 5, size, size // 32)
    ring_bytes = ring.frames.nbytes
    dense_ref_bytes = inst * 5 * size * size * 4  # the reference's f32 list
    assert ring_bytes * 32 == dense_ref_bytes

    actions = (np.random.RandomState(1).rand(args.steps, inst, 64, 64) < 0.1
               ).astype(np.uint8)
    carry, rewards = ro.run_actions(carry, actions)   # compile + warm
    device_sync(rewards)
    t0 = time.time()
    carry, rewards = ro.run_actions(carry, actions)
    device_sync(rewards)
    dt = time.time() - t0

    from carle_tpu.nets import BandTiling as _BT

    print(json.dumps({
        "size": size, "instances": inst, "steps": args.steps,
        "fused": bool(fused),
        "fused_mode": ("band_tiled" if isinstance(fused, _BT)
                       else "whole_ae" if fused else "unfused"),
        "bands": fused.bands if isinstance(fused, _BT) else 0,
        "env_steps_per_s": args.steps * inst / dt,
        "cells_per_s": args.steps * inst * size * size / dt,
        "ring_bytes": int(ring_bytes),
        "ring_vs_reference_f32": 32,
        "reward_finite": bool(np.all(np.isfinite(np.asarray(rewards)))),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
