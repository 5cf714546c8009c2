"""Max single-chip env count at 512² — packed vs uint8 carry (VERDICT item 3).

BASELINE row 2's north-star shape is 65k envs of 512²; the per-chip question
is how many fused-training envs one chip holds and at what rate.  This probe
builds the exact train_mcl fused step (RND2D + AE2D online learning,
``--fused-head`` kernels, rbg dropout) for a ladder of instance counts, with
the universe carry either uint8 (default) or bit-packed (``--packed``,
parallel/packed_env.py), and reports env-steps/s plus device HBM stats; an
OOM is caught and reported as the ladder's ceiling.

  python scripts/mem_probe.py --instances 2048 4096 8192 16384 --packed
  python scripts/mem_probe.py --instances 2048 4096 8192            # uint8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(instances: int, size: int, packed: bool, steps: int,
          fused_head: bool, serialize: bool = False,
          compile_only: bool = False) -> dict:
    import jax
    import numpy as np

    from carle_tpu import EnvConfig, rules
    from carle_tpu.agents import make_random_agent
    from carle_tpu.mcl.ae import ae2d_def
    from carle_tpu.mcl.rnd import rnd2d_def
    from carle_tpu.rollout import Rollout
    from carle_tpu.utils.sync import device_sync

    config = EnvConfig(height=size, width=size, action_height=64,
                       action_width=64, instances=instances)
    defs = [rnd2d_def(config, batch_size=64, fused_head=fused_head),
            ae2d_def(config, batch_size=64, fused_head=fused_head)]
    if packed:
        from carle_tpu.parallel.packed_env import PackedSpatialStack

        stack = PackedSpatialStack(config, defs, mesh=None,
                                   serialize=serialize)
    else:
        from carle_tpu.mcl.base import WrapperStack

        stack = WrapperStack(config, defs, serialize=serialize)
    ro = Rollout(config, defs,
                 make_random_agent(64, 64), stack=stack)
    carry = ro.init(jax.random.PRNGKey(0), rules.LIFE)

    if compile_only:
        # chipless accounting: lower + compile through the remote helper
        # WITHOUT executing, and report XLA's own memory analysis — the
        # cheap way to see what binds before committing a long job.
        # Pricing basis = utils/preflight.price_program, the SAME code the
        # training driver's HBM guard uses (ro._run is the donated jit
        # instance the run path executes), so probe figures and preflight
        # refusals can never drift apart.
        from carle_tpu.utils.preflight import price_program

        mem = price_program(ro._run, carry, num_steps=steps)
        return {"instances": instances, "size": size, "packed": packed,
                "serialize": serialize, "compile_only": True,
                "memory_analysis": mem, "ok": True}

    carry, rewards = ro.run(carry, num_steps=steps)   # compile + warm
    device_sync(rewards)
    t0 = time.time()
    carry, rewards = ro.run(carry, num_steps=steps)
    device_sync(rewards)
    dt = time.time() - t0

    dev = jax.local_devices()[0]
    stats = {}
    try:
        ms = dev.memory_stats() or {}
        stats = {k: ms[k] for k in
                 ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                 if k in ms}
    except Exception:
        pass
    return {
        "instances": instances, "size": size, "packed": packed,
        "serialize": serialize, "steps": steps,
        "env_steps_per_s": steps * instances / dt,
        "scan_steps_per_s": steps / dt,
        "memory": stats,
        "ok": True,
    }


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--instances", type=int, nargs="+",
                        default=[2048, 4096, 8192])
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--steps", type=int, default=32)
    parser.add_argument("--packed", action="store_true")
    parser.add_argument("--compile-only", action="store_true",
                        help="lower+compile only (remote helper, no chip) "
                             "and print XLA's memory analysis")
    parser.add_argument("--serialize", action="store_true",
                        help="optimization_barrier between wrappers: peak "
                             "transients become max-of-wrappers, not sum")
    parser.add_argument("--no-fused-head", action="store_true")
    parser.add_argument("--platform", default=None)
    parser.add_argument("--rng-impl", default="rbg")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.rng_impl != "threefry":
        jax.config.update("jax_default_prng_impl", args.rng_impl)
    from carle_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    for inst in args.instances:
        try:
            rec = probe(inst, args.size, args.packed, args.steps,
                        fused_head=not args.no_fused_head,
                        serialize=args.serialize,
                        compile_only=args.compile_only)
        except Exception as e:  # RESOURCE_EXHAUSTED etc.
            import re

            msg = re.sub(r"\x1b\[[0-9;]*m", "", str(e))  # strip ANSI
            # keep the HBM allocation breakdown when present — it IS the
            # ladder's diagnostic (the r4 binder accounting came from it)
            m = re.search(r"Largest program allocations[\s\S]{0,6000}", msg)
            rec = {"instances": inst, "size": args.size,
                   "packed": args.packed, "serialize": args.serialize,
                   "ok": False,
                   "error": msg[:2000],
                   "allocations": m.group(0) if m else None,
                   "oom": "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
                          or "memory space" in msg or "exceeds" in msg}
            print(json.dumps(rec), flush=True)
            break
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
