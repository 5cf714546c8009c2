"""Isolate the 512² large-instance TPU worker fault (round-4 ladder).

The full fused training step (RND2D + AE2D online learning, packed carry)
runs at 5376 instances of 512² but kills the TPU worker with a "kernel
fault" at 5632+ even though compile-time memory analysis prices 5632 at
14.2 GiB of 15.75 (the effective RUNTIME limit is ~13.5-14 GiB — see
assets/ladder512_r04.jsonl and docs/SCALING.md).  This probe runs
stripped-down pieces of that step at a given instance count so the
faulting component can be named (round-4 verdict, assets/
fault_probe_r04.jsonl: every piece — env, each learner alone, both
forward-only — runs at 6144; only the two-learner TRAINING step crosses
the line):

  env        bare packed CA rollout (no wrappers)
  rnd        env + RND2D only (fused heads, training)
  ae         env + AE2D only (fused heads, training)
  fwd        env + both wrappers, train=False (bonus forward only)
  full       the exact mem_probe step (both wrappers, training)

Each piece is launched as its OWN subprocess: a worker crash poisons the
process that hit it, so in-process sequencing would mis-blame every piece
after the first fault.  Counterpart of the ladder contract at
/root/reference/carle/train_mcl.py:15-89.

  python scripts/fault_probe.py --instances 6144 [--pieces env,rnd,...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PIECES = ("env", "rnd", "ae", "fwd", "full")


def run_piece(piece: str, instances: int, size: int, steps: int) -> dict:
    import jax
    import numpy as np

    from carle_tpu import EnvConfig, rules
    from carle_tpu.agents import make_random_agent
    from carle_tpu.mcl.ae import ae2d_def
    from carle_tpu.mcl.rnd import rnd2d_def
    from carle_tpu.parallel.packed_env import PackedSpatialStack
    from carle_tpu.rollout import Rollout
    from carle_tpu.utils.sync import device_sync

    config = EnvConfig(height=size, width=size, action_height=64,
                       action_width=64, instances=instances)
    train = piece not in ("env", "fwd")
    defs = []
    if piece in ("rnd", "fwd", "full"):
        defs.append(rnd2d_def(config, batch_size=64, fused_head=True,
                              train=train))
    if piece in ("ae", "fwd", "full"):
        defs.append(ae2d_def(config, batch_size=64, fused_head=True,
                             train=train))
    stack = PackedSpatialStack(config, defs, mesh=None)
    ro = Rollout(config, defs, make_random_agent(64, 64), stack=stack)
    carry = ro.init(jax.random.PRNGKey(0), rules.LIFE)
    carry, rewards = ro.run(carry, num_steps=steps)
    device_sync(rewards)
    t0 = time.time()
    carry, rewards = ro.run(carry, num_steps=steps)
    device_sync(rewards)
    dt = time.time() - t0
    return {"piece": piece, "instances": instances, "size": size,
            "env_steps_per_s": steps * instances / dt, "ok": True,
            "reward_checksum": float(np.asarray(rewards).sum())}


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--instances", type=int, default=6144)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--steps", type=int, default=32)
    parser.add_argument("--pieces", default="env,rnd,ae,fwd,full")
    parser.add_argument("--rng-impl", default="rbg")
    parser.add_argument("--piece", default=None,
                        help="(internal) run ONE piece in this process")
    args = parser.parse_args()

    if args.piece:  # child mode
        import jax

        if args.rng_impl != "threefry":
            jax.config.update("jax_default_prng_impl", args.rng_impl)
        from carle_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        rec = run_piece(args.piece, args.instances, args.size, args.steps)
        print(json.dumps(rec), flush=True)
        return 0

    for piece in args.pieces.split(","):
        piece = piece.strip()
        if piece not in PIECES:
            raise SystemExit(f"unknown piece {piece!r} (choose from {PIECES})")
        cmd = [sys.executable, os.path.abspath(__file__),
               "--piece", piece, "--instances", str(args.instances),
               "--size", str(args.size), "--steps", str(args.steps),
               "--rng-impl", args.rng_impl]
        t0 = time.time()
        proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        out = proc.stdout.strip().splitlines()
        rec = None
        for line in out:
            try:
                rec = json.loads(line)
                break
            except ValueError:
                continue
        if rec is None:
            tail = (proc.stderr or proc.stdout or "")[-1500:]
            rec = {"piece": piece, "instances": args.instances,
                   "size": args.size, "ok": False,
                   "returncode": proc.returncode, "tail": tail,
                   "wall_s": round(time.time() - t0, 1)}
        print(json.dumps(rec), flush=True)
        if not rec.get("ok"):
            # a worker crash takes a moment to recover before the next
            # piece can acquire the chip (observed on the axon relay)
            time.sleep(30)
    return 0


if __name__ == "__main__":
    sys.exit(main())
