"""TPU artifact: |batched − sequential| eval gap at the PUBLISHED battery.

VERDICT r3 item 5 — the batched-eval deviation bound was only measured on
CPU at steps <= 128; this records the gap on real hardware at the
reference's published protocol (5 rulesets x 1024 steps, default 4-wrapper
stack with shipped checkpoints — reference evaluation/eval.py:57-77,83-98)
over several seeds, and writes ``assets/eval_deviation_r04.json`` for the
``evaluate_fused_batched`` docstring to quote.

Both paths are warm-fast once compiled (~0.6 s / ~2.4 s per battery on
v5e); the first compile through the tunnel takes minutes — run unbounded.

  python scripts/eval_deviation_tpu.py [--steps 1024] [--seeds 5]
  python scripts/eval_deviation_tpu.py --platform cpu --steps 64  # smoke
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
    parser.add_argument("--steps", type=int, default=1024)
    parser.add_argument("--seeds", type=int, default=5)
    parser.add_argument("--platform", default=None)
    parser.add_argument("--out", default="assets/eval_deviation_r04.json")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from carle_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from carle_tpu.evaluation.eval import evaluate_fused, evaluate_fused_batched

    recs = []
    for seed in range(args.seeds):
        t0 = time.time()
        sb, pr_b = evaluate_fused_batched(steps=args.steps, seed=seed,
                                          verbose=False)
        t_b = time.time() - t0
        t0 = time.time()
        ss, trace = evaluate_fused(steps=args.steps, seed=seed, verbose=False)
        t_s = time.time() - t0
        # evaluate_fused returns the per-step trace; fold to per-rule means
        pr_s = trace.reshape(-1, args.steps).mean(axis=1)
        rec = {
            "seed": seed, "steps": args.steps,
            "batched": float(sb), "sequential": float(ss),
            "diff": float(sb - ss),
            "per_rule_batched": [float(x) for x in pr_b],
            "per_rule_sequential": [float(x) for x in pr_s],
            "t_batched_s": t_b, "t_sequential_s": t_s,
        }
        recs.append(rec)
        print(json.dumps(rec), flush=True)

    diffs = [r["diff"] for r in recs]
    scores = [r["sequential"] for r in recs]
    summary = {
        "protocol": f"{args.seeds} seeds x (5 rulesets x {args.steps} steps), "
                    "default stack, shipped checkpoints",
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "mean_sequential": sum(scores) / len(scores),
        "max_abs_diff": max(abs(d) for d in diffs),
        "mean_diff": sum(diffs) / len(diffs),
        "records": recs,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "records"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
