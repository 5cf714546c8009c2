"""Mixed-rules vs cycled wrapper pre-training at an equal env-step budget.

The reference's train loop cycles rulesets sequentially (one segment per
ruleset per epoch — /root/reference/carle/train_mcl.py:52-64).  The
per-instance rule vectors of the rules-as-data engines enable an
alternative the reference cannot express: deal the rulesets across the
instance batch and train on ALL of them simultaneously
(``train_mcl --mixed-rules``).  This study pre-trains the RND2D+AE2D stack
both ways at the SAME total env-step budget and scores the resulting
checkpoints on the published eval battery.

Run on TPU (background, unbounded — two fused training programs compile):
    python scripts/mixed_rules_study.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from carle_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def _checkpoint_paths(log_dir):
    mdir = os.path.join(log_dir, "models")
    out = {}
    for f in sorted(os.listdir(mdir)):
        for name in ("RND2D", "AE2D"):
            if f.startswith(name + "_"):
                out[name] = os.path.join(mdir, f)
    return out["RND2D"], out["AE2D"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--instances", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=4,
                        help="cycled epochs; mixed runs epochs*len(rules) "
                             "one-segment epochs for the same step budget")
    parser.add_argument("--steps-per-rule", type=int, default=1024)
    parser.add_argument("--eval-steps", type=int, default=1024)
    parser.add_argument("--eval-seeds", type=int, default=2)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log-dir", default="./logs/mixed_study")
    args = parser.parse_args()

    from carle_tpu.evaluation.eval import evaluate_fused
    from carle_tpu.mcl import AE2D, RND2D, PufferDetector, SpeedDetector
    from carle_tpu.train_mcl import DEFAULT_RULES, train

    n_rules = len(DEFAULT_RULES)
    results = {}
    for mode, mixed, epochs in (
        ("cycled", False, args.epochs),
        ("mixed", True, args.epochs * n_rules),
    ):
        log_dir = os.path.join(args.log_dir, mode)
        t0 = time.time()
        history = train(
            instances=args.instances,
            steps=[epochs, args.steps_per_rule],
            rules=DEFAULT_RULES,
            batch_size=64,
            seed=args.seed,
            log_dir=log_dir,
            mixed_rules=mixed,
        )
        train_s = time.time() - t0
        rnd_path, ae_path = _checkpoint_paths(log_dir)
        wrappers = [
            [RND2D, 1.0, rnd_path],
            [AE2D, 1.0, ae_path],
            [SpeedDetector, 1e-2, None],
            [PufferDetector, 1e-3, None],
        ]
        scores = []
        for s in range(args.eval_seeds):
            score, _ = evaluate_fused(
                wrappers=wrappers, steps=args.eval_steps, seed=s,
                verbose=False,
            )
            scores.append(float(score))
        results[mode] = {
            "train_seconds": round(train_s, 1),
            "env_steps": int(epochs * args.steps_per_rule * args.instances)
            * (1 if mixed else n_rules),
            # one full pass over ALL rulesets (cycled's final steps_per_rule
            # slice would cover only the LAST ruleset while mixed's covers
            # all four — reward scales differ per ruleset, so that pair is
            # not comparable; this window is the same rule mix in both modes)
            "final_pass_mean_reward": float(
                history[-n_rules * args.steps_per_rule:].mean()
                / args.instances
            ),
            "battery_scores": scores,
            "battery_mean": sum(scores) / len(scores),
            "checkpoints": {"RND2D": rnd_path, "AE2D": ae_path},
        }
        print(json.dumps({mode: results[mode]}))

    print(json.dumps({"mixed_rules_study": results}))


if __name__ == "__main__":
    main()
