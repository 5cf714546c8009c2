"""PPO seed-robustness suite — N training seeds in ONE process.

VERDICT r2 weak #2: the trained-PPO headline rested on best-of-4 seeds with a
bimodal distribution (1.108/1.067/0.720/0.637).  This suite makes the claim
seed-robust: >= 8 training seeds of the PPO recipe, scored on the full
5-ruleset battery, reported as median + IQR (never best-of).  The bimodality
attack is an exploration schedule — entropy beta decays linearly across
iterations (high early exploration to find the strong strategy, low late so
the policy can commit) — plus a longer budget (3 epochs vs r2's 2).

Everything runs in one process so the fused PPO program and the eval battery
compile ONCE and are reused across seeds (the tunneled remote compiler makes
per-seed subprocesses pay minutes each).

Run (TPU, ~background job):
  python scripts/ppo_seed_suite.py --seeds 8 --out assets/ppo_seed_suite_r03.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the four public rulesets — the ONE canonical table (train_mcl.py)
from carle_tpu.train_mcl import DEFAULT_RULES as TRAIN_RULES  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, default=8)
    parser.add_argument("--instances", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--steps", type=int, default=1024)
    parser.add_argument("--ppo-horizon", type=int, default=128)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--gamma", type=float, default=0.9)
    parser.add_argument("--entropy-beta", type=float, default=1e-2)
    parser.add_argument("--entropy-beta-final", type=float, default=1e-3)
    parser.add_argument("--eval-steps", type=int, default=1024)
    parser.add_argument("--eval-seed", type=int, default=0)
    parser.add_argument("--eval-seeds", type=int, nargs="+", default=None,
                        help="score every policy across THESE eval seeds "
                             "(the r4 train-seed x eval-seed matrix; "
                             "default: just --eval-seed)")
    parser.add_argument("--out", default="assets/ppo_seed_suite_r03.json")
    parser.add_argument("--save-dir", default="logs/ppo_suite")
    args = parser.parse_args()

    from carle_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import numpy as np

    from carle_tpu import EnvConfig, rules as rules_mod
    from carle_tpu.checkpoint import save_pytree
    from carle_tpu.evaluation.eval import (
        DEFAULT_WRAPPERS,
        _fused_wrapper_factory,
        evaluate_fused,
        inject_wrapper_checkpoints,
    )
    from carle_tpu.policy import PolicyTrainer, PPOTrainer

    config = EnvConfig(instances=args.instances)
    factory = _fused_wrapper_factory(config)
    defs = [factory[cls](scale) for cls, scale, _ in DEFAULT_WRAPPERS]
    trainer = PPOTrainer(config, defs, lr=args.lr, gamma=args.gamma)

    iters_per_segment = max(1, args.steps // args.ppo_horizon)
    total_iters = args.epochs * len(TRAIN_RULES) * iters_per_segment

    eval_config = EnvConfig()
    agent = PolicyTrainer(eval_config, []).as_agent()

    os.makedirs(args.save_dir, exist_ok=True)
    results = {"recipe": vars(args), "per_seed": []}

    eval_seeds = (args.eval_seeds if args.eval_seeds is not None
                  else [args.eval_seed])
    # shared random baselines (same eval seeds all training seeds face)
    t0 = time.time()
    random_scores = {}
    for es in eval_seeds:
        rs, _ = evaluate_fused(steps=args.eval_steps, seed=es, verbose=False)
        random_scores[es] = float(rs)
    random_score = random_scores[eval_seeds[0]]
    print(json.dumps({"random_scores": random_scores,
                      "t": time.time() - t0}), flush=True)

    for seed in range(args.seeds):
        t0 = time.time()
        state = trainer.init(jax.random.PRNGKey(seed), rules_mod.LIFE)
        state = state._replace(stack=state.stack._replace(
            wrappers=inject_wrapper_checkpoints(
                state.stack.wrappers, DEFAULT_WRAPPERS
            )
        ))
        it = 0
        trace_tail = 0.0
        for epoch in range(args.epochs):
            for ruleset in TRAIN_RULES:
                bits = rules_mod.pack_rule_bits(ruleset[0], ruleset[0])
                env = state.stack.env._replace(
                    rule_bits=jax.numpy.asarray(bits, dtype=jax.numpy.int32)
                )
                state = state._replace(stack=state.stack._replace(env=env))
                for _ in range(iters_per_segment):
                    frac = it / max(1, total_iters - 1)
                    beta = (args.entropy_beta
                            + frac * (args.entropy_beta_final
                                      - args.entropy_beta))
                    state, t = trainer.run(state, horizon=args.ppo_horizon,
                                           entropy_beta=beta)
                    it += 1
                trace_tail = float(np.asarray(t).mean())
        train_s = time.time() - t0

        params_path = os.path.join(args.save_dir, f"policy_seed{seed}.npz")
        save_pytree(params_path, state.params)

        t0 = time.time()
        # pass the SAME FnAgent instance + params separately: a per-seed
        # (agent, params) tuple would miss the rollout cache and rebuild
        # the battery's jitted programs every seed (eval.py:273-276)
        scores_by_eval_seed = {}
        for es in eval_seeds:
            sc, _ = evaluate_fused(
                Agent=agent, agent_params=state.params,
                steps=args.eval_steps, seed=es, verbose=False,
            )
            scores_by_eval_seed[es] = float(sc)
        score = scores_by_eval_seed[eval_seeds[0]]
        row = {
            "seed": seed,
            "score": float(score),
            "scores_by_eval_seed": scores_by_eval_seed,
            "random_score": float(random_score),
            "last_train_reward": trace_tail,
            "train_s": round(train_s, 1),
            "eval_s": round(time.time() - t0, 1),
            "params": params_path,
        }
        results["per_seed"].append(row)
        print(json.dumps(row), flush=True)
        with open(args.out, "w") as f:  # checkpoint results every seed
            json.dump(results, f, indent=1)

    scores = np.asarray([r["score"] for r in results["per_seed"]])
    results["summary"] = {
        "n": int(scores.size),
        "median": float(np.median(scores)),
        "iqr": [float(np.percentile(scores, 25)),
                float(np.percentile(scores, 75))],
        "mean": float(scores.mean()),
        "min": float(scores.min()),
        "max": float(scores.max()),
        "n_above_0p9": int((scores > 0.9).sum()),
        "random_score": float(random_score),
    }
    if len(eval_seeds) > 1:
        # the train-seed x eval-seed MATRIX (VERDICT r3 item 6): per-policy
        # mean over eval seeds, then the median of those means — robust to
        # a train-seed x eval-seed interaction inflating one cell
        mat = np.asarray([[r["scores_by_eval_seed"][es] for es in eval_seeds]
                          for r in results["per_seed"]])
        means = mat.mean(axis=1)
        results["summary"]["matrix"] = {
            "eval_seeds": list(eval_seeds),
            "median_of_means": float(np.median(means)),
            "min_policy_mean": float(means.min()),
            "per_eval_seed_median": [float(np.median(mat[:, j]))
                                     for j in range(mat.shape[1])],
            "pooled_min": float(mat.min()),
            "random_scores": random_scores,
        }
    print(json.dumps(results["summary"]), flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
