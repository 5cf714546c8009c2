"""Train a toggle policy against the frozen eval wrapper stack, then score
it on the challenge battery vs the random baseline.

Beyond-reference capability (the reference trains only wrapper nets, never
an agent): fused REINFORCE (carle_tpu/policy.py) on the eval geometry with
the DEFAULT_WRAPPERS stack — RND2D + AE2D loading the shipped checkpoints,
frozen exactly as during evaluation, plus Speed/Puffer — so the policy
optimizes the same endogenous reward it will be scored on.  Training rules
cycle the four public rulesets (train_mcl.py:95-98); scoring runs the full
5-ruleset battery (the fifth is the held-out outgroup) through
evaluate_fused with the SAME protocol as the published baselines.

Run (TPU):
  python scripts/train_policy.py --instances 16 --epochs 2 --steps 1024 \
      --out-dir logs/policy
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
    parser.add_argument("--instances", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--steps", type=int, default=1024,
                        help="training steps per ruleset segment")
    parser.add_argument("--algo", choices=("reinforce", "ppo"),
                        default="reinforce")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--entropy-beta", type=float, default=1e-3)
    parser.add_argument("--entropy-beta-final", type=float, default=None,
                        help="PPO only: linearly decay the entropy bonus "
                             "from --entropy-beta to this value across all "
                             "iterations (exploration schedule; beta is a "
                             "traced scalar, so the decay never retraces)")
    parser.add_argument("--ppo-horizon", type=int, default=128,
                        help="steps collected per PPO iteration")
    parser.add_argument("--gamma", type=float, default=0.0,
                        help="PPO discount for return-to-go credit "
                             "(0 = immediate bonus only)")
    parser.add_argument("--eval-steps", type=int, default=1024)
    parser.add_argument("--rng-impl", choices=("threefry", "rbg"),
                        default="threefry",
                        help="rbg = TPU hardware PRNG (see train_mcl --help)")
    parser.add_argument("--resume-params", default=None,
                        help="policy params .npz to continue training from "
                             "(fresh optimizer state)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out-dir", default="logs/policy")
    parser.add_argument("--skip-eval", action="store_true")
    parser.add_argument("--fused-head", action="store_true",
                        help="run the policy conv front-end as the fused "
                             "Pallas head kernels (TPU only)")
    args = parser.parse_args()

    from carle_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.rng_impl != "threefry":
        import jax as _jax

        _jax.config.update("jax_default_prng_impl", args.rng_impl)

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

    config = EnvConfig(instances=args.instances)  # eval geometry, batched
    factory = _fused_wrapper_factory(config)
    defs = [factory[cls](scale) for cls, scale, _ in DEFAULT_WRAPPERS]

    if args.algo == "ppo":
        trainer = PPOTrainer(config, defs, lr=args.lr,
                             entropy_beta=args.entropy_beta,
                             gamma=args.gamma, fused_head=args.fused_head)
    else:
        trainer = PolicyTrainer(config, defs, lr=args.lr,
                                entropy_beta=args.entropy_beta,
                                fused_head=args.fused_head)
    state = trainer.init(jax.random.PRNGKey(args.seed), rules_mod.LIFE)
    state = state._replace(stack=state.stack._replace(
        wrappers=inject_wrapper_checkpoints(
            state.stack.wrappers, DEFAULT_WRAPPERS
        )
    ))
    if args.resume_params:
        from carle_tpu.checkpoint import load_pytree
        from carle_tpu.policy import init_policy_params

        loaded = load_pytree(
            args.resume_params,
            init_policy_params(jax.random.PRNGKey(0), config),
        )
        state = state._replace(params=loaded,
                               opt_state=trainer.opt.init(loaded))

    os.makedirs(args.out_dir, exist_ok=True)
    history = []
    iters_per_segment = max(1, args.steps // args.ppo_horizon)
    total_iters = args.epochs * len(TRAIN_RULES) * iters_per_segment
    iter_idx = 0
    for epoch in range(args.epochs):
        for ruleset in TRAIN_RULES:
            bits = rules_mod.pack_rule_bits(ruleset[0], ruleset[0])
            # note survive<-birth: train under the same (bugged) rules the
            # published eval battery actually runs (eval.py:59)
            env = state.stack.env._replace(
                rule_bits=jax.numpy.asarray(bits, dtype=jax.numpy.int32)
            )
            state = state._replace(stack=state.stack._replace(env=env))
            t0 = time.time()
            if args.algo == "ppo":
                traces = []
                for _ in range(iters_per_segment):
                    if args.entropy_beta_final is not None:
                        frac = iter_idx / max(1, total_iters - 1)
                        beta = (args.entropy_beta
                                + frac * (args.entropy_beta_final
                                          - args.entropy_beta))
                    else:
                        beta = None
                    state, t = trainer.run(state, horizon=args.ppo_horizon,
                                           entropy_beta=beta)
                    iter_idx += 1
                    traces.append(np.asarray(t))
                trace = np.concatenate(traces)
            else:
                state, trace = trainer.run(state, num_steps=args.steps)
                trace = np.asarray(trace)
            history.append(trace)
            # len(trace) is the step count actually run — the PPO branch
            # rounds args.steps to whole horizons, so dividing by args.steps
            # would misstate throughput whenever they differ
            print(json.dumps({
                "epoch": epoch, "ruleset": ruleset,
                "mean_reward_first100": float(trace[:100].mean()),
                "mean_reward_last100": float(trace[-100:].mean()),
                "segment_steps": int(len(trace)),
                "steps_per_s": len(trace) / (time.time() - t0),
            }), flush=True)

    params_path = os.path.join(args.out_dir, "policy_params.npz")
    save_pytree(params_path, state.params)
    np.save(os.path.join(args.out_dir, "policy_reward_trace.npy"),
            np.concatenate(history))
    print(json.dumps({"saved": params_path}), flush=True)

    if args.skip_eval:
        return 0

    # battery score: trained policy (stochastic, as trained) vs random agent
    eval_config = EnvConfig()  # 1 instance — the published protocol
    eval_trainer = PolicyTrainer(eval_config, [])
    agent = eval_trainer.as_agent()
    score_policy, _ = evaluate_fused(
        Agent=(agent, state.params), steps=args.eval_steps,
        seed=args.seed, verbose=False,
    )
    score_random, _ = evaluate_fused(
        steps=args.eval_steps, seed=args.seed, verbose=False,
    )
    out = {
        "policy_score": float(score_policy),
        "random_score": float(score_random),
        "eval_steps": args.eval_steps,
        "train": {"instances": args.instances, "epochs": args.epochs,
                  "steps_per_segment": args.steps, "lr": args.lr},
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(args.out_dir, "battery_scores.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
