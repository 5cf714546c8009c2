"""Render the shipped PPO policy on every battery ruleset as episode GIFs.

One creativity artifact per challenge ruleset (the reference publishes
none): the trained policy playing 256 steps at the eval geometry, agent
toggles highlighted, via the fused Rollout.run_gif path.  By default the
dynamics match the SCORED battery — i.e. the published harness's
survive<-birth bug is applied (eval.py:59); ``--fix-survive-bug`` renders
the declared rules instead.

    python scripts/policy_gallery.py --outdir assets [--steps 256]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from carle_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402

# the battery order (eval.py:89-94): Morley, Life, Day&Night, B3/S023,
# and the held-out outgroup B2/S0
RULE_NAMES = ["morley", "life", "day_night", "b3s023", "outgroup"]


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--outdir", default="assets")
    parser.add_argument("--steps", type=int, default=256)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--every", type=int, default=2)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--fix-survive-bug", action="store_true",
                        help="render the declared rules instead of the "
                             "battery's survive<-birth dynamics")
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from carle_tpu import EnvConfig, rules as rules_mod
    from carle_tpu.evaluation.eval import DEFAULT_RULES, load_shipped_policy
    from carle_tpu.rollout import Rollout

    agent, params = load_shipped_policy()
    cfg = EnvConfig(instances=1, height=args.size, width=args.size)
    ro = Rollout(cfg, wrappers=[], agent=agent)
    os.makedirs(args.outdir, exist_ok=True)

    import jax.numpy as jnp

    for name, (birth, survive) in zip(RULE_NAMES, DEFAULT_RULES):
        if not args.fix_survive_bug:
            survive = birth  # the scored battery's actual dynamics
        bits = rules_mod.pack_rule_bits(birth, survive)
        carry = ro.init(
            jax.random.PRNGKey(args.seed), bits,
            agent_params=jax.tree.map(jnp.copy, params),
        )
        carry, _ = ro.reset(carry)
        _, _, path = ro.run_gif(
            carry, num_steps=args.steps, chunk=min(args.steps, 64),
            every=args.every,
            path=os.path.join(args.outdir, f"ppo_battery_{name}.gif"),
        )
        print(f"{name}: {rules_mod.rulestring(birth, survive)} -> {path}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
