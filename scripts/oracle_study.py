"""Battery calibration with scripted oracle agents (VERDICT r4 item 5).

The PPO plateau (~1.1 battery score vs 0.63-0.66 random) has had no upper
anchor: nobody knew whether 1.1 is near the battery's ceiling or 20% of
it.  This study scores SCRIPTED agents that deploy known engineered
structures (Gosper gun, Morley puffer, glider/LWSS fleets — RLEs shipped
in carle_tpu/patterns/, helpers at reference mcl.py:855-893) through the
action window on the PUBLISHED 5x1024 battery (evaluation/eval.py
protocol, reference_compat survive<-birth semantics), giving the challenge
harness a reproducible skill baseline the reference never had.

  python scripts/oracle_study.py                  # TPU, full battery
  python scripts/oracle_study.py --quick --platform cpu

Writes assets/oracle_scores_r05.json and appends rows to assets/scores.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_agents():
    from carle_tpu.agents import make_seeder_agent, tile_pattern
    from carle_tpu.mcl.patterns import (get_glider, get_morley_puffer,
                                        pattern_path)
    from carle_tpu.rle import read_rle

    glider = np.array([[0, 1, 0],
                       [0, 0, 1],
                       [1, 1, 1]], dtype=np.float32)
    block = np.ones((2, 2), dtype=np.float32)
    gun = read_rle(pattern_path("gosper_gun")).grid
    lwss = read_rle(pattern_path("lwss")).grid

    return {
        # None = the reference RandomAgent baseline (Bernoulli 0.1)
        "random": None,
        "glider": make_seeder_agent(get_glider()),
        "glider_fleet_9": make_seeder_agent(
            tile_pattern(glider, 9, spacing=12)),
        "gosper_gun": make_seeder_agent(gun),
        "morley_puffer": make_seeder_agent(get_morley_puffer()),
        "lwss_fleet_4": make_seeder_agent(tile_pattern(lwss, 4, spacing=10)),
        "block_lattice_36": make_seeder_agent(
            tile_pattern(block, 36, spacing=6)),
    }


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1024)
    parser.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3])
    parser.add_argument("--quick", action="store_true",
                        help="16 steps, seed 0 only (CPU functional check)")
    parser.add_argument("--platform", default=None)
    parser.add_argument("--out", default=None)
    parser.add_argument("--with-policy", action="store_true",
                        help="also score the shipped PPO policy in the same "
                             "process (same compiled programs)")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from carle_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from carle_tpu.evaluation.eval import evaluate_fused, load_shipped_policy

    steps = 16 if args.quick else args.steps
    seeds = [0] if args.quick else args.seeds

    agents = build_agents()
    if args.with_policy:
        agents["ppo_policy"] = load_shipped_policy()

    records = []
    for name, agent in agents.items():
        scores = []
        for seed in seeds:
            score, _ = evaluate_fused(Agent=agent, steps=steps, seed=seed,
                                      verbose=False)
            scores.append(float(score))
        rec = {"agent": name, "steps": steps, "seeds": seeds,
               "scores": scores, "mean": float(np.mean(scores)),
               "min": float(np.min(scores)), "max": float(np.max(scores))}
        records.append(rec)
        print(json.dumps(rec), flush=True)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = args.out or os.path.join(here, "assets", "oracle_scores_r05.json")
    if not args.quick:
        with open(out, "w") as f:
            json.dump({"protocol": f"5x{steps} published battery, "
                                   "reference_compat", "records": records},
                      f, indent=1)
        with open(os.path.join(here, "assets", "scores.txt"), "a") as f:
            f.write(f"\n# oracle calibration (r5, 5x{steps} battery, "
                    f"seeds {seeds})\n")
            for rec in records:
                f.write(f"{rec['agent']}: mean {rec['mean']:.4f} "
                        f"[{rec['min']:.4f}, {rec['max']:.4f}]\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
