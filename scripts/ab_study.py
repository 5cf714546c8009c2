"""Multi-seed A/B study: PyTorch reference vs carle_tpu, identical protocol.

Round-1 recorded a single sample each (reference 0.726 vs ours 0.694 at
steps=256) and called the gap RNG noise; this script substantiates that with
N seeds per side on the exact challenge protocol (evaluation/eval.py:17-79):
default 4-wrapper stack loading the reference's shipped .pt checkpoints on
BOTH sides, 5 rulesets x `--steps` steps, survive<-birth compat bug active,
random Bernoulli(0.1) agent.  Only the action-stream RNG differs per seed.

The reference side replicates the reference's own evaluate() loop verbatim
(its module can't be imported as-is on this image: matplotlib at import time,
and the conv-kernel in-place write at construction breaks on torch >= 2 —
construction happens under no_grad, stepping with grad exactly as upstream).

Run:
  python scripts/ab_study.py --seeds 5 --steps 256 --out assets/ab_study_r02.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_ROOT = "/root/reference"

# eval.py:89-94 battery (last entry is the held-out outgroup) — the ONE
# canonical table lives in carle_tpu/evaluation/eval.py
from carle_tpu.evaluation.eval import DEFAULT_RULES as RULES  # noqa: E402


def _stub_reference_deps() -> None:
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk_io = types.ModuleType("skimage.io")
        sk_io.imsave = lambda *a, **k: None
        sk.io = sk_io
        sys.modules["skimage"] = sk
        sys.modules["skimage.io"] = sk_io
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)


def run_reference(seed: int, steps: int) -> float:
    """One battery with the reference implementation (torch, CPU)."""
    import numpy as np
    import torch

    _stub_reference_deps()
    from carle.env import CARLE as RefCARLE
    from carle.mcl import AE2D, RND2D, PufferDetector, SpeedDetector
    from carle.agents import RandomAgent

    np.random.seed(seed)
    torch.random.manual_seed(seed)

    wrappers = [
        [RND2D, 1.0, REF_ROOT + "/evaluation/RND2D_mcl.pt"],
        [AE2D, 1.0, REF_ROOT + "/evaluation/AE2D_mcl.pt"],
        [SpeedDetector, 1e-2, None],
        [PufferDetector, 1e-3, None],
    ]

    with torch.no_grad():  # conv-kernel writes break under torch>=2 autograd
        agent = RandomAgent()
        env = RefCARLE(device="cpu")
        for cls, scale, ckpt in wrappers:
            env = cls(env)
            env.reward_scale = scale
            env.batch_size = steps * len(RULES)  # freeze updates (eval.py:45)
            if ckpt is not None:
                env.load_state_dict(
                    torch.load(ckpt, weights_only=True, map_location="cpu")
                )
            env.eval()

    score = 0.0
    total = 0
    for ruleset in RULES:
        env.inner_env.birth = ruleset[0]
        env.inner_env.survive = ruleset[0]  # the eval.py:59 bug, as published
        obs = env.reset()
        for _ in range(steps):
            action = agent(obs)
            obs, reward, done, info = env.step(action)
            score += float(reward.detach().sum().cpu().numpy())
            total += 1
    return score / total


def run_ours(seed: int, steps: int) -> float:
    """One battery with carle_tpu's fused path, same .pt checkpoints."""
    from carle_tpu.evaluation.eval import REFERENCE_WRAPPERS, evaluate_fused

    score, _ = evaluate_fused(
        wrappers=REFERENCE_WRAPPERS, steps=steps, reference_compat=True,
        seed=seed, verbose=False,
    )
    return float(score)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, default=5)
    parser.add_argument("--steps", type=int, default=256)
    parser.add_argument("--side", choices=("ref", "ours", "both"),
                        default="both")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    results = {"steps": args.steps, "protocol":
               "5 rulesets, survive-bug compat, reference .pt checkpoints, "
               "Bernoulli(0.1) agent", "reference": [], "carle_tpu": []}

    if args.side in ("ours", "both"):
        from carle_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        for s in range(args.seeds):
            v = run_ours(s, args.steps)
            results["carle_tpu"].append(v)
            print(json.dumps({"side": "carle_tpu", "seed": s, "score": v}),
                  flush=True)
    if args.side in ("ref", "both"):
        for s in range(args.seeds):
            v = run_reference(s, args.steps)
            results["reference"].append(v)
            print(json.dumps({"side": "reference", "seed": s, "score": v}),
                  flush=True)

    import numpy as np

    summary = {}
    for k in ("reference", "carle_tpu"):
        if results[k]:
            summary[k] = {
                "mean": float(np.mean(results[k])),
                "std": float(np.std(results[k], ddof=1))
                if len(results[k]) > 1 else 0.0,
                "n": len(results[k]),
            }
    results["summary"] = summary
    print(json.dumps(summary), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
