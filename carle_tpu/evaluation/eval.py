"""Challenge evaluation harness (reference evaluation/eval.py:17-98).

Protocol replicated: build the wrapper stack from ``[cls, reward_scale,
checkpoint]`` triples, set every wrapper's ``batch_size`` to
``steps * len(rules)`` so online updates never fire during scoring
(eval.py:45), put wrappers in eval mode (dropout off, no gradient work), run
the agent for ``steps`` per ruleset, score = mean reward per step.

The reference sets BOTH birth and survive from the birth list
(``survive = ruleset[0]``, eval.py:58-59).  That bug shaped the published
baseline scores, so it is the default here (``reference_compat=True``); pass
``reference_compat=False`` for the intended rules.

Checkpoints: reference ``.pt`` files load through the torch-state-dict
converters (mcl/rnd.py, mcl/ae.py); ``.npz`` files load the native
full-learner-state format (checkpoint.py).

Run:  python -m carle_tpu.evaluation.eval
"""

from __future__ import annotations

import os
from typing import Any, Callable, List, Optional, Sequence, Tuple

import numpy as np

from carle_tpu import CARLE
from carle_tpu.checkpoint import load_pytree
from carle_tpu.mcl import AE2D, PufferDetector, RND2D, SpeedDetector

from .submission import SubmissionAgent

DEFAULT_WRAPPERS = [
    [RND2D, 1.0, "/root/reference/evaluation/RND2D_mcl.pt"],
    [AE2D, 1.0, "/root/reference/evaluation/AE2D_mcl.pt"],
    [SpeedDetector, 1e-2, None],
    [PufferDetector, 1e-3, None],
]

# eval.py:89-94 — the last ruleset [[2],[0]] is the held-out outgroup
DEFAULT_RULES = [
    [[3, 6, 8], [2, 4, 5]],
    [[3], [2, 3]],
    [[3, 6, 7, 8], [3, 4, 6, 7, 8]],
    [[3], [0, 2, 3]],
    [[2], [0]],
]


def _load_wrapper_checkpoint(wrapper: Any, path: str) -> None:
    if path.endswith(".npz"):
        wrapper._wstate = load_pytree(path, wrapper._wstate)
    else:
        import torch

        wrapper.load_state_dict(
            torch.load(path, weights_only=True, map_location="cpu")
        )


def evaluate(
    Agent: Callable[..., Any],
    rules: Sequence[Sequence[Sequence[int]]],
    wrappers: Sequence[Sequence[Any]],
    params_path: Optional[str] = None,
    steps: int = 1024,
    reference_compat: bool = True,
    seed: int = 0,
    verbose: bool = True,
) -> Tuple[float, List[float]]:
    """Score an agent over the wrapper stack and ruleset battery.

    Returns (mean reward per step, per-step summed-reward trace) exactly as
    the reference does (eval.py:17-79).
    """
    agent = Agent(seed=seed)
    if params_path is not None:
        agent.load_state_dict(params_path)

    env: Any = CARLE()
    for spec in wrappers:
        cls, scale, ckpt = spec[0], spec[1], spec[2]
        env = cls(env, seed=seed)
        env.reward_scale = scale
        try:
            env.batch_size = steps * len(rules)  # freeze updates (eval.py:45)
        except AttributeError:
            pass  # statistic wrappers have no update cycle
        if ckpt is not None:
            _load_wrapper_checkpoint(env, ckpt)
        env.eval()

    score = 0.0
    total_steps = 0
    score_trace: List[float] = []
    for ruleset in rules:
        env.inner_env.birth = list(ruleset[0])
        if reference_compat:
            env.inner_env.survive = list(ruleset[0])  # eval.py:59 bug
        else:
            env.inner_env.survive = list(ruleset[1])

        obs = env.reset()
        for _ in range(steps):
            action = agent(obs)
            obs, reward, done, info = env.step(action)
            step_sum = float(np.asarray(reward).sum())
            score += step_sum
            score_trace.append(step_sum)
            total_steps += 1

        if verbose:
            print(
                "cumulative score = {:.3e} at total steps = {}, rulset = {}".format(
                    score, total_steps, ruleset
                )
            )

    score /= total_steps
    return score, score_trace


if __name__ == "__main__":
    score, trace = evaluate(
        SubmissionAgent, DEFAULT_RULES, DEFAULT_WRAPPERS, steps=1024
    )
    print("mean evaluation score is {:.3e}".format(score))
