"""Demo drivers mirroring the reference's __main__ blocks.

* :func:`prediction_demo` — reference mcl.py:895-959: CARLE -> PredictionBonus
  -> ParsimonyBonus, seed a glider, 1024 predictable steps then 512 random
  steps; the predictability reward rises then plummets.  Saves a reward curve
  plot and the final frame.
* :func:`wrapper_agent_demo` — reference agents.py:105-208: drive a wrapper
  (AE2D/RND2D) env with BOTH the pentadecathlon seed phase and a
  RandomAgent phase across rulesets, dumping reward curves + frames.

matplotlib is optional: without it the curves are saved as .npy only.

Run:  python -m carle_tpu.demos [outdir]
"""

from __future__ import annotations

import os
import sys
from typing import List

import numpy as np

from . import CARLE
from .agents import RandomAgent
from .mcl import AE2D, ParsimonyBonus, PredictionBonus, RND2D, get_glider
from .utils.png import write_png


def _save_curve(path_base: str, rewards: List[float], title: str) -> None:
    np.save(path_base + ".npy", np.asarray(rewards))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure()
        plt.plot(rewards, lw=2, label="rewards")
        plt.legend()
        plt.title(title)
        plt.xlabel("steps")
        plt.savefig(path_base + ".png")
        plt.close()
    except Exception:
        pass  # .npy already captured the data


def prediction_demo(
    outdir: str = "./frames",
    predictable_steps: int = 1024,
    random_steps: int = 512,
    seed: int = 0,
) -> float:
    os.makedirs(outdir, exist_ok=True)
    env: object = CARLE()
    env = PredictionBonus(env, seed=seed)
    env = ParsimonyBonus(env)
    env.inner_env.birth = [3]
    env.inner_env.survive = [2, 3]

    obs = env.reset()
    rng = np.random.RandomState(seed)
    action = get_glider()
    rewards: List[float] = []
    sum_reward = 0.0

    for _ in range(predictable_steps):
        obs, reward, done, info = env.step(action)
        r = float(np.asarray(reward).sum())
        rewards.append(r)
        sum_reward += r
        action = action * 0.0

    for _ in range(random_steps):
        action = (rng.rand(*np.shape(get_glider())) > 0.95).astype(np.float32)
        obs, reward, done, info = env.step(action)
        r = float(np.asarray(reward).sum())
        rewards.append(r)
        sum_reward += r

    print("reward sum ", sum_reward)
    _save_curve(
        os.path.join(outdir, "prediction_demo_rewards"),
        rewards,
        "PredictionBonus: glider then noise",
    )
    frame = np.asarray(obs).reshape(obs.shape[-2], obs.shape[-1])
    write_png(
        os.path.join(outdir, "prediction_demo_final.png"),
        (255 * frame).astype(np.uint8),
    )
    return sum_reward


def _pentadecathlon_action() -> np.ndarray:
    """The reference demo's seed action (agents.py:129-133): three 8-row
    columns with holes at rows 9 and 14 — pentadecathlon-style oscillators
    placed across the action window."""
    action = np.zeros((1, 1, 64, 64), dtype=np.float32)
    for ii in range(1, 30, 14):
        action[0, 0, 8:16, ii:ii + 3] = 1.0
        action[0, 0, 9, ii + 1] = 0.0
        action[0, 0, 14, ii + 1] = 0.0
    return action


def wrapper_agent_demo(
    outdir: str = "./frames", steps: int = 128, seed: int = 0
) -> None:
    os.makedirs(outdir, exist_ok=True)
    rulesets = {"life": ([3], [2, 3]), "mouse_maze": ([3, 7], [1, 2, 3, 4, 5])}
    for wrapper_cls, wrapper_name in ((AE2D, "AE2D"), (RND2D, "RND2D")):
        for name, (birth, survive) in rulesets.items():
            # leg 1 — the reference __main__'s pentadecathlon seed then
            # free-running dynamics (agents.py:125-141)
            env = wrapper_cls(CARLE(), batch_size=32, seed=seed)
            env.inner_env.birth = birth
            env.inner_env.survive = survive
            obs = env.reset()
            action = _pentadecathlon_action()
            rewards: List[float] = []
            for _ in range(steps):
                obs, reward, done, info = env.step(action)
                action = np.zeros_like(action)  # seed once, then hands off
                rewards.append(float(np.asarray(reward).sum()))
            base = os.path.join(
                outdir, f"pentadecathlon_{wrapper_name}_{name}"
            )
            _save_curve(base, rewards, f"{name} seeded, {wrapper_name} reward")
            frame = np.asarray(obs).reshape(obs.shape[-2], obs.shape[-1])
            write_png(base + "_final.png", (255 * frame).astype(np.uint8))

            # leg 2 — RandomAgent across the same rulesets (agents.py:147+)
            env = wrapper_cls(CARLE(), batch_size=32, seed=seed)
            env.inner_env.birth = birth
            env.inner_env.survive = survive
            agent = RandomAgent(seed=seed)

            obs = env.reset()
            rewards = []
            for _ in range(steps):
                obs, reward, done, info = env.step(agent(obs))
                rewards.append(float(np.asarray(reward).sum()))

            base = os.path.join(outdir, f"random_{wrapper_name}_{name}")
            _save_curve(base, rewards, f"{name} CA with {wrapper_name} reward")
            frame = np.asarray(obs).reshape(obs.shape[-2], obs.shape[-1])
            write_png(base + "_final.png", (255 * frame).astype(np.uint8))


def morpho_spaceship_demo(
    outdir: str = "./frames", steps: int = 64, seed: int = 0
) -> None:
    """MorphoBonus rewarding the reference's own shipped spaceship pattern
    (carle/spaceship_duck.rle — the morphology the reference *meant* to
    target before its glider-file paths broke, mcl.py:140-141): seed the
    duck in a Life universe and watch the morphology reward stay positive
    while it cruises."""
    from .mcl import MorphoBonus
    from .mcl.patterns import pattern_path

    os.makedirs(outdir, exist_ok=True)
    env = MorphoBonus(
        CARLE(), seed=seed,
        rle_paths=(pattern_path("spaceship_duck"),
                   pattern_path("spaceship_step")),
    )
    obs = env.reset()

    # drop the duck near the window centre via the action interface
    with open(pattern_path("spaceship_duck")) as f:
        duck = env.inner_env.rle_to_grid(f.read())
    action = np.zeros((1, 1, 64, 64), dtype=np.float32)
    action[0, 0, 20 : 20 + duck.shape[0], 20 : 20 + duck.shape[1]] = duck
    obs, reward, *_ = env.step(action)

    rewards: List[float] = []
    zeros = np.zeros_like(action)
    for _ in range(steps):
        obs, reward, done, info = env.step(zeros)
        rewards.append(float(np.asarray(reward).sum()))

    base = os.path.join(outdir, "morpho_spaceship")
    _save_curve(base, rewards, "MorphoBonus tracking the duck spaceship")
    frame = np.asarray(obs).reshape(obs.shape[-2], obs.shape[-1])
    write_png(base + "_final.png", (255 * frame).astype(np.uint8))


def episode_gif_demo(
    outdir: str = "./frames", steps: int = 256, seed: int = 0
) -> None:
    """Animated episode artifact from the FUSED path: a random agent in a
    Life universe, rendered to an animated GIF (agent toggles highlighted)
    by Rollout.run_gif — the creativity-artifact format the reference's
    per-step PNG dumps (env.py:504-513) approximate frame by frame."""
    import jax

    from . import rules
    from .agents import make_random_agent
    from .config import EnvConfig
    from .rollout import Rollout

    os.makedirs(outdir, exist_ok=True)
    cfg = EnvConfig(instances=4)
    ro = Rollout(cfg, wrappers=[], agent=make_random_agent())
    carry = ro.init(jax.random.PRNGKey(seed), rules.LIFE)
    carry, _ = ro.reset(carry)
    _, _, path = ro.run_gif(
        carry, num_steps=steps, chunk=min(steps, 128), every=2,
        path=os.path.join(outdir, "episode_random_life.gif"),
    )
    print(f"episode gif: {path}")


if __name__ == "__main__":
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()  # every CLI entry point does (CLAUDE.md)
    out = sys.argv[1] if len(sys.argv) > 1 else "./frames"
    prediction_demo(out, predictable_steps=256, random_steps=128)
    wrapper_agent_demo(out, steps=64)
    morpho_spaceship_demo(out, steps=64)
    episode_gif_demo(out, steps=256)
    print(f"demo artifacts in {out}")
