"""Smoke tests for the demo drivers (reference __main__ parity surface).

Tiny step counts — the point is that every demo runs end-to-end and leaves
its artifacts (.npy reward curves, PNG frames, GIF episodes) on disk.
"""

import os

import numpy as np

from carle_tpu import demos


def test_prediction_demo(tmp_path):
    total = demos.prediction_demo(
        str(tmp_path), predictable_steps=8, random_steps=4
    )
    assert np.isfinite(total)
    curve = np.load(str(tmp_path / "prediction_demo_rewards.npy"))
    assert curve.shape == (12,)
    assert os.path.exists(str(tmp_path / "prediction_demo_final.png"))


def test_wrapper_agent_demo(tmp_path):
    demos.wrapper_agent_demo(str(tmp_path), steps=3)
    for wrapper in ("AE2D", "RND2D"):
        for rules in ("life", "mouse_maze"):
            base = str(tmp_path / f"random_{wrapper}_{rules}")
            assert np.load(base + ".npy").shape == (3,)
            assert os.path.exists(base + "_final.png")


def test_morpho_spaceship_demo(tmp_path):
    demos.morpho_spaceship_demo(str(tmp_path), steps=4)
    base = str(tmp_path / "morpho_spaceship")
    curve = np.load(base + ".npy")
    assert curve.shape == (4,)
    # the duck is a genuine Life spaceship: the morphology reward tracking
    # it must be positive while it cruises
    assert np.all(curve > 0)
    assert os.path.exists(base + "_final.png")


def test_episode_gif_demo(tmp_path):
    demos.episode_gif_demo(str(tmp_path), steps=8)
    path = str(tmp_path / "episode_random_life.gif")
    with open(path, "rb") as f:
        header = f.read(6)
    assert header == b"GIF89a"
