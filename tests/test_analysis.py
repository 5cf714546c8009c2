"""Pattern analytics: exact period/displacement classification + curves."""

import numpy as np

from carle_tpu import rle, rules
from carle_tpu.analysis import Classification, classify_pattern, population_curve
from carle_tpu.mcl.patterns import pattern_path


def _place(pattern: np.ndarray, size: int = 48, at=(20, 20)) -> np.ndarray:
    g = np.zeros((size, size), dtype=np.uint8)
    g[at[0]:at[0] + pattern.shape[0], at[1]:at[1] + pattern.shape[1]] = pattern
    return g


def test_classify_block_still_life():
    c = classify_pattern(_place(np.ones((2, 2), np.uint8)), rules.LIFE)
    assert c.kind == "still-life" and c.period == 1
    assert c.displacement == (0, 0) and c.population == 4
    assert c.speed == 0.0


def test_classify_blinker_oscillator():
    c = classify_pattern(_place(np.ones((1, 3), np.uint8)), rules.LIFE)
    assert c.kind == "oscillator" and c.period == 2
    assert c.displacement == (0, 0)


def test_classify_glider_spaceship():
    glider = rle.read_rle(pattern_path("glider_1")).grid
    c = classify_pattern(_place(glider), rules.LIFE)
    assert c.kind == "spaceship" and c.period == 4
    assert sorted(abs(d) for d in c.displacement) == [1, 1]  # diagonal c/4
    assert c.speed == 0.25


def test_classify_lwss_speed():
    lwss = rle.read_rle(pattern_path("lwss")).grid
    c = classify_pattern(_place(lwss), rules.LIFE)
    assert c.kind == "spaceship" and c.period == 4
    assert sorted(abs(d) for d in c.displacement) == [0, 2]  # orthogonal c/2
    assert c.speed == 0.5


def test_classify_died_and_empty():
    c = classify_pattern(_place(np.ones((1, 1), np.uint8)), rules.LIFE)
    assert c.kind == "died" and c.population == 0
    assert classify_pattern(np.zeros((16, 16), np.uint8), rules.LIFE).kind == "died"


def test_classify_aperiodic_within_horizon():
    # an R-pentomino does not settle in 16 generations
    r = np.zeros((3, 3), np.uint8)
    r[0, 1:] = 1
    r[1, :2] = 1
    r[2, 1] = 1
    c = classify_pattern(_place(r, size=64, at=(30, 30)), rules.LIFE,
                         max_period=16)
    assert c.kind == "aperiodic" and c.period == 0


def test_classify_respects_rule():
    # the same 1x3 bar under B2/S0 (the eval battery's held-out "Live Free
    # or Die" outgroup, eval.py:94) evolves differently than under Life —
    # assert the classifier's output depends on the rule, not just the
    # pattern.
    bar = classify_pattern(_place(np.ones((1, 3), np.uint8)),
                           rules.pack_rule_bits([2], [0]))
    assert bar.kind in ("oscillator", "spaceship", "aperiodic", "died",
                        "still-life")
    life = classify_pattern(_place(np.ones((1, 3), np.uint8)), rules.LIFE)
    assert (bar.kind, bar.period, bar.population) != \
        (life.kind, life.period, life.population)


def test_population_curve_matches_classification():
    glider = rle.read_rle(pattern_path("glider_1")).grid
    curve = population_curve(_place(glider), rules.LIFE, 12)
    assert curve.shape == (12,)
    assert curve[3] == 5 and curve[7] == 5  # a glider is 5 cells at p=4
    # batch form
    batch = np.stack([_place(glider), np.zeros((48, 48), np.uint8)])
    curves = population_curve(batch, rules.LIFE, 4)
    assert curves.shape == (4, 2)
    assert curves[-1, 1] == 0


def test_episode_report_from_logged_env(tmp_path):
    """The report consumes the reference CSV episode format end to end."""
    import os

    from carle_tpu import CARLE

    env = CARLE(instances=1, height=48, width=48, action_height=16,
                action_width=16, logging=True)
    env.reset()
    a = np.zeros((1, 1, 16, 16), dtype=np.float32)
    a[0, 0, 4, 5] = 1
    a[0, 0, 5, 5:7] = 1
    a[0, 0, 6, 4] = 1
    a[0, 0, 6, 6] = 1
    env.step(a)  # glider placed (5 toggles)
    zeros = np.zeros_like(a)
    for _ in range(7):
        env.step(zeros)
    path = env.save_log(str(tmp_path))

    from carle_tpu.analysis import episode_report
    from carle_tpu import rules

    rep = episode_report(path, rules.LIFE)
    assert rep["steps"] == 8
    assert rep["total_toggles"] == 5
    assert rep["population"]["last"] == 5
    assert rep["final_pattern"]["kind"] == "spaceship"
    assert rep["final_pattern"]["speed"] == 0.25


def test_census_mixed_soup():
    """Block + blinker + glider placed far apart: three objects, each
    correctly classified in isolation."""
    from carle_tpu.analysis import census

    g = np.zeros((64, 64), dtype=np.uint8)
    g[4:6, 4:6] = 1                        # block
    g[20, 30:33] = 1                       # blinker
    glider = rle.read_rle(pattern_path("glider_1")).grid
    g[44:44 + glider.shape[0], 10:10 + glider.shape[1]] = glider

    rep = census(g, rules.LIFE)
    assert rep["counts"] == {"still-life": 1, "oscillator": 1, "spaceship": 1}
    kinds = {o["kind"]: o for o in rep["objects"]}
    assert kinds["spaceship"]["speed"] == 0.25
    assert kinds["oscillator"]["period"] == 2
    assert kinds["still-life"]["population"] == 4


def test_census_object_across_torus_seam():
    """A block wrapping the corner is ONE object and still a still life."""
    from carle_tpu.analysis import census, extract_objects

    g = np.zeros((32, 32), dtype=np.uint8)
    g[[0, 0, -1, -1], [0, -1, 0, -1]] = 1  # 2x2 block split across the seam
    objs = extract_objects(g)
    assert len(objs) == 1 and len(objs[0]) == 4
    rep = census(g, rules.LIFE)
    assert rep["counts"] == {"still-life": 1}


def test_analysis_cli(tmp_path):
    import json
    import subprocess
    import sys

    repo = __file__.rsplit("/tests/", 1)[0]
    out = subprocess.run(
        [sys.executable, "-m", "carle_tpu.analysis",
         "carle_tpu/patterns/glider_1.rle", "--platform", "cpu"],
        cwd=repo, capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["kind"] == "spaceship" and rep["speed"] == 0.25


def test_soup_search_script_quick():
    import json
    import subprocess
    import sys

    repo = __file__.rsplit("/tests/", 1)[0]
    out = subprocess.run(
        [sys.executable, "scripts/soup_search.py", "--quick",
         "--platform", "cpu"],
        cwd=repo, capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.splitlines()
             if l.startswith("{")]
    assert len(lines) == 9  # 8 soups + aggregate
    agg = lines[-1]["soup_search"]
    assert agg["soups"] == 8
    assert sum(agg["object_counts"].values()) > 0
