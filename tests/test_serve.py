"""Serving daemon tests: drive a live HTTP server (CPU, tiny shapes)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from carle_tpu.serve import make_server


@pytest.fixture(scope="module")
def server():
    srv = make_server(port=0)  # OS-assigned free port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, json.loads(r.read())


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    status, body = _get(server + "/health")
    assert status == 200 and body["ok"] is True
    assert "device" in body


def test_score_random_batched(server):
    status, body = _post(server + "/score",
                         {"agent": "random", "steps": 8})
    assert status == 200, body
    assert np.isfinite(body["score"])
    assert len(body["per_ruleset"]) == 5  # the published 5-ruleset battery
    assert body["latency_s"] > 0

    # second request reuses the compiled program (process rollout cache).
    # NOTE: no strict latency inequality — with the module-scoped server the
    # cache may already be warm from an earlier test, making cold-vs-warm
    # order-dependent; the cache behaviour itself is asserted in
    # tests/test_drivers.py via the rollout-cache hit counters.
    status2, body2 = _post(server + "/score",
                           {"agent": "random", "steps": 8, "seed": 1})
    assert status2 == 200
    assert body2["latency_s"] > 0
    assert body2["score"] != pytest.approx(body["score"])  # seed matters


def test_score_multi_seed(server):
    status, body = _post(
        server + "/score",
        {"agent": "random", "steps": 8, "seeds": [0, 1]},
    )
    assert status == 200, body
    assert len(body["per_seed"]) == 2
    assert body["score"] == pytest.approx(float(np.mean(body["per_seed"])))
    # per_ruleset is seed-AVERAGED: its mean must reproduce the multi-seed
    # score, not the last seed's battery
    assert len(body["per_ruleset"]) == 5
    assert float(np.mean(body["per_ruleset"])) == pytest.approx(
        body["score"], rel=1e-6
    )


def test_score_batched_replicas(server):
    # N independent battery copies inside one scan; per_ruleset is
    # replica-averaged and its mean still reproduces the score
    status, body = _post(
        server + "/score",
        {"agent": "random", "steps": 8, "replicas": 3},
    )
    assert status == 200, body
    assert len(body["per_ruleset"]) == 5
    assert float(np.mean(body["per_ruleset"])) == pytest.approx(
        body["score"], rel=1e-6
    )


def test_score_sequential_per_ruleset(server):
    # the non-batched path returns a per-STEP trace internally; the daemon
    # must still report the documented contract — 5 per-ruleset means whose
    # average is the score
    status, body = _post(
        server + "/score",
        {"agent": "random", "steps": 8, "batched": False},
    )
    assert status == 200, body
    assert len(body["per_ruleset"]) == 5
    assert float(np.mean(body["per_ruleset"])) == pytest.approx(
        body["score"], rel=1e-6
    )


def test_rollout_soup_and_rle(server):
    status, body = _post(
        server + "/rollout",
        {"rule": "B3/S23", "steps": 4, "size": 64, "seed": 0},
    )
    assert status == 200, body
    assert body["rule"] == "B3/S23"
    assert body["population"] > 0
    assert body["rle"].strip().endswith("!")

    # glider in an empty universe: population stays 5 forever
    glider = "x = 3, y = 3, rule = B3/S23\nbob$2bo$3o!"
    status, body = _post(
        server + "/rollout",
        {"rle": glider, "steps": 8, "size": 64},
    )
    assert status == 200, body
    assert body["population"] == 5


def test_error_handling(server):
    status, body = _post(server + "/score", {"agent": "nope"})
    assert status == 400 and "error" in body
    status, body = _post(server + "/bogus", {})
    assert status == 404


def test_gif_endpoint(server):
    """/gif returns a decodable GIF89a episode animation."""
    import base64

    status, body = _post(server + "/gif",
                         {"rule": "B3/S23", "size": 64, "steps": 8,
                          "every": 2, "seed": 5, "density": 0.3})
    assert status == 200, body
    data = base64.b64decode(body["gif_base64"])
    assert data.startswith(b"GIF89a") and data.endswith(b"\x3b")
    assert body["frames"] == 5  # initial + 8/2 captures
    assert body["generations"] == 8
    assert body["population"] >= 0


def test_gif_endpoint_from_rle(server):
    """Seeding /gif from an explicit RLE pattern works like /rollout."""
    import base64

    glider = "x = 3, y = 3, rule = B3/S23\nbob$2bo$3o!"
    status, body = _post(server + "/gif",
                         {"rle": glider, "size": 64, "steps": 4,
                          "every": 4})
    assert status == 200, body
    assert body["population"] == 5  # a glider stays a glider
    assert base64.b64decode(body["gif_base64"]).startswith(b"GIF89a")


def test_gif_endpoint_runs_remainder_steps(server):
    """steps not divisible by every: the remainder generations still run, so
    /gif ends at the same trajectory point /rollout would."""
    status, body = _post(server + "/gif",
                         {"rule": "B3/S23", "size": 64, "steps": 10,
                          "every": 4, "seed": 2, "density": 0.3})
    assert status == 200, body
    assert body["generations"] == 10
    assert body["frames"] == 4  # initial + 2 full strides + remainder
    status2, roll = _post(server + "/rollout",
                          {"rule": "B3/S23", "size": 64, "steps": 10,
                           "seed": 2, "density": 0.3})
    assert status2 == 200
    assert body["population"] == roll["population"]


def test_daemon_survives_junk_requests(server):
    """Robustness: malformed bodies, wrong types, junk rules, and oversized
    params on every endpoint must yield JSON errors (4xx), never kill the
    daemon — it is a resident process by design."""
    import random

    rng = random.Random(0)
    junk_bodies = [
        {},  # all defaults — must succeed or 400, not crash
        {"steps": "many"},
        {"rule": "Z9/Q!!", "steps": 1, "size": 32},
        {"rule": "B3/S23", "steps": -4, "size": 32},
        {"size": 0, "steps": 1},
        {"rle": "!!not rle at all$$", "steps": 1, "size": 32},
        {"seeds": "zero"},
        {"agent": {"nested": "dict"}},
        {"every": 0, "steps": 4, "size": 32},
        {"density": "high", "steps": 1, "size": 32},
        {"max_period": "many", "size": 32},
        {"census": True, "rle": "!!junk", "size": 32},
    ]
    endpoints = ["/score", "/rollout", "/gif", "/classify"]
    for i in range(24):
        ep = endpoints[i % 4]
        body = dict(rng.choice(junk_bodies))
        if ep == "/score":
            body.setdefault("steps", 2)
        try:
            status, resp = _post(server + ep, body)
        except Exception as exc:  # transport-level failure = daemon died
            raise AssertionError(f"{ep} {body} killed the daemon: {exc}")
        assert status in (200, 400), (ep, body, status, resp)
        assert isinstance(resp, dict)

    # the daemon is still alive and serving
    status, body = _get(server + "/health")
    assert status == 200 and body["ok"] is True


def test_classify_endpoint(server):
    glider = "x = 3, y = 3, rule = B3/S23\nbob$2bo$3o!"
    status, body = _post(server + "/classify",
                         {"rle": glider, "size": 48})
    assert status == 200, body
    assert body["kind"] == "spaceship"
    assert body["period"] == 4 and body["speed"] == 0.25


def test_classify_endpoint_census_mode(server):
    glider = "x = 3, y = 3, rule = B3/S23\nbob$2bo$3o!"
    status, body = _post(server + "/classify",
                         {"rle": glider, "size": 48, "census": True})
    assert status == 200, body
    assert body["counts"] == {"spaceship": 1}
    assert body["objects"][0]["speed"] == 0.25


def test_demo_page(server):
    """GET / serves the built-in browser demo driving /gif and /classify."""
    import urllib.request

    with urllib.request.urlopen(server + "/", timeout=60) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/html")
        html = r.read().decode()
    assert "carle_tpu" in html and "/gif" in html and "/classify" in html
