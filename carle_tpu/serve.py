"""Serving daemon: hold the compiled programs hot, score agents on demand.

The deployment story for the challenge harness (reference evaluation/eval.py)
is batch scoring of submitted agents.  Through the remote-compile tunnel a
fresh process pays ~50 s/program of compile round-trips; the fused battery
itself runs in ~0.4 s warm (`evaluate_fused_batched`) — so the economical
serving shape is ONE resident process that compiles once and answers many
scoring requests.  This module is that process: a dependency-free HTTP
daemon (stdlib ``http.server``) in front of the fused evaluation paths,
with the process-level rollout cache keeping every program warm across
requests.

Endpoints (JSON in/out):

  GET  /health          liveness + device + request counters
  POST /score           {"agent": "random"|"network"|"policy",
                         "params_path": str|null, "steps": int,
                         "seed": int, "seeds": [int, ...],
                         "batched": bool, "toggle_rate": float,
                         "replicas": int (batched only: N independent
                          battery copies inside ONE scan)}
                        -> {"score", "per_ruleset" (seed-averaged mean
                            reward/step per battery ruleset, both paths),
                            "per_seed" (multi-seed only), "latency_s"}
  POST /rollout         {"rule": "B3/S23", "steps": int, "size": int,
                         "seed": int, "density": float, "rle": str|null}
                        -> {"population", "generations", "rle", "latency_s"}
  POST /gif             same inputs as /rollout plus "every" (frame
                        stride), "fps", "scale"
                        -> {"gif_base64" (GIF89a episode animation),
                            "frames", "population", "latency_s"}
  POST /classify        same pattern inputs as /rollout plus "max_period"
                        (default 64)
                        -> {"kind" (still-life|oscillator|spaceship|died|
                            aperiodic), "period", "displacement", "speed"};
                        with "census": true instead -> {"objects": [per-
                        object classifications], "counts": {kind: n}}

Single-threaded by design: one TPU chip, one request at a time (queueing is
the correct backpressure — a second in-flight TPU program would wedge on
chip acquisition, see CLAUDE.md).

Run:  python -m carle_tpu.serve --port 8787 [--warmup] [--platform cpu]
Test: tests/test_serve.py drives a live server over HTTP on CPU.
"""

from __future__ import annotations

import functools
import json
import time
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Any, Dict, Optional, Tuple

import numpy as np


# The shipped policy's (Agent, params) pair, cached per params_path so
# repeated /score requests reuse one functional Agent instance — the
# rollout cache keys on it, keeping policy scoring on the warm path.
_POLICY_CACHE: Dict[Any, Tuple[Any, Any]] = {}


def _shipped_policy(params_path: Optional[str]) -> Tuple[Any, Any]:
    pair = _POLICY_CACHE.get(params_path)
    if pair is None:
        from .evaluation.eval import load_shipped_policy

        pair = load_shipped_policy(params_path)
        _POLICY_CACHE[params_path] = pair
    return pair


def _score(body: Dict[str, Any]) -> Dict[str, Any]:
    from .evaluation.eval import (
        DEFAULT_RULES,
        evaluate_fused,
        evaluate_fused_batched,
    )

    agent_kind = body.get("agent", "random")
    params_path = body.get("params_path")
    agent_params: Any = None
    if agent_kind == "random":
        agent: Any = None
    elif agent_kind == "network":
        from .agents import RandomNetworkAgent

        agent = RandomNetworkAgent
    elif agent_kind == "policy":
        agent, agent_params = _shipped_policy(params_path)
        params_path = None
    else:
        raise ValueError(f"unknown agent {agent_kind!r}; "
                         "one of random/network/policy")

    batched = bool(body.get("batched", True))
    fn = evaluate_fused_batched if batched else evaluate_fused
    seeds = body.get("seeds") or [int(body.get("seed", 0))]
    kwargs = dict(
        Agent=agent,
        params_path=params_path,
        agent_params=agent_params,
        steps=int(body.get("steps", 1024)),
        toggle_rate=float(body.get("toggle_rate", 0.1)),
        reference_compat=bool(body.get("reference_compat", True)),
        verbose=False,
    )
    if batched:
        # N independent battery copies as extra instances of the SAME scan
        # (error bars without a seeds loop)
        kwargs["replicas"] = int(body.get("replicas", 1))
    t0 = time.perf_counter()
    scores, per_rules = [], []
    for s in seeds:
        score, per_rule = fn(seed=int(s), **kwargs)
        scores.append(float(score))
        per_rules.append(np.asarray(per_rule, dtype=np.float64).ravel())
    out: Dict[str, Any] = {
        "score": float(np.mean(scores)),
        "agent": agent_kind,
        "steps": kwargs["steps"],
        "batched": batched,
        "latency_s": round(time.perf_counter() - t0, 4),
    }
    if len(seeds) > 1:
        out["per_seed"] = scores
    if per_rules:
        pr = np.mean(per_rules, axis=0)  # seed-averaged
        if not batched:
            # the sequential path returns a per-STEP reward trace
            # [len(rules)*steps]; reduce to per-ruleset mean reward/step so
            # both paths report the same contract
            pr = pr.reshape(len(DEFAULT_RULES), -1).mean(axis=1)
        out["per_ruleset"] = [float(x) for x in pr]
    return out


@functools.lru_cache(maxsize=1)
def _packed_engine():
    """steps-as-DATA packed multi-step: one compiled program serves every
    request regardless of its ``steps`` value.  On TPU that is the Pallas
    kernel (scalar-prefetched step count, the measured ~2e12 cells/s
    engine); elsewhere a jitted XLA scan keyed on the static step count
    (jax.jit caches per distinct value, so repeats stay warm)."""
    from .ops.ca import is_tpu_platform

    if is_tpu_platform():
        from .ops.pallas_bitpack import bit_multi_step_pallas

        return bit_multi_step_pallas
    import jax

    from .ops.bitpack import bit_multi_step

    return jax.jit(bit_multi_step, static_argnums=2)


def _initial_grid(body: Dict[str, Any]):
    """Shared /rollout + /gif setup: (grid [1,H,W], rule bits, birth,
    survive) from a request body (explicit RLE or Bernoulli soup)."""
    import jax
    import jax.numpy as jnp

    from . import rules as rules_mod
    from .rle import parse_rle_text

    size = int(body.get("size", 256))
    rule = body.get("rule", "B3/S23")
    birth, survive = rules_mod.parse_rulestring(rule)
    bits = rules_mod.pack_rule_bits(birth, survive)

    if body.get("rle"):
        grid_np = parse_rle_text(body["rle"]).grid
        h = max(size, grid_np.shape[0])
        w = -(-max(size, grid_np.shape[1]) // 32) * 32  # packed W % 32 == 0
        full = np.zeros((h, w), dtype=np.uint8)
        r0 = (h - grid_np.shape[0]) // 2
        c0 = (w - grid_np.shape[1]) // 2
        full[r0:r0 + grid_np.shape[0], c0:c0 + grid_np.shape[1]] = grid_np
        grid = jnp.asarray(full[None])
    else:
        key = jax.random.PRNGKey(int(body.get("seed", 0)))
        # pad width to a word multiple like the RLE branch — the packed
        # engine asserts W % 32 == 0 and an arbitrary form-typed size
        # would otherwise 400
        w = -(-size // 32) * 32
        grid = jnp.zeros((1, size, w), dtype=jnp.uint8)
        soup = jax.random.bernoulli(
            key, float(body.get("density", 0.3)), (1, size, size)
        ).astype(jnp.uint8)
        grid = grid.at[:, :, (w - size) // 2:(w - size) // 2 + size].set(soup)
    return grid, bits, birth, survive


def _rollout(body: Dict[str, Any]) -> Dict[str, Any]:
    import jax.numpy as jnp

    from . import rules as rules_mod
    from .ops.bitpack import pack_grid, unpack_grid
    from .rle import encode_grid

    steps = int(body.get("steps", 256))
    grid, bits, birth, survive = _initial_grid(body)

    t0 = time.perf_counter()
    packed = pack_grid(grid)
    out = _packed_engine()(packed, jnp.asarray(bits), steps)
    final = np.asarray(unpack_grid(out, grid.shape[2]))[0]
    latency = time.perf_counter() - t0
    resp = {
        "rule": rules_mod.rulestring(birth, survive),
        "generations": steps,
        "population": int(final.sum()),
        "latency_s": round(latency, 4),
    }
    if body.get("return_rle", True):
        resp["rle"] = encode_grid(final, birth, survive)
    return resp


def _gif(body: Dict[str, Any]) -> Dict[str, Any]:
    """Episode animation on demand: run a packed rollout, capture a frame
    every ``every`` generations, return the GIF89a bytes base64-encoded
    (the native LZW path when built).

    Body: rule/size/seed/density/rle as /rollout, plus steps (default 256),
    every (frame stride, default 4), fps, scale.
    """
    import base64

    import jax.numpy as jnp

    from . import rules as rules_mod
    from .ops.bitpack import pack_grid, unpack_grid
    from .utils.gif import encode_gif

    steps = int(body.get("steps", 256))
    every = max(1, int(body.get("every", 4)))
    grid, bits, _, _ = _initial_grid(body)

    t0 = time.perf_counter()
    engine = _packed_engine()
    packed = pack_grid(grid)
    frames = [np.asarray(unpack_grid(packed, grid.shape[2]))[0]]
    for _ in range(steps // every):
        packed = engine(packed, jnp.asarray(bits), every)
        frames.append(np.asarray(unpack_grid(packed, grid.shape[2]))[0])
    if steps % every:  # run the remainder so /gif ends where /rollout would
        packed = engine(packed, jnp.asarray(bits), steps % every)
        frames.append(np.asarray(unpack_grid(packed, grid.shape[2]))[0])
    data = encode_gif(
        np.stack(frames),
        fps=float(body.get("fps", 20.0)),
        scale=int(body.get("scale", 1)),
    )
    latency = time.perf_counter() - t0
    return {
        "rule": rules_mod.rulestring(*rules_mod.unpack_rule_bits(int(bits))),
        "generations": steps,
        "frames": len(frames),
        "population": int(frames[-1].sum()),
        "gif_base64": base64.b64encode(data).decode("ascii"),
        "latency_s": round(latency, 4),
    }


def _classify(body: Dict[str, Any]) -> Dict[str, Any]:
    """Pattern analytics: exact (period, displacement) classification of a
    pattern (same rule/size/seed/density/rle inputs as /rollout; optional
    max_period, default 64)."""
    from .analysis import census, classify_pattern

    grid, bits, _, _ = _initial_grid(body)
    t0 = time.perf_counter()
    if body.get("census"):
        rep = census(np.asarray(grid)[0], int(bits),
                     max_period=int(body.get("max_period", 64)))
        rep["latency_s"] = round(time.perf_counter() - t0, 4)
        return rep
    c = classify_pattern(np.asarray(grid)[0], int(bits),
                         max_period=int(body.get("max_period", 64)))
    return {
        "kind": c.kind,
        "period": c.period,
        "displacement": list(c.displacement),
        "population": c.population,
        "speed": c.speed,
        "latency_s": round(time.perf_counter() - t0, 4),
    }


# Minimal browser demo served at GET /: drives the JSON endpoints from a
# form — evolve a soup (or pasted RLE) to an animation, census the ash.
_DEMO_PAGE = """<!doctype html><html><head><meta charset="utf-8">
<title>carle_tpu</title><style>
body{font-family:monospace;background:#0a0a0e;color:#48dc82;margin:2em}
input,textarea,button{background:#14141c;color:#48dc82;border:1px solid #2a4;
padding:4px;font-family:monospace}img{image-rendering:pixelated;border:1px
solid #2a4;margin-top:1em}pre{color:#9ad}</style></head><body>
<h2>carle_tpu</h2>
<form onsubmit="go(event)">
rule <input id=rule value="B3/S23" size=10>
size <input id=size value=128 size=4>
steps <input id=steps value=256 size=5>
density <input id=density value=0.3 size=4>
seed <input id=seed value=0 size=4>
<button>evolve</button></form>
<p>or paste RLE:</p><textarea id=rle rows=4 cols=60></textarea>
<div id=out></div>
<script>
async function go(e){e.preventDefault();
const body={rule:rule.value,size:+size.value,steps:+steps.value,
density:+density.value,seed:+seed.value,every:4,scale:2};
if(rle.value.trim())body.rle=rle.value;
out.innerHTML="evolving...";
const g=await(await fetch("/gif",{method:"POST",
body:JSON.stringify(body)})).json();
const c=await(await fetch("/classify",{method:"POST",
body:JSON.stringify({...body,census:true})})).json();
out.innerHTML='<img src="data:image/gif;base64,'+g.gif_base64+'">'+
'<pre>population '+g.population+' after '+g.generations+
' generations\\ncensus: '+JSON.stringify(c.counts)+'</pre>';}
</script></body></html>"""


class _Handler(BaseHTTPRequestHandler):
    server_version = "carle_tpu_serve/1.0"
    stats = {"requests": 0, "errors": 0, "started": time.time()}

    def log_message(self, fmt, *args):  # quiet by default
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)

    def _reply(self, code: int, payload: Dict[str, Any]) -> None:
        data = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            data = _DEMO_PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
            return
        if self.path != "/health":
            return self._reply(404, {"error": "unknown path"})
        import jax

        self._reply(200, {
            "ok": True,
            "device": str(jax.devices()[0]),
            "requests": self.stats["requests"],
            "errors": self.stats["errors"],
            "uptime_s": round(time.time() - self.stats["started"], 1),
        })

    def do_POST(self):
        routes = {"/score": _score, "/rollout": _rollout, "/gif": _gif,
                  "/classify": _classify}
        handler = routes.get(self.path)
        if handler is None:
            return self._reply(404, {"error": "unknown path"})
        try:
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            self.stats["requests"] += 1
            self._reply(200, handler(body))
        except Exception as exc:  # serve errors as JSON, keep the daemon up
            self.stats["errors"] += 1
            self._reply(400, {"error": f"{type(exc).__name__}: {exc}"})


def make_server(host: str = "127.0.0.1", port: int = 8787,
                verbose: bool = False) -> HTTPServer:
    srv = HTTPServer((host, port), _Handler)
    srv.verbose = verbose
    return srv


def main() -> None:
    import argparse

    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8787)
    parser.add_argument("--warmup", action="store_true",
                        help="compile + run the batched battery once before "
                             "accepting requests (first /score is then warm)")
    parser.add_argument("--platform", default=None,
                        help="override the JAX platform (e.g. cpu); the "
                             "axon plugin ignores JAX_PLATFORMS")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.warmup:
        t0 = time.time()
        _score({"agent": "random", "steps": 16})
        print(json.dumps({"warmup_s": round(time.time() - t0, 1)}),
              flush=True)

    srv = make_server(args.host, args.port, args.verbose)
    print(json.dumps({"serving": f"http://{args.host}:{args.port}",
                      "device": str(jax.devices()[0])}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
