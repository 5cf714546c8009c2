"""One-command hardware revalidation of this repo's measured TPU claims.

Runs the headline checklist SEQUENTIALLY — only one process may own the
tunneled chip at a time (CLAUDE.md) — each job as its own subprocess so a
kernel fault cannot take down the rest of the sweep.  No per-job timeout
by default: first compiles through the remote-compile tunnel take minutes
and killing mid-compile caches nothing; pass --timeout only on a box with
a local compiler.

Checklist (scaled by --quick for smoke vs full-size for measurement):
  1. bench.py static vc / vc2    — the single-chain + two-stream headlines
  2. bench.py data vc / vd / vd2 — rules-as-data folds + two-stream variant
  3. bench.py per-instance rules — mixed-rule batch engine
  4. eval battery (batched)      — 5x1024 challenge protocol in one scan
  5. train_mcl --fused-head      — fully-fused wrapper-net training step

Writes one JSON line per job (cmd, rc, seconds, parsed JSON tail lines) to
--out (default assets/hw_smoke.jsonl) and prints a PASS/FAIL summary.

    python scripts/hw_smoke.py                 # full-size measurement
    python scripts/hw_smoke.py --quick         # small shapes, CPU-friendly
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _jobs(quick: bool):
    if quick:
        bench_common = ["--instances", "64", "--size", "64",
                        "--steps-per-launch", "16", "--launches", "2"]
        eval_steps, train = ["--steps", "16"], ["--instances", "4",
                                               "--epochs", "1",
                                               "--steps-per-rule", "8",
                                               "--size", "64"]
    else:
        bench_common = []
        eval_steps, train = ["--steps", "1024"], ["--instances", "32",
                                                  "--epochs", "1",
                                                  "--steps-per-rule", "256"]
    py = [sys.executable]
    return [
        ("bench-static-vc", py + ["bench.py",
                                  "--backend", "bitpack-pallas-static",
                                  "--scheme", "vc"] + bench_common),
        ("bench-data-vc", py + ["bench.py", "--backend", "bitpack-pallas",
                                "--scheme", "vc"] + bench_common),
        ("bench-data-vd", py + ["bench.py", "--backend", "bitpack-pallas",
                                "--scheme", "vd"] + bench_common),
        ("bench-data-vd2", py + ["bench.py", "--backend", "bitpack-pallas",
                                 "--scheme", "vd2"] + bench_common),
        ("bench-static-vc2", py + ["bench.py",
                                   "--backend", "bitpack-pallas-static",
                                   "--scheme", "vc2"] + bench_common),
        ("bench-static-vc16", py + ["bench.py",
                                    "--backend", "bitpack-pallas-static",
                                    "--scheme", "vc16"] + bench_common),
        ("bench-data-vd8", py + ["bench.py", "--backend", "bitpack-pallas",
                                 "--scheme", "vd8"] + bench_common),
        ("bench-per-instance-rules", py + ["bench.py",
                                           "--backend", "bitpack-pallas",
                                           "--per-instance-rules"]
         + bench_common),
        ("eval-battery-batched", py + ["-m", "carle_tpu.evaluation.eval",
                                       "--batched"] + eval_steps),
        ("train-fused-head", py + ["-m", "carle_tpu.train_mcl",
                                   "--fused-head", "--rng-impl", "rbg",
                                   "--log-dir", "logs/hw_smoke"] + train),
    ]


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="tiny shapes (functional smoke, runs on CPU)")
    parser.add_argument("--pod", action="store_true",
                        help="append the pod-slice jobs (RDMA halo smoke, "
                             "ICI scaling, packed spatial env at 8k² — "
                             "scripts/pod_smoke.py); each no-ops gracefully "
                             "on a single device")
    parser.add_argument("--platform", default=None,
                        help="forwarded to every job (e.g. cpu — needed for "
                             "CPU runs on the axon box, where the "
                             "JAX_PLATFORMS env var is overridden)")
    parser.add_argument("--only", default=None,
                        help="comma-separated job-name substrings to run")
    parser.add_argument("--timeout", type=float, default=None,
                        help="per-job timeout seconds (NOT recommended on "
                             "the tunneled TPU: kills mid-compile)")
    parser.add_argument("--out", default=os.path.join("assets",
                                                      "hw_smoke.jsonl"))
    args = parser.parse_args()

    jobs = _jobs(args.quick)
    if args.pod:
        extra = ["--quick"] if args.quick else []
        jobs += [
            (f"pod-{j}", [sys.executable, "scripts/pod_smoke.py", j] + extra)
            for j in ("scaling", "rdma", "spatial8k")
        ]
    if args.platform:
        jobs = [(name, cmd + ["--platform", args.platform])
                for name, cmd in jobs]
    if args.only:
        keys = [k.strip() for k in args.only.split(",") if k.strip()]
        jobs = [j for j in jobs if any(k in j[0] for k in keys)]

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    failures = []
    with open(args.out, "a") as log:
        for name, cmd in jobs:
            t0 = time.time()
            try:
                proc = subprocess.run(
                    cmd, cwd=REPO, capture_output=True, text=True,
                    timeout=args.timeout,
                )
                rc, out = proc.returncode, proc.stdout
                tail_err = proc.stderr.strip().splitlines()[-3:]
            except subprocess.TimeoutExpired:
                rc, out, tail_err = -9, "", ["TIMEOUT"]
            parsed = []
            for line in out.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    try:
                        parsed.append(json.loads(line))
                    except ValueError:
                        pass
            rec = {"job": name, "cmd": " ".join(cmd), "rc": rc,
                   "seconds": round(time.time() - t0, 1), "json": parsed,
                   "stderr_tail": tail_err if rc != 0 else []}
            log.write(json.dumps(rec) + "\n")
            log.flush()
            status = "PASS" if rc == 0 else "FAIL"
            print(f"[{status}] {name} rc={rc} {rec['seconds']}s "
                  f"{parsed[-1] if parsed else ''}", flush=True)
            if rc != 0:
                failures.append(name)
    print(json.dumps({"hw_smoke": "done", "failed": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
