"""Soup search: evolve random soups on the packed engine, census the ash.

The classic open-ended-CA experiment (and the spirit of Carle's Game):
start from random noise, let the rule run, and catalogue what survives.
The fused bit-packed engine evolves the whole soup batch as one program
(2e12 cell-updates/s on a v5e chip), then the analysis layer censuses each
final universe — object counts by kind, ash density, and any "notable"
objects (spaceships, or oscillators with period > 2).

    python scripts/soup_search.py --soups 64 --size 256 --steps 1024
    python scripts/soup_search.py --rule B36/S245 --density 0.1
    python scripts/soup_search.py --quick --platform cpu   # smoke

One JSON line per soup (counts + notables) and a final aggregate line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from carle_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--soups", type=int, default=64)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--steps", type=int, default=1024)
    parser.add_argument("--rule", default="B3/S23")
    parser.add_argument("--density", type=float, default=0.3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-period", type=int, default=16,
                        help="census search horizon per object")
    parser.add_argument("--quick", action="store_true",
                        help="tiny smoke config (8 soups, 64^2, 64 steps)")
    parser.add_argument("--platform", default=None,
                        help="override the JAX platform (e.g. cpu)")
    args = parser.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.quick:
        args.soups, args.size, args.steps = 8, 64, 64

    import jax.numpy as jnp
    import numpy as np

    from carle_tpu import rules as rules_mod
    from carle_tpu.analysis import census
    from carle_tpu.ops.bitpack import pack_grid, unpack_grid
    from carle_tpu.serve import _packed_engine
    from carle_tpu.utils.sync import device_sync as _sync

    birth, survive = rules_mod.parse_rulestring(args.rule)
    bits = rules_mod.pack_rule_bits(birth, survive)

    grids = jax.random.bernoulli(
        jax.random.PRNGKey(args.seed), args.density,
        (args.soups, args.size, args.size),
    ).astype(jnp.uint8)
    packed = pack_grid(grids)

    # the serving daemon's engine dispatch: Pallas steps-as-data on TPU,
    # jitted XLA scan elsewhere — one compiled program either way
    out = _packed_engine()(packed, jnp.asarray(bits), args.steps)
    _sync(out)
    finals = np.asarray(unpack_grid(out, args.size))

    area = args.size * args.size
    totals: dict = {}
    notable_total = 0
    for i, final in enumerate(finals):
        rep = census(final, bits, max_period=args.max_period)
        notables = [
            o for o in rep["objects"]
            if o["kind"] == "spaceship"
            or (o["kind"] == "oscillator" and o["period"] > 2)
        ]
        notable_total += len(notables)
        for k, n in rep["counts"].items():
            totals[k] = totals.get(k, 0) + n
        print(json.dumps({
            "soup": i,
            "ash_density": round(float(final.sum()) / area, 5),
            "counts": rep["counts"],
            "notable": notables[:8],
        }), flush=True)

    print(json.dumps({
        "soup_search": {
            "rule": rules_mod.rulestring(birth, survive),
            "soups": args.soups, "size": args.size, "steps": args.steps,
            "object_counts": totals,
            "notable_objects": notable_total,
        }
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
