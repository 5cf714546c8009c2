"""Pattern analytics: period/displacement classification + population curves.

The open-ended challenge this framework serves ("Carle's Game") scores
machine *creativity* — agents are rewarded for building moving or growing
structures (SpeedDetector/PufferDetector, mcl.py:730-853, are crude online
proxies for exactly this).  The reference ships no way to actually ANALYZE
what an agent built.  This module does, offline:

* :func:`classify_pattern` — detect the exact (period, displacement) of a
  pattern evolving in an empty universe, labelling it ``still-life``
  (p=1, d=0), ``oscillator`` (p>1, d=0), ``spaceship`` (d != 0), ``died``,
  or ``aperiodic`` within the search horizon.  A glider classifies as a
  period-4 (1,1)-spaceship; a blinker as a period-2 oscillator.
* :func:`population_curve` — per-generation live-cell counts as ONE jitted
  ``lax.scan`` (dispatch-economical through the axon tunnel), the raw
  series behind puffer/growth detection.

Displacement search uses FFT cross-correlation (one O(HW log HW) pass on
the padded torus) followed by an exact equality check, so a match is never
heuristic.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.ca import ca_step_grid


class Classification(NamedTuple):
    kind: str                 # still-life | oscillator | spaceship | died | aperiodic
    period: int               # 0 for died/aperiodic
    displacement: tuple       # (dy, dx) torus shift per period, (0, 0) unless spaceship
    population: int           # live cells at detection (0 when died)

    @property
    def speed(self) -> float:
        """Chebyshev speed in cells/generation (gliders: 0.25 = c/4)."""
        if self.period == 0:
            return 0.0
        return max(abs(self.displacement[0]), abs(self.displacement[1])) / self.period


@jax.jit
def _step(grid: jax.Array, rule_bits: jax.Array) -> jax.Array:
    return ca_step_grid(grid, rule_bits)


def _find_shift(a: np.ndarray, b: np.ndarray,
                fa: Optional[np.ndarray] = None) -> Optional[tuple]:
    """The torus shift (dy, dx) with roll(a, (dy, dx)) == b, or None.

    FFT cross-correlation proposes the single best-aligned offset; an exact
    comparison accepts or rejects it — correlation alone can tie for
    symmetric patterns, so every candidate peak is verified.  ``fa`` lets
    callers precompute ``rfft2(a)`` once across repeated probes."""
    if fa is None:
        fa = np.fft.rfft2(a.astype(np.float32))
    fb = np.fft.rfft2(b.astype(np.float32))
    corr = np.fft.irfft2(np.conj(fa) * fb, s=a.shape)
    # all offsets sharing the peak (floating-point ties within 1e-3)
    peak = corr.max()
    for dy, dx in zip(*np.nonzero(corr >= peak - 1e-3)):
        if np.array_equal(np.roll(a, (dy, dx), axis=(0, 1)), b):
            return int(dy), int(dx)
    return None


def _signed(d: int, n: int) -> int:
    """Map a torus offset to the signed shift of smallest magnitude."""
    return d - n if d > n // 2 else d


def classify_pattern(
    grid,
    rule_bits,
    max_period: int = 64,
) -> Classification:
    """Classify a pattern's long-run behaviour in an empty universe.

    ``grid`` is a single [H, W] 0/1 array (place the pattern well clear of
    the torus seam if displacement signs matter); ``rule_bits`` an 18-bit
    rule bitmask or anything :func:`carle_tpu.rules.pack_rule_bits`
    produced.  Searches generations 1..``max_period`` for the first exact
    recurrence of the initial pattern up to translation.
    """
    g0 = np.asarray(jax.device_get(grid)).astype(np.uint8)
    if g0.ndim != 2:
        raise ValueError(f"classify_pattern wants one [H, W] grid, got {g0.shape}")
    pop0 = int(g0.sum())
    if pop0 == 0:
        return Classification("died", 0, (0, 0), 0)

    bits = jnp.asarray(rule_bits, dtype=jnp.int32)
    g = jnp.asarray(g0[None])
    h, w = g0.shape
    fa = np.fft.rfft2(g0.astype(np.float32))  # shared across period probes
    for p in range(1, max_period + 1):
        g = _step(g, bits)
        gp = np.asarray(g[0])
        pop = int(gp.sum())
        if pop == 0:
            return Classification("died", 0, (0, 0), 0)
        if pop != pop0:
            continue  # cannot be a translation of g0
        shift = _find_shift(g0, gp, fa=fa)
        if shift is None:
            continue
        dy, dx = _signed(shift[0], h), _signed(shift[1], w)
        if (dy, dx) == (0, 0):
            kind = "still-life" if p == 1 else "oscillator"
        else:
            kind = "spaceship"
        return Classification(kind, p, (dy, dx), pop0)
    return Classification("aperiodic", 0, (0, 0), int(np.asarray(g[0]).sum()))


@functools.partial(jax.jit, static_argnames=("num_steps",))
def _pop_scan(g: jax.Array, rb: jax.Array, num_steps: int) -> jax.Array:
    def body(g, _):
        g = ca_step_grid(g, rb)
        return g, jnp.sum(g, axis=(1, 2), dtype=jnp.int32)

    _, pops = jax.lax.scan(body, g, length=num_steps)
    return pops  # [steps, inst]


def population_curve(grid, rule_bits, num_steps: int) -> np.ndarray:
    """Per-generation live-cell counts [num_steps] (generation 1..N) for a
    batch [inst, H, W] or single [H, W] grid — one jitted scan (module-level
    jit instance: repeated curves reuse the compiled program), so a
    16k-step curve is a single device dispatch."""
    arr = jnp.asarray(grid, dtype=jnp.uint8)
    single = arr.ndim == 2
    if single:
        arr = arr[None]
    pops = np.asarray(
        _pop_scan(arr, jnp.asarray(rule_bits, dtype=jnp.int32), num_steps)
    )
    return pops[:, 0] if single else pops


def episode_report(log_path: str, rule_bits=None, max_period: int = 32) -> dict:
    """Creativity report for a logged episode (the reference CSV format of
    (action_rle, universe_rle) pairs — CARLE.save_log / Rollout.run_logged).

    Returns step count, action budget (total/mean toggles — the quantity
    ParsimonyBonus taxes), the population curve with a least-squares growth
    slope (the quantity PufferDetector thresholds), and — when
    ``rule_bits`` is given — the exact classification of the final
    universe's evolution."""
    from .rle import parse_rle_text, read_log

    pairs = read_log(log_path)
    if not pairs:
        return {"steps": 0}
    toggles, pops = [], []
    final = None
    for action_rle, universe_rle in pairs:
        toggles.append(int(parse_rle_text(action_rle).grid.sum()))
        final = parse_rle_text(universe_rle).grid
        pops.append(int(final.sum()))
    steps = len(pairs)
    slope = (
        float(np.polyfit(np.arange(steps), np.asarray(pops, np.float64), 1)[0])
        if steps >= 2 else 0.0
    )
    report = {
        "steps": steps,
        "total_toggles": int(np.sum(toggles)),
        "mean_toggles_per_step": float(np.mean(toggles)),
        "population": {
            "first": pops[0], "last": pops[-1],
            "mean": float(np.mean(pops)), "max": int(np.max(pops)),
            "growth_slope": slope,  # cells/step; PufferDetector fires > 0.01
        },
    }
    if rule_bits is not None and final is not None:
        c = classify_pattern(final, rule_bits, max_period=max_period)
        report["final_pattern"] = {
            "kind": c.kind, "period": c.period,
            "displacement": list(c.displacement), "speed": c.speed,
        }
    return report


def extract_objects(grid) -> list:
    """8-connected components of a 0/1 grid, torus-aware (an object
    crossing the wraparound seam is ONE object).  Returns a list of
    [n_cells, 2] arrays of (row, col) coordinates UNWRAPPED relative to
    each object's bounding box (origin at its top-left), so seam-crossing
    objects come out contiguous."""
    g = np.asarray(grid) != 0
    if g.ndim != 2:
        raise ValueError(f"extract_objects wants one [H, W] grid, got {g.shape}")
    h, w = g.shape
    seen = np.zeros_like(g, dtype=bool)
    objects = []
    for r, c in zip(*np.nonzero(g)):
        if seen[r, c]:
            continue
        seen[r, c] = True
        stack = [(r, c, 0, 0)]  # (torus row/col, unwrapped row/col)
        cells = []
        while stack:
            y, x, uy, ux = stack.pop()
            cells.append((uy, ux))
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    ny, nx = (y + dy) % h, (x + dx) % w
                    if g[ny, nx] and not seen[ny, nx]:
                        seen[ny, nx] = True
                        stack.append((ny, nx, uy + dy, ux + dx))
        arr = np.asarray(cells, dtype=np.int64)
        arr -= arr.min(axis=0)  # origin at the bounding-box corner
        objects.append(arr)
    return objects


def _canonical_box(n: int) -> int:
    """Round a box extent up to a power of two (>= 16): classification
    boxes get data-dependent bounding-box shapes, and every distinct shape
    jit-compiles a fresh step program — minutes each through the tunneled
    TPU's remote compiler.  A canonical size set bounds the compile count
    and lets every same-bucket object reuse one program."""
    size = 16
    while size < n:
        size *= 2
    return size


def census(grid, rule_bits, max_period: int = 32, pad: int = 8) -> dict:
    """Object census of a universe: extract every 8-connected object and
    classify each IN ISOLATION (standard soup-census methodology — nearby
    objects that would interact are still reported individually).

    Returns {"objects": [{kind, period, displacement, speed, population}],
    "counts": {kind: n}} sorted largest-object first."""
    objs = extract_objects(grid)
    results = []
    for cells in objs:
        hh, ww = cells.max(axis=0) + 1 if len(cells) else (0, 0)
        box = np.zeros((_canonical_box(int(hh) + 2 * pad),
                        _canonical_box(int(ww) + 2 * pad)), dtype=np.uint8)
        box[cells[:, 0] + pad, cells[:, 1] + pad] = 1
        c = classify_pattern(box, rule_bits, max_period=max_period)
        results.append({
            "kind": c.kind, "period": c.period,
            "displacement": list(c.displacement), "speed": c.speed,
            "population": int(len(cells)),
        })
    results.sort(key=lambda o: -o["population"])
    counts: dict = {}
    for o in results:
        counts[o["kind"]] = counts.get(o["kind"], 0) + 1
    return {"objects": results, "counts": counts}


def _main() -> int:
    """CLI: classify a pattern file, census a universe, or report an episode.

        python -m carle_tpu.analysis pattern.rle [--rule B3/S23]
        python -m carle_tpu.analysis universe.rle --census
        python -m carle_tpu.analysis episode_log.csv --report
    """
    import argparse
    import json

    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()  # every CLI entry point does (CLAUDE.md)

    from . import rules as rules_mod
    from .rle import read_rle

    parser = argparse.ArgumentParser(description=_main.__doc__)
    parser.add_argument("path", help=".rle pattern/universe or episode CSV")
    parser.add_argument("--rule", default=None,
                        help="B/S rulestring (default: the file's header "
                             "rule, or B3/S23)")
    parser.add_argument("--census", action="store_true",
                        help="per-object census instead of whole-pattern "
                             "classification")
    parser.add_argument("--report", action="store_true",
                        help="treat path as an episode-log CSV")
    parser.add_argument("--max-period", type=int, default=64)
    parser.add_argument("--platform", default=None,
                        help="override the JAX platform (e.g. cpu)")
    args = parser.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.report:
        bits = (rules_mod.pack_rule_bits(*rules_mod.parse_rulestring(args.rule))
                if args.rule else rules_mod.LIFE)
        print(json.dumps(episode_report(args.path, bits,
                                        max_period=args.max_period)))
        return 0

    pat = read_rle(args.path)
    birth, survive = ((pat.birth, pat.survive) if args.rule is None
                      else rules_mod.parse_rulestring(args.rule))
    bits = rules_mod.pack_rule_bits(birth, survive)
    if args.census:
        print(json.dumps({"rule": rules_mod.rulestring(birth, survive),
                          **census(pat.grid, bits,
                                   max_period=args.max_period)}))
        return 0
    pad = 8
    box = np.zeros((_canonical_box(pat.grid.shape[0] + 2 * pad),
                    _canonical_box(pat.grid.shape[1] + 2 * pad)), np.uint8)
    box[pad:pad + pat.grid.shape[0], pad:pad + pat.grid.shape[1]] = pat.grid
    c = classify_pattern(box, bits, max_period=args.max_period)
    print(json.dumps({
        "rule": rules_mod.rulestring(birth, survive),
        "kind": c.kind, "period": c.period,
        "displacement": list(c.displacement), "speed": c.speed,
        "population": c.population,
    }))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(_main())
