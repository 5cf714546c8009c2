"""HBM preflight: price a training program before it executes.

This module prices a program with XLA's own ``memory_analysis`` on the SAME
jit instance the driver then runs — the compiled executable lands in the
in-process jit cache (and the persistent compilation cache), so the
preflight's marginal cost is one analysis call, not a second compile — and
refuses over-budget configs with an actionable error.

What actually happens past the budget (r5 ladder bisection,
assets/ladder512_r05.jsonl — this REVISES r4's "runtime HBM limit" story):

* the r4 "silently killed TPU worker" events were a ~60-second per-launch
  execution watchdog, not memory at all (the same 6144-env program dies at
  32 steps/launch ≈ 69 s and runs at full rate at 16 ≈ 34 s; r4's 5376
  ceiling ran 59.9 s launches).  Launch chunking
  (train_mcl._chunk_steps) handles that axis.
* memory still has a real cliff: a 15.2 GiB-priced step RUNS but 2.8x
  slower than the same instance count serialized at 13.7 GiB (1014 vs
  2865 env-steps/s at 6144 envs of 512²), and XLA refuses to compile past
  15.75 GiB outright.

The default budget (13.0 GiB) keeps configs clear of the throughput cliff
and the compile ceiling with margin for the pricing basis's model error.
Configs known to behave may force past it (``--force`` / ``force=True``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax

# Measured v5e (r5): full rate through 13.7 GiB priced; 2.8x throughput
# cliff by 15.2; compile refusal at 15.75.  Refuse with margin.
DEFAULT_BUDGET_GIB = 13.0

_MEM_FIELDS = (
    "temp_size_in_bytes",
    "argument_size_in_bytes",
    "output_size_in_bytes",
    "alias_size_in_bytes",
    "generated_code_size_in_bytes",
)


class HBMBudgetError(RuntimeError):
    """A priced program exceeds the runtime HBM budget (would likely kill
    the TPU worker rather than OOM cleanly — see module docstring)."""

    def __init__(self, message: str, analysis: Dict[str, Any]):
        super().__init__(message)
        self.analysis = analysis


def price_program(jitted_fn, *args, **kwargs) -> Dict[str, Any]:
    """Lower + compile ``jitted_fn(*args, **kwargs)`` WITHOUT executing and
    return XLA's memory analysis as a plain dict, including the same
    ``peak_estimate_gib`` figure ``scripts/mem_probe.py --compile-only``
    reports (temp + args + outputs − donation aliasing).

    ``jitted_fn`` should be the exact jit instance the caller will run
    (e.g. ``Rollout._run``) so the compile is reused, donation included.
    """
    compiled = jitted_fn.lower(*args, **kwargs).compile()
    ma = compiled.memory_analysis()
    mem = {f: int(getattr(ma, f)) for f in _MEM_FIELDS if hasattr(ma, f)}
    mem["peak_estimate_gib"] = round(
        (mem.get("temp_size_in_bytes", 0)
         + mem.get("argument_size_in_bytes", 0)
         + mem.get("output_size_in_bytes", 0)
         - mem.get("alias_size_in_bytes", 0)) / 2**30, 3)
    return mem


def _is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def check_hbm_budget(
    jitted_fn,
    *args,
    budget_gib: Optional[float] = None,
    force: bool = False,
    label: str = "program",
    **kwargs,
) -> Optional[Dict[str, Any]]:
    """Price the program and raise :class:`HBMBudgetError` if it exceeds the
    runtime HBM budget.

    ``budget_gib=None`` means automatic: :data:`DEFAULT_BUDGET_GIB` on TPU,
    and NO check on other backends (host RAM does not have the silent-kill
    failure mode; pass an explicit budget to engage the guard anywhere —
    tests do).  ``force=True`` prices and warns but never raises.  Returns
    the analysis dict (or ``None`` when the check is skipped).
    """
    if budget_gib is None:
        if not _is_tpu():
            return None
        budget_gib = DEFAULT_BUDGET_GIB
    mem = price_program(jitted_fn, *args, **kwargs)
    peak = mem["peak_estimate_gib"]
    if peak > budget_gib:
        msg = (
            f"HBM preflight: {label} prices at {peak:.2f} GiB, over the "
            f"{budget_gib:.2f} GiB budget.  Measured on v5e (r5): past "
            f"~14-15 GiB throughput cliffs ~3x (and XLA refuses to "
            f"compile past 15.75).  Shrink the config (fewer instances / "
            f"smaller universe / --packed-state), serialize the wrapper "
            f"chain (WrapperStack serialize=True — frees ~0.25 MB/env at "
            f"512² and restores full rate near the ceiling), or force "
            f"past the guard (force=True / --force)."
        )
        if not force:
            raise HBMBudgetError(msg, mem)
        print(f"WARNING: {msg}  Proceeding (forced).", flush=True)
    return mem
