"""HBM preflight: price a training program before it executes.

Round-4 measurement (STATUS r4, assets/fault_probe_r04.jsonl,
assets/ladder512_r04.jsonl): crossing the EFFECTIVE runtime HBM limit on a
16 GB v5e kills the TPU worker outright — no ``RESOURCE_EXHAUSTED``, no
traceback, a silently dead process.  XLA's compile-time check only rejects
programs over the 15.75 GiB accounting limit, so there is a band of configs
(measured: 5376 envs of 512² fused training ≈ 13.5 GiB runs; 5632 ≈
14.2 GiB crashes the worker) that compiles clean and then dies at launch.

This module prices a program with XLA's own ``memory_analysis`` on the SAME
jit instance the driver then runs — the compiled executable lands in the
in-process jit cache (and the persistent compilation cache), so the
preflight's marginal cost is one analysis call, not a second compile — and
refuses over-budget configs with an actionable error instead of a dead chip.

The default budget is deliberately conservative (13.0 GiB): the measured
crash boundary sits in [13.5, 14.2) GiB of priced memory, and the pricing
basis (donation-aliased temp+args+outputs) carries a few-percent model
error, so the guard refuses before the gray zone.  Configs known to fit may
force past it (``--force`` / ``force=True``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax

# Measured v5e band (r4): 13.5 GiB priced → runs; 14.2 GiB priced → dead
# worker.  Refuse before the gray zone starts.
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
            f"{budget_gib:.2f} GiB runtime budget.  On v5e the measured "
            f"behaviour past ~13.5-14.2 GiB is a silently KILLED TPU "
            f"worker, not a clean OOM (STATUS r4).  Shrink the config "
            f"(fewer instances / smaller universe / --packed-state), or "
            f"force past the guard (force=True / --force) if this config "
            f"is known to fit."
        )
        if not force:
            raise HBMBudgetError(msg, mem)
        print(f"WARNING: {msg}  Proceeding (forced).", flush=True)
    return mem
