"""Shared instance-tile picker for the Pallas kernels.

Every kernel tiles the instance batch so its per-tile working set fits the
scoped VMEM budget; each caller supplies its own per-instance byte
estimate (documented at the call site), the divisor search lives here
once.
"""

from __future__ import annotations


def largest_divisor_tile(instances: int, per_instance_bytes: int,
                         budget_bytes: int) -> int:
    """Largest divisor of ``instances`` with tile * bytes <= budget
    (minimum 1 — a single instance may legitimately exceed the budget and
    then relies on the compiler's own spilling diagnostics)."""
    # clamp to instances first: no divisor exceeds it, and without the
    # clamp tiny per-instance footprints made the search count down from
    # budget//bytes (possibly tens of thousands of useless trial
    # divisions at trace time)
    tile = max(1, min(instances, budget_bytes // max(per_instance_bytes, 1)))
    while instances % tile:
        tile -= 1
    return tile
