"""True device synchronization for benchmarks and smoke checks.

On the tunneled "axon" TPU platform ``jax.block_until_ready`` returns
BEFORE the computation finishes: throughput numbers measured behind it are
silently inflated, and runtime faults in dispatched programs go unnoticed.
A device->host transfer of a *dependent scalar* is a true barrier on every
platform — the transfer cannot complete until the producing computation
has.  Every benchmark/probe in this repo must synchronize through this
helper, never through ``block_until_ready``.
"""

from __future__ import annotations

import jax
import numpy as np


def device_sync(x) -> float:
    """Force completion of the computation producing ``x`` (an array or any
    pytree of arrays) and return the total sum as a host float.

    The per-leaf scalar reductions batch into ONE device->host transfer —
    the barrier is the transfer's data dependence, not its count."""
    sums = []
    for leaf in jax.tree.leaves(x):
        try:
            sums.append(jax.numpy.sum(leaf))
        except TypeError:
            # typed PRNG key arrays have no sum; reduce their raw bits
            sums.append(jax.numpy.sum(jax.random.key_data(leaf)))
    return float(sum(float(np.asarray(s)) for s in jax.device_get(sums)))
