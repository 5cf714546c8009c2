"""Env-batch data parallelism over a device mesh.

Strategy (the north-star config in BASELINE.md: 65k envs over multiple
hosts): shard every state leaf that carries an ``instances`` dimension over
the ``env`` mesh axis, replicate everything else (wrapper params, optimizer
moments, rule bits).  Rollouts jitted on such committed inputs compile to one
SPMD program per device; cross-device terms (batch-mean losses feeding the
replicated-parameter updates, batch-global Speed/Puffer statistics) become
XLA all-reduces over ICI — no hand-written collectives and no host traffic
in the loop.  The one exception is the fused wrapper-net Pallas kernels:
pallas calls are opaque to GSPMD (the batch would gather onto one device),
so `nets._shard_fused` shard_maps them over the instance axis; train()
plumbs the Mesh through `fused_head` automatically.

Works identically on a real TPU pod slice and on the CPU fake mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``) used by tests and
the driver's multi-chip dry run.  For multi-host, call
``jax.distributed.initialize()`` first and pass ``jax.devices()``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EnvConfig


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis_name: str = "env"
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def env_sharding(
    mesh: Mesh, leaf: Any, instances: int, axis_name: str = "env"
) -> NamedSharding:
    """Sharding for one state leaf: shard over the env axis iff dimension 0
    equals ``instances``; everything else replicates.

    Every instance-batched leaf in this package (grids [inst,H,W],
    observations [inst,1,H,W], per-instance statistics [inst,...]) carries
    the batch on dim 0, so only dim 0 is considered — a non-batch leaf whose
    *inner* dimension happens to equal ``instances`` (e.g. a [H,W] weight
    grid when instances == height) stays replicated instead of silently
    resharding on the wrong axis.
    """
    shape = np.shape(leaf)
    # the ENV AXIS extent, not the total device count — they differ on a
    # 2-D env x space mesh (spatial_env.shard_carry_2d)
    n = mesh.shape[axis_name]
    spec: Any = P()
    if instances % n == 0 and len(shape) >= 1 and shape[0] == instances:
        spec = P(*([axis_name] + [None] * (len(shape) - 1)))
    return NamedSharding(mesh, spec)


def shard_carry(
    carry: Any, mesh: Mesh, config: EnvConfig, axis_name: str = "env"
) -> Any:
    """Commit a rollout carry (or any state pytree) onto the mesh:
    instance-batched leaves sharded, the rest replicated."""
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, env_sharding(mesh, leaf, config.instances, axis_name)
        ),
        carry,
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree
    )
