"""Spatial env mode — the FULL environment on a row-sharded universe.

`spatial.py` shards the bare CA update with explicit shard_map halos; this
module makes spatial sharding a real *env mode*: the complete ``env_step``
semantics — action XOR in the centred window, batch-global master reset,
every wrapper bonus, online learning — run on a universe whose rows are
sharded over a ``space`` mesh axis, driven by the unchanged
:class:`~carle_tpu.rollout.Rollout`.

Design: GSPMD, not hand-written collectives.  The carry is *committed* with
row shardings (grid [inst, H@space, W], obs-shaped buffers likewise) and the
existing jitted step is re-used verbatim; XLA partitions the program and
inserts the 1-row halo exchanges for the Moore stencil (``jnp.roll`` /
convs on the sharded axis), all-gathers for the wrapper dense layers, and
all-reduces for batch statistics.  That is exactly how a TPU program should
shard: annotate placement, let the compiler schedule ICI traffic.  The
explicit shard_map/ppermute and RDMA-kernel paths in `spatial.py` /
`pallas_halo.py` remain the low-level alternatives for the bare CA hot loop
(reference SURVEY.md §2: needed beyond ~8k² grids).

Constraint: spatial mode requires ``EnvConfig.backend == "xla"`` — a
``pallas_call`` is opaque to the GSPMD partitioner, so the fused Pallas
kernels cannot be auto-sharded (they have their own explicit-RDMA spatial
variants instead).

Usage::

    mesh = make_mesh(jax.devices(), axis_name="space")
    ro = Rollout(config, wrappers, agent)          # unchanged
    carry = ro.init(key, rule_bits)
    carry = shard_carry_spatial(carry, mesh, config)
    carry, rewards = ro.run(carry, num_steps)      # runs row-sharded
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EnvConfig


def spatial_sharding(
    mesh: Mesh, leaf: Any, config: EnvConfig, axis_name: str = "space",
    env_axis: str = None,
) -> NamedSharding:
    """Sharding for one state leaf in spatial mode: any leaf whose trailing
    two dimensions are the universe extent (H, W) — grids [inst, H, W],
    observations/frame rings [..., 1, H, W] — shards its row dimension over
    the space axis; everything else (params, optimizer moments, scalars,
    action patches) replicates.

    Divisibility is checked against the SPACE AXIS extent
    (``mesh.shape[axis_name]``), not the total device count — they differ
    on a 2-D env x space mesh.  With ``env_axis`` set (2-D mode), leaves
    whose dim 0 is the instance batch additionally shard that dimension
    over the env axis — including the grids themselves, which then shard
    on BOTH axes ([inst@env, H@space, W])."""
    shape = np.shape(leaf)
    n = mesh.shape[axis_name]

    def env_lead() -> bool:
        return (
            env_axis is not None
            and env_axis in mesh.shape
            and len(shape) >= 1
            and shape[0] == config.instances
            and config.instances % mesh.shape[env_axis] == 0
        )

    if (
        len(shape) >= 2
        and shape[-2] == config.height
        and shape[-1] == config.width
        and config.height % n == 0
    ):
        axes = [None] * len(shape)
        axes[-2] = axis_name
        if len(shape) >= 3 and env_lead():
            axes[0] = env_axis
        return NamedSharding(mesh, P(*axes))
    if env_lead():
        return NamedSharding(
            mesh, P(*([env_axis] + [None] * (len(shape) - 1)))
        )
    return NamedSharding(mesh, P())


def _check_xla_backend(config: EnvConfig) -> None:
    from ..ops.ca import resolve_backend

    # resolve first: "auto" means pallas on TPU — exactly the path GSPMD
    # cannot partition — while CPU tests would green-light it
    if resolve_backend(config.backend) != "xla":
        raise ValueError(
            "spatial env mode requires the XLA backend (GSPMD cannot "
            f"partition the '{config.backend}' Pallas path — set "
            "EnvConfig(backend='xla'); see module docstring)"
        )


def shard_carry_spatial(
    carry: Any, mesh: Mesh, config: EnvConfig, axis_name: str = "space"
) -> Any:
    """Commit a rollout carry (or any state pytree) for spatial execution:
    universe-extent leaves row-sharded, the rest replicated.

    For the combined env-batch x spatial layout use :func:`shard_carry_2d`
    with a 2-D ``Mesh(devices.reshape(n_env, n_space), ("env", "space"))``.
    """
    _check_xla_backend(config)
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, spatial_sharding(mesh, leaf, config, axis_name)
        ),
        carry,
    )


def shard_carry_2d(
    carry: Any, mesh: Mesh, config: EnvConfig,
    env_axis: str = "env", space_axis: str = "space",
) -> Any:
    """Commit a rollout carry onto a 2-D env x space mesh: universes shard
    instances over ``env_axis`` AND rows over ``space_axis`` simultaneously,
    other instance-batched leaves (per-instance statistics, action streams)
    shard dim 0 over ``env_axis``, wrapper params/optimizer state replicate.

    Use when BOTH scale axes bind at once — more universes than one chip's
    batch and universes too large for one chip's HBM (SCALING.md §1 row 3):

        devs = np.asarray(jax.devices()).reshape(n_env, n_space)
        mesh = Mesh(devs, ("env", "space"))
        carry = shard_carry_2d(carry, mesh, config)

    Requires ``instances % n_env == 0`` and ``height % n_space == 0``
    (leaves failing either check replicate on that axis), and the XLA
    backend like every GSPMD spatial mode.  Parity-tested against the
    single-device rollout on a 2x4 virtual mesh
    (tests/test_parallel.py::test_shard_carry_2d_rollout_parity).
    """
    _check_xla_backend(config)
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf,
            spatial_sharding(mesh, leaf, config, space_axis,
                             env_axis=env_axis),
        ),
        carry,
    )
