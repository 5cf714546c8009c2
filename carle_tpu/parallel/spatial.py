"""Spatial grid sharding with halo exchange — one universe across chips.

For grids too large for one device, the universe shards by rows over a
``space`` mesh axis.  Each CA step needs exactly one ghost row from each
neighbour (the 3x3 Moore stencil), exchanged with ``lax.ppermute`` inside a
``shard_map`` — two 1-row transfers per step riding ICI, overlapping with the
row-local arithmetic.  The ring permutation wraps, which realizes the global
torus topology across the device ring for free; columns stay device-local so
their circular ``roll`` is untouched.

This is the ring-attention-halo analogue flagged in SURVEY.md §2: the same
math as ops/ca.py (parity-tested), different data movement.
"""

from __future__ import annotations

from functools import lru_cache, partial
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.ca import apply_rule


def _local_step(local: jax.Array, rule_bits: jax.Array, axis_name: str) -> jax.Array:
    """One CA generation on a [inst, H_local, W] row-shard with ring halos."""
    n = jax.lax.axis_size(axis_name)
    up_perm = [(i, (i + 1) % n) for i in range(n)]    # my last row -> next dev
    down_perm = [(i, (i - 1) % n) for i in range(n)]  # my first row -> prev dev

    top_halo = jax.lax.ppermute(local[:, -1:, :], axis_name, up_perm)
    bottom_halo = jax.lax.ppermute(local[:, :1, :], axis_name, down_perm)
    padded = jnp.concatenate([top_halo, local, bottom_halo], axis=1)

    rows = padded[:, :-2, :] + padded[:, 1:-1, :] + padded[:, 2:, :]
    counts = (
        rows + jnp.roll(rows, 1, axis=-1) + jnp.roll(rows, -1, axis=-1) - local
    )
    return apply_rule(local, counts, rule_bits)


@lru_cache(maxsize=64)
def _jitted_spatial_step(mesh: Mesh, axis_name: str):
    """One jitted shard_map instance per (mesh, axis) — a fresh shard_map
    closure per call would re-trace (and on the tunneled TPU re-hit the
    remote compiler) EVERY step; rules stay a traced argument so rule
    changes don't recompile."""
    fn = shard_map(
        partial(_local_step, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P()),
        out_specs=P(None, axis_name, None),
    )
    return jax.jit(fn)


def spatial_ca_step(
    grid: jax.Array,
    rule_bits: jax.Array,
    mesh: Mesh,
    axis_name: str = "space",
) -> jax.Array:
    """One generation of a row-sharded universe [inst, H, W] (H sharded)."""
    fn = _jitted_spatial_step(mesh, axis_name)
    return fn(grid, jnp.asarray(rule_bits, dtype=jnp.int32))


@lru_cache(maxsize=64)
def _jitted_spatial_multi(mesh: Mesh, axis_name: str, num_steps: int):
    def local(g, rb):
        def body(g, _):
            return _local_step(g, rb, axis_name), None

        return jax.lax.scan(body, g, length=num_steps)[0]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P()),
        out_specs=P(None, axis_name, None),
    )
    return jax.jit(fn)


def spatial_multi_step(
    grid: jax.Array,
    rule_bits: jax.Array,
    num_steps: int,
    mesh: Mesh,
    axis_name: str = "space",
) -> jax.Array:
    """``num_steps`` generations under one shard_map'd scan (halos exchanged
    once per generation; no resharding between steps).  The jitted program
    is cached per (mesh, axis, num_steps); rules ride as data."""
    fn = _jitted_spatial_multi(mesh, axis_name, num_steps)
    return fn(grid, jnp.asarray(rule_bits, dtype=jnp.int32))


# ---------------------------------------------------------------------------
# Bit-packed spatial path: 32 cells/word locally, ghost rows 8x smaller too
# ---------------------------------------------------------------------------


def _bit_local_step(
    local: jax.Array, rule_bits, axis_name: str, static_rules=None
) -> jax.Array:
    """One packed generation on a [inst, H_local, W/32] row-shard.

    The two ghost rows ride the ring as packed words — W/8 bytes per
    neighbour instead of the uint8 path's W bytes — and the row-local
    update is the carry-save-adder engine (ops/bitpack.py), so the spatial
    path inherits the packed per-chip rate instead of the int32 rate.
    """
    from ..ops.bitpack import (
        _neighbor_bitplanes_padded,
        _rule_mux,
        _rule_mux_static,
    )

    n = jax.lax.axis_size(axis_name)
    up_perm = [(i, (i + 1) % n) for i in range(n)]
    down_perm = [(i, (i - 1) % n) for i in range(n)]

    top_halo = jax.lax.ppermute(local[:, -1:, :], axis_name, up_perm)
    bottom_halo = jax.lax.ppermute(local[:, :1, :], axis_name, down_perm)
    padded = jnp.concatenate([top_halo, local, bottom_halo], axis=1)

    g = local.astype(jnp.uint32)
    counts = _neighbor_bitplanes_padded(padded.astype(jnp.uint32))
    if static_rules is not None:
        return _rule_mux_static(g, counts, *static_rules)
    return _rule_mux(g, counts, rule_bits)


@lru_cache(maxsize=64)
def _jitted_bit_spatial_multi(mesh: Mesh, axis_name: str, num_steps: int,
                              static_rules):
    def local(g, rb):
        def body(g, _):
            return _bit_local_step(g, rb, axis_name, static_rules), None

        return jax.lax.scan(body, g, length=num_steps)[0]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P()),
        out_specs=P(None, axis_name, None),
    )
    return jax.jit(fn)


def bit_spatial_multi_step(
    packed: jax.Array,
    rule_bits: jax.Array,
    num_steps: int,
    mesh: Mesh,
    axis_name: str = "space",
    static_rules=None,
) -> jax.Array:
    """``num_steps`` packed generations of a row-sharded universe
    [inst, H, W/32] (H sharded over ``axis_name``).

    ``static_rules=(birth, survive)`` trace-specializes the rule like
    :func:`~carle_tpu.ops.bitpack.bit_ca_step_static` (recompiles on rule
    change, ~16x fewer bitops for Life); the default keeps rules as data.
    The jitted program is cached per (mesh, axis, num_steps, static rule).
    """
    if static_rules is not None:
        birth, survive = static_rules
        static_rules = (tuple(int(d) for d in birth),
                        tuple(int(d) for d in survive))
    fn = _jitted_bit_spatial_multi(mesh, axis_name, num_steps, static_rules)
    return fn(packed, jnp.asarray(rule_bits, dtype=jnp.int32))
