"""Pallas halo exchange — spatial CA sharding with explicit ICI RDMA.

The shard_map+ppermute path (spatial.py) lets XLA schedule the 1-cell halo
transfers.  This kernel issues them explicitly with
``pltpu.make_async_remote_copy`` so the ghost-row DMA rides ICI while the
device computes its interior rows — the overlap pattern ring-attention uses
for its block transfers (SURVEY.md §2: the "long context" analogue of this
domain).

Per device and step:

1. neighbour barrier (previous-step buffers are free before peers write);
2. RDMA my last row -> down-neighbour's top ghost, my first row -> up-
   neighbour's bottom ghost (ring wraps: the global torus comes for free);
3. compute interior rows (no ghosts needed) while DMAs are in flight;
4. wait, compute the two boundary rows.

Same math as ops/ca.py (integer Moore sum + 18-bit rule shift).  Parity vs
the single-device path is tested in interpret mode on the CPU mesh (with
``detect_races=True``), and the kernel follows the guide's ring-collective
recipe exactly (pallas_guide.md "Async Remote DMA", "Semaphores").

HARDWARE CAVEAT: this bench box has one chip, so the RDMA path cannot be
hardware-executed here — only interpreter-verified.  The interpreter accepts
some primitives Mosaic's TC lowering does not (we hit exactly this with
``dynamic_slice`` in ops/pallas_ca.py), so first bring-up on a real pod
slice should smoke these kernels before relying on them; the
shard_map+ppermute path (spatial.py) is the conservative alternative whose
collectives XLA lowers everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P


def _row_update(padded: jax.Array, rule_bits: jax.Array) -> jax.Array:
    """CA update for the rows of ``padded[:, 1:-1, :]`` given ghost rows at
    index 0 and -1; circular columns."""
    pi = padded.astype(jnp.int32)
    rows = pi[:, :-2, :] + pi[:, 1:-1, :] + pi[:, 2:, :]
    w = padded.shape[-1]
    counts = (
        rows
        + pltpu.roll(rows, 1, rows.ndim - 1)
        + pltpu.roll(rows, w - 1, rows.ndim - 1)
        - pi[:, 1:-1, :]
    )
    idx = counts + 9 * pi[:, 1:-1, :]
    return ((rule_bits >> idx) & 1).astype(jnp.uint8)


def _halo_kernel(rule_ref, grid_ref, out_ref, halo_ref, send_sem, recv_sem,
                 *, axis_name: str):
    n = jax.lax.axis_size(axis_name)
    my_id = jax.lax.axis_index(axis_name)
    up = (my_id - 1) % n    # neighbour holding the rows above mine
    down = (my_id + 1) % n  # neighbour holding the rows below mine

    # 1. barrier with both neighbours (guide: "Local Barrier Between
    #    Neighbors") so nobody writes into a buffer still in use.
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id=up,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_signal(barrier, inc=1, device_id=down,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 2)

    # 2. ship boundary rows: my last row becomes down's top ghost (slot 0),
    #    my first row becomes up's bottom ghost (slot 1).
    h = grid_ref.shape[1]
    send_down = pltpu.make_async_remote_copy(
        src_ref=grid_ref.at[:, h - 1 : h, :],
        dst_ref=halo_ref.at[0],
        send_sem=send_sem.at[0],
        recv_sem=recv_sem.at[0],
        device_id=down,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    send_up = pltpu.make_async_remote_copy(
        src_ref=grid_ref.at[:, 0:1, :],
        dst_ref=halo_ref.at[1],
        send_sem=send_sem.at[1],
        recv_sem=recv_sem.at[1],
        device_id=up,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    send_down.start()
    send_up.start()

    # 3. interior rows only need local data — overlap with the DMAs.
    g = grid_ref[...]
    out_ref[:, 1 : h - 1, :] = _row_update(g, rule_ref[0])

    # 4. boundary rows once the ghosts have landed.
    send_down.wait()
    send_up.wait()
    top = jnp.concatenate(
        [halo_ref[0], g[:, 0:2, :]], axis=1
    )  # [inst, 3, W] around row 0
    bottom = jnp.concatenate(
        [g[:, h - 2 : h, :], halo_ref[1]], axis=1
    )  # [inst, 3, W] around row h-1
    out_ref[:, 0:1, :] = _row_update(top, rule_ref[0])
    out_ref[:, h - 1 : h, :] = _row_update(bottom, rule_ref[0])


def _halo_multi_kernel(rule_ref, steps_ref, grid_ref, out_ref, halo_ref,
                       send_sem, recv_sem, *, axis_name: str):
    """K generations per launch: the universe stays VMEM-resident in
    ``out_ref``; each generation barriers with the neighbours, RDMAs the
    current boundary rows, computes the interior while the DMAs fly, then
    the boundary rows.  ``rdma.wait()`` covers send completion, so
    overwriting ``out_ref`` with the next generation is safe."""
    n = jax.lax.axis_size(axis_name)
    my_id = jax.lax.axis_index(axis_name)
    up = (my_id - 1) % n
    down = (my_id + 1) % n
    h = grid_ref.shape[1]

    out_ref[...] = grid_ref[...]

    def one_generation(_, carry):
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=up,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(barrier, inc=1, device_id=down,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 2)

        send_down = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[:, h - 1 : h, :],
            dst_ref=halo_ref.at[0],
            send_sem=send_sem.at[0],
            recv_sem=recv_sem.at[0],
            device_id=down,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        send_up = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[:, 0:1, :],
            dst_ref=halo_ref.at[1],
            send_sem=send_sem.at[1],
            recv_sem=recv_sem.at[1],
            device_id=up,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        send_down.start()
        send_up.start()

        g = out_ref[...]
        interior = _row_update(g, rule_ref[0])

        send_down.wait()
        send_up.wait()
        top = jnp.concatenate([halo_ref[0], g[:, 0:2, :]], axis=1)
        bottom = jnp.concatenate([g[:, h - 2 : h, :], halo_ref[1]], axis=1)

        out_ref[:, 1 : h - 1, :] = interior
        out_ref[:, 0:1, :] = _row_update(top, rule_ref[0])
        out_ref[:, h - 1 : h, :] = _row_update(bottom, rule_ref[0])
        return carry

    jax.lax.fori_loop(0, steps_ref[0], one_generation, 0)


@functools.lru_cache(maxsize=64)
def _jitted_halo_multi(mesh: Mesh, axis_name: str, collective_id: int,
                       interpret: bool, detect_races: bool):
    """One jitted shard_map per (mesh, axis, kernel statics): a fresh
    closure per call would re-trace (and re-hit the remote compiler on the
    tunneled TPU) every invocation.  ``num_steps`` is a prefetch scalar, so
    step-count changes don't recompile either."""
    interp = (
        pltpu.InterpretParams(detect_races=detect_races) if interpret else False
    )

    def per_device(local: jax.Array, bits: jax.Array,
                   steps: jax.Array) -> jax.Array:
        inst, h_local, w = local.shape
        kernel = functools.partial(_halo_multi_kernel, axis_name=axis_name)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(local.shape, jnp.uint8),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(local.shape, lambda *_: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(local.shape, lambda *_: (0, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, inst, 1, w), jnp.uint8),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=collective_id
            ),
            interpret=interp,
        )(bits.reshape(1), steps.reshape(1), local)

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(), P()),
        out_specs=P(None, axis_name, None),
        check_vma=False,
    )
    return jax.jit(fn)


def spatial_multi_step_pallas(
    grid: jax.Array,
    rule_bits: jax.Array,
    num_steps,
    mesh: Mesh,
    axis_name: str = "space",
    collective_id: int = 8,
    interpret: bool = False,
    detect_races: bool = False,
) -> jax.Array:
    """``num_steps`` generations of a row-sharded universe, one kernel launch
    per device: per-generation halo RDMA rides ICI while interior rows
    compute, and the local shard never leaves VMEM between generations."""
    fn = _jitted_halo_multi(mesh, axis_name, collective_id, interpret,
                            detect_races)
    return fn(grid, jnp.asarray(rule_bits, dtype=jnp.int32),
              jnp.asarray(num_steps, dtype=jnp.int32))


def _packed_row_update(padded: jax.Array, rule_bits: jax.Array) -> jax.Array:
    """Bit-packed CA update for rows ``1..-2`` of a uint32 word grid
    [inst, rows, W/32] carrying one ghost row above and below.

    Same carry-save-adder + rules-as-data mux as ops/bitpack.py, with the
    horizontal cross-word carries as word-axis ``pltpu.roll``s.  Layout note:
    the word axis sits on lanes UNTRANSPOSED here — at the ≥8k² universe
    sizes this path exists for, W/32 ≥ 256 fills the lanes naturally (the
    single-chip kernels transpose because 256-wide grids only have 8 words).
    """
    from ..ops.bitpack import _count_planes, _rule_mux

    g = padded
    nwords = g.shape[-1]
    prev = pltpu.roll(g, 1, g.ndim - 1)
    nxt = pltpu.roll(g, nwords - 1, g.ndim - 1)
    left = (g << 1) | (prev >> 31)
    right = (g >> 1) | (nxt << 31)
    a = left ^ right
    b = left & right

    # the kernel-local part is only the pltpu.roll horizontal planes above;
    # the Moore-count CSA tree is the parity-tested engine's
    planes = _count_planes(
        a[:, :-2, :], b[:, :-2, :], g[:, :-2, :],
        a[:, 1:-1, :], b[:, 1:-1, :],
        a[:, 2:, :], b[:, 2:, :], g[:, 2:, :],
    )
    return _rule_mux(g[:, 1:-1, :], planes, rule_bits)


def _bit_halo_multi_kernel(rule_ref, steps_ref, grid_ref, out_ref, halo_ref,
                           send_sem, recv_sem, *, axis_name: str):
    """K packed generations per launch with per-generation ghost-ROW RDMA —
    the boundary transfer is W/8 bytes instead of the uint8 kernel's W."""
    n = jax.lax.axis_size(axis_name)
    my_id = jax.lax.axis_index(axis_name)
    up = (my_id - 1) % n
    down = (my_id + 1) % n
    h = grid_ref.shape[1]

    out_ref[...] = grid_ref[...]

    def one_generation(_, carry):
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=up,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(barrier, inc=1, device_id=down,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 2)

        send_down = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[:, h - 1 : h, :],
            dst_ref=halo_ref.at[0],
            send_sem=send_sem.at[0],
            recv_sem=recv_sem.at[0],
            device_id=down,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        send_up = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[:, 0:1, :],
            dst_ref=halo_ref.at[1],
            send_sem=send_sem.at[1],
            recv_sem=recv_sem.at[1],
            device_id=up,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        send_down.start()
        send_up.start()

        g = out_ref[...]
        interior = _packed_row_update(g, rule_ref[0])

        send_down.wait()
        send_up.wait()
        top = jnp.concatenate([halo_ref[0], g[:, 0:2, :]], axis=1)
        bottom = jnp.concatenate([g[:, h - 2 : h, :], halo_ref[1]], axis=1)

        out_ref[:, 1 : h - 1, :] = interior
        out_ref[:, 0:1, :] = _packed_row_update(top, rule_ref[0])
        out_ref[:, h - 1 : h, :] = _packed_row_update(bottom, rule_ref[0])
        return carry

    jax.lax.fori_loop(0, steps_ref[0], one_generation, 0)


def bit_spatial_multi_step_pallas(
    packed: jax.Array,
    rule_bits: jax.Array,
    num_steps,
    mesh: Mesh,
    axis_name: str = "space",
    collective_id: int = 9,
    interpret: bool = False,
    detect_races: bool = False,
) -> jax.Array:
    """``num_steps`` generations of a row-sharded PACKED universe
    [inst, H, W/32] (H sharded): the packed per-chip engine with explicit
    per-generation ghost-row RDMA, VMEM-resident between generations.

    Completes the spatial matrix (uint8/packed x ppermute/RDMA).  Same
    hardware caveat as the uint8 kernels above: interpreter-verified on this
    single-chip box; smoke on a real pod slice before relying on it.
    """
    fn = _jitted_bit_halo_multi(mesh, axis_name, collective_id, interpret,
                                detect_races)
    return fn(packed, jnp.asarray(rule_bits, dtype=jnp.int32),
              jnp.asarray(num_steps, dtype=jnp.int32))


@functools.lru_cache(maxsize=64)
def _jitted_bit_halo_multi(mesh: Mesh, axis_name: str, collective_id: int,
                           interpret: bool, detect_races: bool):
    interp = (
        pltpu.InterpretParams(detect_races=detect_races) if interpret else False
    )

    def per_device(local: jax.Array, bits: jax.Array,
                   steps: jax.Array) -> jax.Array:
        inst, h_local, nwords = local.shape
        kernel = functools.partial(_bit_halo_multi_kernel, axis_name=axis_name)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(local.shape, jnp.uint32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(local.shape, lambda *_: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(local.shape, lambda *_: (0, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, inst, 1, nwords), jnp.uint32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=collective_id
            ),
            interpret=interp,
        )(bits.reshape(1), steps.reshape(1), local)

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(), P()),
        out_specs=P(None, axis_name, None),
        check_vma=False,
    )
    return jax.jit(fn)


def spatial_ca_step_pallas(
    grid: jax.Array,
    rule_bits: jax.Array,
    mesh: Mesh,
    axis_name: str = "space",
    collective_id: int = 7,
    interpret: bool = False,
    detect_races: bool = False,
) -> jax.Array:
    """One generation of a row-sharded [inst, H, W] universe with explicit
    RDMA halo exchange.  Drop-in equivalent of spatial.spatial_ca_step.

    ``interpret=True`` runs under the Pallas TPU interpreter, which emulates
    the remote DMAs and semaphores on CPU devices — with ``detect_races``
    the interpreter also checks the DMA schedule for data races (the
    auxiliary race-detection subsystem of this framework's kernel layer).
    """
    fn = _jitted_halo_step(mesh, axis_name, collective_id, interpret,
                           detect_races)
    return fn(grid, jnp.asarray(rule_bits, dtype=jnp.int32))


@functools.lru_cache(maxsize=64)
def _jitted_halo_step(mesh: Mesh, axis_name: str, collective_id: int,
                      interpret: bool, detect_races: bool):
    interp = (
        pltpu.InterpretParams(detect_races=detect_races) if interpret else False
    )

    def per_device(local: jax.Array, bits: jax.Array) -> jax.Array:
        inst, h_local, w = local.shape
        kernel = functools.partial(_halo_kernel, axis_name=axis_name)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(local.shape, jnp.uint8),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(local.shape, lambda *_: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(local.shape, lambda *_: (0, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, inst, 1, w), jnp.uint8),  # ghost rows
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=collective_id
            ),
            interpret=interp,
        )(bits.reshape(1), local)

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P()),
        out_specs=P(None, axis_name, None),
        check_vma=False,
    )
    return jax.jit(fn)
