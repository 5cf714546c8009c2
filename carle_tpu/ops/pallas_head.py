"""Fused conv-head Pallas kernel: conv3x3 + dropout + relu + maxpool in VMEM.

The wrapper nets' front-end (reference mcl.py:257-279 predictor /
mcl.py:445-481 AE encoder: Conv2d(3x3, pad 1) -> Dropout -> ReLU ->
MaxPool2d) is THE training cost on TPU: the C=2..4-channel activations pad
onto 128 lanes, so every XLA pool/elementwise pass moves ~32x the useful
data — measured 2.92 ms of the 3.32 ms RND gradient at inst=32, 256^2
(scripts/train_cost_probe.py; reformulation probes cap at 1.5x).  This
kernel computes the whole segment per instance-tile in VMEM with W on
lanes and channels as unrolled planes (no padding waste):

* conv as C_in x 9 shifted multiply-adds on the VPU (zero-padded edges,
  matching the reference's padding=1) — plain f32, which is MORE precise
  than the default-lowered TPU conv;
* dropout from the on-core hardware PRNG (`pltpu.prng_*`) — no HBM mask
  traffic at all; masks are regenerated bit-identically in the backward
  kernel from the same seed;
* maxpool (2x2 or 4x4, stride = window, the only configs the nets use) as
  separable shifted maxes, decimated via exact selection matmuls on the
  MXU (precision HIGHEST: products are x*1 / x*0, so the selection is
  bitwise exact);
* a custom VJP whose backward kernel recomputes the forward from the tile
  in VMEM and emits the parameter gradients (dW [O,C,3,3], db [O]); for
  first-layer heads the input cotangent is structurally zero and skipped,
  while ``need_dx=True`` (deeper heads, e.g. conv2 of both wrapper nets)
  additionally computes the true input cotangent as a transpose conv of
  the routed grad in the same kernel.  Max-pool gradient routing follows
  jnp/reduce-max VJP semantics (ties share the grad equally — the
  symmetric subgradient); torch/SelectAndScatter routes whole grads to the
  first tie instead, so the two differ exactly on tied maxima (common on
  near-binary activations) — an equally valid subgradient, chosen because
  it needs ~3x fewer full-resolution passes than first-match routing.

The module also provides :func:`make_fused_tail` — the AE decoder stage
``act(dropout(conv_transpose2d(x)))`` (stride 2, k=4, pad 1) as one kernel
with a full custom VJP — so BOTH wrapper nets (RND predictor/target, AE
encoder+decoder) run entirely in fused kernels under ``--fused-head``.

HBM traffic per step: read x once + write the pool-decimated output (and
the tiny grads) — ~160x less than the unfused chain at pool=4.

Precision (measured v5e, scripts/fused_net_validate.py): the fused stacks'
parameter grads sit at ~1.4e-6 of leaf scale vs a float64 oracle, while
the XLA composition's ConvTranspose2d weight grads are off by up to ~6e-2
EVEN under ``jax.default_matmul_precision("highest")`` — the transpose-conv
dw lowers to a conv XLA runs at bf16 regardless.  The kernels are not just
faster than the unfused chain; they are strictly more accurate on TPU.

Forward-only use (the frozen RND target net) skips the VJP machinery via
``fused_conv_head(..., stop_gradient=True)`` semantics at the call site.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decim_matrix(n: int, pool: int) -> np.ndarray:
    """[n, n/pool] f32 selection matrix: column a picks row pool*a."""
    m = np.zeros((n, n // pool), np.float32)
    m[np.arange(0, n, pool), np.arange(n // pool)] = 1.0
    return m


def _window_matrix(n: int, pool: int) -> np.ndarray:
    """[n, n/pool] f32 ones-over-window matrix: column a covers rows
    [pool*a, pool*(a+1)) — contract to window-sum, transpose-contract to
    broadcast a pooled value over its window."""
    m = np.zeros((n, n // pool), np.float32)
    for a in range(n // pool):
        m[pool * a : pool * (a + 1), a] = 1.0
    return m


def _shift_neg(x: jax.Array, di: int, dj: int) -> jax.Array:
    """x[..., i+di, j+dj] with zero fill (di, dj >= 0)."""
    t, h, w = x.shape
    if di:
        x = jnp.concatenate(
            [x[:, di:, :], jnp.zeros((t, di, w), x.dtype)], axis=1)
    if dj:
        x = jnp.concatenate(
            [x[:, :, dj:], jnp.zeros((t, h, dj), x.dtype)], axis=2)
    return x


_HI = jax.lax.Precision.HIGHEST

# Lanes per decimation/window matmul chunk.  The pool selection matrices
# are [W, W/p] — O(W²) — which is irrelevant at whole-plane sizes (512²:
# 0.5 MB) but fatal for band tiling at huge W (8192: 64 MB in VMEM plus
# hundreds of MB of register spills, the measured r5 compile OOM).  The
# matrices are block-diagonal with identical blocks, so contractions over
# the W axis run chunk-by-chunk against ONE shared [C, C/p] block.
DECIM_CHUNK = 2048


def _contract1(x: jax.Array, m: jax.Array, chunks: int = 1) -> jax.Array:
    """Contract x's axis 1 with m's axis 0: [T,A,B] @ [A,A'] -> [T,B,A'].
    ``chunks > 1``: m is the shared [A/chunks, A'/chunks] diagonal block
    of a block-diagonal matrix (pool selection/window patterns repeat)."""
    if chunks == 1:
        return jax.lax.dot_general(x, m, (((1,), (0,)), ((), ())),
                                   precision=_HI)
    c = x.shape[1] // chunks
    return jnp.concatenate(
        [jax.lax.dot_general(x[:, i * c:(i + 1) * c, :], m,
                             (((1,), (0,)), ((), ())), precision=_HI)
         for i in range(chunks)], axis=-1)


def _contract1_t(x: jax.Array, m: jax.Array, chunks: int = 1) -> jax.Array:
    """Contract x's axis 1 with m's axis 1: [T,A',B] @ [A,A'] -> [T,B,A]."""
    if chunks == 1:
        return jax.lax.dot_general(x, m, (((1,), (1,)), ((), ())),
                                   precision=_HI)
    c = x.shape[1] // chunks
    return jnp.concatenate(
        [jax.lax.dot_general(x[:, i * c:(i + 1) * c, :], m,
                             (((1,), (1,)), ((), ())), precision=_HI)
         for i in range(chunks)], axis=-1)


def _decimate(x: jax.Array, sh: jax.Array, sw: jax.Array,
              wchunks: int = 1) -> jax.Array:
    """[T,H,W] -> [T,H/p,W/p], out[a,b] = x[p*a, p*b] (exact)."""
    return _contract1(_contract1(x, sh), sw, wchunks)  # -> [T,HP,WP]


def _window_max(z: jax.Array, pool: int) -> jax.Array:
    """m[i,j] = max over the pool x pool window starting at (i,j):
    separable log-step shifted maxes (pool must be a power of two), so a
    4-window costs 2 lane shifts + 2 row shifts.  Only multiples of
    ``pool`` are read downstream; edge fill is irrelevant there."""
    m = z
    d = 1
    while d < pool:
        m = jnp.maximum(m, _shift_neg(m, 0, d))
        d *= 2
    d = 1
    while d < pool:
        m = jnp.maximum(m, _shift_neg(m, d, 0))
        d *= 2
    return m


def _shift_rows(x: jax.Array, d: int) -> jax.Array:
    """Row (sublane) shift by d in {-1, 0, 1} with zero fill — cheap on TPU
    (only LANE shifts pay, see the vc-scheme findings)."""
    t, h, w = x.shape
    if d == 0:
        return x
    if d > 0:
        return jnp.concatenate(
            [x[:, d:, :], jnp.zeros((t, d, w), x.dtype)], axis=1)
    return jnp.concatenate(
        [jnp.zeros((t, -d, w), x.dtype), x[:, :h + d, :]], axis=1)


def _expand_packed(xc: jax.Array) -> jax.Array:
    """u32 packed words [t, H, W/32] -> f32 cells [t, H, W], entirely in
    VMEM: lane-repeat each word 32x, then extract bit (lane % 32).  This
    is why the fused nets can consume the packed universe DIRECTLY — the
    XLA-level unpack materialized two u32 cell-sized HBM temps (2 MB/env
    at 512², the r4 envs/chip ladder's residual binder; the 8192-env
    compile OOM's top two allocations were exactly these)."""
    # Mosaic has NO lowering for the minor-dim-merging reshape an
    # element-repeat needs (vector<...x8x32> -> vector<...x256> fails at
    # compile), and pltpu.repeat's tile semantics would interleave words.
    # Lowerable recipe: split words into BYTE planes (values 0-255 — f32
    # exact), lane-concat them, map bytes to their 8 output lanes with an
    # exact selection MATMUL on the MXU, then integer-extract bit lane%8.
    nw = xc.shape[-1]
    w = nw * 32
    bytes_f = jnp.concatenate(
        [((xc >> (8 * b)) & jnp.uint32(0xFF)).astype(jnp.int32)
         .astype(jnp.float32) for b in range(4)],
        axis=-1)                                   # [t, H, 4nw], lane
    # j = b*nw + k holds byte b of word k
    rows = jax.lax.broadcasted_iota(jnp.int32, (4 * nw, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (4 * nw, w), 1)
    sel = (rows == ((cols % 32) // 8) * nw + cols // 32)
    m = sel.astype(jnp.float32)                    # [4nw, w] 0/1
    spread = jax.lax.dot_general(
        bytes_f, m, (((bytes_f.ndim - 1,), (0,)), ((), ())),
        precision=_HI)                             # [t, H, w] byte values
    lane = jax.lax.broadcasted_iota(jnp.int32, spread.shape,
                                    spread.ndim - 1)
    bit = (spread.astype(jnp.int32) >> (lane & 7)) & 1
    return bit.astype(jnp.float32)


def _plane_f32(xc: jax.Array) -> jax.Array:
    """Upcast an input plane to f32 IN VMEM.  Integer (uint8 observation)
    planes go through i32 first — Mosaic's vector unit has no direct
    u8->f32 path (vector arithmetic is i16/i32, CLAUDE.md).  Accepting
    uint8 obs here is what keeps the full-resolution f32 observation out
    of HBM entirely (it was the largest per-env transient of fused
    training at 512²: f32[N,1,512,512] = 1 MB/env)."""
    if xc.dtype == jnp.float32:
        return xc
    if xc.dtype == jnp.uint32:
        return _expand_packed(xc)  # packed words -> cells, in VMEM
    if jnp.issubdtype(xc.dtype, jnp.integer):
        return xc.astype(jnp.int32).astype(jnp.float32)
    return xc.astype(jnp.float32)


def _taps_of(xc: jax.Array):
    """The 3 lane-shifted copies of one (f32) plane: tap (dy,dx) of a 3x3
    conv is then a free row shift of one of these."""
    t, h, w = xc.shape
    left = jnp.concatenate(  # x[., ., j-1]
        [jnp.zeros((t, h, 1), xc.dtype), xc[:, :, : w - 1]], axis=2)
    right = jnp.concatenate(  # x[., ., j+1]
        [xc[:, :, 1:], jnp.zeros((t, h, 1), xc.dtype)], axis=2)
    return (left, xc, right)


def _grad_taps(g: jax.Array):
    """Lane-shifted copies of a grad plane for the TRANSPOSE conv (reverse
    offsets: dx=0 reads g[., ., j+1], dx=2 reads g[., ., j-1])."""
    t, h, w = g.shape
    g_left = jnp.concatenate(
        [g[:, :, 1:], jnp.zeros((t, h, 1), g.dtype)], axis=2)
    g_right = jnp.concatenate(
        [jnp.zeros((t, h, 1), g.dtype), g[:, :, : w - 1]], axis=2)
    return (g_left, g, g_right)


def _tap_planes(x_ref, cin: int):
    """The 3 lane-shifted copies of every input plane, hoisted ONCE per
    tile: tap (dy,dx) of the 3x3 conv is then a free row shift of one of
    these.  Cuts lane shifts from 9 per channel-use to 2 per tile.
    Integer inputs (uint8 observations) are upcast to f32 in VMEM."""
    return [_taps_of(_plane_f32(x_ref[:, c])) for c in range(cin)]


def _conv_block(taps, w_ref, b_ref, o: int, cin: int):
    """One output channel of the 3x3 zero-padded conv from the hoisted
    lane-shifted planes: 9*C row-shifted MACs."""
    t, h, w = taps[0][1].shape
    acc = jnp.full((t, h, w), b_ref[o, 0], jnp.float32)
    for c in range(cin):
        for dy in range(3):
            for dx in range(3):
                # out[i,j] += w[dy,dx] * x[i+dy-1, j+dx-1]
                tap = _shift_rows(taps[c][dx], dy - 1)
                acc = acc + tap * w_ref[o, c, dy, dx]
    return acc


def _keep_mask(shape, drop_p: float):
    """Bernoulli(1 - drop_p) keep mask from the hardware PRNG.

    SIGN-SAFE: Mosaic treats the PRNG words as SIGNED i32 — both a raw
    ``bits >= uint32_threshold`` compare and a ``bits >> 8`` pre-shift
    lower signed (arithmetic shift keeps the sign; measured effective drop
    rates 0.55 and 0.60 at p=0.1 on v5e).  A bitwise AND clearing the sign
    bit is lowering-proof: uniform over [0, 2^31) (micro-probe quantiles
    0.099/0.499/0.899 on hardware).  Keep the LOW (1-p) fraction so the
    interpreter's zero-bit stub degrades to all-keep rather than all-drop."""
    bits = pltpu.prng_random_bits(shape).astype(jnp.int32)
    nonneg = jax.lax.bitwise_and(bits, jnp.int32(0x7FFFFFFF))
    return nonneg < jnp.int32(int((1.0 - drop_p) * (1 << 31)))


def _apply_drop_relu(z, keep, drop_p):
    if drop_p > 0.0:
        z = jnp.where(keep, z * (1.0 / (1.0 - drop_p)), 0.0)
    return jnp.maximum(z, 0.0)


def _head_fwd_kernel(seed_ref, x_ref, w_ref, b_ref, sh_ref, sw_ref, out_ref,
                     *, cout: int, cin: int, pool: int, drop_p: float):
    pi = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], pi)
    sh, sw = sh_ref[...], sw_ref[...]
    taps = _tap_planes(x_ref, cin)
    for o in range(cout):
        z = _conv_block(taps, w_ref, b_ref, o, cin)
        if drop_p > 0.0:
            keep = _keep_mask(z.shape, drop_p)
            z = _apply_drop_relu(z, keep, drop_p)
        else:
            z = jnp.maximum(z, 0.0)
        out_ref[:, o] = _decimate(_window_max(z, pool), sh, sw)


def _head_bwd_kernel(seed_ref, x_ref, w_ref, b_ref, sh_ref, sw_ref,
                     bh_ref, bw_ref, g_ref, dw_ref, db_ref, gx_ref=None,
                     *, cout: int, cin: int, pool: int, drop_p: float,
                     need_dx: bool = False):
    pi = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], pi)
    sh, sw = sh_ref[...], sw_ref[...]

    @pl.when(pi == 0)
    def _init():
        # SMEM accepts scalar stores only — unrolled zero-init
        for o in range(cout):
            db_ref[o, 0] = 0.0
            for c in range(cin):
                for dy in range(3):
                    for dx in range(3):
                        dw_ref[o, c, dy, dx] = 0.0

    bh, bw = bh_ref[...], bw_ref[...]
    taps = _tap_planes(x_ref, cin)
    gx_acc = None
    if need_dx:
        t, h_, w_ = taps[0][1].shape
        gx_acc = [jnp.zeros((t, h_, w_), jnp.float32) for _ in range(cin)]
    for o in range(cout):
        # recompute the forward for this channel (bit-identical PRNG order)
        c = _conv_block(taps, w_ref, b_ref, o, cin)
        if drop_p > 0.0:
            keep = _keep_mask(c.shape, drop_p)
            d = jnp.where(keep, c * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            d = c
        z = jnp.maximum(d, 0.0)

        # pool grad with reduce-max VJP semantics: every element equal to
        # its window max shares the grad equally (ties split 1/cnt — the
        # symmetric subgradient; torch/SelectAndScatter picks first-match
        # instead, which only differs on exact ties).  All window algebra
        # is exact selection/ones matmuls on the MXU.
        m_dec = _decimate(_window_max(z, pool), sh, sw)
        mb = _contract1_t(_contract1_t(m_dec, bh), bw)   # max over own window
        eqf = jnp.where(z == mb, 1.0, 0.0)
        cnt_dec = _contract1(_contract1(eqf, bh), bw)    # ties per window
        g = g_ref[:, o] / cnt_dec                        # cnt >= 1 always
        gb = _contract1_t(_contract1_t(g, bh), bw)       # grad over window
        g_z = gb * eqf

        g_d = jnp.where(d > 0.0, g_z, 0.0)  # relu'
        if drop_p > 0.0:
            g_c = jnp.where(keep, g_d * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            g_c = g_d

        db_ref[o, 0] = db_ref[o, 0] + jnp.sum(g_c)
        for cc in range(cin):
            for dy in range(3):
                for dx in range(3):
                    tap = _shift_rows(taps[cc][dx], dy - 1)
                    dw_ref[o, cc, dy, dx] = (
                        dw_ref[o, cc, dy, dx] + jnp.sum(tap * g_c)
                    )
        if need_dx:
            # input cotangent: transpose conv of g_c with the same taps
            # trick — hoist the lane-shifted g_c planes (reverse offsets),
            # then 9 row-shifted MACs per input channel
            t, h_, w_ = g_c.shape
            g_left = jnp.concatenate(  # g_c[., ., j+1] -> tap dx=0
                [g_c[:, :, 1:], jnp.zeros((t, h_, 1), g_c.dtype)], axis=2)
            g_right = jnp.concatenate(  # g_c[., ., j-1] -> tap dx=2
                [jnp.zeros((t, h_, 1), g_c.dtype), g_c[:, :, : w_ - 1]],
                axis=2)
            g_taps = (g_left, g_c, g_right)
            for cc in range(cin):
                acc = gx_acc[cc]
                for dy in range(3):
                    for dx in range(3):
                        # gx[i,j] += w[dy,dx] * g_c[i-(dy-1), j-(dx-1)]
                        tapg = _shift_rows(g_taps[dx], 1 - dy)
                        acc = acc + tapg * w_ref[o, cc, dy, dx]
                gx_acc[cc] = acc
    if need_dx:
        for cc in range(cin):
            gx_ref[:, cc] = gx_acc[cc]


TILE_BUDGET_BYTES = 5 * 2**20  # tile=2 at 256^2: grad 0.97 vs 1.05 ms at
                               # tile=1; tile=4 exceeds scoped vmem


def _compiler_params(tile: int, planes: int, h: int, w: int):
    """Scale the Mosaic scoped-VMEM limit with the kernel's working set.

    The kernels were sized against v5e's 16 MB default scoped-vmem limit at
    256² universes; bigger geometries overflow it at COMPILE time even at
    tile=1 (measured: conv1 bwd at 512² needs 19.7 MB, conv2 bwd with
    need_dx at [*,4,256,256] needs 18.2 MB) although v5e has 128 MB of
    physical VMEM.  ``planes*h*w*4*tile`` is the same live-plane estimate
    the tile chooser uses; Mosaic's real stack runs ~3x that (routing
    temporaries), so raise the limit to 4x the estimate (100 MB cap) when
    that exceeds the default — and keep the default (None) for the small
    shapes the kernels were originally tuned on."""
    est = 4 * (tile * planes * h * w * 4)
    if est <= 16 * 2**20:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(min(100 * 2**20, est)))


def _tile(instances: int, cin: int, cout: int, h: int, w: int,
          budget_bytes: Optional[int] = None, need_dx: bool = False) -> int:
    """Shared by fwd AND bwd: the PRNG stream is seeded per grid step, so
    both kernels must tile instances identically — size for the bwd's
    larger working set.  Budget is deliberately tight: the bwd at tile=2,
    256^2 measured 16.03 M of the 16 M scoped-vmem limit on v5e (routing
    temporaries dominate), so 256^2 runs at tile=1.  ``need_dx`` adds the
    input-cotangent working set (gx out block + cin accumulator planes +
    3 shifted grad planes) — without it the RND conv2 bwd at [32,4,64,64]
    compiled to a 19.3 M scoped-vmem stack vs the 16 M v5e limit."""
    from .tiling import largest_divisor_tile

    del cout  # channels are processed one at a time; temps are reused
    if budget_bytes is None:
        budget_bytes = TILE_BUDGET_BYTES
    planes = _head_planes(cin, need_dx)
    return largest_divisor_tile(instances, planes * h * w * 4, budget_bytes)


def _head_planes(cin: int, need_dx: bool) -> int:
    planes = cin + 8
    if need_dx:
        planes += 2 * cin + 3
    return planes


def _head_fwd_call(x, w, b, seed, *, pool: int, drop_p: float,
                   interpret: bool, need_dx: bool = False):
    # need_dx only affects the TILE here (fwd and bwd must tile instances
    # identically or the per-grid-step PRNG streams diverge)
    n, cin, h, wd = x.shape
    cout = w.shape[0]
    tile = _tile(n, cin, cout, h, wd, need_dx=need_dx)
    sh = jnp.asarray(_decim_matrix(h, pool))
    sw = jnp.asarray(_decim_matrix(wd, pool))
    kernel = functools.partial(
        _head_fwd_kernel, cout=cout, cin=cin, pool=pool, drop_p=drop_p)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n, cout, h // pool, wd // pool), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // tile,),
            in_specs=[
                pl.BlockSpec((tile, cin, h, wd), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(w.shape, lambda i, *_: (0,) * w.ndim,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cout, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(sh.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(sw.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile, cout, h // pool, wd // pool),
                lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=_compiler_params(
            tile, _head_planes(cin, need_dx), h, wd),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        b.astype(jnp.float32).reshape(cout, 1),
        sh, sw,
    )


def _head_bwd_call(x, w, b, seed, g, *, pool: int, drop_p: float,
                   interpret: bool, need_dx: bool = False):
    n, cin, h, wd = x.shape
    cout = w.shape[0]
    tile = _tile(n, cin, cout, h, wd, need_dx=need_dx)
    sh = jnp.asarray(_decim_matrix(h, pool))
    sw = jnp.asarray(_decim_matrix(wd, pool))
    bh = jnp.asarray(_window_matrix(h, pool))
    bw = jnp.asarray(_window_matrix(wd, pool))
    kernel = functools.partial(
        _head_bwd_kernel, cout=cout, cin=cin, pool=pool, drop_p=drop_p,
        need_dx=need_dx)
    out_shape = [
        jax.ShapeDtypeStruct(w.shape, jnp.float32),
        jax.ShapeDtypeStruct((cout, 1), jnp.float32),
    ]
    out_specs = [
        # SMEM: the grads are accumulated via SCALAR stores, which
        # Mosaic only allows into SMEM (VMEM swap requires vectors)
        pl.BlockSpec(w.shape, lambda i, *_: (0,) * w.ndim,
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((cout, 1), lambda i, *_: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    if need_dx:
        out_shape.append(jax.ShapeDtypeStruct(x.shape, jnp.float32))
        out_specs.append(
            pl.BlockSpec((tile, cin, h, wd), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // tile,),
            in_specs=[
                pl.BlockSpec((tile, cin, h, wd), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(w.shape, lambda i, *_: (0,) * w.ndim,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cout, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(sh.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(sw.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(bh.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(bw.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (tile, cout, h // pool, wd // pool),
                    lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(out_specs),
        ),
        compiler_params=_compiler_params(
            tile, _head_planes(cin, need_dx), h, wd),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        b.astype(jnp.float32).reshape(cout, 1),
        sh, sw, bh, bw,
        g.astype(jnp.float32),
    )
    if need_dx:
        dw, db, gx = outs
        return dw, db.reshape(cout), gx
    dw, db = outs
    return dw, db.reshape(cout), None


@functools.lru_cache(maxsize=None)
def make_fused_head(pool: int, drop_p: float = 0.0, train: bool = False,
                    interpret: bool = False, need_dx: bool = False):
    """Build ``head(x, w, b, seed) -> [N, O, H/pool, W/pool]`` with a custom
    VJP.  With ``need_dx=False`` (first-layer heads) the input cotangent is
    structurally zero and skipped; ``need_dx=True`` computes the true input
    cotangent in the same backward kernel (transpose conv of the routed
    grad), enabling DEEPER fused heads whose inputs carry upstream grads.

    x [N,C,H,W] f32 (zero-padded 3x3 conv), w [O,C,3,3], b [O], seed scalar
    int32 (ignored when ``drop_p == 0`` or ``train`` is False).
    """
    p = drop_p if train else 0.0

    @jax.custom_vjp
    def head(x, w, b, seed):
        return _head_fwd_call(x, w, b, seed, pool=pool, drop_p=p,
                              interpret=interpret, need_dx=need_dx)

    def fwd(x, w, b, seed):
        return head(x, w, b, seed), (x, w, b, seed)

    def bwd(res, g):
        x, w, b, seed = res
        dw, db, gx = _head_bwd_call(x, w, b, seed, g, pool=pool, drop_p=p,
                                    interpret=interpret, need_dx=need_dx)
        if gx is None:
            gx = jnp.zeros_like(x)
        return (gx.astype(x.dtype), dw.astype(w.dtype), db.astype(b.dtype),
                np.zeros((), jax.dtypes.float0))

    head.defvjp(fwd, bwd)
    return head


# ---------------------------------------------------------------------------
# Fused ConvTranspose tails (the AE decoder: deconv s2 k4 p1 + dropout + act)
# ---------------------------------------------------------------------------

def _shift_lanes(x: jax.Array, d: int) -> jax.Array:
    """Lane shift by any |d| <= 3 with zero fill: y[..., j] = x[..., j+d]."""
    t, h, w = x.shape
    if d == 0:
        return x
    if d > 0:
        return jnp.concatenate(
            [x[:, :, d:], jnp.zeros((t, h, d), x.dtype)], axis=2)
    return jnp.concatenate(
        [jnp.zeros((t, h, -d), x.dtype), x[:, :, :w + d]], axis=2)


def _shift2(x: jax.Array, di: int, dj: int) -> jax.Array:
    return _shift_rows(_shift_lanes(x, dj), di)


def _deconv_block(dil, wt_ref, b_ref, o: int, cin: int):
    """One output channel of the stride-2 k4 pad-1 transpose conv from the
    per-channel DILATED planes (zeros interleaved): 16*C shifted MACs.

    out[y, x] = b[o] + sum_c sum_{k in [0,4)^2} wt[c, o, ky, kx]
                * dil[c][y + 1 - ky, x + 1 - kx]
    (torch ConvTranspose2d semantics: y = 2i - pad + ky, pad=1)."""
    t, h2, w2 = dil[0].shape
    acc = jnp.full((t, h2, w2), b_ref[o, 0], jnp.float32)
    for c in range(cin):
        for ky in range(4):
            for kx in range(4):
                tap = _shift2(dil[c], 1 - ky, 1 - kx)
                acc = acc + tap * wt_ref[c, o, ky, kx]
    return acc


def _apply_tail_act(d, act: str):
    if act == "relu":
        return jnp.maximum(d, 0.0)
    return jax.nn.sigmoid(d)


def _tail_fwd_kernel(seed_ref, x_ref, wt_ref, b_ref, uh_ref, uw_ref, out_ref,
                     *, cout: int, cin: int, drop_p: float, act: str):
    pi = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], pi)
    uh, uw = uh_ref[...], uw_ref[...]
    # dilate each input channel to output resolution (exact transpose
    # selection matmuls): D[2i, 2j] = x[i, j]
    dil = [_contract1_t(_contract1_t(x_ref[:, c], uh), uw)
           for c in range(cin)]
    for o in range(cout):
        z = _deconv_block(dil, wt_ref, b_ref, o, cin)
        if drop_p > 0.0:
            keep = _keep_mask(z.shape, drop_p)
            z = jnp.where(keep, z * (1.0 / (1.0 - drop_p)), 0.0)
        out_ref[:, o] = _apply_tail_act(z, act)


def _tail_bwd_kernel(seed_ref, x_ref, wt_ref, b_ref, uh_ref, uw_ref, g_ref,
                     dw_ref, db_ref, gx_ref,
                     *, cout: int, cin: int, drop_p: float, act: str):
    pi = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], pi)
    uh, uw = uh_ref[...], uw_ref[...]

    @pl.when(pi == 0)
    def _init():
        for c in range(cin):
            for o in range(cout):
                for ky in range(4):
                    for kx in range(4):
                        dw_ref[c, o, ky, kx] = 0.0
        for o in range(cout):
            db_ref[o, 0] = 0.0

    dil = [_contract1_t(_contract1_t(x_ref[:, c], uh), uw)
           for c in range(cin)]
    t, hi, wi = x_ref[:, 0].shape
    gx_acc = [jnp.zeros((t, hi, wi), jnp.float32) for _ in range(cin)]
    for o in range(cout):
        z = _deconv_block(dil, wt_ref, b_ref, o, cin)
        if drop_p > 0.0:
            keep = _keep_mask(z.shape, drop_p)
            d = jnp.where(keep, z * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            d = z
        g = g_ref[:, o]
        if act == "relu":
            g_d = jnp.where(d > 0.0, g, 0.0)
        else:
            y = jax.nn.sigmoid(d)
            g_d = g * y * (1.0 - y)
        if drop_p > 0.0:
            g_c = jnp.where(keep, g_d * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            g_c = g_d

        db_ref[o, 0] = db_ref[o, 0] + jnp.sum(g_c)
        # dw[c,o,ky,kx] = sum dil[c][m] * g_c[m - 1 + ky] (both axes):
        # shift g_c by (ky-1, kx-1) and reduce against the dilated input
        for c in range(cin):
            for ky in range(4):
                for kx in range(4):
                    tap = _shift2(g_c, ky - 1, kx - 1)
                    dw_ref[c, o, ky, kx] = (
                        dw_ref[c, o, ky, kx] + jnp.sum(dil[c] * tap)
                    )
        # dx[c][i,j] = sum_k wt[c,o,ky,kx] * g_c[2i-1+ky, 2j-1+kx]:
        # correlation at output res, then exact decimation
        for c in range(cin):
            corr = jnp.zeros_like(g_c)
            for ky in range(4):
                for kx in range(4):
                    corr = corr + wt_ref[c, o, ky, kx] * _shift2(
                        g_c, ky - 1, kx - 1)
            gx_acc[c] = gx_acc[c] + _contract1(_contract1(corr, uh), uw)
    for c in range(cin):
        gx_ref[:, c] = gx_acc[c]


def _tail_tile(instances: int, cin: int, h2: int, w2: int) -> int:
    from .tiling import largest_divisor_tile

    return largest_divisor_tile(instances, (2 * cin + 6) * h2 * w2 * 4,
                                TILE_BUDGET_BYTES)


def _tail_call(x, wt, b, seed, g, *, drop_p: float, act: str,
               interpret: bool, backward: bool):
    n, cin, hi, wi = x.shape
    cout = wt.shape[1]
    h2, w2 = 2 * hi, 2 * wi
    tile = _tail_tile(n, cin, h2, w2)
    uh = jnp.asarray(_decim_matrix(h2, 2))  # [2Hi, Hi]
    uw = jnp.asarray(_decim_matrix(w2, 2))
    common_in = [
        pl.BlockSpec((tile, cin, hi, wi), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wt.shape, lambda i, *_: (0,) * wt.ndim,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cout, 1), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(uh.shape, lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(uw.shape, lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [
        jnp.asarray(seed, jnp.int32).reshape(1),
        x.astype(jnp.float32),
        wt.astype(jnp.float32),
        b.astype(jnp.float32).reshape(cout, 1),
        uh, uw,
    ]
    if not backward:
        return pl.pallas_call(
            functools.partial(_tail_fwd_kernel, cout=cout, cin=cin,
                              drop_p=drop_p, act=act),
            out_shape=jax.ShapeDtypeStruct((n, cout, h2, w2), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n // tile,),
                in_specs=common_in,
                out_specs=pl.BlockSpec(
                    (tile, cout, h2, w2), lambda i, *_: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM),
            ),
            compiler_params=_compiler_params(
                tile, 2 * cin + 6, h2, w2),
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(*args)
    dw, db, gx = pl.pallas_call(
        functools.partial(_tail_bwd_kernel, cout=cout, cin=cin,
                          drop_p=drop_p, act=act),
        out_shape=(
            jax.ShapeDtypeStruct(wt.shape, jnp.float32),
            jax.ShapeDtypeStruct((cout, 1), jnp.float32),
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // tile,),
            in_specs=common_in + [
                pl.BlockSpec((tile, cout, h2, w2), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(wt.shape, lambda i, *_: (0,) * wt.ndim,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((cout, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, cin, hi, wi), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        compiler_params=_compiler_params(
            tile, 2 * cin + 6, h2, w2),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(*args, g.astype(jnp.float32))
    return dw, db.reshape(cout), gx


# ---------------------------------------------------------------------------
# Fused LOSS tail: the AE's final decoder stage + the reconstruction error
# reduction in ONE kernel — the full-resolution recon never touches HBM.
# ---------------------------------------------------------------------------

def _loss_tail_fwd_kernel(seed_ref, x_ref, wt_ref, b_ref, uh_ref, uw_ref,
                          obs_ref, err_ref,
                          *, cout: int, cin: int, drop_p: float, act: str):
    pi = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], pi)
    uh, uw = uh_ref[...], uw_ref[...]
    dil = [_contract1_t(_contract1_t(x_ref[:, c], uh), uw)
           for c in range(cin)]
    tile = x_ref.shape[0]
    totals = [jnp.float32(0.0)] * tile
    for o in range(cout):
        z = _deconv_block(dil, wt_ref, b_ref, o, cin)
        if drop_p > 0.0:
            keep = _keep_mask(z.shape, drop_p)
            z = jnp.where(keep, z * (1.0 / (1.0 - drop_p)), 0.0)
        y = _apply_tail_act(z, act)
        d2 = (_plane_f32(obs_ref[:, o]) - y) ** 2
        for t in range(tile):
            totals[t] = totals[t] + jnp.sum(d2[t])
    for t in range(tile):
        # VMEM vector store of the splatted scalar: a per-instance-tiled
        # SMEM output block ((tile,1) with tile < n) is REJECTED by Mosaic
        # at compile time ("last two dims divisible by 8/128 or equal to
        # the array"), so the error rides out as a [tile,1,128] lane
        # broadcast and the caller slices lane 0
        err_ref[t] = jnp.zeros((1, 128), jnp.float32) + totals[t]


def _loss_tail_bwd_kernel(seed_ref, x_ref, wt_ref, b_ref, uh_ref, uw_ref,
                          obs_ref, gbar_ref, dw_ref, db_ref, gx_ref,
                          *, cout: int, cin: int, drop_p: float, act: str):
    pi = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], pi)
    uh, uw = uh_ref[...], uw_ref[...]

    @pl.when(pi == 0)
    def _init():
        for c in range(cin):
            for o in range(cout):
                for ky in range(4):
                    for kx in range(4):
                        dw_ref[c, o, ky, kx] = 0.0
        for o in range(cout):
            db_ref[o, 0] = 0.0

    dil = [_contract1_t(_contract1_t(x_ref[:, c], uh), uw)
           for c in range(cin)]
    t, hi, wi = x_ref[:, 0].shape
    gx_acc = [jnp.zeros((t, hi, wi), jnp.float32) for _ in range(cin)]
    gbar = gbar_ref[...]  # [tile, 1, 1] — broadcasts like a scalar
    for o in range(cout):
        z = _deconv_block(dil, wt_ref, b_ref, o, cin)
        if drop_p > 0.0:
            keep = _keep_mask(z.shape, drop_p)
            d = jnp.where(keep, z * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            d = z
        y = _apply_tail_act(d, act)
        # err = sum((obs - y)^2)  =>  d err / d y = 2 (y - obs), scaled by
        # the per-instance upstream cotangent
        g = gbar * (2.0 * (y - _plane_f32(obs_ref[:, o])))
        if act == "relu":
            g_d = jnp.where(d > 0.0, g, 0.0)
        else:
            g_d = g * y * (1.0 - y)
        if drop_p > 0.0:
            g_c = jnp.where(keep, g_d * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            g_c = g_d

        db_ref[o, 0] = db_ref[o, 0] + jnp.sum(g_c)
        for c in range(cin):
            for ky in range(4):
                for kx in range(4):
                    tap = _shift2(g_c, ky - 1, kx - 1)
                    dw_ref[c, o, ky, kx] = (
                        dw_ref[c, o, ky, kx] + jnp.sum(dil[c] * tap)
                    )
        for c in range(cin):
            corr = jnp.zeros_like(g_c)
            for ky in range(4):
                for kx in range(4):
                    corr = corr + wt_ref[c, o, ky, kx] * _shift2(
                        g_c, ky - 1, kx - 1)
            gx_acc[c] = gx_acc[c] + _contract1(_contract1(corr, uh), uw)
    for c in range(cin):
        gx_ref[:, c] = gx_acc[c]


def _loss_tail_tile(instances: int, cin: int, cout: int, h2: int,
                    w2: int) -> int:
    from .tiling import largest_divisor_tile

    # existing tail working set + the obs planes + the diff temporary
    return largest_divisor_tile(
        instances, (2 * cin + 7 + cout) * h2 * w2 * 4, TILE_BUDGET_BYTES)


def _loss_tail_call(x, wt, b, obs, seed, gbar, *, drop_p: float, act: str,
                    interpret: bool, backward: bool):
    n, cin, hi, wi = x.shape
    cout = wt.shape[1]
    h2, w2 = 2 * hi, 2 * wi
    tile = _loss_tail_tile(n, cin, cout, h2, w2)
    uh = jnp.asarray(_decim_matrix(h2, 2))
    uw = jnp.asarray(_decim_matrix(w2, 2))
    common_in = [
        pl.BlockSpec((tile, cin, hi, wi), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wt.shape, lambda i, *_: (0,) * wt.ndim,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cout, 1), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(uh.shape, lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(uw.shape, lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, cout, h2, obs.shape[3]),
                     lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [
        jnp.asarray(seed, jnp.int32).reshape(1),
        x.astype(jnp.float32),
        wt.astype(jnp.float32),
        b.astype(jnp.float32).reshape(cout, 1),
        uh, uw,
        obs,  # dtype passthrough: uint8 obs upcast in VMEM (_plane_f32)
    ]
    cp = _compiler_params(tile, 2 * cin + 7 + cout, h2, w2)
    if not backward:
        err = pl.pallas_call(
            functools.partial(_loss_tail_fwd_kernel, cout=cout, cin=cin,
                              drop_p=drop_p, act=act),
            out_shape=jax.ShapeDtypeStruct((n, 1, 128), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n // tile,),
                in_specs=common_in,
                out_specs=pl.BlockSpec((tile, 1, 128),
                                       lambda i, *_: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            compiler_params=cp,
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(*args)
        return err[:, 0, 0]
    dw, db, gx = pl.pallas_call(
        functools.partial(_loss_tail_bwd_kernel, cout=cout, cin=cin,
                          drop_p=drop_p, act=act),
        out_shape=(
            jax.ShapeDtypeStruct(wt.shape, jnp.float32),
            jax.ShapeDtypeStruct((cout, 1), jnp.float32),
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // tile,),
            in_specs=common_in + [
                pl.BlockSpec((tile, 1, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(wt.shape, lambda i, *_: (0,) * wt.ndim,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((cout, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, cin, hi, wi), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        compiler_params=cp,
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(*args, gbar.astype(jnp.float32).reshape(n, 1, 1))
    return dw, db.reshape(cout), gx


@functools.lru_cache(maxsize=None)
def make_fused_loss_tail(act: str, drop_p: float = 0.0, train: bool = False,
                         interpret: bool = False):
    """Build ``loss_tail(x, wt, b, obs, seed) -> err [N]`` — the decoder's
    final stage ``act(dropout(conv_transpose2d(x)))`` FUSED with the
    reconstruction-error reduction ``sum((obs - y)^2)`` over C,H,W, so the
    full-resolution f32 reconstruction never leaves VMEM.

    This removes the dominant per-env HBM transient of fused AE training
    (the [N,1,H,W] recon + its cotangent, ~2 MB/env at 512² — the binder of
    the envs/chip ladder, STATUS r3).  The custom VJP recomputes the recon
    in VMEM from (x, obs, seed) and emits dW, db, and the input cotangent;
    ``obs`` is treated as a constant (zero cotangent — the env observation
    carries no parameter gradients, reference mcl.py:504-512).

    Same PRNG/precision/act conventions as :func:`make_fused_tail`; the
    caller divides by C·H·W for the reference's mean semantics."""
    p = drop_p if train else 0.0

    @jax.custom_vjp
    def loss_tail(x, wt, b, obs, seed):
        return _loss_tail_call(x, wt, b, obs, seed, None, drop_p=p, act=act,
                               interpret=interpret, backward=False)

    def fwd(x, wt, b, obs, seed):
        return loss_tail(x, wt, b, obs, seed), (x, wt, b, obs, seed)

    def bwd(res, gbar):
        x, wt, b, obs, seed = res
        dw, db, gx = _loss_tail_call(x, wt, b, obs, seed, gbar, drop_p=p,
                                     act=act, interpret=interpret,
                                     backward=True)
        gobs = (np.zeros(obs.shape, jax.dtypes.float0)
                if jnp.issubdtype(obs.dtype, jnp.integer)
                else jnp.zeros_like(obs))  # symbolic-zero-ish: DCE'd unused
        return (gx.astype(x.dtype), dw.astype(wt.dtype), db.astype(b.dtype),
                gobs,
                np.zeros((), jax.dtypes.float0))

    loss_tail.defvjp(fwd, bwd)
    return loss_tail


@functools.lru_cache(maxsize=None)
def make_fused_tail(act: str, drop_p: float = 0.0, train: bool = False,
                    interpret: bool = False):
    """Build ``tail(x, wt, b, seed) -> [N, O, 2H, 2W]`` — the AE decoder
    stage ``act(dropout(conv_transpose2d(x)))`` (stride 2, k=4, pad=1,
    torch weight layout [C_in, C_out, 4, 4]) as one Pallas kernel, with a
    full custom VJP (dW, db, and input cotangent — decoders sit mid-net).
    ``act`` is "relu" (deconv1) or "sigmoid" (deconv2, the reconstruction
    output).  Same PRNG/precision conventions as :func:`make_fused_head`."""
    p = drop_p if train else 0.0

    @jax.custom_vjp
    def tail(x, wt, b, seed):
        return _tail_call(x, wt, b, seed, None, drop_p=p, act=act,
                          interpret=interpret, backward=False)

    def fwd(x, wt, b, seed):
        return tail(x, wt, b, seed), (x, wt, b, seed)

    def bwd(res, g):
        x, wt, b, seed = res
        dw, db, gx = _tail_call(x, wt, b, seed, g, drop_p=p, act=act,
                                interpret=interpret, backward=True)
        return (gx.astype(x.dtype), dw.astype(wt.dtype), db.astype(b.dtype),
                np.zeros((), jax.dtypes.float0))

    tail.defvjp(fwd, bwd)
    return tail


# ---------------------------------------------------------------------------
# Fused two-stage ENCODER: conv3x3+dropout+relu+pool TWICE in one kernel.
# ---------------------------------------------------------------------------
#
# The wrapper nets' whole encoder (reference mcl.py:257-279 predictor /
# mcl.py:452-460 AE encoder) runs as ONE pallas_call.  Why this exists: with
# the two-kernel composition the stage-1 activations are a custom-VJP
# residual of stage 2 ([N,4,H/p1,W/p1] f32 — 1 MB/env at 512²) and stage 2's
# backward emits an input cotangent of the same size; together with the f32
# observation they were the measured HBM binders of the 512² envs/chip
# ladder (OOM accounting r4: 3 x 6 GB at 6144 envs).  Here the backward
# kernel RECOMPUTES stage 1 in VMEM (bit-identical dropout via a PRNG
# replay: the stream is reseeded and redrawn in forward order), so the only
# residual is the (uint8) observation itself and nothing inter-stage ever
# touches HBM.


def _enc_stage(taps, w_ref, b_ref, o, cin, pool, sh, sw, drop_p,
               rmask=None, wchunks=1):
    """One output channel of conv+dropout+relu+pool from hoisted taps.
    ``rmask`` ([H/pool, 1], broadcast over lanes) zeroes pooled rows that
    lie OUTSIDE the global universe: a halo'd spatial shard's
    out-of-globe rows are zero CELLS, whose stage-1 activation would be
    relu(bias) — but the global function zero-pads stage 2 with true
    zeros (parallel/spatial_heads.py)."""
    z = _conv_block(taps, w_ref, b_ref, o, cin)
    if drop_p > 0.0:
        keep = _keep_mask(z.shape, drop_p)
        z = _apply_drop_relu(z, keep, drop_p)
    else:
        z = jnp.maximum(z, 0.0)
    out = _decimate(_window_max(z, pool), sh, sw, wchunks)
    if rmask is not None:
        out = out * rmask
    return out


def _enc_fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    sh1_ref, sw1_ref, sh2_ref, sw2_ref, m1_ref, out_ref,
                    *, c1: int, c2: int, cin: int, p1: int, p2: int,
                    drop_p: float, wchunks: int = 1):
    pi = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], pi)
    sh1, sw1 = sh1_ref[...], sw1_ref[...]
    sh2, sw2 = sh2_ref[...], sw2_ref[...]
    m1 = m1_ref[...]
    taps0 = _tap_planes(x_ref, cin)
    # PRNG draw order (replayed by the backward): keep1_0..keep1_{c1-1}
    # at full res, then keep2_0..keep2_{c2-1} at 1/p1 res
    x1 = [_enc_stage(taps0, w1_ref, b1_ref, o, cin, p1, sh1, sw1, drop_p,
                     m1, wchunks)
          for o in range(c1)]
    taps1 = [_taps_of(p) for p in x1]
    for o in range(c2):
        out_ref[:, o] = _enc_stage(taps1, w2_ref, b2_ref, o, c1, p2,
                                   sh2, sw2, drop_p, None, wchunks)


def _pool_route(a, g_pooled, pool, sh, sw, bh, bw, wchunks=1):
    """Route a pooled-resolution grad back through the window max over
    ``a`` (reduce-max VJP semantics: ties share equally — same convention
    as the single-stage head kernels)."""
    m_dec = _decimate(_window_max(a, pool), sh, sw, wchunks)
    mb = _contract1_t(_contract1_t(m_dec, bh), bw, wchunks)
    eqf = jnp.where(a == mb, 1.0, 0.0)
    cnt = _contract1(_contract1(eqf, bh), bw, wchunks)
    gb = _contract1_t(_contract1_t(g_pooled / cnt, bh), bw, wchunks)
    return gb * eqf


def _enc_bwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    sh1_ref, sw1_ref, sh2_ref, sw2_ref, m1_ref,
                    bh1_ref, bw1_ref, bh2_ref, bw2_ref, g_ref,
                    dw1_ref, db1_ref, dw2_ref, db2_ref,
                    *, c1: int, c2: int, cin: int, p1: int, p2: int,
                    drop_p: float, wchunks: int = 1):
    pi = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], pi)
    sh1, sw1 = sh1_ref[...], sw1_ref[...]
    sh2, sw2 = sh2_ref[...], sw2_ref[...]
    m1 = m1_ref[...]
    bh1, bw1 = bh1_ref[...], bw1_ref[...]
    bh2, bw2 = bh2_ref[...], bw2_ref[...]

    @pl.when(pi == 0)
    def _init():
        # SMEM accepts scalar stores only — unrolled zero-init
        for o in range(c1):
            db1_ref[o, 0] = 0.0
            for c in range(cin):
                for dy in range(3):
                    for dx in range(3):
                        dw1_ref[o, c, dy, dx] = 0.0
        for o in range(c2):
            db2_ref[o, 0] = 0.0
            for c in range(c1):
                for dy in range(3):
                    for dx in range(3):
                        dw2_ref[o, c, dy, dx] = 0.0

    taps0 = _tap_planes(x_ref, cin)
    # stage-1 recompute, RETAINING each channel's pre-relu plane and keep
    # mask for the stage-1 backward below (costs 2·c1 planes of VMEM but
    # saves a full second stage-1 recompute + PRNG replay — measured ~20%
    # of the 256² training step when this was replay-based)
    x1, d1s, keeps1 = [], [], []
    for o in range(c1):
        z1 = _conv_block(taps0, w1_ref, b1_ref, o, cin)
        if drop_p > 0.0:
            keep1 = _keep_mask(z1.shape, drop_p)
            d1 = jnp.where(keep1, z1 * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            keep1, d1 = None, z1
        d1s.append(d1)
        keeps1.append(keep1)
        x1.append(_decimate(_window_max(jnp.maximum(d1, 0.0), p1),
                            sh1, sw1, wchunks) * m1)
    taps1 = [_taps_of(p) for p in x1]
    t, h1, w1d = x1[0].shape
    gx1 = [jnp.zeros((t, h1, w1d), jnp.float32) for _ in range(c1)]
    for o in range(c2):
        z2 = _conv_block(taps1, w2_ref, b2_ref, o, c1)
        if drop_p > 0.0:
            keep2 = _keep_mask(z2.shape, drop_p)
            d2 = jnp.where(keep2, z2 * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            d2 = z2
        a2 = jnp.maximum(d2, 0.0)
        g_z2 = _pool_route(a2, g_ref[:, o], p2, sh2, sw2, bh2, bw2,
                           wchunks)
        g_d2 = jnp.where(d2 > 0.0, g_z2, 0.0)
        if drop_p > 0.0:
            g_c2 = jnp.where(keep2, g_d2 * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            g_c2 = g_d2
        db2_ref[o, 0] = db2_ref[o, 0] + jnp.sum(g_c2)
        for c in range(c1):
            for dy in range(3):
                for dx in range(3):
                    tap = _shift_rows(taps1[c][dx], dy - 1)
                    dw2_ref[o, c, dy, dx] = (
                        dw2_ref[o, c, dy, dx] + jnp.sum(tap * g_c2)
                    )
        gt = _grad_taps(g_c2)
        for c in range(c1):
            acc = gx1[c]
            for dy in range(3):
                for dx in range(3):
                    acc = acc + _shift_rows(gt[dx], 1 - dy) * w2_ref[o, c,
                                                                     dy, dx]
            gx1[c] = acc

    # stage-1 backward from the RETAINED pre-act/mask planes (no replay,
    # no second recompute)
    for o in range(c1):
        d1 = d1s[o]
        a1 = jnp.maximum(d1, 0.0)
        # the true gradient through the hard row mask is zero
        g_z1 = _pool_route(a1, gx1[o] * m1, p1, sh1, sw1, bh1, bw1,
                           wchunks)
        g_d1 = jnp.where(d1 > 0.0, g_z1, 0.0)
        if drop_p > 0.0:
            g_c1 = jnp.where(keeps1[o], g_d1 * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            g_c1 = g_d1
        db1_ref[o, 0] = db1_ref[o, 0] + jnp.sum(g_c1)
        for c in range(cin):
            for dy in range(3):
                for dx in range(3):
                    tap = _shift_rows(taps0[c][dx], dy - 1)
                    dw1_ref[o, c, dy, dx] = (
                        dw1_ref[o, c, dy, dx] + jnp.sum(tap * g_c1)
                    )


ENC_TILE_BUDGET_BYTES = 12 * 2**20  # tile=2 at 256² (the heads' tile=2 was
                                    # ~8% over tile=1 there; the scoped-vmem
                                    # limit scales with the estimate below)


def _enc_bytes_per_inst(cin: int, c1: int, h: int, w: int, p1: int) -> int:
    """Working-set estimate: input taps + stage-1 temporaries + the bwd's
    RETAINED pre-act/mask planes (2·c1) at full res, pooled
    planes/taps/grads + stage-2 temporaries at 1/p1² res."""
    return int((3 * cin + 4 + 2 * c1) * h * w * 4
               + (4 * c1 + 12) * (h // p1) * (w // p1) * 4)


def _enc_tile(instances: int, cin: int, c1: int, h: int, w: int,
              p1: int, factor: int = 4) -> int:
    from .tiling import largest_divisor_tile

    return largest_divisor_tile(
        instances, _enc_bytes_per_inst(cin, c1, h, w, p1) * factor // 4,
        ENC_TILE_BUDGET_BYTES)


def _enc_compiler_params(tile: int, cin: int, c1: int, h: int, w: int,
                         p1: int, factor: int = 4):
    est = factor * tile * _enc_bytes_per_inst(cin, c1, h, w, p1)
    if est <= 16 * 2**20:
        return None
    # banded (factor-10) calls may legitimately need >100 MB of stack at
    # huge W (measured 105.9 MB at 8192 lanes, hb=16); v5e has 128 MB
    # physical — cap with room for the in/out windows
    cap = (112 if factor > 4 else 100) * 2**20
    return pltpu.CompilerParams(vmem_limit_bytes=int(min(cap, est)))


def _enc_call(x, w1, b1, w2, b2, seed, mask, g, *, p1: int, p2: int,
              drop_p: float, interpret: bool, backward: bool):
    n, cin, h, wx = x.shape
    # uint32 input = the PACKED universe (32 cells/word, expanded to cell
    # planes inside the kernel by _plane_f32/_expand_packed)
    wd = wx * 32 if x.dtype == jnp.uint32 else wx
    c1 = w1.shape[0]
    c2 = w2.shape[0]
    # banded calls (per-instance masks) carry wide short blocks whose real
    # Mosaic stack runs well past the 4x live-plane model (same finding as
    # the banded decoder-loss: ~5-7x measured at 2048² bands)
    factor = 10 if mask.ndim == 3 else 4
    tile = _enc_tile(n, cin, c1, h, wd, p1, factor)
    h1, w1d = h // p1, wd // p1
    ho, wo = h1 // p2, w1d // p2
    # O(W²) pool matrices are fatal at huge W (8192: 64 MB VMEM + register
    # spills) — switch to per-chunk shared blocks (see DECIM_CHUNK)
    wchunks = (wd // DECIM_CHUNK
               if wd > DECIM_CHUNK and wd % DECIM_CHUNK == 0 else 1)
    w_mat = wd if wchunks == 1 else DECIM_CHUNK
    sh1 = jnp.asarray(_decim_matrix(h, p1))
    sw1 = jnp.asarray(_decim_matrix(w_mat, p1))
    sh2 = jnp.asarray(_decim_matrix(h1, p2))
    sw2 = jnp.asarray(_decim_matrix(w_mat // p1, p2))
    common_in = [
        pl.BlockSpec((tile, cin, h, wx), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w1.shape, lambda i, *_: (0,) * w1.ndim,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c1, 1), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w2.shape, lambda i, *_: (0,) * w2.ndim,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c2, 1), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # the stage-1 row-validity mask may be SHARED ([h1, 1] — the spatial
    # tier, all shards same pattern) or PER-INSTANCE ([n, h1, 1] — the
    # band tiling, where only the first/last band has out-of-globe rows).
    # The kernel body broadcasts either shape over [t, h1, w1d] unchanged.
    if mask.ndim == 3:
        mask_arg = mask.astype(jnp.float32).reshape(n, h1, 1)
        mask_spec = pl.BlockSpec((tile, h1, 1), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_arg = mask.astype(jnp.float32).reshape(h1, 1)
        mask_spec = pl.BlockSpec((h1, 1), lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM)
    common_in = common_in + [
        pl.BlockSpec(m.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
        for m in (sh1, sw1, sh2, sw2)
    ] + [mask_spec]
    args = [
        jnp.asarray(seed, jnp.int32).reshape(1),
        x,  # dtype passthrough: uint8 obs upcast in VMEM (_plane_f32)
        w1.astype(jnp.float32),
        b1.astype(jnp.float32).reshape(c1, 1),
        w2.astype(jnp.float32),
        b2.astype(jnp.float32).reshape(c2, 1),
        sh1, sw1, sh2, sw2,
        mask_arg,
    ]
    cp = _enc_compiler_params(tile, cin, c1, h, wd, p1, factor)
    if not backward:
        return pl.pallas_call(
            functools.partial(_enc_fwd_kernel, c1=c1, c2=c2, cin=cin,
                              p1=p1, p2=p2, drop_p=drop_p,
                              wchunks=wchunks),
            out_shape=jax.ShapeDtypeStruct((n, c2, ho, wo), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n // tile,),
                in_specs=common_in,
                out_specs=pl.BlockSpec(
                    (tile, c2, ho, wo), lambda i, *_: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM),
            ),
            compiler_params=cp,
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(*args)
    bh1 = jnp.asarray(_window_matrix(h, p1))
    bw1 = jnp.asarray(_window_matrix(w_mat, p1))
    bh2 = jnp.asarray(_window_matrix(h1, p2))
    bw2 = jnp.asarray(_window_matrix(w_mat // p1, p2))
    dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_enc_bwd_kernel, c1=c1, c2=c2, cin=cin,
                          p1=p1, p2=p2, drop_p=drop_p, wchunks=wchunks),
        out_shape=(
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct((c1, 1), jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct((c2, 1), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // tile,),
            in_specs=common_in + [
                pl.BlockSpec(m.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM)
                for m in (bh1, bw1, bh2, bw2)
            ] + [
                pl.BlockSpec((tile, c2, ho, wo), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(w1.shape, lambda i, *_: (0,) * w1.ndim,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((c1, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(w2.shape, lambda i, *_: (0,) * w2.ndim,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((c2, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
        ),
        compiler_params=cp,
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(*args, bh1, bw1, bh2, bw2, g.astype(jnp.float32))
    return dw1, db1.reshape(c1), dw2, db2.reshape(c2)


@functools.lru_cache(maxsize=None)
def make_fused_encoder(p1: int, p2: int, drop_p: float = 0.0,
                       train: bool = False, interpret: bool = False):
    """Build ``encoder(x, w1, b1, w2, b2, seed, mask) -> [N, C2, H/(p1·p2),
    W/(p1·p2)]`` — BOTH conv+dropout+relu+pool stages of a wrapper-net
    encoder as one Pallas kernel with a custom VJP.  ``mask`` is the
    [H/p1, 1] stage-1 row-validity plane (all ones off the spatial tier;
    spatial shards zero their out-of-globe halo rows so stage 2 sees the
    global function's zero padding instead of relu(bias) phantoms).

    ``x`` may be uint8 (the raw observation — upcast to f32 in VMEM) or
    f32.  The input cotangent is structurally zero (encoders are the first
    layers; the observation carries no parameter gradients, reference
    mcl.py:343-352) and is skipped.  The backward kernel recomputes both
    stages in VMEM with bit-identical dropout (PRNG replay via reseed), so
    the only cross-pass residual is ``x`` itself: the stage-1 activation
    and its cotangent — 2 x 1 MB/env at 512² under the two-kernel
    composition — never exist in HBM.
    """
    p = drop_p if train else 0.0

    @jax.custom_vjp
    def encoder(x, w1, b1, w2, b2, seed, mask):
        return _enc_call(x, w1, b1, w2, b2, seed, mask, None, p1=p1, p2=p2,
                         drop_p=p, interpret=interpret, backward=False)

    def fwd(x, w1, b1, w2, b2, seed, mask):
        return (encoder(x, w1, b1, w2, b2, seed, mask),
                (x, w1, b1, w2, b2, seed, mask))

    def bwd(res, g):
        x, w1, b1, w2, b2, seed, mask = res
        dw1, db1, dw2, db2 = _enc_call(
            x, w1, b1, w2, b2, seed, mask, g, p1=p1, p2=p2, drop_p=p,
            interpret=interpret, backward=True)
        gx = (np.zeros(x.shape, jax.dtypes.float0)
              if jnp.issubdtype(x.dtype, jnp.integer)
              else jnp.zeros_like(x))
        return (gx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
                dw2.astype(w2.dtype), db2.astype(b2.dtype),
                np.zeros((), jax.dtypes.float0), jnp.zeros_like(mask))

    encoder.defvjp(fwd, bwd)
    return encoder


# ---------------------------------------------------------------------------
# Fused two-stage DECODER + loss: deconv1 + deconv2 + error in ONE kernel.
# ---------------------------------------------------------------------------
#
# make_fused_loss_tail already keeps the full-resolution reconstruction out
# of HBM; this goes one stage deeper and keeps the MID-resolution decoder
# activation (deconv1's output and its cotangent — 2 x 256 KB/env at 512²,
# the next binders after the encoder work) in VMEM too.  With
# encoder + decoder_loss the AE's only cross-pass residuals are the uint8
# obs and the tiny pooled embedding.


def _dl_forward(x_ref, wt1_ref, b1_ref, wt2_ref, b2_ref, uh1, uw1, uh2, uw2,
                cin: int, cmid: int, cout: int, drop_p: float,
                wchunks: int = 1):
    """Both decoder stages; returns (mid activations, keepA list, pre-act
    d2 list, keepB list, y list) — everything the backward needs, retained
    in VMEM (no PRNG replay: two stages' masks coexist cheaply)."""
    return _dl_forward_planes(
        [_plane_f32(x_ref[:, i]) for i in range(cin)],
        wt1_ref, b1_ref, wt2_ref, b2_ref, uh1, uw1, uh2, uw2,
        cmid, cout, drop_p, wchunks)


def _dl_forward_planes(planes, wt1_ref, b1_ref, wt2_ref, b2_ref,
                       uh1, uw1, uh2, uw2,
                       cmid: int, cout: int, drop_p: float,
                       wchunks: int = 1):
    """:func:`_dl_forward` from embedding PLANES already living in VMEM —
    the whole-AE kernel hands the encoder's output straight in without an
    x_ref (the embedding never exists outside the kernel).  ``wchunks``
    chunks the W-axis dilation contractions against shared diagonal
    blocks (the O(W²) matrices again — see DECIM_CHUNK)."""
    cin = len(planes)
    dil1 = [_contract1_t(_contract1_t(p, uh1), uw1, wchunks)
            for p in planes]
    mids, keepsA = [], []
    for m in range(cmid):
        z = _deconv_block(dil1, wt1_ref, b1_ref, m, cin)
        if drop_p > 0.0:
            keep = _keep_mask(z.shape, drop_p)
            d = jnp.where(keep, z * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            keep, d = None, z
        keepsA.append(keep)
        mids.append(jnp.maximum(d, 0.0))
    # dilate the mid activations for stage B
    t = mids[0].shape[0]
    dil2 = [_contract1_t(_contract1_t(a, uh2), uw2, wchunks) for a in mids]
    outs = []
    for o in range(cout):
        z = _deconv_block(dil2, wt2_ref, b2_ref, o, cmid)
        if drop_p > 0.0:
            keep = _keep_mask(z.shape, drop_p)
            d = jnp.where(keep, z * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            keep, d = None, z
        outs.append((keep, d, jax.nn.sigmoid(d)))
    return dil1, mids, keepsA, dil2, outs


def _decoder_loss_fwd_kernel(seed_ref, x_ref, wt1_ref, b1_ref, wt2_ref,
                             b2_ref, uh1_ref, uw1_ref, uh2_ref, uw2_ref,
                             em_ref, obs_ref, err_ref,
                             *, cin: int, cmid: int, cout: int,
                             drop_p: float, wchunks: int = 1):
    pi = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], pi)
    uh1, uw1 = uh1_ref[...], uw1_ref[...]
    uh2, uw2 = uh2_ref[...], uw2_ref[...]
    em = em_ref[...]  # [h4, 1] error row weights (band tiling zeroes the
    # halo-contaminated/overlap rows; ones elsewhere)
    _, _, _, _, outs = _dl_forward(
        x_ref, wt1_ref, b1_ref, wt2_ref, b2_ref, uh1, uw1, uh2, uw2,
        cin, cmid, cout, drop_p, wchunks)
    tile = x_ref.shape[0]
    totals = [jnp.float32(0.0)] * tile
    for o, (_, _, y) in enumerate(outs):
        d2 = em * (_plane_f32(obs_ref[:, o]) - y) ** 2
        for t in range(tile):
            totals[t] = totals[t] + jnp.sum(d2[t])
    for t in range(tile):
        # VMEM lane broadcast (see _loss_tail_fwd_kernel)
        err_ref[t] = jnp.zeros((1, 128), jnp.float32) + totals[t]


def _decoder_loss_bwd_kernel(seed_ref, x_ref, wt1_ref, b1_ref, wt2_ref,
                             b2_ref, uh1_ref, uw1_ref, uh2_ref, uw2_ref,
                             em_ref, obs_ref, gbar_ref,
                             dw1_ref, db1_ref, dw2_ref, db2_ref, gx_ref,
                             *, cin: int, cmid: int, cout: int,
                             drop_p: float, wchunks: int = 1):
    pi = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], pi)
    uh1, uw1 = uh1_ref[...], uw1_ref[...]
    uh2, uw2 = uh2_ref[...], uw2_ref[...]
    em = em_ref[...]

    @pl.when(pi == 0)
    def _init():
        for c in range(cin):
            for m in range(cmid):
                for ky in range(4):
                    for kx in range(4):
                        dw1_ref[c, m, ky, kx] = 0.0
        for m in range(cmid):
            db1_ref[m, 0] = 0.0
            for o in range(cout):
                for ky in range(4):
                    for kx in range(4):
                        dw2_ref[m, o, ky, kx] = 0.0
        for o in range(cout):
            db2_ref[o, 0] = 0.0

    dil1, mids, keepsA, dil2, outs = _dl_forward(
        x_ref, wt1_ref, b1_ref, wt2_ref, b2_ref, uh1, uw1, uh2, uw2,
        cin, cmid, cout, drop_p, wchunks)
    gbar = gbar_ref[...]  # [tile, 1, 1]

    # --- stage B backward: err -> y -> d -> (dw2, db2, g_mid) -------------
    t, hm, wm = mids[0].shape
    g_mid = [jnp.zeros((t, hm, wm), jnp.float32) for _ in range(cmid)]
    for o, (keepB, d, y) in enumerate(outs):
        g = gbar * em * (2.0 * (y - _plane_f32(obs_ref[:, o])))
        g_d = g * y * (1.0 - y)  # sigmoid'
        if drop_p > 0.0:
            g_c = jnp.where(keepB, g_d * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            g_c = g_d
        db2_ref[o, 0] = db2_ref[o, 0] + jnp.sum(g_c)
        for m in range(cmid):
            for ky in range(4):
                for kx in range(4):
                    tap = _shift2(g_c, ky - 1, kx - 1)
                    dw2_ref[m, o, ky, kx] = (
                        dw2_ref[m, o, ky, kx] + jnp.sum(dil2[m] * tap)
                    )
        for m in range(cmid):
            corr = jnp.zeros_like(g_c)
            for ky in range(4):
                for kx in range(4):
                    corr = corr + wt2_ref[m, o, ky, kx] * _shift2(
                        g_c, ky - 1, kx - 1)
            g_mid[m] = g_mid[m] + _contract1(_contract1(corr, uh2), uw2,
                                             wchunks)

    # --- stage A backward: g_mid -> relu/drop -> (dw1, db1, gx) -----------
    t, hi, wi = x_ref[:, 0].shape if x_ref.ndim == 4 else x_ref.shape
    gx_acc = [jnp.zeros((t, hi, wi), jnp.float32) for _ in range(cin)]
    for m in range(cmid):
        # mids[m] = relu(dropA) — relu' via the activation (a > 0)
        g_a = jnp.where(mids[m] > 0.0, g_mid[m], 0.0)
        if drop_p > 0.0:
            g_c = jnp.where(keepsA[m], g_a * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            g_c = g_a
        db1_ref[m, 0] = db1_ref[m, 0] + jnp.sum(g_c)
        for c in range(cin):
            for ky in range(4):
                for kx in range(4):
                    tap = _shift2(g_c, ky - 1, kx - 1)
                    dw1_ref[c, m, ky, kx] = (
                        dw1_ref[c, m, ky, kx] + jnp.sum(dil1[c] * tap)
                    )
        for c in range(cin):
            corr = jnp.zeros_like(g_c)
            for ky in range(4):
                for kx in range(4):
                    corr = corr + wt1_ref[c, m, ky, kx] * _shift2(
                        g_c, ky - 1, kx - 1)
            gx_acc[c] = gx_acc[c] + _contract1(_contract1(corr, uh1), uw1,
                                               wchunks)
    for c in range(cin):
        gx_ref[:, c] = gx_acc[c]


def _dl_bytes_per_inst(cin: int, cmid: int, h4: int, w4: int) -> int:
    """Working set: stage-B planes at full output res dominate (~6),
    stage-A/dilation planes at half res (~(2·cin + 3·cmid))."""
    return int(6 * h4 * w4 * 4
               + (2 * cin + 3 * cmid + 4) * (h4 // 2) * (w4 // 2) * 4)


def _decoder_loss_call(x, wt1, b1, wt2, b2, obs, seed, gbar, *,
                       drop_p: float, interpret: bool, backward: bool,
                       em=None):
    n, cin, hi, wi = x.shape
    cmid = wt1.shape[1]
    cout = wt2.shape[1]
    h2, w2 = 2 * hi, 2 * wi
    h4, w4 = 4 * hi, 4 * wi
    if em is None:
        em = jnp.ones((h4, 1), jnp.float32)
    # Banded (per-instance-em) calls carry wide short blocks (h4 << w4 =
    # full W): Mosaic's real backward stack measured ~10x the
    # _dl_bytes_per_inst model there (54.4 MB vs a 5.7 MB estimate at
    # 2048² bands — the model's live-plane count calibrates on square
    # shapes).  Budget tiles and the scoped-vmem limit accordingly.
    factor = 10 if em.ndim == 3 else 4
    from .tiling import largest_divisor_tile

    tile = largest_divisor_tile(
        n, _dl_bytes_per_inst(cin, cmid, h4, w4) * factor // 4,
        TILE_BUDGET_BYTES)
    # O(W²) dilation matrices chunk against shared diagonal blocks at
    # huge W, exactly like the encoder's pool matrices (DECIM_CHUNK);
    # the emb-width chunk unit is DECIM_CHUNK/4 so the dilated stages'
    # chunks land on the same lane scale
    unit = DECIM_CHUNK // 4
    wchunks = (wi // unit if wi > unit and wi % unit == 0 else 1)
    wm = wi if wchunks == 1 else unit
    uh1 = jnp.asarray(_decim_matrix(h2, 2))
    uw1 = jnp.asarray(_decim_matrix(2 * wm, 2))
    uh2 = jnp.asarray(_decim_matrix(h4, 2))
    uw2 = jnp.asarray(_decim_matrix(4 * wm, 2))
    common_in = [
        pl.BlockSpec((tile, cin, hi, wi), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wt1.shape, lambda i, *_: (0,) * wt1.ndim,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cmid, 1), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wt2.shape, lambda i, *_: (0,) * wt2.ndim,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cout, 1), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # the error row-weight may be SHARED ([h4, 1]) or PER-INSTANCE
    # ([n, h4, 1] — band tiling: clamped windows sit at different offsets
    # within edge bands).  Kernel body broadcasts either shape.
    if em.ndim == 3:
        em_arg = em.astype(jnp.float32).reshape(n, h4, 1)
        em_spec = pl.BlockSpec((tile, h4, 1), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        em_arg = em.astype(jnp.float32).reshape(h4, 1)
        em_spec = pl.BlockSpec((h4, 1), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)
    common_in = common_in + [
        pl.BlockSpec(m.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
        for m in (uh1, uw1, uh2, uw2)
    ] + [
        em_spec,
        # obs may be PACKED (u32, last dim W/32): block follows its shape
        pl.BlockSpec((tile, cout, h4, obs.shape[3]),
                     lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [
        jnp.asarray(seed, jnp.int32).reshape(1),
        x.astype(jnp.float32),
        wt1.astype(jnp.float32),
        b1.astype(jnp.float32).reshape(cmid, 1),
        wt2.astype(jnp.float32),
        b2.astype(jnp.float32).reshape(cout, 1),
        uh1, uw1, uh2, uw2,
        em_arg,
        obs,  # dtype passthrough: uint8 upcast in VMEM
    ]
    est = factor * tile * _dl_bytes_per_inst(cin, cmid, h4, w4)
    cp = (None if est <= 16 * 2**20 else
          pltpu.CompilerParams(vmem_limit_bytes=int(min(100 * 2**20, est))))
    if not backward:
        err = pl.pallas_call(
            functools.partial(_decoder_loss_fwd_kernel, cin=cin, cmid=cmid,
                              cout=cout, drop_p=drop_p, wchunks=wchunks),
            out_shape=jax.ShapeDtypeStruct((n, 1, 128), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n // tile,),
                in_specs=common_in,
                out_specs=pl.BlockSpec((tile, 1, 128),
                                       lambda i, *_: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            compiler_params=cp,
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(*args)
        return err[:, 0, 0]
    dw1, db1, dw2, db2, gx = pl.pallas_call(
        functools.partial(_decoder_loss_bwd_kernel, cin=cin, cmid=cmid,
                          cout=cout, drop_p=drop_p, wchunks=wchunks),
        out_shape=(
            jax.ShapeDtypeStruct(wt1.shape, jnp.float32),
            jax.ShapeDtypeStruct((cmid, 1), jnp.float32),
            jax.ShapeDtypeStruct(wt2.shape, jnp.float32),
            jax.ShapeDtypeStruct((cout, 1), jnp.float32),
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // tile,),
            in_specs=common_in + [
                pl.BlockSpec((tile, 1, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(wt1.shape, lambda i, *_: (0,) * wt1.ndim,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((cmid, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(wt2.shape, lambda i, *_: (0,) * wt2.ndim,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((cout, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, cin, hi, wi), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        compiler_params=cp,
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(*args, gbar.astype(jnp.float32).reshape(n, 1, 1))
    return dw1, db1.reshape(cmid), dw2, db2.reshape(cout), gx


@functools.lru_cache(maxsize=None)
def make_fused_decoder_loss(drop_p: float = 0.0, train: bool = False,
                            interpret: bool = False):
    """Build ``decoder_loss(x, wt1, b1, wt2, b2, obs, seed) -> err [N]`` —
    the AE decoder's BOTH transpose-conv stages (deconv1 relu, deconv2
    sigmoid — reference mcl.py:461-467) fused with the reconstruction-error
    reduction.  Beyond :func:`make_fused_loss_tail`, the mid-resolution
    decoder activation and its cotangent also never leave VMEM: with the
    fused encoder the AE's only cross-pass residuals are the uint8 obs and
    the pooled embedding.  ``obs`` may be uint8; the caller divides by
    C·H·W for the reference's mean semantics."""
    p = drop_p if train else 0.0

    @jax.custom_vjp
    def decoder_loss(x, wt1, b1, wt2, b2, obs, seed):
        return _decoder_loss_call(x, wt1, b1, wt2, b2, obs, seed, None,
                                  drop_p=p, interpret=interpret,
                                  backward=False)

    def fwd(x, wt1, b1, wt2, b2, obs, seed):
        return (decoder_loss(x, wt1, b1, wt2, b2, obs, seed),
                (x, wt1, b1, wt2, b2, obs, seed))

    def bwd(res, gbar):
        x, wt1, b1, wt2, b2, obs, seed = res
        dw1, db1, dw2, db2, gx = _decoder_loss_call(
            x, wt1, b1, wt2, b2, obs, seed, gbar, drop_p=p,
            interpret=interpret, backward=True)
        gobs = (np.zeros(obs.shape, jax.dtypes.float0)
                if jnp.issubdtype(obs.dtype, jnp.integer)
                else jnp.zeros_like(obs))
        return (gx.astype(x.dtype), dw1.astype(wt1.dtype),
                db1.astype(b1.dtype), dw2.astype(wt2.dtype),
                db2.astype(b2.dtype), gobs,
                np.zeros((), jax.dtypes.float0))

    decoder_loss.defvjp(fwd, bwd)
    return decoder_loss


@functools.lru_cache(maxsize=None)
def make_fused_decoder_loss_banded(drop_p: float = 0.0, train: bool = False,
                                   interpret: bool = False):
    """:func:`make_fused_decoder_loss` with an explicit error ROW-WEIGHT
    input: ``decoder_loss(x, wt1, b1, wt2, b2, obs, seed, em) -> err [N]``
    where ``em`` is [4·Hi, 1] f32 multiplying the squared error per output
    row (and scaling the backward identically).  The band tiling
    (parallel/band_heads.py) zeroes the halo-contaminated/overlap rows so
    per-band errors sum to the exact global loss; ``em`` of ones recovers
    the plain kernel bit-for-bit."""
    p = drop_p if train else 0.0

    @jax.custom_vjp
    def decoder_loss(x, wt1, b1, wt2, b2, obs, seed, em):
        return _decoder_loss_call(x, wt1, b1, wt2, b2, obs, seed, None,
                                  drop_p=p, interpret=interpret,
                                  backward=False, em=em)

    def fwd(x, wt1, b1, wt2, b2, obs, seed, em):
        return (decoder_loss(x, wt1, b1, wt2, b2, obs, seed, em),
                (x, wt1, b1, wt2, b2, obs, seed, em))

    def bwd(res, gbar):
        x, wt1, b1, wt2, b2, obs, seed, em = res
        dw1, db1, dw2, db2, gx = _decoder_loss_call(
            x, wt1, b1, wt2, b2, obs, seed, gbar, drop_p=p,
            interpret=interpret, backward=True, em=em)
        gobs = (np.zeros(obs.shape, jax.dtypes.float0)
                if jnp.issubdtype(obs.dtype, jnp.integer)
                else jnp.zeros_like(obs))
        return (gx.astype(x.dtype), dw1.astype(wt1.dtype),
                db1.astype(b1.dtype), dw2.astype(wt2.dtype),
                db2.astype(b2.dtype), gobs,
                np.zeros((), jax.dtypes.float0), jnp.zeros_like(em))

    decoder_loss.defvjp(fwd, bwd)
    return decoder_loss


# ---------------------------------------------------------------------------
# Whole-AE: encoder + decoder + reconstruction loss in ONE kernel.
# ---------------------------------------------------------------------------
#
# The r4 HLO buffer census at the 512² envs/chip ceiling (STATUS r4,
# assets/ladder512_r04.jsonl) showed six f32[n, 2, 128, 128] copies of the
# AE EMBEDDING (conv_encoder's output, conv_decoder_loss's input, their
# saved residuals and cotangents — ~0.75 MB/env) dominating the 2.6 MB/env
# temp arena once every cell-sized buffer was gone.  Fusing the whole
# autoencoder (reference mcl.py:445-512: 2-stage conv encoder, 2-stage
# transpose-conv decoder, reconstruction error) into ONE pallas_call makes
# the embedding a kernel-local VMEM value: the only HBM tenants of an AE
# training step are the (uint8/packed) source+target and 8 scalar-sized
# parameter grads.  The same kernel serves PredictionBonus/SurpriseBonus
# (mcl.py:558-728): ``src`` (the ring frame) and ``obs`` (the current
# frame) are separate inputs that may each independently be uint8 cells or
# packed u32 words.
#
# Backward strategy = the proven pieces composed: the encoder recompute
# RETAINS stage-1 pre-act/keep planes (as _enc_bwd_kernel) plus stage-2
# pre-act/keep/act planes (new — the decoder backward needs the embedding
# anyway), and the decoder forward retains its planes as
# _decoder_loss_bwd_kernel; dropout masks replay bit-identically from the
# shared per-tile PRNG stream because forward and backward draw in the
# same order (enc1 x c1, enc2 x c2, decA x cmid, decB x cout).


def _ae_fwd_kernel(seed_ref, src_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   wt1_ref, bt1_ref, wt2_ref, bt2_ref,
                   sh1_ref, sw1_ref, sh2_ref, sw2_ref, m1_ref,
                   uh1_ref, uw1_ref, uh2_ref, uw2_ref, obs_ref, err_ref,
                   *, c1: int, c2: int, cin: int, p1: int, p2: int,
                   cmid: int, cout: int, drop_p: float):
    pi = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], pi)
    sh1, sw1 = sh1_ref[...], sw1_ref[...]
    sh2, sw2 = sh2_ref[...], sw2_ref[...]
    m1 = m1_ref[...]
    uh1, uw1 = uh1_ref[...], uw1_ref[...]
    uh2, uw2 = uh2_ref[...], uw2_ref[...]
    taps0 = _tap_planes(src_ref, cin)
    x1 = [_enc_stage(taps0, w1_ref, b1_ref, o, cin, p1, sh1, sw1, drop_p,
                     m1)
          for o in range(c1)]
    taps1 = [_taps_of(p) for p in x1]
    emb = [_enc_stage(taps1, w2_ref, b2_ref, o, c1, p2, sh2, sw2, drop_p)
           for o in range(c2)]
    _, _, _, _, outs = _dl_forward_planes(
        emb, wt1_ref, bt1_ref, wt2_ref, bt2_ref, uh1, uw1, uh2, uw2,
        cmid, cout, drop_p)
    tile = src_ref.shape[0]
    totals = [jnp.float32(0.0)] * tile
    for o, (_, _, y) in enumerate(outs):
        d2 = (_plane_f32(obs_ref[:, o]) - y) ** 2
        for t in range(tile):
            totals[t] = totals[t] + jnp.sum(d2[t])
    for t in range(tile):
        # VMEM lane broadcast (see _loss_tail_fwd_kernel)
        err_ref[t] = jnp.zeros((1, 128), jnp.float32) + totals[t]


def _ae_bwd_kernel(seed_ref, src_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   wt1_ref, bt1_ref, wt2_ref, bt2_ref,
                   sh1_ref, sw1_ref, sh2_ref, sw2_ref, m1_ref,
                   uh1_ref, uw1_ref, uh2_ref, uw2_ref,
                   bh1_ref, bw1_ref, bh2_ref, bw2_ref, obs_ref, gbar_ref,
                   dw1_ref, db1_ref, dw2_ref, db2_ref,
                   dwt1_ref, dbt1_ref, dwt2_ref, dbt2_ref,
                   *, c1: int, c2: int, cin: int, p1: int, p2: int,
                   cmid: int, cout: int, drop_p: float):
    pi = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], pi)
    sh1, sw1 = sh1_ref[...], sw1_ref[...]
    sh2, sw2 = sh2_ref[...], sw2_ref[...]
    m1 = m1_ref[...]
    uh1, uw1 = uh1_ref[...], uw1_ref[...]
    uh2, uw2 = uh2_ref[...], uw2_ref[...]
    bh1, bw1 = bh1_ref[...], bw1_ref[...]
    bh2, bw2 = bh2_ref[...], bw2_ref[...]

    @pl.when(pi == 0)
    def _init():
        # SMEM accepts scalar stores only — unrolled zero-init
        for o in range(c1):
            db1_ref[o, 0] = 0.0
            for c in range(cin):
                for dy in range(3):
                    for dx in range(3):
                        dw1_ref[o, c, dy, dx] = 0.0
        for o in range(c2):
            db2_ref[o, 0] = 0.0
            for c in range(c1):
                for dy in range(3):
                    for dx in range(3):
                        dw2_ref[o, c, dy, dx] = 0.0
        for c in range(c2):
            for m in range(cmid):
                for ky in range(4):
                    for kx in range(4):
                        dwt1_ref[c, m, ky, kx] = 0.0
        for m in range(cmid):
            dbt1_ref[m, 0] = 0.0
            for o in range(cout):
                for ky in range(4):
                    for kx in range(4):
                        dwt2_ref[m, o, ky, kx] = 0.0
        for o in range(cout):
            dbt2_ref[o, 0] = 0.0

    # --- encoder recompute, retaining what both backwards need ------------
    taps0 = _tap_planes(src_ref, cin)
    x1, d1s, keeps1 = [], [], []
    for o in range(c1):
        z1 = _conv_block(taps0, w1_ref, b1_ref, o, cin)
        if drop_p > 0.0:
            keep1 = _keep_mask(z1.shape, drop_p)
            d1 = jnp.where(keep1, z1 * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            keep1, d1 = None, z1
        d1s.append(d1)
        keeps1.append(keep1)
        x1.append(_decimate(_window_max(jnp.maximum(d1, 0.0), p1),
                            sh1, sw1) * m1)
    taps1 = [_taps_of(p) for p in x1]
    embs, d2s, keeps2, a2s = [], [], [], []
    for o in range(c2):
        z2 = _conv_block(taps1, w2_ref, b2_ref, o, c1)
        if drop_p > 0.0:
            keep2 = _keep_mask(z2.shape, drop_p)
            d2 = jnp.where(keep2, z2 * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            keep2, d2 = None, z2
        a2 = jnp.maximum(d2, 0.0)
        embs.append(_decimate(_window_max(a2, p2), sh2, sw2))
        d2s.append(d2)
        keeps2.append(keep2)
        a2s.append(a2)

    # --- decoder forward (retained) + backward -----------------------------
    dil1, mids, keepsA, dil2, outs = _dl_forward_planes(
        embs, wt1_ref, bt1_ref, wt2_ref, bt2_ref, uh1, uw1, uh2, uw2,
        cmid, cout, drop_p)
    gbar = gbar_ref[...]  # [tile, 1, 1]

    t, hm, wm = mids[0].shape
    g_mid = [jnp.zeros((t, hm, wm), jnp.float32) for _ in range(cmid)]
    for o, (keepB, d, y) in enumerate(outs):
        g = gbar * (2.0 * (y - _plane_f32(obs_ref[:, o])))
        g_d = g * y * (1.0 - y)  # sigmoid'
        if drop_p > 0.0:
            g_c = jnp.where(keepB, g_d * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            g_c = g_d
        dbt2_ref[o, 0] = dbt2_ref[o, 0] + jnp.sum(g_c)
        for m in range(cmid):
            for ky in range(4):
                for kx in range(4):
                    tap = _shift2(g_c, ky - 1, kx - 1)
                    dwt2_ref[m, o, ky, kx] = (
                        dwt2_ref[m, o, ky, kx] + jnp.sum(dil2[m] * tap)
                    )
        for m in range(cmid):
            corr = jnp.zeros_like(g_c)
            for ky in range(4):
                for kx in range(4):
                    corr = corr + wt2_ref[m, o, ky, kx] * _shift2(
                        g_c, ky - 1, kx - 1)
            g_mid[m] = g_mid[m] + _contract1(_contract1(corr, uh2), uw2)

    te, he, we = embs[0].shape
    g_emb = [jnp.zeros((te, he, we), jnp.float32) for _ in range(c2)]
    for m in range(cmid):
        g_a = jnp.where(mids[m] > 0.0, g_mid[m], 0.0)
        if drop_p > 0.0:
            g_c = jnp.where(keepsA[m], g_a * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            g_c = g_a
        dbt1_ref[m, 0] = dbt1_ref[m, 0] + jnp.sum(g_c)
        for c in range(c2):
            for ky in range(4):
                for kx in range(4):
                    tap = _shift2(g_c, ky - 1, kx - 1)
                    dwt1_ref[c, m, ky, kx] = (
                        dwt1_ref[c, m, ky, kx] + jnp.sum(dil1[c] * tap)
                    )
        for c in range(c2):
            corr = jnp.zeros_like(g_c)
            for ky in range(4):
                for kx in range(4):
                    corr = corr + wt1_ref[c, m, ky, kx] * _shift2(
                        g_c, ky - 1, kx - 1)
            g_emb[c] = g_emb[c] + _contract1(_contract1(corr, uh1), uw1)

    # --- encoder stage-2 backward from the VMEM embedding cotangent --------
    t1, h1, w1d = x1[0].shape
    gx1 = [jnp.zeros((t1, h1, w1d), jnp.float32) for _ in range(c1)]
    for o in range(c2):
        g_z2 = _pool_route(a2s[o], g_emb[o], p2, sh2, sw2, bh2, bw2)
        g_d2 = jnp.where(d2s[o] > 0.0, g_z2, 0.0)
        if drop_p > 0.0:
            g_c2 = jnp.where(keeps2[o], g_d2 * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            g_c2 = g_d2
        db2_ref[o, 0] = db2_ref[o, 0] + jnp.sum(g_c2)
        for c in range(c1):
            for dy in range(3):
                for dx in range(3):
                    tap = _shift_rows(taps1[c][dx], dy - 1)
                    dw2_ref[o, c, dy, dx] = (
                        dw2_ref[o, c, dy, dx] + jnp.sum(tap * g_c2)
                    )
        gt = _grad_taps(g_c2)
        for c in range(c1):
            acc = gx1[c]
            for dy in range(3):
                for dx in range(3):
                    acc = acc + _shift_rows(gt[dx], 1 - dy) * w2_ref[o, c,
                                                                     dy, dx]
            gx1[c] = acc

    # --- encoder stage-1 backward (retained pre-act/mask planes) -----------
    for o in range(c1):
        d1 = d1s[o]
        a1 = jnp.maximum(d1, 0.0)
        g_z1 = _pool_route(a1, gx1[o] * m1, p1, sh1, sw1, bh1, bw1)
        g_d1 = jnp.where(d1 > 0.0, g_z1, 0.0)
        if drop_p > 0.0:
            g_c1 = jnp.where(keeps1[o], g_d1 * (1.0 / (1.0 - drop_p)), 0.0)
        else:
            g_c1 = g_d1
        db1_ref[o, 0] = db1_ref[o, 0] + jnp.sum(g_c1)
        for c in range(cin):
            for dy in range(3):
                for dx in range(3):
                    tap = _shift_rows(taps0[c][dx], dy - 1)
                    dw1_ref[o, c, dy, dx] = (
                        dw1_ref[o, c, dy, dx] + jnp.sum(tap * g_c1)
                    )


def _ae_bytes_per_inst(cin: int, c1: int, c2: int, cmid: int,
                       h: int, w: int, p1: int) -> int:
    """Working-set estimate = encoder-bwd retention (incl. the new stage-2
    pre-act/keep/act planes at 1/p1² res) + decoder-loss planes at full
    output resolution."""
    enc = ((3 * cin + 4 + 2 * c1) * h * w * 4
           + (4 * c1 + 12 + 3 * c2) * (h // p1) * (w // p1) * 4)
    dec = _dl_bytes_per_inst(c2, cmid, h, w)
    return int(enc + dec)


AE_TILE_BUDGET_BYTES = 12 * 2**20


def _ae_call(src, w1, b1, w2, b2, wt1, bt1, wt2, bt2, obs, seed, mask,
             gbar, *, p1: int, p2: int, drop_p: float, interpret: bool,
             backward: bool):
    n, cin, h, wx = src.shape
    wd = wx * 32 if src.dtype == jnp.uint32 else wx
    c1 = w1.shape[0]
    c2 = w2.shape[0]
    cmid = wt1.shape[1]
    cout = wt2.shape[1]
    if p1 * p2 != 4:
        # the stride-2 x2 decoder returns to input resolution only for a
        # total encoder pool of 4 (the wrapper nets' shape, mcl.py:452-467)
        raise ValueError(f"whole-AE kernel needs p1*p2 == 4, got {(p1, p2)}")
    from .tiling import largest_divisor_tile

    tile = largest_divisor_tile(
        n, _ae_bytes_per_inst(cin, c1, c2, cmid, h, wd, p1),
        AE_TILE_BUDGET_BYTES)
    h1, w1d = h // p1, wd // p1
    ho, wo = h1 // p2, w1d // p2
    sh1 = jnp.asarray(_decim_matrix(h, p1))
    sw1 = jnp.asarray(_decim_matrix(wd, p1))
    sh2 = jnp.asarray(_decim_matrix(h1, p2))
    sw2 = jnp.asarray(_decim_matrix(w1d, p2))
    uh1 = jnp.asarray(_decim_matrix(2 * ho, 2))
    uw1 = jnp.asarray(_decim_matrix(2 * wo, 2))
    uh2 = jnp.asarray(_decim_matrix(4 * ho, 2))
    uw2 = jnp.asarray(_decim_matrix(4 * wo, 2))
    common_in = [
        pl.BlockSpec((tile, cin, h, wx), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w1.shape, lambda i, *_: (0,) * w1.ndim,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c1, 1), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w2.shape, lambda i, *_: (0,) * w2.ndim,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c2, 1), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wt1.shape, lambda i, *_: (0,) * wt1.ndim,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cmid, 1), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wt2.shape, lambda i, *_: (0,) * wt2.ndim,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cout, 1), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(m.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
        for m in (sh1, sw1, sh2, sw2)
    ] + [
        pl.BlockSpec((h1, 1), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(m.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
        for m in (uh1, uw1, uh2, uw2)
    ]
    args = [
        jnp.asarray(seed, jnp.int32).reshape(1),
        src,  # dtype passthrough: u8 cells / u32 words expand in VMEM
        w1.astype(jnp.float32),
        b1.astype(jnp.float32).reshape(c1, 1),
        w2.astype(jnp.float32),
        b2.astype(jnp.float32).reshape(c2, 1),
        wt1.astype(jnp.float32),
        bt1.astype(jnp.float32).reshape(cmid, 1),
        wt2.astype(jnp.float32),
        bt2.astype(jnp.float32).reshape(cout, 1),
        sh1, sw1, sh2, sw2,
        mask.astype(jnp.float32).reshape(h1, 1),
        uh1, uw1, uh2, uw2,
    ]
    obs_spec = pl.BlockSpec((tile, cout, h, obs.shape[3]),
                            lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    est = 4 * tile * _ae_bytes_per_inst(cin, c1, c2, cmid, h, wd, p1)
    cp = (None if est <= 16 * 2**20 else
          pltpu.CompilerParams(vmem_limit_bytes=int(min(100 * 2**20, est))))
    if not backward:
        err = pl.pallas_call(
            functools.partial(_ae_fwd_kernel, c1=c1, c2=c2, cin=cin,
                              p1=p1, p2=p2, cmid=cmid, cout=cout,
                              drop_p=drop_p),
            out_shape=jax.ShapeDtypeStruct((n, 1, 128), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n // tile,),
                in_specs=common_in + [obs_spec],
                out_specs=pl.BlockSpec((tile, 1, 128),
                                       lambda i, *_: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            compiler_params=cp,
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(*args, obs)
        return err[:, 0, 0]
    bh1 = jnp.asarray(_window_matrix(h, p1))
    bw1 = jnp.asarray(_window_matrix(wd, p1))
    bh2 = jnp.asarray(_window_matrix(h1, p2))
    bw2 = jnp.asarray(_window_matrix(w1d, p2))
    grads = pl.pallas_call(
        functools.partial(_ae_bwd_kernel, c1=c1, c2=c2, cin=cin,
                          p1=p1, p2=p2, cmid=cmid, cout=cout,
                          drop_p=drop_p),
        out_shape=(
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct((c1, 1), jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct((c2, 1), jnp.float32),
            jax.ShapeDtypeStruct(wt1.shape, jnp.float32),
            jax.ShapeDtypeStruct((cmid, 1), jnp.float32),
            jax.ShapeDtypeStruct(wt2.shape, jnp.float32),
            jax.ShapeDtypeStruct((cout, 1), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // tile,),
            in_specs=common_in + [
                pl.BlockSpec(m.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM)
                for m in (bh1, bw1, bh2, bw2)
            ] + [obs_spec] + [
                pl.BlockSpec((tile, 1, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(w1.shape, lambda i, *_: (0,) * w1.ndim,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((c1, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(w2.shape, lambda i, *_: (0,) * w2.ndim,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((c2, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(wt1.shape, lambda i, *_: (0,) * wt1.ndim,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((cmid, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(wt2.shape, lambda i, *_: (0,) * wt2.ndim,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((cout, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
        ),
        compiler_params=cp,
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(*args, bh1, bw1, bh2, bw2, obs,
      gbar.astype(jnp.float32).reshape(n, 1, 1))
    dw1, db1, dw2, db2, dwt1, dbt1, dwt2, dbt2 = grads
    return (dw1, db1.reshape(c1), dw2, db2.reshape(c2),
            dwt1, dbt1.reshape(cmid), dwt2, dbt2.reshape(cout))


@functools.lru_cache(maxsize=None)
def make_fused_ae_loss(p1: int, p2: int, drop_p: float = 0.0,
                       train: bool = False, interpret: bool = False):
    """Build ``ae_loss(src, w1, b1, w2, b2, wt1, bt1, wt2, bt2, obs, seed,
    mask) -> err [N]`` — the ENTIRE autoencoder (2-stage conv encoder,
    2-stage transpose-conv decoder, squared-error reduction vs ``obs``) as
    one Pallas kernel with a custom VJP over all 8 parameter tensors.

    ``src`` (the encoder input) and ``obs`` (the loss target) are separate
    inputs — equal for AE2D (mcl.py:445-512), the ring frame vs the
    current frame for PredictionBonus/SurpriseBonus (mcl.py:558-728) —
    and may each independently be uint8 cells or packed u32 words
    (expanded in VMEM).  Neither the embedding nor ANY activation or
    cotangent of the net exists in HBM; the r4 envs/chip census priced
    those embedding copies at ~0.75 MB/env of the 2.6 MB/env arena.

    All four dropout stages draw from one per-tile hardware-PRNG stream
    (a different stream than any multi-kernel composition — same
    distribution; the backward replays it bit-identically by drawing in
    forward order).  Input cotangents for ``src``/``obs`` are
    structurally zero (both are observations, mcl.py:343-352)."""
    p = drop_p if train else 0.0

    @jax.custom_vjp
    def ae_loss(src, w1, b1, w2, b2, wt1, bt1, wt2, bt2, obs, seed, mask):
        return _ae_call(src, w1, b1, w2, b2, wt1, bt1, wt2, bt2, obs,
                        seed, mask, None, p1=p1, p2=p2, drop_p=p,
                        interpret=interpret, backward=False)

    def fwd(src, w1, b1, w2, b2, wt1, bt1, wt2, bt2, obs, seed, mask):
        return (ae_loss(src, w1, b1, w2, b2, wt1, bt1, wt2, bt2, obs,
                        seed, mask),
                (src, w1, b1, w2, b2, wt1, bt1, wt2, bt2, obs, seed, mask))

    def bwd(res, gbar):
        src, w1, b1, w2, b2, wt1, bt1, wt2, bt2, obs, seed, mask = res
        dw1, db1, dw2, db2, dwt1, dbt1, dwt2, dbt2 = _ae_call(
            src, w1, b1, w2, b2, wt1, bt1, wt2, bt2, obs, seed, mask,
            gbar, p1=p1, p2=p2, drop_p=p, interpret=interpret,
            backward=True)

        def zero_like_input(x):
            return (np.zeros(x.shape, jax.dtypes.float0)
                    if jnp.issubdtype(x.dtype, jnp.integer)
                    else jnp.zeros_like(x))

        return (zero_like_input(src), dw1.astype(w1.dtype),
                db1.astype(b1.dtype), dw2.astype(w2.dtype),
                db2.astype(b2.dtype), dwt1.astype(wt1.dtype),
                dbt1.astype(bt1.dtype), dwt2.astype(wt2.dtype),
                dbt2.astype(bt2.dtype), zero_like_input(obs),
                np.zeros((), jax.dtypes.float0), jnp.zeros_like(mask))

    ae_loss.defvjp(fwd, bwd)
    return ae_loss
