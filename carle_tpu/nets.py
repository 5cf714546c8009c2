"""Neural-net primitives as pure functions over param pytrees.

The reference builds its wrapper/agent networks from ``torch.nn`` modules
(mcl.py:257-298, 445-481; agents.py:69-88).  Here the same architectures are
expressed as explicit param pytrees plus pure ``apply`` functions, so they
compose with ``jax.jit`` / ``jax.grad`` / ``lax.scan`` and can live inside the
scanned environment step (online learning happens *inside* rollouts,
mcl.py:333-341 — see mcl/rnd.py).

Layout notes (TPU):

* NCHW with OIHW kernels, matching torch's layout so reference checkpoints
  load by direct reshape (checkpoint.py converts ``state_dict`` tensors 1:1);
  XLA relayouts internally for the conv units.
* Channel counts here are tiny (1-4), so convs lower to VPU-friendly stencil
  fusions rather than MXU matmuls; the dense heads are real matmuls and get
  the MXU.  ``preferred_element_type=float32`` keeps accumulation exact for
  reward-curve parity.

Initialization matches torch's defaults in distribution: Conv2d/Linear use
kaiming_uniform(a=sqrt(5)) which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in))
for weights, and the same bound for biases.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


Params = Dict[str, jax.Array]


class SpaceSharding(NamedTuple):
    """Mesh routing tag for the fused kernels: the observation is
    ROW-SHARDED over ``axis`` (the packed/GSPMD spatial env modes), so the
    kernels must run under shard_map with explicit row-halo exchange
    (parallel/spatial_heads.py) instead of the batch-axis _shard_fused.
    Pass as the wrappers' ``fused_head`` (or nets ``mesh=``) argument.
    ``env_axis`` names the instance axis of a 2-D env x space mesh."""

    mesh: Any
    axis: str = "space"
    env_axis: Optional[str] = None


class BandTiling(NamedTuple):
    """SINGLE-CHIP routing tag for the fused kernels at huge universes:
    the observation's H axis is split into ``bands`` row bands processed
    sequentially by the kernel grid (parallel/band_heads.py) — each band
    rides through the encoder/decoder-loss kernels as its own
    batch element with halo rows SLICED from the array (exact, no
    communication) and globe edges zero-padded, so whole planes never
    need to fit VMEM at once.  This is what lets learned wrappers run at
    8192² on one chip, where holding full planes in VMEM needs a pod
    slice and the unfused XLA conv transients measure 17.2 GB (STATUS
    r4).  Pass as the wrappers' ``fused_head`` (or nets ``mesh=``)
    argument; band-vs-global parity is exact up to dropout-stream
    assignment (each band draws its own masks, like every other fused
    composition delta)."""

    bands: int


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------


def _uniform(key: jax.Array, shape: Sequence[int], bound: float) -> jax.Array:
    return jax.random.uniform(
        key, tuple(shape), minval=-bound, maxval=bound, dtype=jnp.float32
    )


def conv_init(
    key: jax.Array, out_ch: int, in_ch: int, k: int, bias: bool = True
) -> Params:
    """Conv2d weight (OIHW) + bias with torch-default init."""
    wk, bk = jax.random.split(key)
    fan_in = in_ch * k * k
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": _uniform(wk, (out_ch, in_ch, k, k), bound)}
    if bias:
        p["b"] = _uniform(bk, (out_ch,), bound)
    return p


def conv_transpose_init(
    key: jax.Array, in_ch: int, out_ch: int, k: int, bias: bool = True
) -> Params:
    """ConvTranspose2d weight in torch layout (in_ch, out_ch, kH, kW).

    torch computes fan_in of a ConvTranspose2d from weight.size(1)*k*k
    = out_ch*k*k; replicated for distributional parity.
    """
    wk, bk = jax.random.split(key)
    fan_in = out_ch * k * k
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": _uniform(wk, (in_ch, out_ch, k, k), bound)}
    if bias:
        p["b"] = _uniform(bk, (out_ch,), bound)
    return p


def linear_init(
    key: jax.Array, out_features: int, in_features: int, bias: bool = True
) -> Params:
    """Linear weight in torch layout (out, in) + bias."""
    wk, bk = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    p = {"w": _uniform(wk, (out_features, in_features), bound)}
    if bias:
        p["b"] = _uniform(bk, (out_features,), bound)
    return p


# ---------------------------------------------------------------------------
# layer applications
# ---------------------------------------------------------------------------

_DIMNUMS = ("NCHW", "OIHW", "NCHW")


def warn_if_bf16_on_tpu(compute_dtype) -> None:
    """Loud runtime guard on the measured bf16 trap (VERDICT r2 item 7).

    ``compute_dtype=bfloat16`` for the tiny-channel wrapper nets measured
    **37x SLOWER than f32 on TPU v5e** (56 vs 2096 env-steps/s at inst=32):
    1-4 channel bf16 convs hit a pathological XLA layout path.  Nor can the
    fused Pallas heads (``fused_head=True``) recover it: their cost is VPU
    f32 MAC passes with channels as unrolled planes — there is no MXU matmul
    in that path for bf16 to accelerate, and the VPU issue rate is
    word-width-agnostic for this access pattern (same reason u16 bit-packing
    was a mirage, CLAUDE.md).  The option stays for architectures where a
    real MXU matmul dominates (e.g. big dense heads); anyone selecting it
    for the shipped nets gets this warning instead of a silent 37x."""
    import warnings

    if compute_dtype is None:
        return
    if jnp.dtype(compute_dtype) != jnp.dtype(jnp.bfloat16):
        return
    from .ops.ca import is_tpu_platform

    if is_tpu_platform():
        warnings.warn(
            "compute_dtype=bfloat16 measured ~37x SLOWER than float32 for "
            "the tiny-channel wrapper nets on TPU v5e (XLA layout "
            "pathology; the fused Pallas heads cannot use bf16 either — "
            "no MXU in their path). Use the default f32, or fused_head=True "
            "for the 4x fast path.",
            stacklevel=3,
        )


def conv2d(x: jax.Array, p: Params, stride: int = 1, padding: int = 0,
           compute_dtype=None) -> jax.Array:
    """2-D convolution, NCHW x OIHW.

    ``compute_dtype=bfloat16`` runs the layer in reduced precision (outputs
    cast back to f32).  Measured on TPU v5e this is ~37x SLOWER for the
    tiny-channel wrapper convs (bf16 layout pathology) — keep the f32
    default there; the option exists for architectures where it wins."""
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=None if compute_dtype is not None
        else jnp.float32,
    )
    out = out.astype(jnp.float32)
    if "b" in p:
        out = out + p["b"][None, :, None, None]
    return out


def conv_transpose2d(
    x: jax.Array, p: Params, stride: int = 2, padding: int = 1,
    compute_dtype=None,
) -> jax.Array:
    """torch-semantics ConvTranspose2d: out = (in-1)*stride - 2*padding + k.

    Implemented as the transpose convolution identity: input dilation by
    ``stride``, spatially-flipped kernel with swapped in/out channels, and
    (k-1-padding) edge padding.
    """
    w = p["w"]  # (in_ch, out_ch, kH, kW)
    k = w.shape[2]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    flipped = jnp.flip(w, axis=(2, 3)).transpose(1, 0, 2, 3)  # -> OIHW
    pad = k - 1 - padding
    out = jax.lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=None if compute_dtype is not None
        else jnp.float32,
    )
    out = out.astype(jnp.float32)
    if "b" in p:
        out = out + p["b"][None, :, None, None]
    return out


def linear(x: jax.Array, p: Params, compute_dtype=None) -> jax.Array:
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = jnp.dot(
        x, w.T,
        preferred_element_type=None if compute_dtype is not None
        else jnp.float32,
        # exact f32 on TPU needs HIGHEST (the default does ONE bf16 pass,
        # ~3e-3 relative per product — CLAUDE.md); mixed-precision opt-in
        # (compute_dtype) keeps the fast default on purpose
        precision=None if compute_dtype is not None
        else jax.lax.Precision.HIGHEST,
    ).astype(jnp.float32)
    if "b" in p:
        out = out + p["b"]
    return out


def max_pool2(x: jax.Array) -> jax.Array:
    """2x2 max pool, stride 2, no padding (torch MaxPool2d(2, 2, padding=0))."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, 2, 2),
        window_strides=(1, 1, 2, 2),
        padding="VALID",
    )


def dropout(
    x: jax.Array, key: Optional[jax.Array], p: float, train: bool
) -> jax.Array:
    """Inverted dropout matching ``nn.Dropout``: train scales kept units by
    1/(1-p); eval is the identity."""
    if not train or p == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


def flatten(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1)


def split_keys(key: Optional[jax.Array], n: int) -> Tuple[Optional[jax.Array], ...]:
    """Split a (possibly absent) dropout key into n subkeys."""
    if key is None:
        return (None,) * n
    return tuple(jax.random.split(key, n))



def _cells_f32(x: jax.Array) -> jax.Array:
    """f32 cell view of a net input that may be f32/uint8 cells or the
    PACKED universe (uint32, last dim W/32).  Off-TPU fallback counterpart
    of the kernels' in-VMEM expansion (ops/pallas_head._expand_packed)."""
    if x.dtype == jnp.uint32:
        from .ops.bitpack import unpack_grid

        return unpack_grid(x, x.shape[-1] * 32).astype(jnp.float32)
    return x.astype(jnp.float32)


def _shard_fused(call, mesh):
    """Partition a fused head/tail kernel call over a device mesh's first
    axis (the instance batch).

    A ``pallas_call`` is an opaque custom call to GSPMD: under committed
    shardings it silently gathers the whole batch onto one device (measured
    — the output comes back SingleDeviceSharding).  Wrapping the call in
    ``shard_map`` keeps each shard's instances local; JAX's shard_map
    transpose handles the replicated-weight cotangents (per-shard dW/db are
    psummed automatically), verified grad-exact vs the unsharded kernel on
    the 8-device CPU mesh (tests/test_pallas_head.py).  The PRNG seed is
    decorrelated per shard (the kernels seed per LOCAL grid step, so shards
    would otherwise draw identical dropout masks)."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def local(x, w, b, seed):
        seed = seed + jax.lax.axis_index(axis).astype(jnp.int32) * jnp.int32(
            0x3779B1)
        return call(x, w, b, seed)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(), P(), P()), out_specs=P(axis),
        check_vma=False,
    )


def _shard_fused_loss(call, mesh):
    """:func:`_shard_fused` for the loss-tail signature
    ``(x, w, b, obs, seed)`` — obs shards with the instance batch."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def local(x, w, b, obs, seed):
        seed = seed + jax.lax.axis_index(axis).astype(jnp.int32) * jnp.int32(
            0x3779B1)
        return call(x, w, b, obs, seed)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(axis), P()), out_specs=P(axis),
        check_vma=False,
    )


def conv_head(
    x: jax.Array,
    p: Params,
    key: Optional[jax.Array],
    *,
    pool: int,
    drop_p: float,
    train: bool,
    force_kernel: bool = False,
    need_dx: bool = False,
    mesh: Any = None,
) -> jax.Array:
    """The fused front-end segment ``pool^k(relu(dropout(conv3x3(x))))`` as
    ONE Pallas kernel (ops/pallas_head.py) — the measured training
    bottleneck (the tiny-channel activations pad onto 128 lanes in XLA, so
    the unfused chain moves ~32x the data; scripts/train_cost_probe.py).

    By default the custom VJP emits parameter grads and a zero input
    cotangent (first-layer heads: ``x`` must not depend on other learned
    parameters); pass ``need_dx=True`` for deeper heads — the backward
    kernel then also computes the true input cotangent.

    Semantics deltas vs the unfused composition (both documented, both
    opt-in via the wrappers' ``fused_head`` flag): the conv runs in plain
    f32 (MORE precise than the default-lowered TPU conv); dropout masks
    come from the on-core hardware PRNG (a different stream than
    jax.random, like ``--rng-impl rbg``; all-zero bits under the Pallas
    interpreter, so CPU use requires dropout off); max-pool grads share
    ties equally (reduce-max VJP semantics) where torch routes first-match.
    """
    from .ops.pallas_head import make_fused_head

    from .ops.ca import is_tpu_platform

    # validate BEFORE the backend branch: the fused kernel's log-step
    # window max silently computes a wrong (overlapping) pool for
    # non-power-of-two sizes instead of erroring like the fallback
    if pool < 2 or pool & (pool - 1):
        raise ValueError(f"pool must be a power of two >= 2, got {pool}")
    if isinstance(mesh, BandTiling):
        raise ValueError(
            "BandTiling applies to the two-stage paths (conv_encoder, "
            "conv_decoder_loss, conv_ae_loss); single-stage heads have no "
            "banded variant"
        )
    on_tpu = is_tpu_platform()
    if not on_tpu and not force_kernel:
        # graceful fallback off-TPU: the interpreter is slow and stubs the
        # PRNG to zero bits (all-dropped masks); keep CPU runs correct via
        # the unfused composition — the flag plumbing still exercises
        # end-to-end, and kernel correctness is covered by the interpret
        # tests (tests/test_pallas_head.py)
        z = conv2d(x, p, padding=1)
        z = jax.nn.relu(dropout(z, key, drop_p, train))
        for _ in range(pool.bit_length() - 1):
            z = max_pool2(z)
        return z
    head = make_fused_head(pool, drop_p, train, interpret=not on_tpu,
                           need_dx=need_dx)
    if mesh is not None:
        head = _shard_fused(head, mesh)
    if train and drop_p > 0.0:
        if key is None:
            # the unfused path would raise inside jax.random — a silent
            # fixed seed here would correlate every step's dropout masks
            raise ValueError(
                "train=True with drop_p > 0 requires a PRNG key"
            )
        seed = jax.random.randint(key, (), 0, jnp.int32(2**31 - 1))
    else:
        seed = jnp.int32(0)
    return head(x, p["w"], p["b"], seed)


def _shard_fused_encoder(call, mesh):
    """:func:`_shard_fused` for the fused-encoder signature
    ``(x, w1, b1, w2, b2, seed, mask)`` (mask replicated)."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def local(x, w1, b1, w2, b2, seed, mask):
        seed = seed + jax.lax.axis_index(axis).astype(jnp.int32) * jnp.int32(
            0x3779B1)
        return call(x, w1, b1, w2, b2, seed, mask)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )


def conv_encoder(
    x: jax.Array,
    p1: Params,
    p2: Params,
    key: Optional[jax.Array],
    *,
    pools: Tuple[int, int],
    drop_p: float,
    train: bool,
    force_kernel: bool = False,
    mesh: Any = None,
) -> jax.Array:
    """BOTH encoder stages ``pool(relu(drop(conv3x3)))`` x2 as ONE Pallas
    kernel (ops/pallas_head.py make_fused_encoder).  ``x`` may be the raw
    uint8 observation — it is upcast to f32 inside VMEM, so the
    full-resolution f32 obs never exists in HBM; and because the backward
    kernel recomputes stage 1 in VMEM (bit-identical PRNG replay), the
    stage-1 activation and its cotangent — the measured HBM binders of the
    512² fused-training ladder (r4 OOM accounting: 3 x 6 GB at 6144 envs)
    — never exist either.  The only cross-pass residual is ``x`` itself.

    Input cotangent is structurally zero (encoders are first layers).
    Same PRNG/precision/pool-tie conventions, off-TPU fallback, and mesh
    partitioning as :func:`conv_head`; the two stages share one seed (one
    hardware-PRNG stream per kernel) where the two-kernel composition drew
    from two — a different dropout stream, same distribution.
    """
    from .ops.pallas_head import make_fused_encoder

    from .ops.ca import is_tpu_platform

    pool1, pool2 = pools
    for pool in pools:
        if pool < 2 or pool & (pool - 1):
            raise ValueError(f"pools must be powers of two >= 2, got {pools}")
    if isinstance(mesh, SpaceSharding):
        # row-sharded observation: shard_map + explicit row halos
        from .parallel.spatial_heads import encoder_spatial

        return encoder_spatial(x, p1, p2, key, pools=pools, drop_p=drop_p,
                               train=train, sharding=mesh,
                               force_kernel=force_kernel)
    if isinstance(mesh, BandTiling):
        # single-chip sequential row bands (huge universes)
        from .parallel.band_heads import encoder_banded

        return encoder_banded(x, p1, p2, key, pools=pools, drop_p=drop_p,
                              train=train, tiling=mesh,
                              force_kernel=force_kernel)
    on_tpu = is_tpu_platform()
    if not on_tpu and not force_kernel:
        xf = _cells_f32(x)
        k1, k2 = split_keys(key, 2)
        z = conv2d(xf, p1, padding=1)
        z = jax.nn.relu(dropout(z, k1, drop_p, train))
        for _ in range(pool1.bit_length() - 1):
            z = max_pool2(z)
        z = conv2d(z, p2, padding=1)
        z = jax.nn.relu(dropout(z, k2, drop_p, train))
        for _ in range(pool2.bit_length() - 1):
            z = max_pool2(z)
        return z
    enc = make_fused_encoder(pool1, pool2, drop_p, train,
                             interpret=not on_tpu)
    if mesh is not None:
        enc = _shard_fused_encoder(enc, mesh)
    if train and drop_p > 0.0:
        if key is None:
            raise ValueError(
                "train=True with drop_p > 0 requires a PRNG key"
            )
        seed = jax.random.randint(key, (), 0, jnp.int32(2**31 - 1))
    else:
        seed = jnp.int32(0)
    # all rows are real here; the spatial tier passes a real validity mask
    mask = jnp.ones((x.shape[2] // pool1, 1), jnp.float32)
    return enc(x, p1["w"], p1["b"], p2["w"], p2["b"], seed, mask)


def conv_tail(
    x: jax.Array,
    p: Params,
    key: Optional[jax.Array],
    *,
    act: str,
    drop_p: float,
    train: bool,
    force_kernel: bool = False,
    mesh: Any = None,
) -> jax.Array:
    """The AE decoder stage ``act(dropout(conv_transpose2d(x)))`` (stride 2,
    k=4, pad=1) as one Pallas kernel with a full custom VJP (input
    cotangents included — decoders sit mid-net).  Same conventions,
    off-TPU fallback, and mesh partitioning as :func:`conv_head`."""
    from .ops.pallas_head import make_fused_tail

    from .ops.ca import is_tpu_platform

    if isinstance(mesh, SpaceSharding):
        from .parallel.spatial_heads import tail_spatial

        return tail_spatial(x, p, key, act=act, drop_p=drop_p, train=train,
                            sharding=mesh, force_kernel=force_kernel)
    if isinstance(mesh, BandTiling):
        raise ValueError(
            "BandTiling serves the training losses (conv_encoder, "
            "conv_decoder_loss, conv_ae_loss) — a banded conv_tail would "
            "materialise the full-resolution activation it exists to avoid"
        )
    on_tpu = is_tpu_platform()
    if not on_tpu and not force_kernel:
        z = conv_transpose2d(x, p, stride=2, padding=1)
        z = dropout(z, key, drop_p, train)
        return jax.nn.relu(z) if act == "relu" else jax.nn.sigmoid(z)
    tail = make_fused_tail(act, drop_p, train, interpret=not on_tpu)
    if mesh is not None:
        tail = _shard_fused(tail, mesh)
    if train and drop_p > 0.0:
        if key is None:
            # the unfused path would raise inside jax.random — a silent
            # fixed seed here would correlate every step's dropout masks
            raise ValueError(
                "train=True with drop_p > 0 requires a PRNG key"
            )
        seed = jax.random.randint(key, (), 0, jnp.int32(2**31 - 1))
    else:
        seed = jnp.int32(0)
    return tail(x, p["w"], p["b"], seed)


def conv_loss_tail(
    x: jax.Array,
    p: Params,
    obs: jax.Array,
    key: Optional[jax.Array],
    *,
    act: str,
    drop_p: float,
    train: bool,
    force_kernel: bool = False,
    mesh: Any = None,
) -> jax.Array:
    """:func:`conv_tail` fused with the reconstruction-error reduction:
    returns ``sum((obs - act(dropout(conv_transpose2d(x))))^2)`` over C,H,W
    per instance ([N] f32; caller divides by C·H·W for the reference's mean,
    mcl.py:508) WITHOUT materialising the full-resolution reconstruction —
    the dominant per-env HBM transient of fused AE training (STATUS r3:
    the 512² envs/chip ladder OOMs on these f32 recon transients, not the
    carry).  Same conventions, fallback, and mesh partitioning as
    :func:`conv_tail`."""
    from .ops.pallas_head import make_fused_loss_tail

    from .ops.ca import is_tpu_platform

    if isinstance(mesh, SpaceSharding):
        from .parallel.spatial_heads import loss_tail_spatial

        return loss_tail_spatial(x, p, obs, key, act=act, drop_p=drop_p,
                                 train=train, sharding=mesh,
                                 force_kernel=force_kernel)
    if isinstance(mesh, BandTiling):
        raise ValueError(
            "BandTiling routes through conv_decoder_loss / conv_ae_loss "
            "(the banded error reduction needs the two-stage row-weighted "
            "kernel), not the single-stage loss tail"
        )
    on_tpu = is_tpu_platform()
    if not on_tpu and not force_kernel:
        z = conv_transpose2d(x, p, stride=2, padding=1)
        z = dropout(z, key, drop_p, train)
        y = jax.nn.relu(z) if act == "relu" else jax.nn.sigmoid(z)
        return jnp.sum((_cells_f32(obs) - y) ** 2, axis=(1, 2, 3))
    tail = make_fused_loss_tail(act, drop_p, train, interpret=not on_tpu)
    if mesh is not None:
        tail = _shard_fused_loss(tail, mesh)
    if train and drop_p > 0.0:
        if key is None:
            raise ValueError(
                "train=True with drop_p > 0 requires a PRNG key"
            )
        seed = jax.random.randint(key, (), 0, jnp.int32(2**31 - 1))
    else:
        seed = jnp.int32(0)
    return tail(x, p["w"], p["b"], obs, seed)


def _shard_fused_decoder_loss(call, mesh):
    """:func:`_shard_fused` for the decoder-loss signature
    ``(x, wt1, b1, wt2, b2, obs, seed)`` — obs shards with the batch."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def local(x, wt1, b1, wt2, b2, obs, seed):
        seed = seed + jax.lax.axis_index(axis).astype(jnp.int32) * jnp.int32(
            0x3779B1)
        return call(x, wt1, b1, wt2, b2, obs, seed)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P(), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )


def conv_decoder_loss(
    x: jax.Array,
    p1: Params,
    p2: Params,
    obs: jax.Array,
    key: Optional[jax.Array],
    *,
    drop_p: float,
    train: bool,
    force_kernel: bool = False,
    mesh: Any = None,
) -> jax.Array:
    """BOTH AE decoder stages (deconv1 relu, deconv2 sigmoid) FUSED with
    the reconstruction-error reduction: returns ``sum((obs - recon)^2)``
    over C,H,W per instance without materialising either the mid-res
    decoder activation or the full-res recon in HBM
    (ops/pallas_head.make_fused_decoder_loss).  ``obs`` may be uint8.
    With ``mesh=SpaceSharding`` the decoder falls back to the per-stage
    halo'd kernels (parallel/spatial_heads.py) — the spatial tier's
    instance counts are small, so per-env residuals are not its binder."""
    if isinstance(mesh, SpaceSharding):
        from .parallel.spatial_heads import loss_tail_spatial, tail_spatial

        k1, k2 = split_keys(key, 2)
        a = tail_spatial(x, p1, k1, act="relu", drop_p=drop_p, train=train,
                         sharding=mesh, force_kernel=force_kernel)
        return loss_tail_spatial(a, p2, obs, k2, act="sigmoid",
                                 drop_p=drop_p, train=train, sharding=mesh,
                                 force_kernel=force_kernel)
    if isinstance(mesh, BandTiling):
        from .parallel.band_heads import decoder_loss_banded

        return decoder_loss_banded(x, p1, p2, obs, key, drop_p=drop_p,
                                   train=train, tiling=mesh,
                                   force_kernel=force_kernel)
    from .ops.pallas_head import make_fused_decoder_loss

    from .ops.ca import is_tpu_platform

    on_tpu = is_tpu_platform()
    if not on_tpu and not force_kernel:
        k1, k2 = split_keys(key, 2)
        a = conv_transpose2d(x, p1, stride=2, padding=1)
        a = jax.nn.relu(dropout(a, k1, drop_p, train))
        z = conv_transpose2d(a, p2, stride=2, padding=1)
        y = jax.nn.sigmoid(dropout(z, k2, drop_p, train))
        return jnp.sum((_cells_f32(obs) - y) ** 2, axis=(1, 2, 3))
    dl = make_fused_decoder_loss(drop_p, train, interpret=not on_tpu)
    if mesh is not None:
        dl = _shard_fused_decoder_loss(dl, mesh)
    if train and drop_p > 0.0:
        if key is None:
            raise ValueError(
                "train=True with drop_p > 0 requires a PRNG key"
            )
        seed = jax.random.randint(key, (), 0, jnp.int32(2**31 - 1))
    else:
        seed = jnp.int32(0)
    return dl(x, p1["w"], p1["b"], p2["w"], p2["b"], obs, seed)


def _shard_fused_ae(call, mesh):
    """:func:`_shard_fused` for the whole-AE signature
    ``(src, w1, b1, w2, b2, wt1, bt1, wt2, bt2, obs, seed, mask)`` —
    src/obs shard with the instance batch, params/mask replicate."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def local(src, w1, b1, w2, b2, wt1, bt1, wt2, bt2, obs, seed, mask):
        seed = seed + jax.lax.axis_index(axis).astype(jnp.int32) * jnp.int32(
            0x3779B1)
        return call(src, w1, b1, w2, b2, wt1, bt1, wt2, bt2, obs, seed, mask)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),) + (P(),) * 8 + (P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )


def conv_ae_loss(
    src: jax.Array,
    p1: Params,
    p2: Params,
    pd1: Params,
    pd2: Params,
    obs: jax.Array,
    key: Optional[jax.Array],
    *,
    pools: Tuple[int, int],
    drop_p: float,
    train: bool,
    force_kernel: bool = False,
    mesh: Any = None,
) -> jax.Array:
    """The ENTIRE autoencoder — both conv encoder stages, both transpose-conv
    decoder stages, and the reconstruction-error reduction vs ``obs`` — as
    ONE Pallas kernel (ops/pallas_head.make_fused_ae_loss): returns
    ``sum((obs - recon(src))^2)`` over C,H,W per instance ([N] f32; caller
    divides by C·H·W for the reference's mean, mcl.py:508).

    Beyond :func:`conv_encoder` + :func:`conv_decoder_loss`, the pooled
    EMBEDDING also never exists in HBM — the r4 512² envs/chip census
    priced its six f32[n, 2, 128, 128] copies at ~0.75 MB/env of the
    2.6 MB/env temp arena, the dominant term once every cell-sized buffer
    was fused away.  ``src`` and ``obs`` may each be uint8 cells or packed
    u32 words; they differ for PredictionBonus (ring frame vs current
    frame, mcl.py:558-728) and coincide for AE2D.

    With ``mesh=SpaceSharding`` (row-sharded observations) the whole-AE
    fusion is not available — falls back to the per-stage halo'd kernels,
    whose instance counts are small (the spatial tier's binder is the
    universe, not per-env residuals).  All four dropout stages draw from
    ONE hardware-PRNG stream per kernel (vs two streams in the two-kernel
    composition — same distribution, different masks)."""
    if isinstance(mesh, SpaceSharding):
        k1, k2 = split_keys(key, 2)
        x = conv_encoder(src, p1, p2, k1, pools=pools, drop_p=drop_p,
                         train=train, mesh=mesh, force_kernel=force_kernel)
        return conv_decoder_loss(x, pd1, pd2, obs, k2, drop_p=drop_p,
                                 train=train, mesh=mesh,
                                 force_kernel=force_kernel)
    if isinstance(mesh, BandTiling):
        from .parallel.band_heads import ae_loss_banded

        return ae_loss_banded(src, p1, p2, pd1, pd2, obs, key, pools=pools,
                              drop_p=drop_p, train=train, tiling=mesh,
                              force_kernel=force_kernel)
    from .ops.pallas_head import make_fused_ae_loss

    from .ops.ca import is_tpu_platform

    pool1, pool2 = pools
    for pool in pools:
        if pool < 2 or pool & (pool - 1):
            raise ValueError(f"pools must be powers of two >= 2, got {pools}")
    on_tpu = is_tpu_platform()
    if not on_tpu and not force_kernel:
        xf = _cells_f32(src)
        k1, k2, k3, k4 = split_keys(key, 4)
        z = conv2d(xf, p1, padding=1)
        z = jax.nn.relu(dropout(z, k1, drop_p, train))
        for _ in range(pool1.bit_length() - 1):
            z = max_pool2(z)
        z = conv2d(z, p2, padding=1)
        z = jax.nn.relu(dropout(z, k2, drop_p, train))
        for _ in range(pool2.bit_length() - 1):
            z = max_pool2(z)
        a = conv_transpose2d(z, pd1, stride=2, padding=1)
        a = jax.nn.relu(dropout(a, k3, drop_p, train))
        r = conv_transpose2d(a, pd2, stride=2, padding=1)
        y = jax.nn.sigmoid(dropout(r, k4, drop_p, train))
        return jnp.sum((_cells_f32(obs) - y) ** 2, axis=(1, 2, 3))
    # the whole-AE kernel holds encoder + decoder retention for a whole
    # instance in VMEM — past ~512² its tile=1 working set exceeds the
    # scoped-vmem cap and the remote compile fails (HTTP 500).  Fall back
    # to the r4 two-kernel composition there instead of failing: same
    # math, the embedding returns to HBM (which is not the binder at the
    # small instance counts huge universes allow).
    from .ops.pallas_head import _ae_bytes_per_inst

    wd = src.shape[3] * 32 if src.dtype == jnp.uint32 else src.shape[3]
    ae_bytes = _ae_bytes_per_inst(
        src.shape[1], p1["w"].shape[0], p2["w"].shape[0],
        pd1["w"].shape[1], src.shape[2], wd, pool1)
    if 4 * ae_bytes > 100 * 2**20:
        k1, k2 = split_keys(key, 2)
        x = conv_encoder(src, p1, p2, k1, pools=pools, drop_p=drop_p,
                         train=train, mesh=mesh, force_kernel=force_kernel)
        return conv_decoder_loss(x, pd1, pd2, obs, k2, drop_p=drop_p,
                                 train=train, mesh=mesh,
                                 force_kernel=force_kernel)
    ae = make_fused_ae_loss(pool1, pool2, drop_p, train,
                            interpret=not on_tpu)
    if mesh is not None:
        ae = _shard_fused_ae(ae, mesh)
    if train and drop_p > 0.0:
        if key is None:
            raise ValueError(
                "train=True with drop_p > 0 requires a PRNG key"
            )
        seed = jax.random.randint(key, (), 0, jnp.int32(2**31 - 1))
    else:
        seed = jnp.int32(0)
    mask = jnp.ones((src.shape[2] // pool1, 1), jnp.float32)
    return ae(src, p1["w"], p1["b"], p2["w"], p2["b"],
              pd1["w"], pd1["b"], pd2["w"], pd2["b"], obs, seed, mask)
