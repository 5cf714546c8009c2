"""Fused wrapper-net kernels as a SINGLE-CHIP sequential row-band loop.

VERDICT r4 item 3.  At 8192² the fused kernels cannot hold whole planes in
VMEM (~7·(H/n+16)·W·4 per plane set needs a pod slice) and the unfused XLA
conv path materialises 17.2 GB of transients — STATUS r4 declared the
single-chip learned-wrapper env "infeasible both ways".  This module makes
it feasible: the H axis is cut into ``bands`` row bands, each band becomes
its own batch element of ONE kernel call, and the pallas grid iterates the
bands sequentially — only one band's planes are ever live in VMEM.

Unlike the multi-chip spatial tier (parallel/spatial_heads.py), every halo
row here is SLICED from the array in HBM — exact by construction, no
ppermute, no validity subtleties for interior bands.  Only the first/last
band's out-of-globe halo rows are zero-padded, and only the ENCODER needs
masking for them (zero input rows produce relu(bias) phantoms at stage 1
where the global function zero-pads stage 2 — the r4 trap); the kernels
take a PER-INSTANCE row-validity mask so all bands go through one call.
Transpose convs are immune: zero-padding the input reproduces the global
edge behaviour exactly (the dilated zero rows contribute nothing).

Receptive-field arithmetic (reference net shapes — conv3x3 pad 1, pools
p1·p2 = 4; deconv stride 2 k 4 pad 1, mcl.py:452-467):

* encoder: ``p1·p2`` input halo rows per side -> crop exactly 1 pooled
  output row per side (same rule as spatial_heads, but the halos are
  exact so the outputs are too);
* two-stage decoder + loss: each band reads a CLAMPED window of
  embedding rows (core ± 2, shifted inward at globe edges so the window
  never leaves the globe — zero-padded out-of-globe halo rows would
  reproduce the relu(bias) phantom trap at the decoder's MID stage); the
  fused error reduction takes a PER-INSTANCE row-weight input (``em``,
  make_fused_decoder_loss_banded) that keeps exactly each band's core
  full-res rows, so per-band errors SUM to the exact global loss — no
  full-resolution reconstruction ever exists in HBM.

Parameter cotangents: banding is plain slicing (linear), so each kernel's
custom-VJP param grads sum over band-instances = the global param grads
(same tie/dropout conventions).  Dropout: each band draws its own
hardware-PRNG masks (the kernels seed per grid tile) — the usual
fused-composition stream delta, bit-consistent between fwd and bwd.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import nets
from ..nets import BandTiling

ENC_CROP = 1   # pooled output rows cropped per side (halo = p1*p2 inputs)
DEC_HALO = 2   # embedding window margin rows per side (decoder+loss)


def _band_input(x: jax.Array, nb: int, halo: int) -> jax.Array:
    """[inst, C, H, W*] -> [inst·nb, C, H/nb + 2·halo, W*]: band ``b`` of
    instance ``i`` lands at index ``i·nb + b``; halo rows are exact slices
    of the neighbouring bands, globe edges zero-padded.  Works for uint8
    cells, packed u32 words and f32 planes alike (rows are rows)."""
    n, c, h, w = x.shape
    hb = h // nb
    xp = jnp.pad(x, ((0, 0), (0, 0), (halo, halo), (0, 0)))
    bands = [xp[:, :, b * hb: b * hb + hb + 2 * halo] for b in range(nb)]
    out = jnp.stack(bands, axis=1)  # [inst, nb, C, hb+2halo, W*]
    return out.reshape(n * nb, c, hb + 2 * halo, w)


def _unband(y: jax.Array, n: int, nb: int) -> jax.Array:
    """[inst·nb, C, hb', W'] -> [inst, C, nb·hb', W'] (bands are contiguous
    row blocks)."""
    _, c, hbp, w = y.shape
    return (y.reshape(n, nb, c, hbp, w)
            .transpose(0, 2, 1, 3, 4)
            .reshape(n, c, nb * hbp, w))


def _check(h: int, nb: int, unit: int, what: str) -> int:
    if h % nb:
        raise ValueError(f"band tiling: {what} height {h} not divisible by "
                         f"bands={nb}")
    hb = h // nb
    if hb % unit:
        raise ValueError(f"band tiling: band height {hb} must be a "
                         f"multiple of {unit} ({what})")
    return hb


def encoder_banded(
    x: jax.Array,
    p1: nets.Params,
    p2: nets.Params,
    key: Optional[jax.Array],
    *,
    pools: Tuple[int, int],
    drop_p: float,
    train: bool,
    tiling: BandTiling,
    force_kernel: bool = False,
) -> jax.Array:
    """:func:`nets.conv_encoder` as a sequential band loop on one chip."""
    from ..ops.ca import is_tpu_platform
    from ..ops.pallas_head import make_fused_encoder

    on_tpu = is_tpu_platform()
    if not on_tpu and not force_kernel:
        return nets.conv_encoder(x, p1, p2, key, pools=pools, drop_p=drop_p,
                                 train=train)
    pool1, pool2 = pools
    halo = pool1 * pool2
    n, c, hx, w = x.shape
    # cell rows are cell rows whatever the W packing; H is never packed
    nb = tiling.bands
    hb = _check(hx, nb, halo, "observation")
    xb = _band_input(x, nb, halo)

    # per-band stage-1 row-validity: pooled-local row r of band b is global
    # pooled row b·hb/p1 + r − halo/p1 — ones except the first/last band's
    # out-of-globe halo rows (trace-time numpy; broadcast over instances)
    h1b = (hb + 2 * halo) // pool1
    r = np.arange(h1b)
    band_masks = np.stack([
        ((r + b * hb // pool1 - halo // pool1) >= 0)
        & ((r + b * hb // pool1 - halo // pool1) < hx // pool1)
        for b in range(nb)
    ]).astype(np.float32)                                    # [nb, h1b]
    mask = jnp.asarray(
        np.broadcast_to(band_masks[None], (n, nb, h1b))
        .reshape(n * nb, h1b, 1))

    enc = make_fused_encoder(pool1, pool2, drop_p, train,
                             interpret=not on_tpu)
    from ..parallel.spatial_heads import _resolve_seed

    out = enc(xb, p1["w"], p1["b"], p2["w"], p2["b"],
              _resolve_seed(key, train, drop_p), mask)
    out = out[:, :, ENC_CROP:-ENC_CROP]
    return _unband(out, n, nb)


def decoder_loss_banded(
    x: jax.Array,
    pd1: nets.Params,
    pd2: nets.Params,
    obs: jax.Array,
    key: Optional[jax.Array],
    *,
    drop_p: float,
    train: bool,
    tiling: BandTiling,
    force_kernel: bool = False,
) -> jax.Array:
    """:func:`nets.conv_decoder_loss` as a sequential band loop: per-band
    row-weighted errors sum to the exact global reconstruction loss, and
    the full-resolution recon never exists in HBM."""
    from ..ops.ca import is_tpu_platform
    from ..ops.pallas_head import make_fused_decoder_loss_banded

    on_tpu = is_tpu_platform()
    if not on_tpu and not force_kernel:
        return nets.conv_decoder_loss(x, pd1, pd2, obs, key, drop_p=drop_p,
                                      train=train)
    n, cin, he, we = x.shape
    nb = tiling.bands
    heb = _check(he, nb, 1, "embedding")
    # CLAMPED windows: each band's kernel input is a window of embedding
    # rows that lies FULLY inside the globe (edge bands shift their window
    # inward instead of zero-padding).  Zero-padded out-of-globe embedding
    # halo rows would produce relu(bias) phantom rows at the decoder's MID
    # stage — the encoder's r4 trap one level down (measured: interior
    # bands exact, first/last band wrong by ~0.1-0.3 recon units) —
    # whereas a window inside the globe makes every discrepancy land on
    # rows the per-band error weight already zeroes.  At a globe edge the
    # window's own edge coincides with it, and the kernel's zero fill IS
    # the global deconv's zero padding.
    win = heb + 2 * DEC_HALO if nb > 1 else heb
    if win > he:
        raise ValueError(
            f"band tiling: embedding window {win} exceeds height {he} — "
            f"use fewer bands")
    starts = [min(max(b * heb - DEC_HALO, 0), he - win) for b in range(nb)]
    xb = jnp.stack([x[:, :, s: s + win] for s in starts], axis=1)
    xb = xb.reshape(n * nb, cin, win, we)
    cout = obs.shape[1]
    obs_b = jnp.stack([obs[:, :, 4 * s: 4 * (s + win)] for s in starts],
                      axis=1).reshape(n * nb, cout, 4 * win, obs.shape[3])

    # per-band error row weights: band b's core full-res rows sit at local
    # offset 4·(b·heb − start) inside its window
    h4b = 4 * win
    em_bands = np.zeros((nb, h4b), np.float32)
    for b, s in enumerate(starts):
        o = 4 * (b * heb - s)
        em_bands[b, o: o + 4 * heb] = 1.0
    em = jnp.asarray(
        np.broadcast_to(em_bands[None], (n, nb, h4b))
        .reshape(n * nb, h4b, 1))

    dl = make_fused_decoder_loss_banded(drop_p, train, interpret=not on_tpu)
    from ..parallel.spatial_heads import _resolve_seed

    err = dl(xb, pd1["w"], pd1["b"], pd2["w"], pd2["b"], obs_b,
             _resolve_seed(key, train, drop_p), em)
    return err.reshape(n, nb).sum(axis=1)


def ae_loss_banded(
    src: jax.Array,
    p1: nets.Params,
    p2: nets.Params,
    pd1: nets.Params,
    pd2: nets.Params,
    obs: jax.Array,
    key: Optional[jax.Array],
    *,
    pools: Tuple[int, int],
    drop_p: float,
    train: bool,
    tiling: BandTiling,
    force_kernel: bool = False,
) -> jax.Array:
    """Whole-AE loss under band tiling: banded encoder (full small
    embedding lands in HBM — ~32 MB/inst at 8192², fine) + banded
    decoder-loss.  The single whole-AE kernel cannot span bands (the
    decoder needs neighbouring bands' embeddings), so this is the
    two-call composition."""
    k1, k2 = nets.split_keys(key, 2)
    x = encoder_banded(src, p1, p2, k1, pools=pools, drop_p=drop_p,
                       train=train, tiling=tiling,
                       force_kernel=force_kernel)
    return decoder_loss_banded(x, pd1, pd2, obs, k2, drop_p=drop_p,
                               train=train, tiling=tiling,
                               force_kernel=force_kernel)
