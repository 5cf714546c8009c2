"""Decompose the fused training-step cost and probe conv formulations.

STATUS records the ablation row (dropout / frozen-stack / --rng-impl rbg)
but not WHERE the remaining ~8 ms/step goes at the train_mcl config
(inst=32, 256^2, RND2D+AE2D, reference semantics).  This probe times each
piece as its own scanned jit — env CA step, each wrapper's loss grad, the
layer-level conv grads, and an alternative formulation of the dominant
conv (3x3, in_ch=1 as 9 shifted MACs on the VPU instead of
lax.conv_general_dilated) — so the next optimization targets the measured
bottleneck instead of a guess.

Run on TPU (each piece is a fresh program — first run pays the remote
compiler; the persistent cache covers reruns):
    python scripts/train_cost_probe.py [--pieces env,rnd_grad,...]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from carle_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from carle_tpu.config import EnvConfig  # noqa: E402
from carle_tpu import nets  # noqa: E402
from carle_tpu import rules as _rules  # noqa: E402
from carle_tpu.mcl import ae as ae_mod  # noqa: E402
from carle_tpu.mcl import rnd as rnd_mod  # noqa: E402

STEPS = 64
INST = 32


from carle_tpu.utils.sync import device_sync as _sync  # true axon barrier


def _time(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def _scanned(step_fn):
    """Wrap a (obs, key) -> scalar piece into a STEPS-long scan with a
    data dependency between iterations (no constant folding)."""

    def scan_fn(obs, key):
        def body(carry, _):
            o, k = carry
            k, sub = jax.random.split(k)
            val = step_fn(o, sub)
            # cheap dependency: nudge one corner element by the result
            o = o.at[0, 0, 0, 0].add(val * 1e-20)
            return (o, k), val

        (_, _), vals = jax.lax.scan(body, (obs, key), length=STEPS)
        return vals.sum()

    return jax.jit(scan_fn)


def conv1_rollmac(x, p):
    """3x3 pad-1 conv with in_ch==1 as 9 shifted multiply-adds (VPU path;
    no conv op).  x: [N,1,H,W], w: [O,1,3,3] -> [N,O,H,W]."""
    w, b = p["w"], p["b"]
    xp = jnp.pad(x[:, 0], ((0, 0), (1, 1), (1, 1)))
    h, wdt = x.shape[2], x.shape[3]
    acc = jnp.zeros((x.shape[0], w.shape[0], h, wdt), x.dtype)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy : dy + h, dx : dx + wdt]
            acc = acc + patch[:, None] * w[None, :, 0, dy, dx][..., None, None]
    return acc + b[None, :, None, None]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pieces", default="all")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--rng-impl", choices=("threefry", "rbg"),
                        default="rbg")
    parser.add_argument("--platform", default=None,
                        help="e.g. cpu for a smoke run (the axon plugin "
                             "overrides JAX_PLATFORMS; only "
                             "jax.config.update works)")
    args = parser.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.rng_impl != "threefry":
        jax.config.update("jax_default_prng_impl", args.rng_impl)

    cfg = EnvConfig(height=args.size, width=args.size, instances=INST)
    key = jax.random.PRNGKey(0)
    obs = jax.random.bernoulli(key, 0.3, (INST, 1, args.size, args.size)
                               ).astype(jnp.float32)

    rnd_params = rnd_mod.init_predictor_params(jax.random.PRNGKey(1), cfg)
    rnd_target = rnd_mod.init_random_network_params(jax.random.PRNGKey(2), cfg)
    ae_params = ae_mod.init_ae_params(jax.random.PRNGKey(3), cfg)

    # atol 5e-3: on TPU lax.conv runs at default (reduced) precision while
    # the rollmac path is plain f32 VPU arithmetic — rollmac is the MORE
    # precise formulation
    np.testing.assert_allclose(
        np.asarray(conv1_rollmac(obs[:2], rnd_params["conv1"])),
        np.asarray(nets.conv2d(obs[:2], rnd_params["conv1"], padding=1)),
        rtol=0, atol=5e-3,
    )

    def rnd_loss(params, o, k):
        target = rnd_mod.random_forward(rnd_target, o)
        pred = rnd_mod.predictor_forward(params, o, k, True)
        return jnp.mean((jax.lax.stop_gradient(target) - pred) ** 2)

    def ae_loss(params, o, k):
        recon = ae_mod.ae_forward(params, o, k, True)
        return jnp.mean((o - recon) ** 2)

    def rnd_loss_fused(params, o, k):
        target = rnd_mod.random_forward(rnd_target, o, fused_head=True)
        pred = rnd_mod.predictor_forward(params, o, k, True, fused_head=True)
        return jnp.mean((jax.lax.stop_gradient(target) - pred) ** 2)

    def ae_loss_fused(params, o, k):
        recon = ae_mod.ae_forward(params, o, k, True, fused_head=True)
        return jnp.mean((o - recon) ** 2)

    def conv1_loss(params, o, _):
        return nets.conv2d(o, params, padding=1).sum()

    def head_loss(params, o, k):
        """The RND front-end segment: conv1 -> dropout -> relu -> pool4.
        This is the fusion target — one HBM read of obs, 16x smaller
        write."""
        x = nets.conv2d(o, params, padding=1)
        x = jax.nn.relu(nets.dropout(x, k, 0.1, True))
        return nets.max_pool2(nets.max_pool2(x)).sum()

    def conv1_rollmac_loss(params, o, _):
        return conv1_rollmac(o, params).sum()

    def head_rollmac_loss(params, o, k):
        """Same head with the conv as 9 shifted MACs: no conv op at all, so
        XLA can't pick the tiny-channel conv layout for the activations."""
        x = conv1_rollmac(o, params)
        x = jax.nn.relu(nets.dropout(x, k, 0.1, True))
        return nets.max_pool2(nets.max_pool2(x)).sum()

    def head_folded_loss(params, o, k):
        """lax.conv, but channels folded into batch for the elementwise/pool
        chain (layout probe)."""
        x = nets.conv2d(o, params, padding=1)
        n, c, h, w = x.shape
        x = x.reshape(n * c, 1, h, w)
        x = jax.nn.relu(nets.dropout(x, k, 0.1, True))
        return nets.max_pool2(nets.max_pool2(x)).sum()

    def reshape_pool4(x):
        n, c, h, w = x.shape
        return x.reshape(n, c, h // 4, 4, w // 4, 4).max(axis=(3, 5))

    def head_rm2_loss(params, o, k):
        """rollmac conv + reshape-max pooling: no conv op AND no
        SelectAndScatter in the bwd (max VJP is an eq-mask)."""
        x = conv1_rollmac(o, params)
        x = jax.nn.relu(nets.dropout(x, k, 0.1, True))
        return reshape_pool4(x).sum()

    def stride_pool2(x):
        a = jnp.maximum(x[..., ::2, ::2], x[..., ::2, 1::2])
        b = jnp.maximum(x[..., 1::2, ::2], x[..., 1::2, 1::2])
        return jnp.maximum(a, b)

    def head_stride_loss(params, o, k):
        """rollmac conv + strided-slice pooling (bwd = interior-padded
        scatters instead of SelectAndScatter)."""
        x = conv1_rollmac(o, params)
        x = jax.nn.relu(nets.dropout(x, k, 0.1, True))
        return stride_pool2(stride_pool2(x)).sum()

    def pool4_only_loss(o):
        return nets.max_pool2(nets.max_pool2(o)).sum()

    pieces = {
        "env": None,  # filled below (different carry shape)
        "rnd_fwd": _scanned(lambda o, k: rnd_loss(rnd_params, o, k)),
        "rnd_grad": _scanned(
            lambda o, k: jax.grad(rnd_loss)(rnd_params, o, k)["conv1"]["b"].sum()
        ),
        "ae_fwd": _scanned(lambda o, k: ae_loss(ae_params, o, k)),
        "ae_grad": _scanned(
            lambda o, k: jax.grad(ae_loss)(ae_params, o, k)["conv1"]["b"].sum()
        ),
        "rnd_grad_fused": _scanned(
            lambda o, k: jax.grad(rnd_loss_fused)(
                rnd_params, o, k)["conv1"]["b"].sum()
        ),
        "ae_grad_fused": _scanned(
            lambda o, k: jax.grad(ae_loss_fused)(
                ae_params, o, k)["conv1"]["b"].sum()
        ),
        "conv1_fwd": _scanned(
            lambda o, k: conv1_loss(rnd_params["conv1"], o, k)
        ),
        "conv1_grad": _scanned(
            lambda o, k: jax.grad(conv1_loss)(rnd_params["conv1"], o, k)["b"].sum()
        ),
        "head_fwd": _scanned(
            lambda o, k: head_loss(rnd_params["conv1"], o, k)
        ),
        "head_grad": _scanned(
            lambda o, k: jax.grad(head_loss)(rnd_params["conv1"], o, k)["b"].sum()
        ),
        "head_rollmac_fwd": _scanned(
            lambda o, k: head_rollmac_loss(rnd_params["conv1"], o, k)
        ),
        "head_rollmac_grad": _scanned(
            lambda o, k: jax.grad(head_rollmac_loss)(
                rnd_params["conv1"], o, k)["b"].sum()
        ),
        "head_stride_fwd": _scanned(
            lambda o, k: head_stride_loss(rnd_params["conv1"], o, k)
        ),
        "head_stride_grad": _scanned(
            lambda o, k: jax.grad(head_stride_loss)(
                rnd_params["conv1"], o, k)["b"].sum()
        ),
        "pool4_grad": _scanned(
            lambda o, k: jax.grad(
                lambda oo: pool4_only_loss(
                    jnp.broadcast_to(oo, (oo.shape[0], 4) + oo.shape[2:]))
            )(o).sum()
        ),
        "head_rm2_fwd": _scanned(
            lambda o, k: head_rm2_loss(rnd_params["conv1"], o, k)
        ),
        "head_rm2_grad": _scanned(
            lambda o, k: jax.grad(head_rm2_loss)(
                rnd_params["conv1"], o, k)["b"].sum()
        ),
        "head_folded_fwd": _scanned(
            lambda o, k: head_folded_loss(rnd_params["conv1"], o, k)
        ),
        "head_folded_grad": _scanned(
            lambda o, k: jax.grad(head_folded_loss)(
                rnd_params["conv1"], o, k)["b"].sum()
        ),
        "conv1_rollmac_fwd": _scanned(
            lambda o, k: conv1_rollmac_loss(rnd_params["conv1"], o, k)
        ),
        "conv1_rollmac_grad": _scanned(
            lambda o, k: jax.grad(conv1_rollmac_loss)(
                rnd_params["conv1"], o, k)["b"].sum()
        ),
    }

    # env piece: CA step scan on the packed-free uint8 path (the train path)
    from carle_tpu.ops.ca import ca_step_with_action

    def env_scan(grid, k):
        def body(carry, _):
            g, kk = carry
            kk, sub = jax.random.split(kk)
            action = jax.random.bernoulli(
                sub, 0.1,
                (INST, cfg.eff_action_height, cfg.eff_action_width),
            ).astype(jnp.uint8)
            g = ca_step_with_action(
                g, action, jnp.asarray(_rules.LIFE, jnp.int32), config=cfg)
            return (g, kk), g[0, 0, 0]

        (_, _), vals = jax.lax.scan(body, (grid, k), length=STEPS)
        return vals.astype(jnp.int32).sum()

    grid = (obs[:, 0] > 0).astype(jnp.uint8)
    env_fn = jax.jit(env_scan)

    want = (set(pieces) if args.pieces == "all"
            else set(args.pieces.split(",")))
    results = {}
    for name in sorted(want):
        t0 = time.time()
        if name == "env":
            per_step = _time(env_fn, grid, key)
        else:
            per_step = _time(pieces[name], obs, key)
        results[name] = round(per_step * 1e3, 4)
        print(json.dumps({
            "piece": name, "ms_per_step": results[name],
            "compile_plus_run_s": round(time.time() - t0, 1),
        }), flush=True)

    print(json.dumps({"train_cost_probe": results,
                      "config": {"instances": INST, "size": args.size,
                                 "steps": STEPS,
                                 "rng_impl": args.rng_impl}}))


if __name__ == "__main__":
    main()
