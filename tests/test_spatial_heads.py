"""Fused wrapper-net kernels on row-sharded observations (VERDICT r3 item 2).

parallel/spatial_heads.py shard_maps the fused encoder/tail kernels over
the ``space`` mesh axis with explicit row-halo exchange, lifting the old
"wrappers must be plain-XLA" constraint of the packed spatial env mode.
Kernel-path tests run interpret-mode pallas inside shard_map
(force_kernel); the stack-level 1024² parity runs the same SpaceSharding
routing through its off-TPU GSPMD fallback (identical math — the kernels
themselves are hardware-validated by scripts/fused_net_validate.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from carle_tpu import nets, rules
from carle_tpu.config import EnvConfig
from carle_tpu.nets import SpaceSharding


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("space",))


def _row_shard(x, mesh):
    return jax.device_put(x, NamedSharding(mesh, P(None, None, "space")))


def test_encoder_spatial_matches_unsharded():
    """Halo'd shard_mapped encoder kernel == unsharded composition, fwd and
    all four param grads (uint8 input, pools (2,2) and (4,2))."""
    from carle_tpu.parallel import spatial_heads as sh

    mesh = _mesh()
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.rand(2, 1, 64, 128) < 0.3).astype(np.uint8))
    for pools, c1, c2 in [((2, 2), 4, 2), ((4, 2), 4, 1)]:
        p1 = {"w": jnp.asarray(rng.randn(c1, 1, 3, 3).astype(np.float32) * .3),
              "b": jnp.asarray(rng.randn(c1).astype(np.float32) * .1)}
        p2 = {"w": jnp.asarray(rng.randn(c2, c1, 3, 3).astype(np.float32) * .3),
              "b": jnp.asarray(rng.randn(c2).astype(np.float32) * .1)}
        want = nets.conv_encoder(x, p1, p2, None, pools=pools, drop_p=0.0,
                                 train=False)
        got = sh.encoder_spatial(
            x, p1, p2, None, pools=pools, drop_p=0.0, train=False,
            sharding=SpaceSharding(mesh), force_kernel=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

        co = jnp.asarray(rng.randn(*want.shape).astype(np.float32))

        def loss(params, fn):
            return (fn(params) * co).sum()

        gk = jax.grad(lambda p: loss(p, lambda q: sh.encoder_spatial(
            x, q["1"], q["2"], None, pools=pools, drop_p=0.0, train=False,
            sharding=SpaceSharding(mesh), force_kernel=True)))(
                {"1": p1, "2": p2})
        gr = jax.grad(lambda p: loss(p, lambda q: nets.conv_encoder(
            x, q["1"], q["2"], None, pools=pools, drop_p=0.0,
            train=False)))({"1": p1, "2": p2})
        for a, r in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
            scale = float(np.abs(np.asarray(r)).max()) or 1.0
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(r) / scale,
                                       rtol=3e-6, atol=3e-6)


def test_tail_spatial_matches_unsharded():
    """Halo'd shard_mapped deconv tail == unsharded, fwd + grads + input
    cotangent (the tail sits mid-net, its dx must survive the crop)."""
    from carle_tpu.parallel import spatial_heads as sh

    mesh = _mesh()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 2, 32, 64).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(2, 1, 4, 4).astype(np.float32) * .3),
         "b": jnp.asarray(rng.randn(1).astype(np.float32) * .1)}
    want = nets.conv_tail(x, p, None, act="relu", drop_p=0.0, train=False)
    got = sh.tail_spatial(x, p, None, act="relu", drop_p=0.0, train=False,
                          sharding=SpaceSharding(mesh), force_kernel=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    co = jnp.asarray(rng.randn(*want.shape).astype(np.float32))
    gk = jax.grad(lambda px: (sh.tail_spatial(
        px["x"], px["p"], None, act="relu", drop_p=0.0, train=False,
        sharding=SpaceSharding(mesh), force_kernel=True) * co).sum())(
            {"x": x, "p": p})
    gr = jax.grad(lambda px: (nets.conv_tail(
        px["x"], px["p"], None, act="relu", drop_p=0.0,
        train=False) * co).sum())({"x": x, "p": p})
    for a, r in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def _patched_force_kernel(monkeypatch):
    """Route the SpaceSharding paths through the interpret-mode KERNELS on
    CPU (nets imports these symbols at call time, so patching the module
    attributes reaches the wrapper defs)."""
    from carle_tpu.parallel import spatial_heads as sh

    for name in ("encoder_spatial", "tail_spatial", "loss_tail_spatial"):
        orig = getattr(sh, name)

        def forced(*a, _orig=orig, **k):
            k["force_kernel"] = True
            return _orig(*a, **k)

        monkeypatch.setattr(sh, name, forced)


@pytest.mark.parametrize("kernel_path", [False, True])
def test_packed_spatial_online_learning_fused_parity(monkeypatch,
                                                     kernel_path):
    """FULL online-learning parity inside the packed spatial env: RND+AE
    with fused_head=SpaceSharding on the 8-device mesh vs the dense
    unfused single-device stack — rewards equal through live Adam updates.
    kernel_path=True runs the interpret-mode pallas kernels inside
    shard_map at 64² (dropout off: interpret stubs the PRNG);
    kernel_path=False runs the GSPMD fallback at 1024² (the VERDICT r3
    item-2 geometry)."""
    from carle_tpu.agents import make_random_agent
    from carle_tpu.mcl.ae import ae2d_def
    from carle_tpu.mcl.base import WrapperStack
    from carle_tpu.mcl.rnd import rnd2d_def
    from carle_tpu.parallel import shard_carry_packed
    from carle_tpu.parallel.packed_env import PackedSpatialStack
    from carle_tpu.rollout import Rollout

    if kernel_path:
        _patched_force_kernel(monkeypatch)
        size, steps = 64, 3
    else:
        size, steps = 1024, 2

    mesh = _mesh()
    cfg = EnvConfig(height=size, width=size, action_height=16,
                    action_width=16, instances=2)
    mk = functools.partial(dict, batch_size=2, dropout=False)

    def defs(fused):
        return [rnd2d_def(cfg, fused_head=fused, **mk()),
                ae2d_def(cfg, fused_head=fused, **mk())]

    # dense, unfused, single-device oracle
    oracle = Rollout(cfg, defs(False), make_random_agent(16, 16),
                     stack=WrapperStack(cfg, defs(False)))
    ocarry = oracle.init(jax.random.PRNGKey(7), rules.LIFE)
    ocarry, orewards = oracle.run(ocarry, num_steps=steps)
    assert int(ocarry.stack.wrappers[0].updates) >= 1  # Adam really fired

    # packed + row-sharded + fused-over-space
    fused = SpaceSharding(mesh)
    stack = PackedSpatialStack(cfg, defs(fused), mesh)
    ro = Rollout(cfg, defs(fused), make_random_agent(16, 16), stack=stack)
    carry = shard_carry_packed(ro.init(jax.random.PRNGKey(7), rules.LIFE),
                               mesh, cfg)
    carry, rewards = ro.run(carry, num_steps=steps)

    assert int(carry.stack.wrappers[0].updates) == int(
        ocarry.stack.wrappers[0].updates)
    np.testing.assert_allclose(np.asarray(rewards), np.asarray(orewards),
                               rtol=2e-4, atol=2e-5)
