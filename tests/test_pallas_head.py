"""Fused conv-head kernel tests (interpret mode, CPU).

Dropout inside the kernel uses the TPU hardware PRNG, which the Pallas
interpreter stubs to zero bits — so CPU tests cover the drop_p=0 paths
exactly (fwd bit-parity, parameter-grad parity) and hardware behavior
(dropout rate, determinism, speed) is exercised by the TPU verify drive.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carle_tpu import nets
from carle_tpu.config import EnvConfig
from carle_tpu.ops.pallas_head import make_fused_head


def _ref_pool(z, pool):
    n, c, h, w = z.shape
    return z.reshape(n, c, h // pool, pool, w // pool, pool).max(axis=(3, 5))


@pytest.mark.parametrize("shape", [(4, 1, 4, 64, 128, 4), (2, 4, 2, 64, 128, 2),
                                   (3, 2, 3, 32, 64, 2)])
def test_head_forward_parity(shape):
    n, cin, cout, h, w, pool = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, cin, h, w).astype(np.float32))
    wt = jnp.asarray(rng.randn(cout, cin, 3, 3).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)

    head = make_fused_head(pool, 0.0, train=False, interpret=True)
    out = head(x, wt, b, jnp.int32(0))
    expected = _ref_pool(
        jax.nn.relu(nets.conv2d(x, {"w": wt, "b": b}, padding=1)), pool)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(4, 1, 4, 64, 128, 4), (2, 4, 2, 64, 128, 2)])
def test_head_param_grads_parity(shape):
    """Grad parity vs the reshape-max composition (identical reduce-max VJP
    tie semantics), on binary-like inputs where ties are plentiful."""
    n, cin, cout, h, w, pool = shape
    rng = np.random.RandomState(1)
    x = jnp.asarray((rng.rand(n, cin, h, w) < 0.3).astype(np.float32))
    wt = jnp.asarray(rng.randn(cout, cin, 3, 3).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)

    head = make_fused_head(pool, 0.0, train=False, interpret=True)
    co = jnp.asarray(rng.randn(n, cout, h // pool, w // pool)
                     .astype(np.float32))

    def loss_f(wt, b):
        return (head(x, wt, b, jnp.int32(0)) * co).sum()

    def loss_r(wt, b):
        z = jax.nn.relu(nets.conv2d(x, {"w": wt, "b": b}, padding=1))
        return (_ref_pool(z, pool) * co).sum()

    gf = jax.grad(loss_f, argnums=(0, 1))(wt, b)
    gr = jax.grad(loss_r, argnums=(0, 1))(wt, b)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-6)


def test_head_zero_input_cotangent():
    """The head advertises first-layer-only use: its input cotangent is
    structurally zero."""
    head = make_fused_head(2, 0.0, train=False, interpret=True)
    x = jnp.ones((2, 1, 16, 32), jnp.float32)
    wt = jnp.ones((1, 1, 3, 3), jnp.float32)
    b = jnp.zeros((1,), jnp.float32)
    gx = jax.grad(lambda x_: head(x_, wt, b, jnp.int32(0)).sum())(x)
    assert float(jnp.abs(gx).max()) == 0.0


def test_conv_head_at_wrapper_shapes():
    """The interpret kernel (force_kernel=True) matches the unfused conv_head
    fallback at the real wrapper front-end configs (RND conv1 pool4,
    AE conv1 pool2) with dropout off."""
    from carle_tpu.mcl.ae import init_ae_params
    from carle_tpu.mcl.rnd import init_predictor_params

    cfg = EnvConfig(height=64, width=128, instances=2)
    obs = jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.3, (2, 1, 64, 128)).astype(jnp.float32)
    rnd_p = init_predictor_params(jax.random.PRNGKey(0), cfg)["conv1"]
    ae_p = init_ae_params(jax.random.PRNGKey(1), cfg)["conv1"]

    for p, pool in ((rnd_p, 4), (ae_p, 2)):
        out_k = nets.conv_head(obs, p, None, pool=pool, drop_p=0.1,
                               train=False, force_kernel=True)
        out_u = nets.conv_head(obs, p, None, pool=pool, drop_p=0.1,
                               train=False, force_kernel=False)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_u),
                                   rtol=1e-5, atol=1e-5)


def test_train_fused_head_runs(tmp_path):
    """End-to-end: a tiny train() with fused_head=True runs and checkpoints
    (CPU interpret path, dropout masks all-keep is fine for smoke)."""
    from carle_tpu.train_mcl import train

    history = train(
        instances=2, steps=[1, 6], rules=[[[3], [2, 3]]],
        height=64, width=64, batch_size=4,
        log_dir=str(tmp_path / "logs"), seed=0, fused_head=True,
    )
    assert history.shape == (6,)
    assert np.isfinite(history).all()


@pytest.mark.parametrize("shape", [(2, 4, 2, 64, 128, 2)])
def test_head_input_cotangent_parity(shape):
    """need_dx=True computes the true input cotangent (deeper fused heads)."""
    n, cin, cout, h, w, pool = shape
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(n, cin, h, w).astype(np.float32))
    wt = jnp.asarray(rng.randn(cout, cin, 3, 3).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    head = make_fused_head(pool, 0.0, train=False, interpret=True,
                           need_dx=True)
    out = head(x, wt, b, jnp.int32(0))
    co = jnp.asarray(rng.randn(*out.shape).astype(np.float32))

    def loss_f(x_):
        return (head(x_, wt, b, jnp.int32(0)) * co).sum()

    def loss_r(x_):
        z = jax.nn.relu(nets.conv2d(x_, {"w": wt, "b": b}, padding=1))
        return (_ref_pool(z, pool) * co).sum()

    gf = jax.grad(loss_f)(x)
    gr = jax.grad(loss_r)(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("act,cin", [("relu", 2), ("sigmoid", 1)])
def test_tail_parity(act, cin):
    """Fused ConvTranspose tail (stride 2, k4, pad 1 + act): fwd and the
    full VJP (dx, dw, db) match the XLA composition."""
    from carle_tpu.ops.pallas_head import make_fused_tail

    rng = np.random.RandomState(11)
    n, cout, hi, wi = 2, 1, 32, 64
    x = jnp.asarray(rng.randn(n, cin, hi, wi).astype(np.float32))
    wt = jnp.asarray(rng.randn(cin, cout, 4, 4).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)

    def ref(x, wt, b):
        z = nets.conv_transpose2d(x, {"w": wt, "b": b}, stride=2, padding=1)
        return jnp.maximum(z, 0.0) if act == "relu" else jax.nn.sigmoid(z)

    tail = make_fused_tail(act, 0.0, train=False, interpret=True)
    out = tail(x, wt, b, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x, wt, b)),
                               rtol=1e-5, atol=1e-5)

    co = jnp.asarray(rng.randn(*out.shape).astype(np.float32))
    gf = jax.grad(lambda x_, w_, b_: (tail(x_, w_, b_, jnp.int32(0))*co).sum(),
                  argnums=(0, 1, 2))(x, wt, b)
    gr = jax.grad(lambda x_, w_, b_: (ref(x_, w_, b_)*co).sum(),
                  argnums=(0, 1, 2))(x, wt, b)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_ae_fused_grads_full_stack():
    """The fully-fused AE forward (2 heads + 2 tails, interpret kernels via
    monkeypatched platform detection is overkill — here: kernel chain built
    directly) produces grads for ALL params matching the XLA composition."""
    from carle_tpu.mcl.ae import init_ae_params
    from carle_tpu.ops.pallas_head import make_fused_head, make_fused_tail

    cfg = EnvConfig(height=32, width=64, instances=2)
    params = init_ae_params(jax.random.PRNGKey(0), cfg)
    obs = jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.3, (2, 1, 32, 64)).astype(jnp.float32)

    h1 = make_fused_head(2, 0.0, train=False, interpret=True)
    h2 = make_fused_head(2, 0.0, train=False, interpret=True, need_dx=True)
    t1 = make_fused_tail("relu", 0.0, train=False, interpret=True)
    t2 = make_fused_tail("sigmoid", 0.0, train=False, interpret=True)

    def fused_loss(p):
        x = h1(obs, p["conv1"]["w"], p["conv1"]["b"], jnp.int32(0))
        x = h2(x, p["conv2"]["w"], p["conv2"]["b"], jnp.int32(0))
        x = t1(x, p["deconv1"]["w"], p["deconv1"]["b"], jnp.int32(0))
        x = t2(x, p["deconv2"]["w"], p["deconv2"]["b"], jnp.int32(0))
        return jnp.mean((obs - x) ** 2)

    def ref_loss(p):
        x = nets.conv2d(obs, p["conv1"], padding=1)
        x = _ref_pool(jax.nn.relu(x), 2)
        x = nets.conv2d(x, p["conv2"], padding=1)
        x = _ref_pool(jax.nn.relu(x), 2)
        x = jax.nn.relu(nets.conv_transpose2d(x, p["deconv1"],
                                              stride=2, padding=1))
        x = jax.nn.sigmoid(nets.conv_transpose2d(x, p["deconv2"],
                                                 stride=2, padding=1))
        return jnp.mean((obs - x) ** 2)

    gf = jax.grad(fused_loss)(params)
    gr = jax.grad(ref_loss)(params)
    flat_f, _ = jax.tree.flatten(gf)
    flat_r, _ = jax.tree.flatten(gr)
    for a, r in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-3, atol=1e-6)


def test_rnd_fused_grads_full_stack():
    """The fully-fused RND predictor (head pool4 + deeper head pool2 with
    need_dx + dense/tanh) produces grads for ALL params matching the XLA
    composition (mirrors mcl/rnd.py predictor_forward's fused path)."""
    from carle_tpu.mcl.rnd import init_predictor_params
    from carle_tpu.ops.pallas_head import make_fused_head

    cfg = EnvConfig(height=32, width=64, instances=2)
    params = init_predictor_params(jax.random.PRNGKey(0), cfg)
    obs = jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.3, (2, 1, 32, 64)).astype(jnp.float32)

    h1 = make_fused_head(4, 0.0, train=False, interpret=True)
    h2 = make_fused_head(2, 0.0, train=False, interpret=True, need_dx=True)

    def fused_loss(p):
        x = h1(obs, p["conv1"]["w"], p["conv1"]["b"], jnp.int32(0))
        x = h2(x, p["conv2"]["w"], p["conv2"]["b"], jnp.int32(0))
        x = jnp.tanh(nets.linear(nets.flatten(x), p["dense"]))
        return (x ** 2).mean()

    def ref_loss(p):
        x = nets.conv2d(obs, p["conv1"], padding=1)
        x = _ref_pool(jax.nn.relu(x), 4)
        x = nets.conv2d(x, p["conv2"], padding=1)
        x = _ref_pool(jax.nn.relu(x), 2)
        x = jnp.tanh(nets.linear(nets.flatten(x), p["dense"]))
        return (x ** 2).mean()

    gf = jax.grad(fused_loss)(params)
    gr = jax.grad(ref_loss)(params)
    for a, r in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-3, atol=1e-7)


def test_fused_kernels_shard_over_mesh():
    """Mesh-wrapped fused kernels (nets._shard_fused): a pallas_call is
    opaque to GSPMD — under committed shardings the batch silently gathers
    onto one device — so conv_head/conv_tail accept a Mesh and shard_map
    the kernel over the instance axis.  Checks (on the 8-device CPU mesh):
    output stays batch-sharded, and grads (incl. the psummed replicated-
    weight cotangents from the shard_map transpose) match the unsharded
    kernel."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]), ("env",))
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(16, 1, 32, 64).astype(np.float32))
    x = jax.device_put(x, NamedSharding(mesh, P("env")))
    hp = {"w": jnp.asarray(rng.randn(2, 1, 3, 3).astype(np.float32) * 0.3),
          "b": jnp.asarray(rng.randn(2).astype(np.float32) * 0.1)}
    tp = {"w": jnp.asarray(rng.randn(2, 1, 4, 4).astype(np.float32) * 0.3),
          "b": jnp.asarray(rng.randn(1).astype(np.float32) * 0.1)}
    co = jnp.asarray(rng.randn(16, 1, 32, 64).astype(np.float32))

    def net(p, mesh_arg):
        z = nets.conv_head(x, p["h"], None, pool=2, drop_p=0.0, train=False,
                           force_kernel=True, need_dx=False, mesh=mesh_arg)
        z = nets.conv_tail(z, p["t"], None, act="relu", drop_p=0.0,
                           train=False, force_kernel=True, mesh=mesh_arg)
        return (z * co).sum()

    params = {"h": hp, "t": tp}
    out_sharded = jax.jit(
        lambda p: nets.conv_head(x, p["h"], None, pool=2, drop_p=0.0,
                                 train=False, force_kernel=True, mesh=mesh)
    )(params)
    assert out_sharded.sharding.is_equivalent_to(
        NamedSharding(mesh, P("env")), out_sharded.ndim)

    gs = jax.jit(jax.grad(lambda p: net(p, mesh)))(params)
    gp = jax.jit(jax.grad(lambda p: net(p, None)))(params)
    for a, r in zip(jax.tree.leaves(gs), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_policy_fused_head_parity():
    """policy_logits(fused_head) matches the unfused forward and grads —
    the policy net shares the wrapper nets' tiny-channel pathology, so
    PolicyTrainer/PPOTrainer accept fused_head too (interpret kernels via
    force_kernel on CPU; dropout-free config so interpret is exact)."""
    from carle_tpu.policy import init_policy_params, policy_logits

    cfg = EnvConfig(height=32, width=64, action_height=16, action_width=16,
                    instances=4)
    params = init_policy_params(jax.random.PRNGKey(0), cfg)
    obs = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.3, (4, 1, 32, 64)).astype(jnp.float32)
    co = jax.random.normal(jax.random.PRNGKey(2), (4, 16 * 16))

    def loss_fused(p):
        return (policy_logits(p, obs, force_kernel=True) * co).sum()

    def loss_ref(p):
        return (policy_logits(p, obs) * co).sum()

    lf, gf = jax.value_and_grad(loss_fused)(params)
    lr, gr = jax.value_and_grad(loss_ref)(params)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)
    for a, r in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("act,cin", [("sigmoid", 1), ("relu", 2)])
def test_loss_tail_parity(act, cin):
    """Fused loss tail (deconv stage + sum((obs-y)^2) reduction in one
    kernel): fwd value and the full VJP (dx, dw, db) match the XLA
    composition that materialises the reconstruction."""
    from carle_tpu.ops.pallas_head import make_fused_loss_tail

    rng = np.random.RandomState(21)
    n, cout, hi, wi = 4, 1, 32, 64
    x = jnp.asarray(rng.randn(n, cin, hi, wi).astype(np.float32))
    wt = jnp.asarray(rng.randn(cin, cout, 4, 4).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    obs = jnp.asarray(
        (rng.rand(n, cout, 2 * hi, 2 * wi) < 0.3).astype(np.float32))

    def ref(x, wt, b):
        z = nets.conv_transpose2d(x, {"w": wt, "b": b}, stride=2, padding=1)
        y = jnp.maximum(z, 0.0) if act == "relu" else jax.nn.sigmoid(z)
        return jnp.sum((obs - y) ** 2, axis=(1, 2, 3))

    lt = make_fused_loss_tail(act, 0.0, train=False, interpret=True)
    err = lt(x, wt, b, obs, jnp.int32(0))
    assert err.shape == (n,)
    np.testing.assert_allclose(np.asarray(err), np.asarray(ref(x, wt, b)),
                               rtol=1e-4, atol=1e-4)

    co = jnp.asarray(rng.randn(n).astype(np.float32))
    gf = jax.grad(
        lambda x_, w_, b_: (lt(x_, w_, b_, obs, jnp.int32(0)) * co).sum(),
        argnums=(0, 1, 2))(x, wt, b)
    gr = jax.grad(lambda x_, w_, b_: (ref(x_, w_, b_) * co).sum(),
                  argnums=(0, 1, 2))(x, wt, b)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-3, atol=1e-4)


def test_ae_fused_loss_full_stack():
    """The fully-fused AE with the LOSS tail as the final stage (no full-res
    recon in HBM) produces the same per-instance loss and ALL-param grads
    as the XLA composition."""
    from carle_tpu.mcl.ae import init_ae_params
    from carle_tpu.ops.pallas_head import (
        make_fused_head, make_fused_loss_tail, make_fused_tail)

    cfg = EnvConfig(height=32, width=64, instances=2)
    params = init_ae_params(jax.random.PRNGKey(0), cfg)
    obs = jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.3, (2, 1, 32, 64)).astype(jnp.float32)

    h1 = make_fused_head(2, 0.0, train=False, interpret=True)
    h2 = make_fused_head(2, 0.0, train=False, interpret=True, need_dx=True)
    t1 = make_fused_tail("relu", 0.0, train=False, interpret=True)
    lt = make_fused_loss_tail("sigmoid", 0.0, train=False, interpret=True)

    def fused_loss(p):
        x = h1(obs, p["conv1"]["w"], p["conv1"]["b"], jnp.int32(0))
        x = h2(x, p["conv2"]["w"], p["conv2"]["b"], jnp.int32(0))
        x = t1(x, p["deconv1"]["w"], p["deconv1"]["b"], jnp.int32(0))
        err = lt(x, p["deconv2"]["w"], p["deconv2"]["b"], obs, jnp.int32(0))
        return jnp.mean(err / jnp.float32(obs[0].size))

    def ref_loss(p):
        x = nets.conv2d(obs, p["conv1"], padding=1)
        x = _ref_pool(jax.nn.relu(x), 2)
        x = nets.conv2d(x, p["conv2"], padding=1)
        x = _ref_pool(jax.nn.relu(x), 2)
        x = jax.nn.relu(nets.conv_transpose2d(x, p["deconv1"],
                                              stride=2, padding=1))
        x = jax.nn.sigmoid(nets.conv_transpose2d(x, p["deconv2"],
                                                 stride=2, padding=1))
        return jnp.mean((obs - x) ** 2)

    lf, gf = jax.value_and_grad(fused_loss)(params)
    lr, gr = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)
    for a, r in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-3, atol=1e-6)


def test_loss_tail_shards_over_mesh():
    """conv_loss_tail(mesh=...) shard_maps the kernel over the instance
    axis; values and grads match the unsharded kernel."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]), ("env",))
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(16, 1, 16, 32).astype(np.float32))
    x = jax.device_put(x, NamedSharding(mesh, P("env")))
    p = {"w": jnp.asarray(rng.randn(1, 1, 4, 4).astype(np.float32) * 0.3),
         "b": jnp.asarray(rng.randn(1).astype(np.float32) * 0.1)}
    obs = jnp.asarray((rng.rand(16, 1, 32, 64) < 0.3).astype(np.float32))
    obs = jax.device_put(obs, NamedSharding(mesh, P("env")))
    co = jnp.asarray(rng.randn(16).astype(np.float32))

    def loss(pp, mesh_arg):
        err = nets.conv_loss_tail(x, pp, obs, None, act="sigmoid",
                                  drop_p=0.0, train=False,
                                  force_kernel=True, mesh=mesh_arg)
        return (err * co).sum()

    vs, gs = jax.jit(jax.value_and_grad(lambda pp: loss(pp, mesh)))(p)
    vu, gu = jax.jit(jax.value_and_grad(lambda pp: loss(pp, None)))(p)
    np.testing.assert_allclose(float(vs), float(vu), rtol=1e-5)
    for a, r in zip(jax.tree.leaves(gs), jax.tree.leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_ae2d_def_fused_loss_wiring():
    """ae2d_def(fused_head=True)'s loss path (the conv_loss_tail branch)
    produces the same bonus and learning trajectory as the dense def on
    CPU (where both resolve to XLA compositions — the kernel itself is
    covered by the interpret tests above); exercises the full WrapperDef
    apply including the Adam update gate."""
    from carle_tpu.mcl.ae import ae2d_def
    from carle_tpu.mcl.base import StepCtx

    cfg = EnvConfig(height=32, width=32, instances=2)
    d_fused = ae2d_def(cfg, batch_size=2, fused_head=True, dropout=False)
    d_plain = ae2d_def(cfg, batch_size=2, dropout=False)
    sf = d_fused.init(jax.random.PRNGKey(0))
    sp = d_plain.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for i in range(4):
        obs = jax.random.bernoulli(
            jax.random.PRNGKey(10 + i), 0.3, (2, 1, 32, 32)
        ).astype(jnp.float32)
        ctx = StepCtx(prev_grid=obs[:, 0].astype(jnp.uint8), obs=obs,
                      action=jnp.zeros((2, 16, 16), jnp.uint8),
                      action_full=jnp.zeros((2, 32, 32), jnp.uint8),
                      key=key, action_sum=jnp.zeros((2, 1)))
        r0 = jnp.zeros((2, 1))
        sf, rf = d_fused.apply(sf, ctx, r0)
        sp, rp = d_plain.apply(sp, ctx, r0)
        np.testing.assert_allclose(np.asarray(rf), np.asarray(rp),
                                   rtol=1e-5, atol=1e-6)
    assert int(sf.updates) == int(sp.updates) == 2


# ---------------------------------------------------------------------------
# Fused two-stage encoder (r4): conv+drop+relu+pool x2 in one kernel
# ---------------------------------------------------------------------------


def _ref_encoder(x, p1, p2, pool1, pool2):
    x = x.astype(jnp.float32)
    z = _ref_pool(jax.nn.relu(nets.conv2d(x, p1, padding=1)), pool1)
    return _ref_pool(jax.nn.relu(nets.conv2d(z, p2, padding=1)), pool2)


@pytest.mark.parametrize("cfg", [(4, 2, 4, 1), (2, 2, 4, 2)])
def test_encoder_forward_parity(cfg):
    """The one-kernel encoder (RND pools (4,2) / AE pools (2,2)) matches
    the unfused two-stage composition, for BOTH f32 and uint8 inputs (the
    uint8 obs upcasts inside VMEM — ops/pallas_head._plane_f32)."""
    from carle_tpu.ops.pallas_head import make_fused_encoder

    p1_, p2_, c1, c2 = cfg
    rng = np.random.RandomState(0)
    x8 = jnp.asarray((rng.rand(6, 1, 32, 64) < 0.3).astype(np.uint8))
    w1 = {"w": jnp.asarray(rng.randn(c1, 1, 3, 3).astype(np.float32) * 0.3),
          "b": jnp.asarray(rng.randn(c1).astype(np.float32) * 0.1)}
    w2 = {"w": jnp.asarray(rng.randn(c2, c1, 3, 3).astype(np.float32) * 0.3),
          "b": jnp.asarray(rng.randn(c2).astype(np.float32) * 0.1)}
    enc = make_fused_encoder(p1_, p2_, 0.0, train=False, interpret=True)
    want = _ref_encoder(x8, w1, w2, p1_, p2_)
    ones = jnp.ones((x8.shape[2] // p1_, 1), jnp.float32)
    for x in (x8, x8.astype(jnp.float32)):
        out = enc(x, w1["w"], w1["b"], w2["w"], w2["b"], jnp.int32(0), ones)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_encoder_param_grads_parity():
    """Encoder grads (all four param leaves) match the unfused composition
    at a tile < n geometry (cross-grid-step SMEM accumulation + the
    stage-1 recompute in the backward kernel)."""
    from carle_tpu.ops.pallas_head import _enc_tile, make_fused_encoder

    rng = np.random.RandomState(1)
    n, h, w = 8, 256, 256
    assert _enc_tile(n, 1, 4, h, w, 2) < n  # the point of this geometry
    x8 = jnp.asarray((rng.rand(n, 1, h, w) < 0.3).astype(np.uint8))
    co = jnp.asarray(rng.randn(n, 2, h // 4, w // 4).astype(np.float32))
    w1 = {"w": jnp.asarray(rng.randn(4, 1, 3, 3).astype(np.float32) * 0.3),
          "b": jnp.asarray(rng.randn(4).astype(np.float32) * 0.1)}
    w2 = {"w": jnp.asarray(rng.randn(2, 4, 3, 3).astype(np.float32) * 0.3),
          "b": jnp.asarray(rng.randn(2).astype(np.float32) * 0.1)}
    enc = make_fused_encoder(2, 2, 0.0, train=False, interpret=True)
    ones = jnp.ones((h // 2, 1), jnp.float32)

    def loss_k(p):
        z = enc(x8, p["1"]["w"], p["1"]["b"], p["2"]["w"], p["2"]["b"],
                jnp.int32(0), ones)
        return (z * co).sum()

    def loss_r(p):
        return (_ref_encoder(x8, p["1"], p["2"], 2, 2) * co).sum()

    params = {"1": w1, "2": w2}
    gk = jax.grad(loss_k)(params)
    gr = jax.grad(loss_r)(params)
    for a, r in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        scale = float(np.abs(np.asarray(r)).max()) or 1.0
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(r) / scale,
                                   rtol=2e-6, atol=2e-6)


def test_conv_encoder_fallback_and_kernel_agree():
    """nets.conv_encoder: the off-TPU fallback (unfused XLA chain) and the
    interpret-mode kernel compute the same function, from uint8 input."""
    rng = np.random.RandomState(2)
    x8 = jnp.asarray((rng.rand(4, 1, 32, 32) < 0.3).astype(np.uint8))
    p1 = {"w": jnp.asarray(rng.randn(4, 1, 3, 3).astype(np.float32) * 0.3),
          "b": jnp.asarray(rng.randn(4).astype(np.float32) * 0.1)}
    p2 = {"w": jnp.asarray(rng.randn(1, 4, 3, 3).astype(np.float32) * 0.3),
          "b": jnp.asarray(rng.randn(1).astype(np.float32) * 0.1)}
    fb = nets.conv_encoder(x8, p1, p2, None, pools=(4, 2), drop_p=0.0,
                           train=False)
    kk = nets.conv_encoder(x8, p1, p2, None, pools=(4, 2), drop_p=0.0,
                           train=False, force_kernel=True)
    np.testing.assert_allclose(np.asarray(kk), np.asarray(fb),
                               rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="powers of two"):
        nets.conv_encoder(x8, p1, p2, None, pools=(3, 2), drop_p=0.0,
                          train=False)


def test_encoder_shards_over_mesh():
    """conv_encoder(mesh=...) shard_maps the kernel over the instance axis
    (pallas is opaque to GSPMD): output stays batch-sharded and grads
    (incl. the psummed replicated-weight cotangents) match unsharded."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]), ("env",))
    rng = np.random.RandomState(3)
    x = jax.device_put(
        jnp.asarray((rng.rand(16, 1, 32, 64) < 0.3).astype(np.uint8)),
        NamedSharding(mesh, P("env")))
    p1 = {"w": jnp.asarray(rng.randn(4, 1, 3, 3).astype(np.float32) * 0.3),
          "b": jnp.asarray(rng.randn(4).astype(np.float32) * 0.1)}
    p2 = {"w": jnp.asarray(rng.randn(2, 4, 3, 3).astype(np.float32) * 0.3),
          "b": jnp.asarray(rng.randn(2).astype(np.float32) * 0.1)}
    co = jnp.asarray(rng.randn(16, 2, 8, 16).astype(np.float32))

    def net(p, mesh_arg):
        z = nets.conv_encoder(x, p["1"], p["2"], None, pools=(2, 2),
                              drop_p=0.0, train=False, force_kernel=True,
                              mesh=mesh_arg)
        return (z * co).sum()

    params = {"1": p1, "2": p2}
    out_sharded = jax.jit(
        lambda p: nets.conv_encoder(x, p["1"], p["2"], None, pools=(2, 2),
                                    drop_p=0.0, train=False,
                                    force_kernel=True, mesh=mesh)
    )(params)
    assert out_sharded.sharding.is_equivalent_to(
        NamedSharding(mesh, P("env")), out_sharded.ndim)
    gs = jax.jit(jax.grad(lambda p: net(p, mesh)))(params)
    gp = jax.jit(jax.grad(lambda p: net(p, None)))(params)
    for a, r in zip(jax.tree.leaves(gs), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_loss_tail_accepts_uint8_obs():
    """The fused loss tail takes the raw uint8 obs (upcast in VMEM) and
    matches its own f32-obs result exactly, values being 0/1."""
    from carle_tpu.ops.pallas_head import make_fused_loss_tail

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(4, 2, 16, 32).astype(np.float32))
    wt = jnp.asarray(rng.randn(2, 1, 4, 4).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(1).astype(np.float32) * 0.1)
    obs8 = jnp.asarray((rng.rand(4, 1, 32, 64) < 0.3).astype(np.uint8))
    lt = make_fused_loss_tail("sigmoid", 0.0, train=False, interpret=True)

    def loss(wt_, obs):
        return lt(x, wt_, b, obs, jnp.int32(0)).sum()

    v8, g8 = jax.value_and_grad(loss)(wt, obs8)
    vf, gf = jax.value_and_grad(loss)(wt, obs8.astype(jnp.float32))
    np.testing.assert_allclose(float(v8), float(vf), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(gf), rtol=1e-6,
                               atol=1e-7)


def test_stepctx_obs_cells_set_by_both_stacks():
    """Both stacks publish the uint8 obs alongside the f32 one, and the
    fused defs' net input selector picks it (this is what lets XLA DCE the
    f32 obs from an all-fused compiled step)."""
    from carle_tpu.mcl._online import net_input
    from carle_tpu.mcl.base import StepCtx, WrapperStack
    from carle_tpu.mcl.speed import speed_def
    from carle_tpu.parallel.packed_env import PackedSpatialStack
    from carle_tpu import rules
    from carle_tpu.config import EnvConfig

    cfg = EnvConfig(height=32, width=32, action_height=8, action_width=8,
                    instances=2)
    captured = {}

    def spy_def(base):
        def apply(ws, ctx, reward):
            captured["obs_cells"] = ctx.obs_cells
            captured["obs"] = ctx.obs
            return base.apply(ws, ctx, reward)
        return base._replace(apply=apply)

    for stack_cls in (WrapperStack, PackedSpatialStack):
        stack = stack_cls(cfg, [spy_def(speed_def(cfg))])
        st = stack.init(jax.random.PRNGKey(0), rules.LIFE)
        action = jnp.zeros((2, 8, 8), jnp.uint8)
        stack.step(st, action, jax.random.PRNGKey(1))
        assert captured["obs_cells"].dtype == jnp.uint8
        assert captured["obs_cells"].shape == captured["obs"].shape

    ctx = StepCtx(prev_grid=None, obs="f32", action=None, action_full=None,
                  key=None, obs_cells="u8")
    assert net_input(ctx, True) == "u8"
    assert net_input(ctx, False) == "f32"
    assert net_input(ctx._replace(obs_cells=None), True) == "f32"


def test_decoder_loss_parity():
    """The two-stage decoder+loss kernel (deconv1 relu + deconv2 sigmoid +
    error reduction in ONE kernel) matches the unfused composition: value,
    all four param grads, and the input cotangent (uint8 obs)."""
    from carle_tpu.ops.pallas_head import make_fused_decoder_loss

    rng = np.random.RandomState(5)
    n, cin, hi = 6, 2, 16
    x = jnp.asarray(rng.randn(n, cin, hi, hi).astype(np.float32))
    wt1 = jnp.asarray(rng.randn(cin, 1, 4, 4).astype(np.float32) * .3)
    b1 = jnp.asarray(rng.randn(1).astype(np.float32) * .1)
    wt2 = jnp.asarray(rng.randn(1, 1, 4, 4).astype(np.float32) * .3)
    b2 = jnp.asarray(rng.randn(1).astype(np.float32) * .1)
    obs = jnp.asarray((rng.rand(n, 1, 4 * hi, 4 * hi) < 0.3).astype(np.uint8))
    dl = make_fused_decoder_loss(0.0, False, interpret=True)

    def ref(x, wt1, b1, wt2, b2):
        a = jax.nn.relu(nets.conv_transpose2d(x, {"w": wt1, "b": b1}))
        y = jax.nn.sigmoid(nets.conv_transpose2d(a, {"w": wt2, "b": b2}))
        return jnp.sum((obs.astype(jnp.float32) - y) ** 2, axis=(1, 2, 3))

    ek = dl(x, wt1, b1, wt2, b2, obs, jnp.int32(0))
    er = ref(x, wt1, b1, wt2, b2)
    np.testing.assert_allclose(np.asarray(ek), np.asarray(er), rtol=1e-5)
    gk = jax.grad(lambda *a: jnp.sum(dl(*a, obs, jnp.int32(0))),
                  argnums=(0, 1, 2, 3, 4))(x, wt1, b1, wt2, b2)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a)),
                  argnums=(0, 1, 2, 3, 4))(x, wt1, b1, wt2, b2)
    for k, r in zip(gk, gr):
        scale = float(np.abs(np.asarray(r)).max()) or 1.0
        np.testing.assert_allclose(np.asarray(k) / scale,
                                   np.asarray(r) / scale,
                                   rtol=5e-6, atol=5e-6)


def test_conv_decoder_loss_fallback_and_routing():
    """nets.conv_decoder_loss: CPU fallback == interpret kernel; the AE def
    routes through it under fused_head (same reward as unfused to float
    tolerance — covered end-to-end by the reward-parity suite)."""
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(4, 2, 8, 8).astype(np.float32))
    p1 = {"w": jnp.asarray(rng.randn(2, 1, 4, 4).astype(np.float32) * .3),
          "b": jnp.asarray(rng.randn(1).astype(np.float32) * .1)}
    p2 = {"w": jnp.asarray(rng.randn(1, 1, 4, 4).astype(np.float32) * .3),
          "b": jnp.asarray(rng.randn(1).astype(np.float32) * .1)}
    obs = jnp.asarray((rng.rand(4, 1, 32, 32) < 0.3).astype(np.uint8))
    fb = nets.conv_decoder_loss(x, p1, p2, obs, None, drop_p=0.0,
                                train=False)
    kk = nets.conv_decoder_loss(x, p1, p2, obs, None, drop_p=0.0,
                                train=False, force_kernel=True)
    np.testing.assert_allclose(np.asarray(kk), np.asarray(fb), rtol=1e-5)


def test_encoder_and_decoder_loss_accept_packed_universe():
    """The fused kernels consume the PACKED universe directly (u32, last
    dim W/32 — expanded to cell planes in VMEM): bit-identical outputs and
    grads vs the uint8-cells input.  This is what keeps the XLA unpack's
    u32 cell-sized temps (2 MB/env at 512² — the r4 ladder's residual
    binder) out of HBM entirely."""
    from carle_tpu.ops.bitpack import pack_grid
    from carle_tpu.ops.pallas_head import (make_fused_decoder_loss,
                                           make_fused_encoder)

    rng = np.random.RandomState(7)
    cells = (rng.rand(4, 64, 64) < 0.3).astype(np.uint8)
    packed = pack_grid(jnp.asarray(cells))[:, None]
    x8 = jnp.asarray(cells)[:, None]
    w1 = jnp.asarray(rng.randn(4, 1, 3, 3).astype(np.float32) * .3)
    b1 = jnp.asarray(rng.randn(4).astype(np.float32) * .1)
    w2 = jnp.asarray(rng.randn(2, 4, 3, 3).astype(np.float32) * .3)
    b2 = jnp.asarray(rng.randn(2).astype(np.float32) * .1)
    enc = make_fused_encoder(2, 2, 0.0, False, interpret=True)
    ones = jnp.ones((32, 1), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(enc(packed, w1, b1, w2, b2, jnp.int32(0), ones)),
        np.asarray(enc(x8, w1, b1, w2, b2, jnp.int32(0), ones)))
    gp = jax.grad(lambda a, b: (enc(packed, a, b1, b, b2, jnp.int32(0),
                                    ones) ** 2).sum(), argnums=(0, 1))(w1, w2)
    gu = jax.grad(lambda a, b: (enc(x8, a, b1, b, b2, jnp.int32(0),
                                    ones) ** 2).sum(), argnums=(0, 1))(w1, w2)
    for k, u in zip(gp, gu):
        np.testing.assert_array_equal(np.asarray(k), np.asarray(u))

    x = jnp.asarray(rng.randn(4, 2, 16, 16).astype(np.float32))
    wt1 = jnp.asarray(rng.randn(2, 1, 4, 4).astype(np.float32) * .3)
    wt2 = jnp.asarray(rng.randn(1, 1, 4, 4).astype(np.float32) * .3)
    bb = jnp.asarray(rng.randn(1).astype(np.float32) * .1)
    dl = make_fused_decoder_loss(0.0, False, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(dl(x, wt1, bb, wt2, bb, packed, jnp.int32(0))),
        np.asarray(dl(x, wt1, bb, wt2, bb, x8, jnp.int32(0))))


def test_net_input_prefers_packed_for_fused():
    """net_input hands the fused kernels the packed universe when the
    stack carries one (except the space-sharded tier, which reduces in
    XLA over cells)."""
    from carle_tpu.mcl._online import net_input
    from carle_tpu.mcl.base import StepCtx
    from carle_tpu.nets import SpaceSharding

    packed = jnp.zeros((2, 8, 2), jnp.uint32)
    ctx = StepCtx(prev_grid=None, obs="f32", action=None, action_full=None,
                  key=None, packed=packed, obs_cells="u8")
    out = net_input(ctx, True)
    assert out.dtype == jnp.uint32 and out.shape == (2, 1, 8, 2)
    assert net_input(ctx, False) == "f32"
    assert net_input(ctx, SpaceSharding(None)) == "u8"
    assert net_input(ctx._replace(packed=None), True) == "u8"


# ---------------------------------------------------------------------------
# Whole-AE single kernel (VERDICT r4 item 1)
# ---------------------------------------------------------------------------


def _ae_ref(src_f, w1, b1, w2, b2, wt1, bt1, wt2, bt2, obs_f):
    z = _ref_pool(jax.nn.relu(
        nets.conv2d(src_f, {"w": w1, "b": b1}, padding=1)), 2)
    z = _ref_pool(jax.nn.relu(
        nets.conv2d(z, {"w": w2, "b": b2}, padding=1)), 2)
    a = jax.nn.relu(nets.conv_transpose2d(z, {"w": wt1, "b": bt1}))
    y = jax.nn.sigmoid(nets.conv_transpose2d(a, {"w": wt2, "b": bt2}))
    return jnp.sum((obs_f - y) ** 2, axis=(1, 2, 3))


def _ae_test_params(rng):
    return (jnp.asarray(rng.randn(4, 1, 3, 3).astype(np.float32) * .3),
            jnp.asarray(rng.randn(4).astype(np.float32) * .1),
            jnp.asarray(rng.randn(2, 4, 3, 3).astype(np.float32) * .3),
            jnp.asarray(rng.randn(2).astype(np.float32) * .1),
            jnp.asarray(rng.randn(2, 1, 4, 4).astype(np.float32) * .3),
            jnp.asarray(rng.randn(1).astype(np.float32) * .1),
            jnp.asarray(rng.randn(1, 1, 4, 4).astype(np.float32) * .3),
            jnp.asarray(rng.randn(1).astype(np.float32) * .1))


def test_ae_loss_kernel_parity():
    """The whole-AE kernel (encoder + decoder + loss in ONE pallas_call)
    matches the unfused composition: value and ALL EIGHT parameter grads,
    with src != obs (the PredictionBonus shape)."""
    from carle_tpu.ops.pallas_head import make_fused_ae_loss

    rng = np.random.RandomState(11)
    n, h = 4, 32
    src = jnp.asarray((rng.rand(n, 1, h, h) < 0.3).astype(np.uint8))
    obs = jnp.asarray((rng.rand(n, 1, h, h) < 0.3).astype(np.uint8))
    params = _ae_test_params(rng)
    mask = jnp.ones((h // 2, 1), jnp.float32)
    ae = make_fused_ae_loss(2, 2, 0.0, False, interpret=True)

    ek = ae(src, *params, obs, jnp.int32(0), mask)
    er = _ae_ref(src.astype(jnp.float32), *params, obs.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(ek), np.asarray(er), rtol=1e-5)

    gk = jax.grad(lambda *p: jnp.sum(ae(src, *p, obs, jnp.int32(0), mask)),
                  argnums=tuple(range(8)))(*params)
    gr = jax.grad(
        lambda *p: jnp.sum(_ae_ref(src.astype(jnp.float32), *p,
                                   obs.astype(jnp.float32))),
        argnums=tuple(range(8)))(*params)
    for k, r in zip(gk, gr):
        scale = float(np.abs(np.asarray(r)).max()) or 1.0
        np.testing.assert_allclose(np.asarray(k) / scale,
                                   np.asarray(r) / scale,
                                   rtol=5e-6, atol=5e-6)


def test_ae_loss_kernel_accepts_packed():
    """src and obs may independently be packed u32 words.  The in-VMEM
    expansion itself is bit-exact (encoder test asserts array_equal); the
    end-to-end values are compared to float tolerance because the
    interpret-mode graph fuses differently per input dtype and XLA-CPU
    reassociates the big reductions (measured 4.6e-7 relative)."""
    from carle_tpu.ops.bitpack import pack_grid
    from carle_tpu.ops.pallas_head import make_fused_ae_loss

    rng = np.random.RandomState(12)
    n, h = 2, 32
    src_cells = (rng.rand(n, h, h) < 0.3).astype(np.uint8)
    obs_cells = (rng.rand(n, h, h) < 0.3).astype(np.uint8)
    src8 = jnp.asarray(src_cells)[:, None]
    obs8 = jnp.asarray(obs_cells)[:, None]
    srcp = pack_grid(jnp.asarray(src_cells))[:, None]
    obsp = pack_grid(jnp.asarray(obs_cells))[:, None]
    params = _ae_test_params(rng)
    mask = jnp.ones((h // 2, 1), jnp.float32)
    ae = make_fused_ae_loss(2, 2, 0.0, False, interpret=True)

    ref = np.asarray(ae(src8, *params, obs8, jnp.int32(0), mask))
    for s, o in ((srcp, obs8), (src8, obsp), (srcp, obsp)):
        np.testing.assert_allclose(
            np.asarray(ae(s, *params, o, jnp.int32(0), mask)), ref,
            rtol=1e-5)
    g8 = jax.grad(lambda *p: jnp.sum(ae(src8, *p, obs8, jnp.int32(0),
                                        mask)),
                  argnums=tuple(range(8)))(*params)
    gp = jax.grad(lambda *p: jnp.sum(ae(srcp, *p, obsp, jnp.int32(0),
                                        mask)),
                  argnums=tuple(range(8)))(*params)
    for a, b in zip(g8, gp):
        scale = float(np.abs(np.asarray(a)).max()) or 1.0
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=1e-5, atol=1e-5)


def test_conv_ae_loss_fallback_and_kernel_agree():
    """nets.conv_ae_loss: CPU fallback == interpret kernel (value + a
    param grad), uint8 inputs."""
    rng = np.random.RandomState(13)
    n, h = 3, 32
    src = jnp.asarray((rng.rand(n, 1, h, h) < 0.3).astype(np.uint8))
    obs = jnp.asarray((rng.rand(n, 1, h, h) < 0.3).astype(np.uint8))
    w1, b1, w2, b2, wt1, bt1, wt2, bt2 = _ae_test_params(rng)
    p1 = {"w": w1, "b": b1}
    p2 = {"w": w2, "b": b2}
    pd1 = {"w": wt1, "b": bt1}
    pd2 = {"w": wt2, "b": bt2}

    def run(force):
        return nets.conv_ae_loss(src, p1, p2, pd1, pd2, obs, None,
                                 pools=(2, 2), drop_p=0.0, train=False,
                                 force_kernel=force)

    np.testing.assert_allclose(np.asarray(run(True)), np.asarray(run(False)),
                               rtol=1e-5)

    def loss(wa, force):
        return jnp.sum(nets.conv_ae_loss(
            src, {"w": wa, "b": b1}, p2, pd1, pd2, obs, None,
            pools=(2, 2), drop_p=0.0, train=False, force_kernel=force))

    gk = jax.grad(lambda wa: loss(wa, True))(w1)
    gf = jax.grad(lambda wa: loss(wa, False))(w1)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gf),
                               rtol=1e-5, atol=1e-6)


def test_ae2d_def_whole_ae_wiring():
    """ae2d_def(fused_head=True) routes through the whole-AE kernel (CPU:
    its fallback) and matches the unfused def's rewards; whole_ae=False
    keeps the two-kernel r4 composition."""
    from carle_tpu import EnvConfig, rules
    from carle_tpu.mcl.ae import ae2d_def
    from carle_tpu.rollout import Rollout

    cfg = EnvConfig(height=64, width=64, action_height=16, action_width=16,
                    instances=2)
    rng = np.random.RandomState(3)
    actions = (rng.rand(6, 2, 16, 16) < 0.15).astype(np.uint8)

    def run(**kw):
        defs = [ae2d_def(cfg, batch_size=2, dropout=False, **kw)]
        ro = Rollout(cfg, defs)
        carry = ro.init(jax.random.PRNGKey(2), rules.LIFE)
        carry, rewards = ro.run_actions(carry, actions)
        return np.asarray(rewards)

    unfused = run()
    whole = run(fused_head=True)
    two_kernel = run(fused_head=True, whole_ae=False)
    assert np.any(unfused != 0.0)
    np.testing.assert_allclose(whole, unfused, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(two_kernel, unfused, rtol=1e-5, atol=1e-6)


def test_prediction_def_fused_whole_ae():
    """prediction_def(fused_head=True) (src = ring frame, target = current
    frame through conv_ae_loss) matches the unfused def's rewards."""
    from carle_tpu import EnvConfig, rules
    from carle_tpu.mcl.prediction import prediction_def
    from carle_tpu.rollout import Rollout

    cfg = EnvConfig(height=64, width=64, action_height=16, action_width=16,
                    instances=2)
    rng = np.random.RandomState(4)
    actions = (rng.rand(10, 2, 16, 16) < 0.15).astype(np.uint8)

    def run(**kw):
        defs = [prediction_def(cfg, batch_size=2, dropout=False, **kw)]
        ro = Rollout(cfg, defs)
        carry = ro.init(jax.random.PRNGKey(2), rules.LIFE)
        carry, rewards = ro.run_actions(carry, actions)
        return np.asarray(rewards)

    unfused = run()
    fused = run(fused_head=True)
    assert np.any(unfused != 0.0)
    np.testing.assert_allclose(fused, unfused, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Single-chip row-band tiling (VERDICT r4 item 3)
# ---------------------------------------------------------------------------


def test_encoder_banded_matches_global():
    """encoder_banded (sequential band loop, per-instance validity masks)
    == the global encoder kernel, for both wrapper-net pool configs and
    uint8/packed inputs."""
    from carle_tpu.nets import BandTiling
    from carle_tpu.ops.bitpack import pack_grid
    from carle_tpu.parallel.band_heads import encoder_banded

    rng = np.random.RandomState(21)
    n, h, w = 2, 64, 64
    cells = (rng.rand(n, h, w) < 0.3).astype(np.uint8)
    for pools in ((2, 2), (4, 2)):
        p1 = {"w": jnp.asarray(rng.randn(4, 1, 3, 3).astype(np.float32) * .3),
              "b": jnp.asarray(rng.randn(4).astype(np.float32) * .1)}
        p2 = {"w": jnp.asarray(rng.randn(2, 4, 3, 3).astype(np.float32) * .3),
              "b": jnp.asarray(rng.randn(2).astype(np.float32) * .1)}
        for x in (jnp.asarray(cells)[:, None],
                  pack_grid(jnp.asarray(cells))[:, None]):
            ref = nets.conv_encoder(x, p1, p2, None, pools=pools,
                                    drop_p=0.0, train=False,
                                    force_kernel=True)
            banded = encoder_banded(
                x, p1, p2, None, pools=pools, drop_p=0.0, train=False,
                tiling=BandTiling(4), force_kernel=True)
            np.testing.assert_allclose(np.asarray(banded), np.asarray(ref),
                                       rtol=1e-5, atol=1e-6)


def test_decoder_loss_banded_matches_global():
    """Banded decoder+loss (row-weighted error kernel): per-band errors sum
    to the global loss; param grads and the embedding cotangent match."""
    from carle_tpu.nets import BandTiling
    from carle_tpu.parallel.band_heads import decoder_loss_banded

    rng = np.random.RandomState(22)
    n, cin, he = 2, 2, 16
    x = jnp.asarray(rng.randn(n, cin, he, he).astype(np.float32))
    pd1 = {"w": jnp.asarray(rng.randn(2, 1, 4, 4).astype(np.float32) * .3),
           "b": jnp.asarray(rng.randn(1).astype(np.float32) * .1)}
    pd2 = {"w": jnp.asarray(rng.randn(1, 1, 4, 4).astype(np.float32) * .3),
           "b": jnp.asarray(rng.randn(1).astype(np.float32) * .1)}
    obs = jnp.asarray((rng.rand(n, 1, 4 * he, 4 * he) < 0.3)
                      .astype(np.uint8))

    def ref_fn(xx, w1):
        return jnp.sum(nets.conv_decoder_loss(
            xx, {"w": w1, "b": pd1["b"]}, pd2, obs, None, drop_p=0.0,
            train=False, force_kernel=True))

    def band_fn(xx, w1):
        return jnp.sum(decoder_loss_banded(
            xx, {"w": w1, "b": pd1["b"]}, pd2, obs, None, drop_p=0.0,
            train=False, tiling=BandTiling(4), force_kernel=True))

    np.testing.assert_allclose(float(band_fn(x, pd1["w"])),
                               float(ref_fn(x, pd1["w"])), rtol=1e-5)
    gb = jax.grad(band_fn, argnums=(0, 1))(x, pd1["w"])
    gr = jax.grad(ref_fn, argnums=(0, 1))(x, pd1["w"])
    for a, b in zip(gb, gr):
        scale = float(np.abs(np.asarray(b)).max()) or 1.0
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=1e-5, atol=1e-5)


def test_ae_loss_banded_matches_global():
    """conv_ae_loss under BandTiling == the whole-AE kernel's loss (value
    + the 8 param grads), uint8 src/obs."""
    from carle_tpu.nets import BandTiling

    rng = np.random.RandomState(23)
    n, h = 2, 32
    src = jnp.asarray((rng.rand(n, 1, h, h) < 0.3).astype(np.uint8))
    obs = jnp.asarray((rng.rand(n, 1, h, h) < 0.3).astype(np.uint8))
    w1, b1, w2, b2, wt1, bt1, wt2, bt2 = _ae_test_params(rng)
    packs = dict(p1={"w": w1, "b": b1}, p2={"w": w2, "b": b2},
                 pd1={"w": wt1, "b": bt1}, pd2={"w": wt2, "b": bt2})

    def loss(wa, mesh):
        return jnp.sum(nets.conv_ae_loss(
            src, {"w": wa, "b": b1}, packs["p2"], packs["pd1"],
            packs["pd2"], obs, None, pools=(2, 2), drop_p=0.0,
            train=False, force_kernel=True, mesh=mesh))

    lb = float(loss(w1, nets.BandTiling(4)))
    lr = float(loss(w1, None))
    np.testing.assert_allclose(lb, lr, rtol=1e-5)
    gb = jax.grad(lambda wa: loss(wa, BandTiling(4)))(w1)
    gr = jax.grad(lambda wa: loss(wa, None))(w1)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gr),
                               rtol=1e-5, atol=1e-6)


def test_encoder_chunked_decimation_matches(monkeypatch):
    """At huge W the pool selection/window matrices go block-diagonal-
    chunked (DECIM_CHUNK — O(W²) matrices were the measured 8192² compile
    OOM).  Chunked == unchunked bit-for-bit, forward and grads."""
    from carle_tpu.ops import pallas_head as ph

    rng = np.random.RandomState(31)
    n, h, w = 2, 32, 128
    x = jnp.asarray((rng.rand(n, 1, h, w) < 0.3).astype(np.uint8))
    w1 = jnp.asarray(rng.randn(4, 1, 3, 3).astype(np.float32) * .3)
    b1 = jnp.asarray(rng.randn(4).astype(np.float32) * .1)
    w2 = jnp.asarray(rng.randn(2, 4, 3, 3).astype(np.float32) * .3)
    b2 = jnp.asarray(rng.randn(2).astype(np.float32) * .1)
    ones = jnp.ones((h // 2, 1), jnp.float32)

    def run():
        # fresh factory per DECIM_CHUNK value (the lru_cache keys only on
        # the public args; clear it so the kernel retraces)
        ph.make_fused_encoder.cache_clear()
        enc = ph.make_fused_encoder(2, 2, 0.0, False, interpret=True)
        out = enc(x, w1, b1, w2, b2, jnp.int32(0), ones)
        g = jax.grad(lambda a: (enc(x, a, b1, w2, b2, jnp.int32(0),
                                    ones) ** 2).sum())(w1)
        return np.asarray(out), np.asarray(g)

    ref_out, ref_g = run()
    monkeypatch.setattr(ph, "DECIM_CHUNK", 32)  # -> wchunks = 4
    chk_out, chk_g = run()
    ph.make_fused_encoder.cache_clear()
    np.testing.assert_array_equal(chk_out, ref_out)
    np.testing.assert_array_equal(chk_g, ref_g)


def test_decoder_loss_chunked_dilation_matches(monkeypatch):
    """The decoder's O(W²) dilation matrices chunk like the encoder's pool
    matrices at huge W — chunked == unchunked bit-for-bit (value + grads
    incl. the embedding cotangent)."""
    from carle_tpu.ops import pallas_head as ph

    rng = np.random.RandomState(33)
    n, cin, hi = 2, 2, 16
    x = jnp.asarray(rng.randn(n, cin, hi, hi).astype(np.float32))
    wt1 = jnp.asarray(rng.randn(cin, 1, 4, 4).astype(np.float32) * .3)
    b1 = jnp.asarray(rng.randn(1).astype(np.float32) * .1)
    wt2 = jnp.asarray(rng.randn(1, 1, 4, 4).astype(np.float32) * .3)
    b2 = jnp.asarray(rng.randn(1).astype(np.float32) * .1)
    obs = jnp.asarray((rng.rand(n, 1, 4 * hi, 4 * hi) < 0.3)
                      .astype(np.uint8))

    def run():
        ph.make_fused_decoder_loss.cache_clear()
        dl = ph.make_fused_decoder_loss(0.0, False, interpret=True)
        val = dl(x, wt1, b1, wt2, b2, obs, jnp.int32(0))
        g = jax.grad(lambda xx, a: jnp.sum(dl(xx, a, b1, wt2, b2, obs,
                                              jnp.int32(0))),
                     argnums=(0, 1))(x, wt1)
        return np.asarray(val), [np.asarray(t) for t in g]

    ref_v, ref_g = run()
    monkeypatch.setattr(ph, "DECIM_CHUNK", 16)  # unit 4 -> wchunks = 4
    chk_v, chk_g = run()
    ph.make_fused_decoder_loss.cache_clear()
    np.testing.assert_array_equal(chk_v, ref_v)
    for a, b in zip(chk_g, ref_g):
        np.testing.assert_array_equal(a, b)


def test_conv_ae_loss_auto_falls_back_past_vmem(monkeypatch):
    """Past ~512² the whole-AE kernel's working set exceeds VMEM; the
    wrapper must route to the two-kernel composition instead of failing
    the remote compile (review r5)."""
    from carle_tpu.ops import pallas_head as ph

    rng = np.random.RandomState(41)
    src = jnp.asarray((rng.rand(2, 1, 32, 32) < 0.3).astype(np.uint8))
    w1, b1, w2, b2, wt1, bt1, wt2, bt2 = _ae_test_params(rng)
    packs = (({"w": w1, "b": b1}, {"w": w2, "b": b2},
              {"w": wt1, "b": bt1}, {"w": wt2, "b": bt2}))

    def run():
        return np.asarray(nets.conv_ae_loss(
            src, *packs, src, None, pools=(2, 2), drop_p=0.0,
            train=False, force_kernel=True))

    ref = run()
    # pretend the shape is huge: the whole-AE factory must NOT be touched
    monkeypatch.setattr(ph, "_ae_bytes_per_inst",
                        lambda *a, **k: 10**12)
    monkeypatch.setattr(ph, "make_fused_ae_loss",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("whole-AE built past VMEM")))
    out = run()
    np.testing.assert_allclose(out, ref, rtol=1e-5)
