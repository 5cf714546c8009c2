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
