"""Layer-primitive parity vs torch + agent behavior tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from carle_tpu import nets
from carle_tpu.agents import (
    RandomAgent,
    RandomNetworkAgent,
    make_random_agent,
    make_random_network_agent,
)

torch = pytest.importorskip("torch")


def test_conv2d_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 16, 16).astype(np.float32)
    w = rng.randn(5, 3, 3, 3).astype(np.float32) * 0.1
    b = rng.randn(5).astype(np.float32) * 0.1

    ours = nets.conv2d(jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)},
                       padding=1)
    theirs = torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), padding=1
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_conv_transpose2d_matches_torch():
    """ConvTranspose2d(k=4, stride=2, padding=1) — the AE2D decoder layer
    (reference mcl.py:462, 465)."""
    rng = np.random.RandomState(1)
    x = rng.rand(2, 2, 8, 8).astype(np.float32)
    w = rng.randn(2, 1, 4, 4).astype(np.float32) * 0.1  # (in, out, kH, kW)
    b = rng.randn(1).astype(np.float32) * 0.1

    ours = nets.conv_transpose2d(
        jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    )
    theirs = torch.nn.functional.conv_transpose2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=2, padding=1
    ).numpy()
    assert ours.shape == (2, 1, 16, 16)  # exact 2x upsample
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_max_pool2_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.rand(1, 1, 10, 10).astype(np.float32)
    ours = nets.max_pool2(jnp.asarray(x))
    theirs = torch.nn.functional.max_pool2d(torch.tensor(x), 2, 2).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs)


def test_linear_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.rand(4, 7).astype(np.float32)
    w = rng.randn(5, 7).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    ours = nets.linear(jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)})
    theirs = torch.nn.functional.linear(
        torch.tensor(x), torch.tensor(w), torch.tensor(b)
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_dropout_train_and_eval():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1000,))
    out_eval = nets.dropout(x, key, 0.1, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))
    out_train = nets.dropout(x, key, 0.1, train=True)
    kept = np.asarray(out_train) != 0
    # kept units are scaled by 1/(1-p); drop rate is ~p
    np.testing.assert_allclose(np.asarray(out_train)[kept], 1.0 / 0.9, rtol=1e-6)
    assert 0.05 < 1 - kept.mean() < 0.15


def test_random_agent_shape_and_rate():
    agent = RandomAgent(seed=0)
    obs = jnp.zeros((3, 1, 256, 256))
    action = agent(obs)
    assert action.shape == (3, 1, 64, 64)
    rate = float(jnp.mean(action))
    assert 0.07 < rate < 0.13  # toggle_rate = 0.1 (agents.py:33)
    # consecutive calls draw fresh randomness
    assert not np.array_equal(np.asarray(action), np.asarray(agent(obs)))


def test_random_network_agent_deterministic_and_shaped():
    agent = RandomNetworkAgent(seed=1)
    obs = jnp.zeros((2, 1, 256, 256))
    a1, a2 = agent(obs), agent(obs)
    assert a1.shape == (2, 1, 64, 64)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert set(np.unique(np.asarray(a1))) <= {0.0, 1.0}


def test_random_network_agent_matches_torch_with_shared_weights():
    """Bit-parity of the frozen policy vs the reference network given
    identical weights (reference agents.py:74-101)."""
    import sys

    sys.path.insert(0, "/root/reference")
    from carle.agents import RandomNetworkAgent as RefRNA

    with torch.no_grad():
        ref = RefRNA()
    ours = RandomNetworkAgent()
    ours.load_torch_state_dict(ref.network.state_dict())

    rng = np.random.RandomState(5)
    obs = (rng.rand(2, 1, 256, 256) < 0.1).astype(np.float32)
    with torch.no_grad():
        ref_act = ref(torch.tensor(obs)).numpy()
    our_act = np.asarray(ours(obs))
    np.testing.assert_array_equal(our_act, ref_act)


def test_functional_agents_jit_in_scan():
    """Policies must compose under jit+scan (the fused rollout contract)."""
    agent = make_random_agent(16, 16)
    params = agent.init(jax.random.PRNGKey(0))

    def body(key, _):
        key, sub = jax.random.split(key)
        act = agent.apply(params, sub, jnp.zeros((2, 1, 64, 64)))
        return key, act.sum()

    _, sums = jax.jit(lambda k: jax.lax.scan(body, k, length=4))(
        jax.random.PRNGKey(1)
    )
    assert sums.shape == (4,)

    net_agent = make_random_network_agent(16, 16, 64, 64)
    net_params = net_agent.init(jax.random.PRNGKey(2))
    act = jax.jit(net_agent.apply)(
        net_params, jax.random.PRNGKey(0), jnp.zeros((2, 1, 64, 64))
    )
    assert act.shape == (2, 1, 16, 16)


def test_bf16_guard_warns_on_tpu(monkeypatch):
    """The measured 37x bf16 trap must WARN loudly when selected on TPU
    (VERDICT r2 item 7: runtime guard instead of a silent slowdown)."""
    import warnings

    import pytest as _pytest

    import carle_tpu.nets as nets
    import carle_tpu.ops.ca as ca

    monkeypatch.setattr(ca, "is_tpu_platform", lambda: True)
    with _pytest.warns(UserWarning, match="37x SLOWER"):
        nets.warn_if_bf16_on_tpu(jnp.bfloat16)
    with warnings.catch_warnings():
        warnings.simplefilter("error")     # no warning for the defaults
        nets.warn_if_bf16_on_tpu(None)
        nets.warn_if_bf16_on_tpu(jnp.float32)
    monkeypatch.setattr(ca, "is_tpu_platform", lambda: False)
    with warnings.catch_warnings():
        warnings.simplefilter("error")     # CPU bf16 is not the trap
        nets.warn_if_bf16_on_tpu(jnp.bfloat16)


def test_rnd_def_emits_bf16_guard(monkeypatch):
    """The guard is wired into the wrapper-def constructors."""
    import pytest as _pytest

    import carle_tpu.ops.ca as ca
    from carle_tpu import EnvConfig
    from carle_tpu.mcl.rnd import rnd2d_def

    monkeypatch.setattr(ca, "is_tpu_platform", lambda: True)
    cfg = EnvConfig(height=64, width=64, instances=1)
    with _pytest.warns(UserWarning, match="37x SLOWER"):
        rnd2d_def(cfg, compute_dtype=jnp.bfloat16)
