"""Fused policy-gradient training tests."""

import numpy as np
import jax
import jax.numpy as jnp

from carle_tpu import EnvConfig, rules
from carle_tpu.mcl.base import StepCtx, WrapperDef, default_on_reset
from carle_tpu.policy import PolicyTrainer


CFG = EnvConfig(height=32, width=32, action_height=8, action_width=8,
                instances=8)


def _toggle_reward_def(sign: float) -> WrapperDef:
    """Test wrapper: reward = sign * mean(action) — a dense, immediately
    learnable signal for the REINFORCE mechanics."""

    def init(key):
        return ()

    def apply(state, ctx: StepCtx, reward):
        bonus = sign * jnp.mean(
            ctx.action.astype(jnp.float32), axis=(1, 2)
        )[:, None]
        return state, reward + bonus

    return WrapperDef(name="toggle", init=init, apply=apply,
                      on_reset=default_on_reset)


def test_policy_learns_to_toggle_more():
    trainer = PolicyTrainer(CFG, [_toggle_reward_def(+1.0)], lr=0.02,
                            entropy_beta=0.01)
    state = trainer.init(jax.random.PRNGKey(1), rules.LIFE)
    state, trace = trainer.run(state, num_steps=300)
    trace = np.asarray(trace)
    assert np.isfinite(trace).all()
    assert trace[-20:].mean() > trace[:20].mean() + 0.1
    assert trace[-20:].mean() > 0.2  # toggle rate pushed well above init ~5%


def test_policy_learns_to_toggle_less():
    trainer = PolicyTrainer(CFG, [_toggle_reward_def(-1.0)], lr=0.02,
                            entropy_beta=0.001)
    state = trainer.init(jax.random.PRNGKey(0), rules.LIFE)
    state, trace = trainer.run(state, num_steps=200)
    trace = np.asarray(trace)
    assert np.isfinite(trace).all()
    # reward is negative mean-toggle-rate: should approach 0 from below
    assert trace[-20:].mean() > trace[:20].mean()
    assert trace[-20:].mean() > -0.03


def test_trained_policy_exports_as_agent():
    trainer = PolicyTrainer(CFG, [_toggle_reward_def(1.0)], lr=0.02)
    state = trainer.init(jax.random.PRNGKey(1), rules.LIFE)
    state, _ = trainer.run(state, num_steps=50)

    agent = trainer.as_agent()
    obs = jnp.zeros((CFG.instances, 1, 32, 32))
    action = agent.apply(state.params, jax.random.PRNGKey(0), obs)
    assert action.shape == (CFG.instances, 1, 8, 8)
    assert set(np.unique(np.asarray(action))) <= {0.0, 1.0}


def test_policy_trains_against_wrapper_stack():
    """End-to-end: policy + online-learning bonus wrapper in ONE scan."""
    from carle_tpu.mcl.rnd import rnd2d_def

    trainer = PolicyTrainer(CFG, [rnd2d_def(CFG, batch_size=8)], lr=1e-3)
    state = trainer.init(jax.random.PRNGKey(2), rules.LIFE)
    state, trace = trainer.run(state, num_steps=32)
    assert np.isfinite(np.asarray(trace)).all()
    assert int(state.stack.wrappers[0].updates) == 4  # RND learned too


def test_ppo_trainer_runs_and_learns_shapes():
    """PPO iteration: collect + clipped updates compile into one program,
    params actually move, and the reward trace is finite."""
    from carle_tpu.policy import PPOTrainer

    cfg = EnvConfig(height=32, width=32, action_height=8, action_width=8,
                    instances=4)
    trainer = PPOTrainer(cfg, wrappers=[_toggle_reward_def(1.0)], epochs=2,
                         minibatches=2)
    state = trainer.init(jax.random.PRNGKey(0), rules.LIFE)
    p0 = jax.tree.map(jnp.copy, state.params)

    state, trace = trainer.run(state, horizon=8)
    assert trace.shape == (8,)
    assert bool(jnp.all(jnp.isfinite(trace)))
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), p0, state.params
    )
    assert max(jax.tree.leaves(moved)) > 0.0


def test_ppo_learns_to_toggle_more():
    """Learning signal: with reward = +mean(action), clipped-surrogate PPO
    must push the toggle rate well above the ~5% init, like the REINFORCE
    trainer above but via recompute-based minibatch updates."""
    from carle_tpu.policy import PPOTrainer

    trainer = PPOTrainer(CFG, wrappers=[_toggle_reward_def(1.0)], lr=0.02,
                         epochs=4, minibatches=2, entropy_beta=0.01)
    state = trainer.init(jax.random.PRNGKey(1), rules.LIFE)

    state, first = trainer.run(state, horizon=32)
    for _ in range(9):
        state, last = trainer.run(state, horizon=32)
    assert float(last.mean()) > float(first.mean()) + 0.1, (
        float(first.mean()), float(last.mean()),
    )
    assert float(last.mean()) > 0.2


def test_ppo_discounted_credit_runs():
    """gamma > 0 turns on discounted return-to-go credit; mechanics stay
    finite and params move."""
    from carle_tpu.policy import PPOTrainer

    trainer = PPOTrainer(CFG, wrappers=[_toggle_reward_def(1.0)], lr=0.01,
                         epochs=2, minibatches=2, gamma=0.9)
    state = trainer.init(jax.random.PRNGKey(2), rules.LIFE)
    state, trace = trainer.run(state, horizon=8)
    assert bool(jnp.all(jnp.isfinite(trace)))


def test_ppo_rejects_too_few_samples_per_minibatch():
    """horizon*instances < minibatches would make empty minibatches whose
    mean-loss is NaN — PPOTrainer must fail loudly at trace time instead
    (review-fix regression pin)."""
    import pytest

    from carle_tpu.policy import PPOTrainer

    cfg = EnvConfig(height=32, width=32, action_height=8, action_width=8,
                    instances=1)
    trainer = PPOTrainer(cfg, wrappers=[_toggle_reward_def(1.0)],
                         minibatches=4)
    state = trainer.init(jax.random.PRNGKey(0), rules.LIFE)
    with pytest.raises(ValueError, match="minibatches"):
        trainer.run(state, horizon=2)
