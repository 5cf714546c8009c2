"""Policy-gradient agent training — fully fused on TPU.

The reference ships only random policies (agents.py) and trains nothing but
the reward wrappers.  This module closes the loop the platform was built
for: a learnable toggle policy trained *against* the endogenous-reward
wrapper stack, with the whole optimization — policy sampling, CA dynamics,
bonus networks (optionally learning online at the same time), REINFORCE
updates — compiled into one ``lax.scan``.

Policy: a small CNN maps the observation to per-cell Bernoulli logits over
the action window.  Training: per-step REINFORCE with a batch-mean advantage
(blended with a small EMA term so a signal survives instances == 1),
global-norm gradient clipping, and entropy regularization,

    loss = -(R - b) * sum(log pi(a|s)) - beta * H[pi]

which is exact for this 1-step-reward setting (every wrapper bonus is paid
at the step it is earned; the base env has no exogenous reward).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from . import nets
from .agents import Agent
from .config import EnvConfig
from .mcl.base import WrapperDef, WrapperStack


def init_policy_params(key: jax.Array, config: EnvConfig,
                       filters: int = 8) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    dense_in = (config.height // 4) * (config.width // 4)
    n_out = config.eff_action_height * config.eff_action_width
    return {
        "conv1": nets.conv_init(k1, filters, 1, 3),
        "conv2": nets.conv_init(k2, 1, filters, 3),
        "dense": nets.linear_init(k3, n_out, dense_in),
    }


def policy_logits(params: Dict[str, Any], obs: jax.Array,
                  fused_head: Any = False,
                  force_kernel: bool = False) -> jax.Array:
    """obs [inst, 1, H, W] -> toggle logits [inst, AH*AW].

    ``fused_head`` runs the conv front-end as the fused Pallas head kernels
    (dropout-free configuration) — the policy net has the same tiny-channel
    lane-padding pathology as the wrapper nets; may be a Mesh to shard the
    kernels over the instance batch (nets._shard_fused)."""
    if fused_head or force_kernel:
        mesh = None if isinstance(fused_head, bool) else fused_head
        # both stages as the ONE-kernel encoder (same r4 path as the
        # wrapper nets: uint8-capable input, no inter-stage HBM residuals)
        x = nets.conv_encoder(obs, params["conv1"], params["conv2"], None,
                              pools=(2, 2), drop_p=0.0, train=False,
                              force_kernel=force_kernel, mesh=mesh)
    else:
        x = nets.max_pool2(
            jax.nn.relu(nets.conv2d(obs, params["conv1"], padding=1)))
        x = nets.max_pool2(
            jax.nn.relu(nets.conv2d(x, params["conv2"], padding=1)))
    # bias toward sparse toggling at init (sigmoid(-3) ~ 0.047 toggle rate)
    return nets.linear(nets.flatten(x), params["dense"]) - 3.0


class PolicyTrainState(NamedTuple):
    stack: Any                # StackState
    params: Any
    opt_state: Any
    baseline: jax.Array       # EMA of the batch-mean reward
    key: jax.Array


class PolicyTrainer:
    """Builds the fused REINFORCE training step/segment runners."""

    def __init__(
        self,
        config: EnvConfig,
        wrappers: Sequence[WrapperDef] = (),
        lr: float = 1e-3,
        entropy_beta: float = 1e-3,
        baseline_decay: float = 0.99,
        fused_head: Any = False,
    ) -> None:
        self.config = config
        self.fused_head = fused_head
        self.stack = WrapperStack(config, wrappers)
        # global-norm clipping: the surrogate's gradient scales with the
        # summed log-prob over the whole action window, and occasional large
        # advantage x logp spikes otherwise diverge the logits to overflow
        self.opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
        self.entropy_beta = entropy_beta
        self.baseline_decay = baseline_decay
        self._run = jax.jit(self._run_impl, static_argnames=("num_steps",),
                            donate_argnames=("state",))

    def init(self, key: jax.Array, rule_bits: int) -> PolicyTrainState:
        k_stack, k_policy, k_run = jax.random.split(key, 3)
        params = init_policy_params(k_policy, self.config)
        return PolicyTrainState(
            stack=self.stack.init(k_stack, rule_bits),
            params=params,
            opt_state=self.opt.init(params),
            baseline=jnp.asarray(0.0, dtype=jnp.float32),
            key=k_run,
        )

    # -- one fused REINFORCE step -----------------------------------------
    def _step(self, state: PolicyTrainState, _):
        cfg = self.config
        key, k_sample, k_env = jax.random.split(state.key, 3)
        obs = self.stack.observe(state.stack)

        # 1. sample an action from the current policy (no gradients here)
        logits = policy_logits(state.params, obs, self.fused_head)
        u = jax.random.uniform(k_sample, logits.shape)
        action = (u < jax.nn.sigmoid(logits)).astype(jnp.float32)
        patch = action.reshape(
            cfg.instances, cfg.eff_action_height, cfg.eff_action_width
        )

        # 2. environment transition + wrapper bonuses
        new_stack, (_, reward) = self.stack.step(state.stack, patch, k_env)
        r = reward[:, 0]                                        # [inst]

        # 3. advantage: batch-mean baseline (no lag) blended with the EMA
        #    (keeps a signal when instances == 1)
        baseline = (
            self.baseline_decay * state.baseline
            + (1 - self.baseline_decay) * jnp.mean(r)
        )
        advantage = jax.lax.stop_gradient(
            r - jnp.mean(r) + 0.1 * (r - baseline)
        )

        # 4. REINFORCE surrogate on the sampled action
        def loss_fn(params):
            lg = policy_logits(params, obs, self.fused_head)
            logp = -optax.sigmoid_binary_cross_entropy(lg, action)
            logp_sum = jnp.sum(logp, axis=1)                    # [inst]
            # Bernoulli entropy in stable logits form: -log p = softplus(-x),
            # -log(1-p) = softplus(x).  (The naive p*log(p+eps) form has a
            # jit-compiled gradient that overflows for saturated logits.)
            p = jax.nn.sigmoid(lg)
            entropy = jnp.mean(
                p * jax.nn.softplus(-lg) + (1 - p) * jax.nn.softplus(lg)
            )
            return -jnp.mean(advantage * logp_sum) - self.entropy_beta * entropy

        grads = jax.grad(loss_fn)(state.params)
        updates, opt_state = self.opt.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = PolicyTrainState(
            stack=new_stack, params=params, opt_state=opt_state,
            baseline=baseline, key=key,
        )
        return new_state, jnp.mean(r)

    def _run_impl(self, state: PolicyTrainState, num_steps: int):
        return jax.lax.scan(self._step, state, length=num_steps)

    def run(self, state: PolicyTrainState, num_steps: int
            ) -> Tuple[PolicyTrainState, jax.Array]:
        """Train for ``num_steps`` fused steps; returns (state, mean-reward
        trace [num_steps]).  Donates ``state``."""
        return self._run(state, num_steps=num_steps)

    def as_agent(self, deterministic_rate: Optional[float] = None) -> Agent:
        """Freeze the trained policy into the standard Agent protocol.
        Inherits this trainer's ``fused_head`` so the evaluated forward is
        numerically the TRAINED forward (the fused kernels run the conv in
        exact f32; the unfused TPU conv takes a reduced-precision pass —
        logits near the decision boundary would otherwise flip)."""
        return _policy_agent(self.config, deterministic_rate,
                             fused_head=self.fused_head)


def _policy_agent(cfg: EnvConfig,
                  deterministic_rate: Optional[float] = None,
                  fused_head: Any = False) -> Agent:
    def init(key):
        raise RuntimeError("use trained params from a trainer state")

    def apply(params, key, obs):
        logits = policy_logits(params, obs, fused_head)
        if deterministic_rate is not None:
            action = (jax.nn.sigmoid(logits) > deterministic_rate)
        else:
            u = jax.random.uniform(key, logits.shape)
            action = u < jax.nn.sigmoid(logits)
        return action.astype(jnp.float32).reshape(
            obs.shape[0], 1, cfg.eff_action_height, cfg.eff_action_width
        )

    return Agent(init=init, apply=apply)


# ---------------------------------------------------------------------------
# PPO: clipped-surrogate training over recomputed rollout segments
# ---------------------------------------------------------------------------


class PPOTrainState(NamedTuple):
    stack: Any                # StackState
    params: Any
    opt_state: Any
    baseline: jax.Array       # EMA of the batch-mean reward
    key: jax.Array


class PPOTrainer:
    """Proximal Policy Optimization, fully fused on TPU.

    Each ``run`` iteration is two jitted phases inside one program:

    1. **Collect** — a ``lax.scan`` rolls the policy through the wrapped env
       for ``horizon`` steps, storing the *uint8 grids* (64x less HBM than
       float observations), sampled action bits, per-instance rewards and
       behaviour log-probs.
    2. **Update** — ``epochs`` passes of minibatched clipped-surrogate
       ascent; the policy forward is *recomputed* from the stored uint8
       grids (compute is cheap on the VPU/MXU, memory is not), with
       advantage = reward − batch mean blended with an EMA baseline (the
       same empirical baseline as the REINFORCE trainer — every wrapper
       bonus is paid at the step it is earned, so the 1-step return is
       exact and no critic/GAE is needed).

    The reference trains no agent at all; this is the second half of the
    beyond-reference training story started by :class:`PolicyTrainer`.
    """

    def __init__(
        self,
        config: EnvConfig,
        wrappers: Sequence[WrapperDef] = (),
        lr: float = 3e-4,
        clip_eps: float = 0.2,
        entropy_beta: float = 1e-3,
        epochs: int = 4,
        minibatches: int = 4,
        baseline_decay: float = 0.99,
        gamma: float = 0.0,
        norm_advantage: bool = False,
        fused_head: Any = False,
    ) -> None:
        self.config = config
        self.fused_head = fused_head
        self.stack = WrapperStack(config, wrappers)
        self.opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
        self.clip_eps = clip_eps
        self.entropy_beta = entropy_beta
        self.epochs = epochs
        self.minibatches = minibatches
        self.baseline_decay = baseline_decay
        # gamma > 0 credits actions for future bonuses flowing through the
        # universe state (a toggled glider pays SpeedDetector for many
        # steps); gamma == 0 reduces to the immediate-bonus objective.
        self.gamma = gamma
        # std-normalizing near-constant endogenous rewards amplifies batch
        # noise to +/-1 and the repeated clipped updates then drive the
        # policy to a degenerate attractor (observed: collapse to zero
        # toggles on the frozen eval stack) — default OFF, raw advantages
        # like the REINFORCE trainer
        self.norm_advantage = norm_advantage
        self._run = jax.jit(self._run_impl, static_argnames=("horizon",),
                            donate_argnames=("state",))

    def init(self, key: jax.Array, rule_bits: int) -> PPOTrainState:
        k_stack, k_policy, k_run = jax.random.split(key, 3)
        params = init_policy_params(k_policy, self.config)
        return PPOTrainState(
            stack=self.stack.init(k_stack, rule_bits),
            params=params,
            opt_state=self.opt.init(params),
            baseline=jnp.asarray(0.0, dtype=jnp.float32),
            key=k_run,
        )

    # -- phase 1: collect ---------------------------------------------------
    def _collect_step(self, carry, _):
        stack, params, key = carry
        cfg = self.config
        key, k_sample, k_env = jax.random.split(key, 3)
        grid_u8 = self.stack.universe(stack)
        obs = self.stack.observe(stack)

        logits = policy_logits(params, obs, self.fused_head)
        u = jax.random.uniform(k_sample, logits.shape)
        action = (u < jax.nn.sigmoid(logits)).astype(jnp.float32)
        logp_old = jnp.sum(
            -optax.sigmoid_binary_cross_entropy(logits, action), axis=1
        )
        patch = action.reshape(
            cfg.instances, cfg.eff_action_height, cfg.eff_action_width
        )
        new_stack, (_, reward) = self.stack.step(stack, patch, k_env)
        sample = (
            grid_u8,                                  # state BEFORE acting
            action.astype(jnp.bool_),                 # bit-packedable sample
            reward[:, 0],
            logp_old,
        )
        return (new_stack, params, key), sample

    # -- phase 2: clipped-surrogate updates ---------------------------------
    def _minibatch_update(self, carry, idx, grids, actions, advantages,
                          logp_old, entropy_beta):
        params, opt_state = carry

        def loss_fn(p):
            obs = grids[idx].astype(jnp.float32)[:, None]
            lg = policy_logits(p, obs, self.fused_head)
            act = actions[idx].astype(jnp.float32)
            logp = jnp.sum(-optax.sigmoid_binary_cross_entropy(lg, act),
                           axis=1)
            ratio = jnp.exp(logp - logp_old[idx])
            adv = advantages[idx]
            unclipped = ratio * adv
            clipped = jnp.clip(
                ratio, 1.0 - self.clip_eps, 1.0 + self.clip_eps
            ) * adv
            pg_loss = -jnp.mean(jnp.minimum(unclipped, clipped))
            prob = jax.nn.sigmoid(lg)
            entropy = jnp.mean(
                prob * jax.nn.softplus(-lg) + (1 - prob) * jax.nn.softplus(lg)
            )
            return pg_loss - entropy_beta * entropy

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = self.opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), None

    def _run_impl(self, state: PPOTrainState, entropy_beta: jax.Array,
                  horizon: int):
        cfg = self.config
        (stack, params, key), (grids, actions, rewards, logp_old) = (
            jax.lax.scan(
                self._collect_step,
                (state.stack, state.params, state.key),
                length=horizon,
            )
        )
        if self.gamma > 0.0:
            # discounted return-to-go along the horizon, per instance
            def disc(carry, r):
                ret = r + self.gamma * carry
                return ret, ret

            _, returns = jax.lax.scan(disc,
                                      jnp.zeros_like(rewards[0]),
                                      rewards, reverse=True)
            # truncated returns shrink toward the horizon boundary (step t
            # accumulates ~(1-gamma^(T-t))/(1-gamma) of the bonus mass), so
            # a single global baseline would push late-horizon actions
            # negative by POSITION.  Center per timestep across instances
            # to remove the position bias (inst == 1 has no cross-instance
            # mean; the global centering below is all we can do there).
            if cfg.instances > 1:
                returns = returns - jnp.mean(returns, axis=1, keepdims=True)
            credit = returns
        else:
            credit = rewards

        n = horizon * cfg.instances
        flat_grids = grids.reshape(n, cfg.height, cfg.width)
        flat_actions = actions.reshape(n, -1)
        flat_rewards = credit.reshape(n)
        flat_logp = logp_old.reshape(n)

        baseline = (
            self.baseline_decay * state.baseline
            + (1 - self.baseline_decay) * jnp.mean(flat_rewards)
        )
        # STRICTLY zero-mean advantage (no EMA blend): any uniform offset
        # acts as behaviour cloning of the sampled actions — with ~95%-zero
        # toggle patches and many clipped updates per horizon that drives
        # the logits to the all-zeros attractor (observed on the frozen
        # eval stack before this fix).  The flat batch is horizon*instances
        # samples, so the batch mean is a solid baseline on its own; the
        # EMA is kept only as a reward-trace diagnostic.
        advantages = flat_rewards - jnp.mean(flat_rewards)
        if self.norm_advantage:
            advantages = advantages / (jnp.std(advantages) + 1e-6)

        mb = n // self.minibatches
        if mb == 0:
            # mean over an empty minibatch is NaN and optax would silently
            # write NaN params — fail at trace time instead
            raise ValueError(
                f"horizon*instances = {n} must be >= minibatches "
                f"({self.minibatches}); raise the horizon or lower "
                "minibatches"
            )
        key, k_perm = jax.random.split(key)

        def epoch_body(carry, k):
            perm = jax.random.permutation(k, n)
            idxs = perm[: mb * self.minibatches].reshape(
                self.minibatches, mb
            )
            return jax.lax.scan(
                lambda c, i: self._minibatch_update(
                    c, i, flat_grids, flat_actions, advantages, flat_logp,
                    entropy_beta,
                ),
                carry, idxs,
            )[0], None

        (params, opt_state), _ = jax.lax.scan(
            epoch_body,
            (params, state.opt_state),
            jax.random.split(k_perm, self.epochs),
        )
        new_state = PPOTrainState(
            stack=stack, params=params, opt_state=opt_state,
            baseline=baseline, key=key,
        )
        return new_state, rewards.mean(axis=1)

    def run(self, state: PPOTrainState, horizon: int,
            entropy_beta: Optional[float] = None,
            ) -> Tuple[PPOTrainState, jax.Array]:
        """One PPO iteration (collect ``horizon`` steps + clipped updates);
        returns (state, per-step batch-mean reward trace [horizon]).
        Donates ``state``.  ``entropy_beta`` overrides the constructor value
        for THIS iteration — it is a traced scalar, so schedules (e.g. a
        linear exploration decay across iterations) never retrace."""
        beta = self.entropy_beta if entropy_beta is None else entropy_beta
        return self._run(state, jnp.asarray(beta, jnp.float32),
                         horizon=horizon)

    def as_agent(self, deterministic_rate: Optional[float] = None) -> Agent:
        # inherits fused_head for the same reason as PolicyTrainer.as_agent
        return _policy_agent(self.config, deterministic_rate,
                             fused_head=self.fused_head)
