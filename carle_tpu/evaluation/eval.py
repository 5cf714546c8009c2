"""Challenge evaluation harness (reference evaluation/eval.py:17-98).

Protocol replicated: build the wrapper stack from ``[cls, reward_scale,
checkpoint]`` triples, set every wrapper's ``batch_size`` to
``steps * len(rules)`` so online updates never fire during scoring
(eval.py:45), put wrappers in eval mode (dropout off, no gradient work), run
the agent for ``steps`` per ruleset, score = mean reward per step.

The reference sets BOTH birth and survive from the birth list
(``survive = ruleset[0]``, eval.py:58-59).  That bug shaped the published
baseline scores, so it is the default here (``reference_compat=True``); pass
``reference_compat=False`` for the intended rules.

Checkpoints: reference ``.pt`` files load through the torch-state-dict
converters (mcl/rnd.py, mcl/ae.py); ``.npz`` files load the native
full-learner-state format (checkpoint.py).

Run:  python -m carle_tpu.evaluation.eval
"""

from __future__ import annotations

import os
from typing import Any, Callable, List, Optional, Sequence, Tuple

import numpy as np

from carle_tpu import CARLE
from carle_tpu.checkpoint import load_pytree
from carle_tpu.mcl import (
    AE2D,
    CornerBonus,
    MorphoBonus,
    ParsimonyBonus,
    PredictionBonus,
    PufferDetector,
    RND2D,
    SpeedDetector,
    SurpriseBonus,
)

from .submission import SubmissionAgent

_HERE = os.path.dirname(os.path.abspath(__file__))

# Shipped carle_tpu-trained checkpoints (train_mcl on TPU: 4 epochs x 4
# rulesets x 1024 steps x 32 instances) — the analogue of the reference's
# evaluation/RND2D_mcl.pt / AE2D_mcl.pt artifacts.  A trained PPO policy
# ships alongside (policy_ppo.npz, f16-compressed; battery 1.181-1.200
# across eval seeds 0-3 vs 0.634-0.661 random — loader-verified on v5e,
# assets/scores.txt): score it with
#   evaluate_fused(Agent=load_shipped_policy())
DEFAULT_WRAPPERS = [
    [RND2D, 1.0, _HERE + "/RND2D_mcl.npz"],
    [AE2D, 1.0, _HERE + "/AE2D_mcl.npz"],
    [SpeedDetector, 1e-2, None],
    [PufferDetector, 1e-3, None],
]

# The reference's own shipped checkpoints (converted on load) for A/B runs.
REFERENCE_WRAPPERS = [
    [RND2D, 1.0, "/root/reference/evaluation/RND2D_mcl.pt"],
    [AE2D, 1.0, "/root/reference/evaluation/AE2D_mcl.pt"],
    [SpeedDetector, 1e-2, None],
    [PufferDetector, 1e-3, None],
]

# eval.py:89-94 — the last ruleset [[2],[0]] is the held-out outgroup
DEFAULT_RULES = [
    [[3, 6, 8], [2, 4, 5]],
    [[3], [2, 3]],
    [[3, 6, 7, 8], [3, 4, 6, 7, 8]],
    [[3], [0, 2, 3]],
    [[2], [0]],
]


def load_shipped_policy(path: Optional[str] = None):
    """(Agent, params) pair for the shipped trained PPO policy
    (``policy_ppo.npz``, battery 1.181-1.200 across eval seeds 0-3 vs the
    0.634-0.661 random baseline — loader-verified on v5e,
    assets/scores.txt).  ``path`` overrides with another native .npz params
    file of the same architecture; pass the pair to ``evaluate_fused`` /
    ``evaluate_fused_batched``."""
    import jax

    from carle_tpu import EnvConfig
    from carle_tpu.policy import PolicyTrainer, init_policy_params

    path = path or (_HERE + "/policy_ppo.npz")
    if not path.endswith(".npz"):
        raise ValueError(
            "policy params must be a native .npz pytree (torch .pt state "
            "dicts apply to the class agents, not the shipped policy)"
        )
    cfg = EnvConfig()
    params = load_pytree(path, init_policy_params(jax.random.PRNGKey(0), cfg))
    return (PolicyTrainer(cfg, []).as_agent(), params)


def _load_wrapper_checkpoint(wrapper: Any, path: str) -> None:
    if path.endswith(".npz"):
        scale = wrapper.reward_scale  # spec wins over the checkpointed value
        wrapper._wstate = load_pytree(path, wrapper._wstate)
        wrapper.reward_scale = scale
    else:
        import torch

        wrapper.load_state_dict(
            torch.load(path, weights_only=True, map_location="cpu")
        )


def evaluate(
    Agent: Callable[..., Any],
    rules: Sequence[Sequence[Sequence[int]]],
    wrappers: Sequence[Sequence[Any]],
    params_path: Optional[str] = None,
    steps: int = 1024,
    reference_compat: bool = True,
    seed: int = 0,
    verbose: bool = True,
) -> Tuple[float, List[float]]:
    """Score an agent over the wrapper stack and ruleset battery.

    Returns (mean reward per step, per-step summed-reward trace) exactly as
    the reference does (eval.py:17-79).
    """
    agent = Agent(seed=seed)
    if params_path is not None:
        agent.load_state_dict(params_path)

    env: Any = CARLE()
    for spec in wrappers:
        cls, scale, ckpt = spec[0], spec[1], spec[2]
        env = cls(env, seed=seed)
        env.reward_scale = scale
        try:
            env.batch_size = steps * len(rules)  # freeze updates (eval.py:45)
        except AttributeError:
            pass  # statistic wrappers have no update cycle
        if ckpt is not None:
            _load_wrapper_checkpoint(env, ckpt)
        env.eval()

    score = 0.0
    total_steps = 0
    score_trace: List[float] = []
    for ruleset in rules:
        env.inner_env.birth = list(ruleset[0])
        if reference_compat:
            env.inner_env.survive = list(ruleset[0])  # eval.py:59 bug
        else:
            env.inner_env.survive = list(ruleset[1])

        obs = env.reset()
        for _ in range(steps):
            action = agent(obs)
            obs, reward, done, info = env.step(action)
            step_sum = float(np.asarray(reward).sum())
            score += step_sum
            score_trace.append(step_sum)
            total_steps += 1

        if verbose:
            print(
                "cumulative score = {:.3e} at total steps = {}, rulset = {}".format(
                    score, total_steps, ruleset
                )
            )

    score /= total_steps
    return score, score_trace


def _fused_wrapper_factory(config: Any) -> dict:
    """WrapperDef factories for every reference wrapper class, keyed by the
    class used in ``[cls, reward_scale, ckpt]`` eval specs.  Learning
    wrappers are built with ``train=False`` (frozen updates, dropout off —
    the fused equivalent of the huge-batch_size trick, eval.py:45)."""
    from carle_tpu.mcl import (
        ae2d_def,
        corner_def,
        morpho_def,
        parsimony_def,
        prediction_def,
        puffer_def,
        rnd2d_def,
        speed_def,
        surprise_def,
    )

    return {
        RND2D: lambda s: rnd2d_def(config, reward_scale=s, train=False),
        AE2D: lambda s: ae2d_def(config, reward_scale=s, train=False),
        PredictionBonus: lambda s: prediction_def(
            config, reward_scale=s, train=False
        ),
        SurpriseBonus: lambda s: surprise_def(
            config, reward_scale=s, train=False
        ),
        MorphoBonus: lambda s: morpho_def(config, reward_scale=s),
        CornerBonus: lambda s: corner_def(config, reward_scale=s),
        ParsimonyBonus: lambda s: parsimony_def(reward_scale=s),
        SpeedDetector: lambda s: speed_def(config, reward_scale=s),
        PufferDetector: lambda s: puffer_def(config, reward_scale=s),
    }


def inject_wrapper_checkpoints(
    wstates: Sequence[Any], wrappers: Sequence[Sequence[Any]]
) -> Tuple[Any, ...]:
    """Load each ``[cls, scale, ckpt]`` spec's checkpoint into the matching
    functional wrapper state (native .npz or converted torch .pt); the
    spec's reward_scale always wins over the checkpointed value.  Shared by
    the fused eval path and policy training against a frozen eval stack."""
    from carle_tpu.mcl.ae import ae_params_from_torch
    from carle_tpu.mcl.rnd import (
        predictor_params_from_torch,
        random_network_params_from_torch,
    )

    new_wstates = list(wstates)
    for i, (cls, _, ckpt) in enumerate(wrappers):
        if ckpt is None:
            continue
        if not hasattr(new_wstates[i], "reward_scale"):
            raise ValueError(
                f"{cls.__name__} has no checkpointable state; drop the "
                f"checkpoint path {ckpt!r} from its spec"
            )
        if ckpt.endswith(".npz"):
            loaded = load_pytree(ckpt, new_wstates[i])
            new_wstates[i] = loaded._replace(
                reward_scale=new_wstates[i].reward_scale
            )
            continue
        import torch

        sd = torch.load(ckpt, weights_only=True, map_location="cpu")
        if cls is RND2D:
            new_wstates[i] = new_wstates[i]._replace(
                params=predictor_params_from_torch(sd),
                target_params=random_network_params_from_torch(sd),
            )
        elif cls in (AE2D, PredictionBonus, SurpriseBonus):
            # Prediction/Surprise subclass AE2D upstream (mcl.py:558, 701)
            # and share its predictor architecture / state-dict layout
            new_wstates[i] = new_wstates[i]._replace(
                params=ae_params_from_torch(sd)
            )
        else:
            raise ValueError(f"no torch converter for {cls.__name__}")
    return tuple(new_wstates)


# Process-level reuse of the fused rollout programs.  Building a Rollout
# per call re-traces its jitted scans; on the tunneled TPU even a
# persistent-cache hit costs long remote round trips, so repeat scoring
# (serving many submissions, scoring during training) reuses one Rollout
# per (config, wrapper spec, agent class, params_path) — params stay
# per-call data.
_ROLLOUT_CACHE: dict = {}
_ROLLOUT_CACHE_MAX = 16  # FIFO-evicted; each entry pins jitted programs


def _cached_rollout(tag, config, wrappers, Agent, toggle_rate, params_path,
                    make):
    """Return a (possibly cached) Rollout.  Only cacheable specs — Agent
    None, a class, or a functional :class:`carle_tpu.agents.Agent` — hit the
    cache; agent *params* are per-call data so reuse is behaviourally
    transparent PROVIDED the class's ``_agent`` closure depends only on
    class/dims/toggle_rate (true for the in-repo agents; ``params_path`` is
    part of the key so distinct submission files never share a closure).
    Functional Agents key on their own (function-identity) equality, so the
    SAME Agent instance reuses its programs — pass params via
    ``agent_params`` rather than baking them into the closure to benefit.
    Pass a shell instance or an ``(Agent, params)`` pair to bypass the
    cache for anything fancier."""
    from carle_tpu.agents import Agent as FnAgent

    if not (Agent is None or isinstance(Agent, (type, FnAgent))):
        return make()
    try:
        key = (
            tag, config,
            tuple((cls, float(scale)) for cls, scale, _ in wrappers),
            Agent, float(toggle_rate), params_path,
        )
        ro = _ROLLOUT_CACHE.get(key)
    except TypeError:  # unhashable config/spec — skip the cache
        return make()
    if ro is None:
        ro = make()
        if len(_ROLLOUT_CACHE) >= _ROLLOUT_CACHE_MAX:
            _ROLLOUT_CACHE.pop(next(iter(_ROLLOUT_CACHE)))
        _ROLLOUT_CACHE[key] = ro
    return ro


def _resolve_fused_agent(
    Agent: Any, params_path: Optional[str], agent_params: Any,
    config: Any, toggle_rate: float, seed: int,
) -> Tuple[Any, Any]:
    """Resolve any supported agent spec to (functional Agent, params).

    Accepts: ``None`` (reference Bernoulli baseline), a functional
    :class:`carle_tpu.agents.Agent`, an ``(Agent, params)`` pair, an agent
    class (RandomAgent / RandomNetworkAgent / SubmissionAgent / any shell
    exposing ``_agent``/``params``), or an already-built shell instance.
    ``params_path`` loads into class/instance specs via their
    ``load_state_dict`` (torch .pt or native .npz), matching the reference's
    agent loading (eval.py:33-36).  Returned params of ``None`` mean "use
    the agent's own init".
    """
    from carle_tpu.agents import Agent as FnAgent, make_random_agent

    if Agent is None:
        if params_path is not None or agent_params is not None:
            raise ValueError(
                "params_path/agent_params were given but Agent=None scores "
                "the Bernoulli random baseline, which has no parameters — "
                "pass the agent the parameters belong to (silently scoring "
                "the wrong agent would be worse than this error)"
            )
        return (
            make_random_agent(
                config.eff_action_width, config.eff_action_height, toggle_rate
            ),
            None,
        )
    if isinstance(Agent, FnAgent):
        if params_path is not None:
            raise ValueError(
                "params_path cannot be loaded into a bare functional Agent "
                "(its param pytree structure is caller-defined) — load the "
                "checkpoint yourself and pass agent_params, or pass an agent "
                "class/instance with a load_state_dict"
            )
        return Agent, agent_params
    if isinstance(Agent, tuple):
        if params_path is not None or agent_params is not None:
            raise ValueError(
                "an (Agent, params) pair already carries its parameters — "
                "params_path/agent_params would be silently ignored; pass "
                "one source of parameters only"
            )
        fn, p = Agent
        return fn, p

    inst = (
        Agent(
            seed=seed,
            action_width=config.eff_action_width,
            action_height=config.eff_action_height,
            observation_width=config.width,
            observation_height=config.height,
        )
        if isinstance(Agent, type)
        else Agent
    )
    if params_path is not None:
        inst.load_state_dict(params_path)
    fn = getattr(inst, "_agent", None)
    if fn is None:
        raise TypeError(
            f"{type(inst).__name__} does not expose a functional policy "
            "(expected an `_agent` attribute); pass a carle_tpu.agents.Agent "
            "or an (Agent, params) pair instead"
        )
    return fn, getattr(inst, "params", None)


def evaluate_fused(
    Agent: Any = None,
    rules: Sequence[Sequence[Sequence[int]]] = None,
    wrappers: Sequence[Sequence[Any]] = None,
    params_path: Optional[str] = None,
    steps: int = 1024,
    reference_compat: bool = True,
    seed: int = 0,
    toggle_rate: float = 0.1,
    verbose: bool = True,
    config: Any = None,
    agent_params: Any = None,
) -> Tuple[float, np.ndarray]:
    """TPU-native scoring: the same protocol as :func:`evaluate`, but each
    ruleset segment is ONE jitted ``lax.scan`` (policy + env + all bonuses),
    so the whole 5x1024-step battery is a handful of device dispatches
    instead of ~5000 host round-trips.  Eval semantics (frozen updates,
    dropout off) come from building the wrapper defs with ``train=False``
    — behaviourally identical to the huge-batch_size trick (eval.py:45).

    Any agent the per-step :func:`evaluate` accepts scores here too (see
    :func:`_resolve_fused_agent`); ``Agent=None`` is the reference baseline
    — Bernoulli(toggle_rate) toggles (submission.py:34-41).  All ten
    reference wrapper classes are accepted in ``wrappers`` specs.  Returns
    (mean score, per-step trace).
    """
    import jax

    from carle_tpu import EnvConfig, rules as rules_mod  # noqa: F401
    from carle_tpu.rollout import Rollout

    if rules is None:
        rules = DEFAULT_RULES
    if wrappers is None:
        wrappers = DEFAULT_WRAPPERS

    if config is None:
        config = EnvConfig()  # the reference eval geometry (256², 1 env)
    agent_fn, loaded_params = _resolve_fused_agent(
        Agent, params_path, agent_params, config, toggle_rate, seed
    )

    def _make():
        factory = _fused_wrapper_factory(config)
        defs = [factory[cls](scale) for cls, scale, _ in wrappers]
        return Rollout(config, defs, agent_fn)

    ro = _cached_rollout("seq", config, wrappers, Agent, toggle_rate,
                         params_path, _make)
    if loaded_params is not None:
        # the fused runners DONATE their carry; copy so the caller's params
        # survive this call (and repeated calls with the same params work)
        import jax.numpy as jnp

        loaded_params = jax.tree.map(jnp.copy, loaded_params)
    carry = ro.init(
        jax.random.PRNGKey(seed), rules_mod.LIFE, agent_params=loaded_params
    )
    carry = carry._replace(stack=carry.stack._replace(
        wrappers=inject_wrapper_checkpoints(carry.stack.wrappers, wrappers)
    ))

    score = 0.0
    traces = []
    total = 0
    for ruleset in rules:
        birth = list(ruleset[0])
        survive = list(ruleset[0] if reference_compat else ruleset[1])
        carry = ro.with_rules(
            carry, rules_mod.pack_rule_bits(birth, survive)
        )
        carry, _ = ro.reset(carry)
        carry, rewards = ro.run(carry, num_steps=steps)
        seg = np.asarray(rewards.sum(axis=(1, 2)))  # [steps]
        traces.append(seg)
        score += float(seg.sum())
        total += steps
        if verbose:
            print(
                "cumulative score = {:.3e} at total steps = {}, rulset = {}"
                .format(score, total, ruleset)
            )

    return score / total, np.concatenate(traces)


def evaluate_fused_batched(
    Agent: Any = None,
    rules: Sequence[Sequence[Sequence[int]]] = None,
    wrappers: Sequence[Sequence[Any]] = None,
    params_path: Optional[str] = None,
    steps: int = 1024,
    reference_compat: bool = True,
    seed: int = 0,
    toggle_rate: float = 0.1,
    verbose: bool = True,
    agent_params: Any = None,
    replicas: int = 1,
    mesh: Any = None,
) -> Tuple[float, np.ndarray]:
    """The whole battery as ONE batch: every ruleset becomes an env instance
    carrying its own 18-bit rule mask (per-instance rules — rules are data,
    so a [instances] rule vector broadcasts through the same compiled step;
    the reference cannot express this at all).  One reset + one jitted scan
    scores all rulesets concurrently: ~len(rules)x less wall time and
    dispatch than the sequential battery.

    Protocol note: the published harness runs rulesets SEQUENTIALLY with
    wrapper statistics carried across segments (reference eval.py:57-75 —
    reset() never clears wrapper buffers).  Here each ruleset instead
    evolves in its own instance from fresh statistics; Speed/Puffer run
    ``per_instance`` (identical to the protocol's batch-global mode at its
    instances=1).  Scores agree with :func:`evaluate_fused` to within that
    carry-over and the agent RNG stream — MEASURED for the default
    4-wrapper stack.  On TPU v5e at the PUBLISHED battery (5 rulesets x
    1024 steps, shipped checkpoints, 5 seeds —
    assets/eval_deviation_r04.json, scripts/eval_deviation_tpu.py):
    max per-seed |batched - sequential| 0.0254 on scores ~0.645 (3.9%),
    5-seed mean diff +0.0014 (0.2%); warm battery 0.5-0.6 s batched vs
    2.2 s sequential.  CPU at steps=64/128 over 5 seeds: per-seed |diff|
    <= 0.102/0.084 (~10%), mean bias 2.5/3.8%; bounded in CI by
    tests/test_drivers.py::test_batched_vs_sequential_deviation_bound.
    Use the sequential path for published numbers and this one for fast
    scoring in training loops.

    ``replicas > 1`` runs that many INDEPENDENT copies of the battery as
    additional instances in the same scan (per-instance agent RNG makes
    each copy an independent sample) — error bars from one compiled
    program instead of a seeds loop.  ``per_rule`` is then averaged over
    replicas.

    ``mesh`` (a ``jax.sharding.Mesh``) shards the instance batch —
    rulesets x replicas — over the mesh's devices (parallel/mesh.py
    placement rules: per-instance leaves shard dim 0, wrapper params
    replicate), so a replicated battery scores on a pod slice in one
    launch; ``len(rules) * replicas`` must divide by the device count.

    Returns (mean score, per-ruleset mean scores [len(rules)]).
    """
    import jax
    import jax.numpy as jnp

    from carle_tpu import EnvConfig, rules as rules_mod  # noqa: F401
    from carle_tpu.mcl import puffer_def, speed_def
    from carle_tpu.rollout import Rollout

    if rules is None:
        rules = DEFAULT_RULES
    if wrappers is None:
        wrappers = DEFAULT_WRAPPERS

    replicas = max(1, int(replicas))
    config = EnvConfig(instances=len(rules) * replicas)
    agent_fn, loaded_params = _resolve_fused_agent(
        Agent, params_path, agent_params, config, toggle_rate, seed
    )

    def _make():
        factory = _fused_wrapper_factory(config)
        factory[SpeedDetector] = lambda s: speed_def(
            config, reward_scale=s, per_instance=True
        )
        factory[PufferDetector] = lambda s: puffer_def(
            config, reward_scale=s, per_instance=True
        )
        defs = [factory[cls](scale) for cls, scale, _ in wrappers]
        return Rollout(config, defs, agent_fn)

    ro = _cached_rollout("batched", config, wrappers, Agent, toggle_rate,
                         params_path, _make)
    if loaded_params is not None:
        loaded_params = jax.tree.map(jnp.copy, loaded_params)  # donation guard
    carry = ro.init(
        jax.random.PRNGKey(seed), rules_mod.LIFE, agent_params=loaded_params
    )
    carry = carry._replace(stack=carry.stack._replace(
        wrappers=inject_wrapper_checkpoints(carry.stack.wrappers, wrappers)
    ))

    bits = jnp.asarray(
        [
            rules_mod.pack_rule_bits(
                rs[0], rs[0] if reference_compat else rs[1]
            )
            for rs in rules
        ] * replicas,
        dtype=jnp.int32,
    )
    env = carry.stack.env._replace(rule_bits=bits)
    carry = carry._replace(stack=carry.stack._replace(env=env))
    if mesh is not None:
        from carle_tpu.parallel import shard_carry

        carry = shard_carry(carry, mesh, config)
    carry, _ = ro.reset(carry)
    carry, rewards = ro.run(carry, num_steps=steps)

    per_inst = np.asarray(rewards.sum(axis=(0, 2))) / steps
    # [replicas, len(rules)] -> replica-averaged battery
    per_rule = per_inst.reshape(replicas, len(rules)).mean(axis=0)
    score = float(per_rule.mean())
    if verbose:
        for rs, v in zip(rules, per_rule):
            print(f"ruleset {rs}: mean reward/step = {v:.3e}")
    return score, per_rule


if __name__ == "__main__":
    import argparse

    from carle_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    parser = argparse.ArgumentParser(
        description="Challenge evaluation (5 rulesets x N steps)"
    )
    parser.add_argument("--fused", action="store_true",
                        help="one jitted scan per ruleset (TPU-native path)")
    parser.add_argument("--batched", action="store_true",
                        help="all rulesets as one batch via per-instance "
                             "rule masks (fast variant; see "
                             "evaluate_fused_batched protocol note)")
    parser.add_argument("--steps", type=int, default=1024)
    parser.add_argument("--checkpoints", choices=("shipped", "reference"),
                        default="shipped",
                        help="shipped carle_tpu .npz or converted reference .pt")
    parser.add_argument("--fix-survive-bug", action="store_true",
                        help="use the declared survive rules instead of the "
                             "reference's survive<-birth bug")
    parser.add_argument("--agent", choices=("random", "network", "policy"),
                        default="random",
                        help="random = Bernoulli baseline (SubmissionAgent), "
                             "network = frozen random-CNN RandomNetworkAgent, "
                             "policy = the shipped trained PPO policy "
                             "(policy_ppo.npz; override with --agent-params)")
    parser.add_argument("--agent-params", default=None,
                        help="agent checkpoint loaded via load_state_dict "
                             "(.pt torch state dict or .npz params); for "
                             "--agent policy this must be a native .npz "
                             "params file")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", default=None,
                        help="override the JAX platform (e.g. cpu); the "
                             "JAX_PLATFORMS env var is overridden by the "
                             "axon plugin, only the config knob works")
    args = parser.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from carle_tpu.agents import RandomNetworkAgent

    wrappers = (DEFAULT_WRAPPERS if args.checkpoints == "shipped"
                else REFERENCE_WRAPPERS)
    compat = not args.fix_survive_bug
    if args.agent == "policy":
        if not (args.fused or args.batched):
            parser.error("--agent policy is a functional policy with no "
                         "per-step shell; pass --fused or --batched")
        policy_pair = load_shipped_policy(args.agent_params)
        if args.batched:
            score, per_rule = evaluate_fused_batched(
                Agent=policy_pair, wrappers=wrappers, steps=args.steps,
                reference_compat=compat, seed=args.seed,
            )
        else:
            score, trace = evaluate_fused(
                Agent=policy_pair, wrappers=wrappers, steps=args.steps,
                reference_compat=compat, seed=args.seed,
            )
        print("mean evaluation score is {:.3e}".format(score))
        raise SystemExit(0)

    agent_cls = SubmissionAgent if args.agent == "random" else RandomNetworkAgent
    if args.agent == "random" and args.agent_params:
        # SubmissionAgent inherits DemoAgent.load_state_dict, a NO-OP
        # (submission.py — the reference's challenge-template contract):
        # the params would load into nothing and the plain Bernoulli
        # baseline would be scored under the user's checkpoint name
        parser.error("--agent random has no parameters to load; use "
                     "--agent network or --agent policy with --agent-params")
    # always route through the class so --agent-params reaches
    # load_state_dict on every path (Agent=None would silently drop it)
    if args.batched:
        score, per_rule = evaluate_fused_batched(
            Agent=agent_cls,
            wrappers=wrappers, params_path=args.agent_params,
            steps=args.steps, reference_compat=compat, seed=args.seed,
        )
    elif args.fused:
        score, trace = evaluate_fused(
            Agent=agent_cls,
            wrappers=wrappers, params_path=args.agent_params,
            steps=args.steps, reference_compat=compat, seed=args.seed,
        )
    else:
        score, trace = evaluate(
            agent_cls, DEFAULT_RULES, wrappers,
            params_path=args.agent_params, steps=args.steps,
            reference_compat=compat, seed=args.seed,
        )
    print("mean evaluation score is {:.3e}".format(score))
