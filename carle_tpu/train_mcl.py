"""Wrapper pre-training driver (reference carle/train_mcl.py:15-89).

Same protocol: stack CARLE -> RND2D -> AE2D, drive with a (random) agent,
cycle epochs x rulesets, run ``steps_per_rule`` steps per segment, checkpoint
the wrapper states and dump the reward history after each segment.

TPU-native differences:

* each ruleset segment is ONE jitted ``lax.scan`` (rollout.py), not a Python
  loop of 2048 host round-trips;
* rule changes are state updates (no retrace) — the whole multi-ruleset
  training run reuses a single compiled program;
* checkpoints are .npz pytrees of the FULL learner state (params + Adam
  moments + accumulation counters), so training resumes exactly — the
  reference can't resume (no optimizer state in its .pt files);
* metrics are the same ``.npy`` reward histories the reference writes
  (train_mcl.py:86).

Run:  python -m carle_tpu.train_mcl
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import rules as rules_mod
from .agents import make_random_agent
from .checkpoint import save_pytree, load_pytree
from .config import EnvConfig
from .mcl.ae import ae2d_def
from .mcl.rnd import rnd2d_def
from .rollout import Rollout

# Life, Move/Morley, Day & Night, B3/S023 (train_mcl.py:95-98; the reference
# comment calls the last one "Live Free or Die" but that rule is canonically
# B2/S0 — kept as shipped)
DEFAULT_RULES: List[List[List[int]]] = [
    [[3], [2, 3]],
    [[3, 6, 8], [2, 4, 5]],
    [[3, 6, 7, 8], [3, 4, 6, 7, 8]],
    [[3], [0, 2, 3]],
]


def _find_checkpoint(directory: str, name: str) -> str:
    """Resolve a wrapper checkpoint in ``directory``: the canonical
    ``{name}.npz`` if present, else the NEWEST ``{name}_*.npz`` the trainer
    itself writes — so ``--resume-from`` can point straight at a previous
    run's ``models/`` directory without renaming."""
    canonical = os.path.join(directory, f"{name}.npz")
    if os.path.exists(canonical):
        return canonical
    if not os.path.isdir(directory):
        raise FileNotFoundError(
            f"--resume-from directory {directory!r} does not exist "
            f"(expected {name}.npz or {name}_*.npz checkpoints in it)"
        )
    candidates = [
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.startswith(name + "_") and f.endswith(".npz")
    ]
    if not candidates:
        return canonical  # let load_pytree raise its clear error
    return max(candidates, key=os.path.getmtime)


# Measured fused-training cost on v5e (r5): 2881 env-steps/s at 512² =
# 7.55e8 cell-steps/s = 1.33e-9 s per cell-step (RND+AE whole-AE kernels,
# flat per-env from 256 to 7040 envs; cross-check: the 5376-env 32-step
# launch took 59.9 s = 32·5376·512²·1.33e-9).  Used with ~20% margin ONLY
# to predict whether a segment's single-scan launch would exceed the
# execution-transport watchdog (below) — a 2x misprediction just splits a
# launch in half.
K_CELL_SECONDS = 1.6e-9


def _chunk_steps(steps: int, instances: int, height: int, width: int,
                 budget_s: float) -> int:
    """Largest divisor of ``steps`` whose single launch stays under
    ``budget_s`` predicted seconds.

    Why: launches over ~60 s of device execution are KILLED on this
    environment's execution transport ("TPU worker crashed or restarted"
    — r5 ladder bisection: the same 6144-env program dies at 32
    steps/launch ≈ 69 s and runs at full rate at 16 ≈ 34 s; r4's
    'runtime HBM limit' was this watchdog wearing a memory costume).
    Chunking a segment into several launches of one compiled length is
    throughput-neutral (launch overhead is ms against a seconds-long
    scan) and costs ONE compile, same as the unchunked segment."""
    if budget_s <= 0:
        return steps
    pred = steps * instances * height * width * K_CELL_SECONDS
    if pred <= budget_s:
        return steps
    per_step = pred / steps
    max_c = max(1, int(budget_s / per_step))
    for c in range(min(max_c, steps), 0, -1):
        if steps % c == 0:
            return c
    return 1


def _write_progress(path: str, payload: Dict[str, Any]) -> None:
    """Atomic progress write (tmp + rename): a crash mid-write must never
    leave a torn JSON for the supervisor to trip over."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def train(
    agent_fn: Optional[Callable[..., Any]] = None,
    instances: int = 16,
    steps: Sequence[int] = (64, 2048),
    rules: Sequence[Sequence[Sequence[int]]] = None,
    mcl: Optional[Sequence[Callable[..., Any]]] = None,
    height: int = 256,
    width: int = 256,
    batch_size: int = 64,
    seed: int = 0,
    log_dir: str = "./logs/mcl",
    resume_from: Optional[str] = None,
    segment_callback: Optional[Callable[[Dict[str, Any]], None]] = None,
    mesh: Any = "auto",
    mixed_rules: bool = False,
    skip_segments: int = 0,
    progress_file: Optional[str] = None,
    fused_head: bool = False,
    packed_state: bool = False,
    hbm_budget_gib: Optional[float] = None,
    force_hbm: bool = False,
    launch_budget_s: float = 50.0,
    serialize: bool = False,
) -> np.ndarray:
    """Pre-train the RND2D + AE2D wrapper stack (reference train(),
    train_mcl.py:15; like the reference, the ``mcl`` argument is accepted for
    signature parity but the stack is RND2D + AE2D, train_mcl.py:38-39).

    ``mixed_rules=True`` trains on ALL rulesets simultaneously instead of
    cycling them: the rulesets are dealt round-robin across the instance
    batch as a per-instance rule VECTOR (a beyond-reference capability of
    the rules-as-data engines, Pallas kernels included), so each epoch is
    ONE fused segment whose wrapper updates see every rule's dynamics at
    once — no curriculum ordering effects, 4x fewer program launches.

    ``mesh`` controls multi-chip env-batch data parallelism (the north-star
    config in BASELINE.md): ``"auto"`` shards the instance batch over every
    local device whenever there is more than one and ``instances`` divides
    evenly (for multi-host, call ``jax.distributed.initialize()`` first so
    ``jax.devices()`` spans hosts); ``True`` forces it; ``False``/``None``
    stays single-device; a ``jax.sharding.Mesh`` is used as given.  Sharding
    is placement-only — grids and per-instance stats shard over the "env"
    axis, wrapper params/optimizer moments replicate, and XLA turns the
    batch-mean losses into ICI all-reduces — so reward histories match the
    single-device run (tests/test_drivers.py).

    ``fused_head=True`` runs every learned wrapper layer as a fused Pallas
    kernel (4.05x on v5e, nets.conv_head/conv_tail); on a multi-device mesh
    the Mesh is passed through to the defs so the kernels run under
    shard_map (pallas calls are opaque to GSPMD).

    ``packed_state=True`` carries the universes bit-packed (32 cells/word,
    parallel/packed_env.py with no space mesh): the scan carry's grid
    shrinks 8x vs uint8 (observations unpack lazily per step for the bonus
    nets) — the memory lever for the north-star 65k-envs-of-512² config
    (BASELINE.md row 2; the packed 65k x 512² state is 2.1 GB vs 17 GB).
    Trajectory/reward parity with the uint8 carry is exact
    (tests/test_drivers.py::test_train_packed_state_matches_default).

    Elastic recovery (scripts/train_supervisor.py drives this; the reference
    has no failure handling at all — a crash loses the run): ``progress_file``
    atomically records how many segments completed after each one, and
    ``skip_segments`` fast-forwards the schedule past segments a previous
    (crashed) process already finished — combined with ``resume_from`` this
    continues training from the last completed segment.  Continuation is
    semantic, not bit-exact: the carry's RNG key restarts from ``seed``, so
    the action stream differs from the uncrashed run; the learned state
    (params + Adam moments + accumulation counters) is exact.

    HBM preflight (``utils/preflight.py``): before the first segment the
    fused step program is priced with XLA's memory analysis on the same jit
    instance the loop runs (so the compile is reused, not doubled), and
    configs over the budget raise :class:`HBMBudgetError`.  Past the budget
    the program compiles but throughput CLIFFS (r5 measured: a 15.2 GiB
    step runs 2.8x slower than the same config serialized at 13.7), and
    the 15.75 GiB compile limit looms.  ``hbm_budget_gib=None`` = 13.0 GiB
    on TPU, no check elsewhere; ``force_hbm=True`` warns and proceeds.

    ``serialize=True`` puts an optimization barrier between the wrapper
    learners (WrapperStack serialize) — throughput-free at moderate scale
    and REQUIRED for full rate near the HBM ceiling (r5: 6144 envs of
    512² run 2865 env-steps/s serialized vs 1014 plain); the measured
    7040 envs/chip ceiling uses it.

    Launch chunking (``launch_budget_s``, default 50): launches whose
    device execution exceeds ~60 s are KILLED by this environment's
    execution transport ("TPU worker crashed" — the r5 ladder bisection
    that dissolved r4's "runtime HBM limit"); big segments are split into
    several launches of one compiled scan length.  0 disables.

    Returns the per-step summed reward history (skipped segments excluded),
    and writes:
      {log_dir}/models/RND2D_{exp}.npz, AE2D_{exp}.npz  (full learner states)
      {log_dir}/metrics/mcl_rewards_{exp}.npy
    """
    if rules is None:
        rules = DEFAULT_RULES
    config = EnvConfig(
        height=height, width=width, action_height=64, action_width=64,
        instances=instances,
    ).validate()

    # resolve the mesh BEFORE building the wrapper defs: the fused Pallas
    # kernels are opaque to GSPMD (they would gather the batch onto one
    # device), so on a multi-device mesh they must be shard_mapped — the
    # defs receive the Mesh itself through fused_head (nets._shard_fused)
    mesh_obj = None
    if mesh is not None and mesh is not False:
        from jax.sharding import Mesh

        from .parallel.mesh import make_mesh

        devices = jax.devices()
        if isinstance(mesh, Mesh):
            mesh_obj = mesh
        elif mesh is True or (
            mesh == "auto" and len(devices) > 1
            and instances % len(devices) == 0
        ):
            mesh_obj = make_mesh(devices)
    fused_arg: Any = fused_head
    if fused_head and mesh_obj is not None and mesh_obj.devices.size > 1:
        fused_arg = mesh_obj

    wrapper_defs = [
        rnd2d_def(config, batch_size=batch_size, fused_head=fused_arg),
        ae2d_def(config, batch_size=batch_size, fused_head=fused_arg),
    ]
    if agent_fn is None:
        agent = make_random_agent(
            config.eff_action_width, config.eff_action_height
        )
        agent_params = None
    else:
        # reference-style class agents (shells, incl. the compat facades),
        # instances, functional Agents, and (Agent, params) pairs all
        # resolve through the eval harness's resolver — which passes ALL
        # four dims (the reference contract, train_mcl.py:41-45) and keeps
        # the built instance's own params (a seeded RandomNetworkAgent's
        # identity IS its frozen weights)
        from .evaluation.eval import _resolve_fused_agent

        agent, agent_params = _resolve_fused_agent(
            agent_fn, None, None, config, 0.1, seed
        )
        if agent_params is not None:
            # Rollout donates its carry; don't let the scan consume the
            # shell instance's own param buffers
            agent_params = jax.tree.map(jnp.copy, agent_params)

    stack = None
    if packed_state:
        from .parallel.packed_env import PackedSpatialStack

        stack = PackedSpatialStack(config, wrapper_defs, mesh=None,
                                   serialize=serialize)
    elif serialize:
        from .mcl.base import WrapperStack

        stack = WrapperStack(config, wrapper_defs, serialize=True)
    ro = Rollout(config, wrapper_defs, agent, stack=stack)
    carry = ro.init(jax.random.PRNGKey(seed), rules_mod.LIFE,
                    agent_params=agent_params)

    if resume_from:
        wstates = tuple(
            load_pytree(_find_checkpoint(resume_from, name), ws)
            for name, ws in zip(("RND2D", "AE2D"), carry.stack.wrappers)
        )
        carry = carry._replace(stack=carry.stack._replace(wrappers=wstates))

    if mesh_obj is not None:
        from .parallel.mesh import shard_carry

        carry = shard_carry(carry, mesh_obj, config)

    from .utils.preflight import check_hbm_budget

    epochs, steps_per_rule = int(steps[0]), int(steps[1])
    # decide launch chunking FIRST so the preflight lowers+compiles the
    # SAME program the segment loop runs (num_steps is a static argname —
    # pricing the unchunked length would pay a second multi-minute remote
    # compile and never execute the first).  The K_CELL predictor is
    # calibrated on the fused whole-AE step; the unfused XLA path runs
    # ~4x slower per step (the measured fused-head speedup), so scale it.
    chunk = steps_per_rule
    if jax.default_backend() == "tpu":
        k_scale = 1 if fused_head else 5
        chunk = _chunk_steps(steps_per_rule, instances, height, width,
                             launch_budget_s / k_scale)
    if chunk < steps_per_rule:
        print(f"launch chunking: {steps_per_rule} steps as "
              f"{steps_per_rule // chunk} launches of {chunk} "
              f"(predicted single-launch time exceeds "
              f"{launch_budget_s:.0f}s — launches over ~60s are killed "
              f"by the execution transport)", flush=True)
    mem = check_hbm_budget(
        ro._run, carry, num_steps=chunk,
        budget_gib=hbm_budget_gib, force=force_hbm,
        label=f"train step (inst={instances}, {height}x{width})",
    )
    if mem is not None:
        print(f"HBM preflight: {mem['peak_estimate_gib']:.2f} GiB priced "
              f"(temp {mem.get('temp_size_in_bytes', 0) / 2**30:.2f} GiB)",
              flush=True)

    exp_id = "mcl" + str(int(time.time()))
    model_dir = os.path.join(log_dir, "models")
    metric_dir = os.path.join(log_dir, "metrics")
    os.makedirs(model_dir, exist_ok=True)
    os.makedirs(metric_dir, exist_ok=True)

    rewards_hist: List[np.ndarray] = []

    if mixed_rules:
        packed = [rules_mod.pack_rule_bits(r[0], r[1]) for r in rules]
        # host-side numpy (NOT a jnp array): Rollout.run donates the carry,
        # so with_rules must mint a FRESH device buffer every epoch
        rule_vec = np.asarray(
            [packed[i % len(packed)] for i in range(instances)],
            dtype=np.int32,
        )
        segments = [("mixed", rule_vec)]
    else:
        segments = [
            (ruleset, rules_mod.pack_rule_bits(ruleset[0], ruleset[1]))
            for ruleset in rules
        ]
    total_segments = epochs * len(segments)
    seg_index = 0
    for epoch in range(epochs):
        for ruleset, bits in segments:
            seg_index += 1
            if seg_index <= skip_segments:
                continue
            carry = ro.with_rules(carry, bits)
            carry, _ = ro.reset(carry)

            t1 = time.time()
            # big configs split the segment into several launches of ONE
            # compiled scan length so no launch outlives the execution
            # watchdog (chunk chosen above, before the preflight, so the
            # priced program IS the executed program)
            parts = []
            for _ in range(steps_per_rule // chunk):
                carry, seg_rewards = ro.run(carry, num_steps=chunk)
                parts.append(np.asarray(seg_rewards.sum(axis=(1, 2))))
            seg_sum = np.concatenate(parts)  # [steps]
            t2 = time.time()

            rewards_hist.append(seg_sum)
            steps_per_second = steps_per_rule * instances / (t2 - t1)
            mean_reward = float(seg_sum.sum()) / (steps_per_rule * instances)
            print(f"steps / second = {steps_per_second:.3f}")
            print(
                f"round {epoch}, ruleset {ruleset}, "
                f"mean reward = {mean_reward:.3e}"
            )

            for name, ws in zip(("RND2D", "AE2D"), carry.stack.wrappers):
                save_pytree(
                    os.path.join(model_dir, f"{name}_{exp_id}.npz"), ws
                )
            if progress_file:
                _write_progress(progress_file, {
                    "completed_segments": seg_index,
                    "total_segments": total_segments,
                    "exp_id": exp_id,
                    "model_dir": model_dir,
                })
            if segment_callback:
                segment_callback(
                    dict(epoch=epoch, ruleset=ruleset,
                         steps_per_second=steps_per_second,
                         mean_reward=mean_reward)
                )

        if rewards_hist:
            np.save(
                os.path.join(metric_dir, f"mcl_rewards_{exp_id}.npy"),
                np.concatenate(rewards_hist),
            )

    return (np.concatenate(rewards_hist) if rewards_hist
            else np.zeros(0, dtype=np.float32))


if __name__ == "__main__":
    import argparse

    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(
        description="Pre-train the RND2D+AE2D wrapper stack (fused scans)"
    )
    parser.add_argument("--instances", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--steps-per-rule", type=int, default=512)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--size", type=int, default=256,
                        help="universe height = width")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log-dir", default="./logs/mcl")
    parser.add_argument("--resume-from", default=None,
                        help="directory holding RND2D.npz / AE2D.npz (or a "
                             "previous run's models/ dir — the newest "
                             "RND2D_*/AE2D_* checkpoints are picked up)")
    parser.add_argument("--skip-segments", type=int, default=0,
                        help="fast-forward past the first N schedule "
                             "segments (elastic restart: pair with "
                             "--resume-from; see scripts/train_supervisor.py)")
    parser.add_argument("--progress-file", default=None,
                        help="atomically record completed-segment count "
                             "here after each segment (for the supervisor)")
    parser.add_argument("--platform", default=None,
                        help="override the JAX platform (e.g. cpu); the "
                             "axon plugin ignores JAX_PLATFORMS, only this "
                             "works")
    parser.add_argument("--mixed-rules", action="store_true",
                        help="train on ALL rulesets simultaneously via a "
                             "per-instance rule vector (one fused segment "
                             "per epoch) instead of cycling them")
    parser.add_argument("--mesh", choices=("auto", "on", "off"),
                        default="auto",
                        help="shard the instance batch over all local "
                             "devices (multi-host: initialize "
                             "jax.distributed first)")
    parser.add_argument("--fused-head", action="store_true",
                        help="run the wrapper nets' conv front-ends as one "
                             "fused Pallas kernel (ops/pallas_head.py): "
                             "conv in exact f32, dropout from the on-core "
                             "hardware PRNG, pool-tie grads split equally "
                             "— measured 3x on the front-end segment; "
                             "TPU-only (the interpreter has no PRNG)")
    parser.add_argument("--packed-state", action="store_true",
                        help="carry the universes bit-packed (32 cells/word)"
                             " through the training scan — 8x smaller state,"
                             " lazy per-step obs unpack; the memory lever "
                             "for huge env batches (BASELINE north star)")
    parser.add_argument("--hbm-budget-gib", type=float, default=None,
                        help="runtime HBM budget for the preflight check "
                             "(default: 13.0 on TPU, no check elsewhere). "
                             "Over-budget configs refuse to launch — past "
                             "~13.5-14.2 GiB the measured failure is a "
                             "silently dead TPU worker, not a clean OOM")
    parser.add_argument("--force", action="store_true",
                        help="launch even if the HBM preflight prices the "
                             "program over budget (warns instead of raising)")
    parser.add_argument("--serialize", action="store_true",
                        help="optimization barrier between wrapper "
                             "learners: throughput-free at moderate "
                             "scale, required for full rate near the HBM "
                             "ceiling (the 7040-envs/chip 512^2 config)")
    parser.add_argument("--launch-budget-s", type=float, default=50.0,
                        help="split segments into launches predicted to "
                             "stay under this many seconds (launches over "
                             "~60s are killed by the execution transport); "
                             "0 disables chunking")
    parser.add_argument("--rng-impl", choices=("threefry", "rbg"),
                        default="threefry",
                        help="PRNG for in-scan randomness. Dropout masks "
                             "dominate the training step (65.6 -> 145.1 "
                             "scan-steps/s with dropout off on v5e); rbg "
                             "uses the TPU hardware generator and reaches "
                             "120.6 with dropout ON (1.84x) at the cost of "
                             "cross-backend reproducibility")
    args = parser.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.rng_impl != "threefry":
        jax.config.update("jax_default_prng_impl", args.rng_impl)

    history = train(
        instances=args.instances,
        steps=[args.epochs, args.steps_per_rule],
        rules=DEFAULT_RULES,
        height=args.size,
        width=args.size,
        batch_size=args.batch_size,
        seed=args.seed,
        log_dir=args.log_dir,
        resume_from=args.resume_from,
        mesh={"auto": "auto", "on": True, "off": False}[args.mesh],
        mixed_rules=args.mixed_rules,
        skip_segments=args.skip_segments,
        progress_file=args.progress_file,
        fused_head=args.fused_head,
        packed_state=args.packed_state,
        hbm_budget_gib=args.hbm_budget_gib,
        force_hbm=args.force,
        launch_budget_s=args.launch_budget_s,
        serialize=args.serialize,
    )
    print(json.dumps({"total_reward": float(history.sum()),
                      "segments": len(history) // args.steps_per_rule}))
