"""Fused rollout + checkpoint tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from carle_tpu import EnvConfig, rules
from carle_tpu.agents import make_random_agent
from carle_tpu.checkpoint import load_pytree, save_pytree
from carle_tpu.mcl.ae import ae2d_def
from carle_tpu.mcl.parsimony import parsimony_def
from carle_tpu.mcl.rnd import rnd2d_def
from carle_tpu.rollout import Rollout


CFG = EnvConfig(height=64, width=64, action_height=16, action_width=16,
                instances=2)


def test_rollout_runs_and_shapes():
    ro = Rollout(
        CFG,
        wrappers=[rnd2d_def(CFG, batch_size=4), parsimony_def()],
        agent=make_random_agent(16, 16),
    )
    carry = ro.init(jax.random.PRNGKey(0), rules.LIFE)
    carry, _ = ro.reset(carry)
    carry, rewards = ro.run(carry, num_steps=12)
    assert rewards.shape == (12, 2, 1)
    assert bool(jnp.all(jnp.isfinite(rewards)))
    # the RND learner must have stepped its optimizer 3 times (12 / 4)
    assert int(carry.stack.wrappers[0].updates) == 3


def test_rollout_rule_swap_no_retrace():
    ro = Rollout(CFG, wrappers=[], agent=make_random_agent(16, 16))
    carry = ro.init(jax.random.PRNGKey(0), rules.LIFE)
    carry, _ = ro.run(carry, num_steps=4)
    n_compiles = ro._run._cache_size()
    for bits in (rules.MORLEY, rules.DAY_AND_NIGHT, rules.LIVE_FREE_OR_DIE):
        carry = ro.with_rules(carry, bits)
        carry, _ = ro.run(carry, num_steps=4)
    assert ro._run._cache_size() == n_compiles  # rules are data


def test_rollout_action_stream_matches_shell():
    """The fused scan must produce the same universe trajectory as the
    step-at-a-time shell for an identical action stream."""
    from carle_tpu import CARLE

    rng = np.random.RandomState(0)
    actions = (rng.rand(10, 2, 16, 16) < 0.1).astype(np.uint8)

    ro = Rollout(CFG, wrappers=[])
    carry = ro.init(jax.random.PRNGKey(0), rules.LIFE)
    carry, _ = ro.run_actions(carry, actions)
    fused_grid = np.asarray(carry.stack.env.grid)

    env = CARLE(height=64, width=64, action_height=16, action_width=16,
                instances=2)
    env.reset()
    for t in range(10):
        env.step(actions[t][:, None])
    shell_grid = np.asarray(env.state.grid)
    np.testing.assert_array_equal(fused_grid, shell_grid)


def test_learner_state_checkpoint_roundtrip(tmp_path):
    ro = Rollout(CFG, wrappers=[ae2d_def(CFG, batch_size=4)],
                 agent=make_random_agent(16, 16))
    carry = ro.init(jax.random.PRNGKey(1), rules.LIFE)
    carry, _ = ro.run(carry, num_steps=8)
    wstate = carry.stack.wrappers[0]

    path = str(tmp_path / "ae2d.npz")
    save_pytree(path, wstate)
    restored = load_pytree(path, wstate)

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        wstate,
        restored,
    )

    # resume must continue bit-exactly: run 4 more steps from both states.
    # run() donates its carry, so branch from explicit copies.
    copy = lambda t: jax.tree.map(jnp.copy, t)
    c1 = copy(carry._replace(stack=carry.stack._replace(wrappers=(wstate,))))
    c2 = copy(carry._replace(stack=carry.stack._replace(wrappers=(restored,))))
    _, r1 = ro.run(c1, num_steps=4)
    _, r2 = ro.run(c2, num_steps=4)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_rollout_non_square_action_window():
    """Non-square action windows must flow through the fused path without a
    silent transpose: agents emit [inst, 1, AH, AW] (rows first) and the env
    applies the patch in the centred (AH, AW) window."""
    cfg = EnvConfig(height=64, width=128, action_height=8, action_width=32,
                    instances=2)
    ro = Rollout(
        cfg,
        wrappers=[parsimony_def()],
        agent=make_random_agent(cfg.eff_action_width, cfg.eff_action_height,
                                toggle_rate=1.0),  # all-toggles patch
    )
    carry = ro.init(jax.random.PRNGKey(0), rules.LIFE)
    carry, _ = ro.reset(carry)

    # one step of an all-ones patch is a master reset (whole window set);
    # run the agent apply directly to check its emitted layout instead
    action = ro.agent.apply(carry.agent_params, jax.random.PRNGKey(1),
                            jnp.zeros((2, 1, 64, 128), jnp.float32))
    assert action.shape == (2, 1, 8, 32)

    # a half-toggled stream exercises the real fused step
    ro2 = Rollout(cfg, wrappers=[],
                  agent=make_random_agent(cfg.eff_action_width,
                                          cfg.eff_action_height, 0.5))
    carry2 = ro2.init(jax.random.PRNGKey(0), rules.LIFE)
    carry2, _ = ro2.reset(carry2)
    carry2, rewards = ro2.run(carry2, num_steps=3)
    grid = np.asarray(carry2.stack.env.grid)
    assert grid.shape == (2, 64, 128)
    # live cells stay inside the 3-step growth envelope of the 8x32 window
    r0, c0 = cfg.action_row_offset, cfg.action_col_offset
    live = np.argwhere(grid.any(axis=0))
    assert live.size  # something was toggled
    assert live[:, 0].min() >= r0 - 3 and live[:, 0].max() < r0 + 8 + 3
    assert live[:, 1].min() >= c0 - 3 and live[:, 1].max() < c0 + 32 + 3


def test_run_logged_writes_decodable_episode_log(tmp_path):
    """A fused run_logged must produce the reference's CSV episode artifact:
    decodable (action, universe) RLE pairs at every snapshot boundary, with
    the final universe entry matching the live grid."""
    from carle_tpu import rle

    ro = Rollout(CFG, wrappers=[parsimony_def()],
                 agent=make_random_agent(16, 16))
    carry = ro.init(jax.random.PRNGKey(3), rules.LIFE)
    carry, _ = ro.reset(carry)
    carry, rewards, log_path = ro.run_logged(
        carry, num_steps=10, snapshot_every=4, directory=str(tmp_path),
        save_png=True,
    )
    assert rewards.shape == (10, 2, 1)

    pairs = rle.read_log(log_path)
    assert len(pairs) == 3  # chunks of 4, 4, 2
    for action_rle, universe_rle in pairs:
        act = rle.parse_rle_text(action_rle)
        uni = rle.parse_rle_text(universe_rle)
        assert act.grid.shape == (16, 16)
        assert uni.grid.shape == (64, 64)
    final = rle.parse_rle_text(pairs[-1][1]).grid
    np.testing.assert_array_equal(final,
                                  np.asarray(carry.stack.env.grid[0]))
    # PNG frames were dumped at each snapshot
    import os
    assert sum(f.endswith(".png") for f in os.listdir(tmp_path)) == 3


def test_checkpoint_versioning_and_migration(tmp_path):
    """Checkpoints are stamped with a format version; old (unstamped) files
    load as v0, added state fields can fall back to template values, and
    future wire formats are rejected with a clear error."""
    import pytest

    from carle_tpu.checkpoint import (
        FORMAT_VERSION,
        checkpoint_meta,
        load_pytree,
        save_pytree,
    )

    tree = {"a": np.arange(4, dtype=np.float32), "b": np.float32(2.0)}
    p = str(tmp_path / "ck.npz")
    save_pytree(p, tree)
    assert checkpoint_meta(p)["format_version"] == FORMAT_VERSION
    back = load_pytree(p, tree)
    np.testing.assert_array_equal(np.asarray(back["a"]), tree["a"])

    # newer code adds a state field: strict load fails loudly, migration
    # keeps the template value
    grown = dict(tree, c=np.ones(2, dtype=np.int32))
    with pytest.raises(KeyError, match="missing leaf"):
        load_pytree(p, grown)
    migrated = load_pytree(p, grown, missing="template")
    np.testing.assert_array_equal(np.asarray(migrated["c"]), grown["c"])

    # round-1 file without the meta entry reads as v0 and still loads
    np.savez(str(tmp_path / "old.npz"),
             **{"a": tree["a"], "b": np.asarray(tree["b"])})
    assert checkpoint_meta(str(tmp_path / "old.npz"))["format_version"] == 0
    load_pytree(str(tmp_path / "old.npz"), tree)

    # future wire format is rejected
    import json as _json
    np.savez(
        str(tmp_path / "future.npz"),
        **{"a": tree["a"], "b": np.asarray(tree["b"]),
           "__checkpoint_meta__": np.frombuffer(
               _json.dumps({"format_version": FORMAT_VERSION + 1}).encode(),
               dtype=np.uint8)},
    )
    with pytest.raises(ValueError, match="newer than supported"):
        load_pytree(str(tmp_path / "future.npz"), tree)


def test_run_logged_with_per_instance_rules(tmp_path):
    """run_logged must log the logged instance's own rule when the env
    carries a per-instance rule vector."""
    from carle_tpu import rle

    cfg = EnvConfig(height=64, width=64, action_height=16, action_width=16,
                    instances=2)
    ro = Rollout(cfg, wrappers=[], agent=make_random_agent(16, 16))
    carry = ro.init(jax.random.PRNGKey(0), rules.LIFE)
    bits = jnp.asarray([rules.pack_rule_bits([3], [2, 3]),
                        rules.pack_rule_bits([3, 6, 8], [2, 4, 5])],
                       dtype=jnp.int32)
    env = carry.stack.env._replace(rule_bits=bits)
    carry = carry._replace(stack=carry.stack._replace(env=env))
    carry, _ = ro.reset(carry)
    carry, rewards, path = ro.run_logged(
        carry, num_steps=4, snapshot_every=4, instance=1,
        directory=str(tmp_path),
    )
    pat = rle.parse_rle_text(rle.read_log(path)[-1][1])
    assert pat.birth == [3, 6, 8] and pat.survive == [2, 4, 5]


@pytest.mark.parametrize("stack_seed", [1, 2, 3])
def test_random_wrapper_stack_fuzz(stack_seed):
    """Random subsets and ORDERS of all ten wrapper classes composed into
    one fused rollout: any eval-spec stack must build, run, and produce
    finite rewards (composition order is user-controlled in the reference
    harness and never restricted)."""
    from carle_tpu.evaluation.eval import _fused_wrapper_factory
    from carle_tpu.agents import make_random_agent

    config = EnvConfig(height=64, width=64, action_height=16,
                       action_width=16, instances=2)
    factory = _fused_wrapper_factory(config)
    rng = np.random.RandomState(stack_seed)
    classes = list(factory.keys())
    k = int(rng.randint(2, len(classes) + 1))
    picked = [classes[i] for i in rng.permutation(len(classes))[:k]]
    defs = [factory[cls](0.1) for cls in picked]

    ro = Rollout(config, defs,
                 make_random_agent(config.eff_action_width,
                                   config.eff_action_height))
    carry = ro.init(jax.random.PRNGKey(stack_seed), rules.LIFE)
    carry, _ = ro.reset(carry)
    carry, rewards = ro.run(carry, num_steps=6)
    r = np.asarray(rewards)
    assert r.shape == (6, 2, 1)
    assert np.all(np.isfinite(r)), [c.__name__ for c in picked]
