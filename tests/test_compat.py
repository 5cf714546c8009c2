"""The REFERENCE repo's own unittest suite must pass against the facade.

carle_tpu.compat registers this framework under the ``carle`` module name
with torch-tensor returns; the strongest drop-in proof is running the
reference's unmodified test files (reference tests/test_env.py:8-67,
tests/test_mcl.py:10-101) against it.  A fresh subprocess keeps the
sys.modules aliases away from this process's parity tests (which import
the GENUINE reference package).
"""

import os
import subprocess
import sys

REFERENCE_TESTS = "/root/reference/tests"

_RUNNER = r"""
import jax
jax.config.update("jax_platforms", "cpu")

import carle_tpu.compat as compat
compat.install()

import importlib.util
import sys
import unittest

suite = unittest.TestSuite()
loader = unittest.TestLoader()
for name in ("test_env", "test_mcl"):
    path = "%s/" + name + ".py"
    spec = importlib.util.spec_from_file_location("ref_" + name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    suite.addTests(loader.loadTestsFromModule(mod))

result = unittest.TextTestRunner(verbosity=2).run(suite)
assert result.testsRun == 4, result.testsRun
sys.exit(0 if result.wasSuccessful() else 1)
""" % (REFERENCE_TESTS,)


def test_reference_suite_passes_against_facade(tmp_path):
    if not os.path.isdir(REFERENCE_TESTS):
        import pytest

        pytest.skip("reference checkout not present")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER],
        cwd=repo, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    # all four reference cases, none skipped
    assert "Ran 4 tests" in proc.stderr, proc.stderr


def test_install_uninstall_roundtrip():
    """install() aliases carle -> carle_tpu.compat; uninstall() restores the
    ability to import the genuine reference package."""
    import carle_tpu.compat as compat

    compat.install()
    try:
        import carle

        assert carle is compat
        from carle.env import CARLE as FacadeCARLE

        from carle_tpu.compat.env import CARLE as DirectCARLE

        assert FacadeCARLE is DirectCARLE
    finally:
        compat.uninstall()
    assert "carle" not in sys.modules or sys.modules["carle"] is not compat


def test_train_facade_accepts_reference_agent_class(tmp_path):
    """``carle.train_mcl.train(RandomAgent, ...)`` — the reference driver
    contract (reference train_mcl.py:15-45) — runs on the native trainer."""
    import numpy as np

    import carle_tpu.compat as compat

    compat.install()
    try:
        from carle.train_mcl import train
        from carle.agents import RandomAgent

        hist = train(RandomAgent, instances=2, steps=[1, 4],
                     rules=[[[3], [2, 3]]], height=64, width=64,
                     batch_size=4, log_dir=str(tmp_path), mesh=False)
        assert np.asarray(hist).shape == (4,)
        assert np.all(np.isfinite(np.asarray(hist)))
    finally:
        compat.uninstall()


def test_train_facade_network_agent_non_default_size(tmp_path):
    """The class-agent path must pass ALL four dims (the reference contract
    train_mcl.py:41-45): a RandomNetworkAgent sizes its dense layer from the
    observation dims, so a 64x64 universe crashes if they are defaulted."""
    import numpy as np

    from carle_tpu.agents import RandomNetworkAgent
    from carle_tpu.train_mcl import train

    hist = train(RandomNetworkAgent, instances=2, steps=[1, 4],
                 rules=[[[3], [2, 3]]], height=64, width=64,
                 batch_size=4, log_dir=str(tmp_path), mesh=False)
    assert np.asarray(hist).shape == (4,)
    assert np.all(np.isfinite(np.asarray(hist)))


def test_train_uses_provided_agent_params(tmp_path):
    """train() must drive the agent spec's OWN params (resolver + explicit
    ``agent_params`` into the rollout carry), not re-drawn ones: a
    params-dependent policy run with two different param payloads must
    produce different reward histories.  (A seeded RandomNetworkAgent can't
    discriminate here: bias-free nets act identically — not at all — on the
    empty post-reset universe, in the reference too.)"""
    import jax.numpy as jnp
    import numpy as np

    from carle_tpu.agents import Agent
    from carle_tpu.train_mcl import train

    def apply(params, key, obs):
        del key
        return jnp.broadcast_to(
            params["patch"][None, None], (obs.shape[0], 1, 64, 64)
        ).astype(jnp.float32)

    agent = Agent(
        init=lambda k: {"patch": jnp.zeros((64, 64), jnp.float32)},
        apply=apply,
    )
    glider = jnp.zeros((64, 64), jnp.float32)
    glider = glider.at[30, 31].set(1).at[31, 32].set(1).at[32, 30:33].set(1)

    def run(tag, patch):
        return np.asarray(train(
            (agent, {"patch": patch}), instances=2, steps=[1, 4],
            rules=[[[3], [2, 3]]], height=64, width=64,
            batch_size=4, log_dir=str(tmp_path / tag), mesh=False, seed=0,
        ))

    h0 = run("empty", jnp.zeros((64, 64), jnp.float32))
    h1 = run("glider", glider)
    assert not np.allclose(h0, h1)


_EVAL_RUNNER = r"""
import jax
jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, {repo_root!r})       # carle_tpu
sys.path.insert(0, "/root/reference")   # the reference's evaluation package

import carle_tpu.compat as compat
compat.install()                         # "carle" now serves carle_tpu

import importlib.util
spec = importlib.util.spec_from_file_location(
    "ref_eval", "/root/reference/evaluation/eval.py")
ref_eval = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ref_eval)        # imports carle.* via the facade

from carle.mcl import RND2D, SpeedDetector, PufferDetector

# the shipped .pt was saved on CUDA; the reference script's bare
# torch.load cannot read it on a CPU-only box (it fails identically
# against the genuine reference package) — re-save a CPU copy so the
# UNMODIFIED evaluate() can load it
import torch
sd = torch.load("/root/reference/evaluation/RND2D_mcl.pt",
                weights_only=True, map_location="cpu")
torch.save(sd, "RND2D_cpu.pt")

wrappers = [
    [RND2D, 1.0, "RND2D_cpu.pt"],
    [SpeedDetector, 1e-2, None],
    [PufferDetector, 1e-3, None],
]
rules = [[[3], [2, 3]], [[2], [0]]]
score, trace = ref_eval.evaluate(
    ref_eval.SubmissionAgent, rules, wrappers, params_path=None, steps=4)
assert len(trace) == 8, len(trace)
import numpy as np
assert np.isfinite(float(score)), score
print("REF_EVAL_SCORE", float(score))
"""


def test_reference_eval_harness_runs_on_facade(tmp_path):
    """The reference's OWN evaluation/eval.py::evaluate — its challenge
    scoring script, torch checkpoint loading and all (reference
    eval.py:17-79) — runs against the facade: wrapper stacking,
    reward_scale/batch_size assignment on every wrapper, .pt state dicts,
    eval() mode, torch-tensor rewards."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _EVAL_RUNNER.format(repo_root=repo_root)],
        cwd=str(tmp_path),  # neither repo's root: imports must self-resolve
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "REF_EVAL_SCORE" in proc.stdout


def test_install_restores_displaced_genuine_modules():
    """If the genuine reference was imported first, uninstall() must restore
    the SAME module objects (class identities survive the roundtrip)."""
    import types

    if "skimage" not in sys.modules:  # reference frame export needs it
        _sk = types.ModuleType("skimage")
        _sk_io = types.ModuleType("skimage.io")
        _sk_io.imsave = lambda *a, **k: None
        _sk.io = _sk_io
        sys.modules["skimage"] = _sk
        sys.modules["skimage.io"] = _sk_io
    sys.path.insert(0, "/root/reference")
    try:
        import carle as genuine_carle
        import carle.env as genuine_env

        assert "carle_tpu" not in getattr(genuine_carle, "__file__", "")

        import carle_tpu.compat as compat

        compat.install()
        import carle

        assert carle is compat
        compat.uninstall()
        import carle

        assert carle is genuine_carle
        assert sys.modules["carle.env"] is genuine_env
    finally:
        sys.path.remove("/root/reference")
