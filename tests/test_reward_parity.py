"""RND/AE reward-curve parity vs the PyTorch reference (BASELINE.md row 4).

Same initial weights (converted from the torch modules), same action stream,
dropout disabled on both sides (torch ``.eval()`` / our ``dropout=False``),
online Adam updates firing every ``batch_size`` steps on both sides — the
per-step bonus sequences must track within float tolerance THROUGH the
parameter updates, which exercises the whole chain: forward parity, loss
parity, gradient parity, and the accumulate+Adam correspondence
(mcl/_online.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import sys  # noqa: E402

sys.path.insert(0, "/root/reference")

from carle.env import CARLE as RefCARLE  # noqa: E402
from carle.mcl import AE2D as RefAE, RND2D as RefRND  # noqa: E402

from carle_tpu import CARLE  # noqa: E402
from carle_tpu.mcl import AE2D, RND2D  # noqa: E402


SMALL = dict(height=64, width=64, action_height=16, action_width=16)


def _action_stream(n=20, seed=0):
    rng = np.random.RandomState(seed)
    acts = []
    for t in range(n):
        if t % 4 == 3:
            acts.append(np.zeros((1, 1, 16, 16), dtype=np.float32))
        else:
            acts.append((rng.rand(1, 1, 16, 16) < 0.15).astype(np.float32))
    return acts


def _make_ref_wrapper(cls):
    with torch.no_grad():
        env = RefCARLE(**SMALL, device="cpu")
        if cls is RefAE:
            wrapped = RefAE(RefRND(env))
        else:
            wrapped = cls(env)
    # updates every 4 steps; dropout off, training still live (the reference
    # eval() pattern only disables dropout — updates are gated by batch_size)
    outer = wrapped
    outer.batch_size = 4
    if cls is RefAE:
        wrapped.env.batch_size = 10**9  # freeze the nested RND's updates
        wrapped.env.reward_scale = 0.0
    for m in ([outer] if cls is not RefAE else [outer, wrapped.env]):
        m.predictor.eval()
        if hasattr(m, "random_network"):
            m.random_network.eval()
    return outer


@pytest.mark.parametrize("which", ["rnd", "ae"])
def test_online_reward_curve_parity(which):
    if which == "rnd":
        ref = _make_ref_wrapper(RefRND)
        ours = RND2D(CARLE(**SMALL), batch_size=4, dropout=False)
        sd = ref.state_dict()
    else:
        ref = _make_ref_wrapper(RefAE)
        ours = AE2D(CARLE(**SMALL), batch_size=4, dropout=False)
        sd = {k: v for k, v in ref.state_dict().items()
              if k.startswith("predictor")}
    ours.load_state_dict(sd)

    ref.reset()
    ours.reset()

    ref_curve, our_curve = [], []
    for act in _action_stream():
        with torch.enable_grad():
            _, r_ref, _, _ = ref.step(torch.tensor(act))
        _, r_our, _, _ = ours.step(act)
        ref_curve.append(float(r_ref.detach().sum()))
        our_curve.append(float(np.asarray(r_our).sum()))

    ref_curve = np.asarray(ref_curve)
    our_curve = np.asarray(our_curve)
    # bonuses are O(1e-2..1); updates at steps 4, 8, 12, 16 must not diverge
    np.testing.assert_allclose(our_curve, ref_curve, rtol=2e-3, atol=2e-5)
    assert int(ours.updates) == len(ref_curve) // 4


def test_statistic_wrapper_reward_parity():
    """SpeedDetector + ParsimonyBonus rewards must match the torch reference
    step-for-step under an identical action stream (no learning involved —
    pure statistic/transform wrappers)."""
    from carle.mcl import (  # reference
        ParsimonyBonus as RefParsimony,
        SpeedDetector as RefSpeed,
    )

    from carle_tpu.mcl import ParsimonyBonus, SpeedDetector

    with torch.no_grad():
        ref_env = RefCARLE(**SMALL, device="cpu")
        ref = RefParsimony(RefSpeed(ref_env))
    ours = ParsimonyBonus(SpeedDetector(CARLE(**SMALL)))

    ref.reset()
    ours.reset()

    rng = np.random.RandomState(3)
    acts = []
    g = np.zeros((1, 1, 16, 16), dtype=np.float32)
    g[0, 0, 4, 5] = 1; g[0, 0, 5, 5:7] = 1; g[0, 0, 6, 4] = 1; g[0, 0, 6, 6] = 1
    acts.append(g)
    for t in range(14):
        if t % 3 == 0:
            acts.append((rng.rand(1, 1, 16, 16) < 0.1).astype(np.float32))
        else:
            acts.append(np.zeros((1, 1, 16, 16), dtype=np.float32))

    for act in acts:
        with torch.no_grad():
            _, r_ref, _, _ = ref.step(torch.tensor(act))
        _, r_our, _, _ = ours.step(act)
        np.testing.assert_allclose(
            float(np.asarray(r_our).sum()), float(r_ref.sum()),
            rtol=1e-5, atol=1e-6,
        )
