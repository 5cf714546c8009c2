"""Reverse checkpoint interop: carle_tpu-trained wrappers -> reference .pt.

Closes the conversion loop (forward direction: mcl/rnd.py
predictor_params_from_torch etc.).  Verified three ways: key-set equality
with the SHIPPED reference artifacts, strict=True loading into the LIVE
torch reference classes, and forward parity of the reloaded nets.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from carle_tpu import CARLE
from carle_tpu.config import EnvConfig
from carle_tpu.mcl import AE2D, RND2D, to_state_dict
from carle_tpu.mcl.ae import ae_params_from_torch
from carle_tpu.mcl.export import learner_state_to_state_dict
from carle_tpu.mcl.rnd import (
    predictor_forward,
    predictor_params_from_torch,
    random_forward,
    random_network_params_from_torch,
)


def _tree_allclose(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=0)


def test_rnd2d_state_dict_keys_match_shipped_artifact():
    import torch

    ref_sd = torch.load("/root/reference/evaluation/RND2D_mcl.pt",
                        map_location="cpu")
    env = RND2D(CARLE(instances=1, height=256, width=256))
    sd = to_state_dict(env)
    assert list(sd.keys()) == list(ref_sd.keys())
    for k in sd:
        assert tuple(sd[k].shape) == tuple(ref_sd[k].shape), k


def test_ae2d_nested_state_dict_keys_match_shipped_artifact():
    import torch

    ref_sd = torch.load("/root/reference/evaluation/AE2D_mcl.pt",
                        map_location="cpu")
    env = AE2D(RND2D(CARLE(instances=1, height=256, width=256)))
    sd = to_state_dict(env)
    assert list(sd.keys()) == list(ref_sd.keys())
    for k in sd:
        assert tuple(sd[k].shape) == tuple(ref_sd[k].shape), k


def test_rnd2d_roundtrip_through_torch_keys():
    env = RND2D(CARLE(instances=1, height=128, width=128))
    sd = to_state_dict(env, torch_tensors=False)
    back_pred = predictor_params_from_torch(sd)
    back_rand = random_network_params_from_torch(sd)
    _tree_allclose(back_pred, env._wstate.params)
    _tree_allclose(back_rand, env._wstate.target_params)


def test_ae2d_roundtrip_through_torch_keys():
    env = AE2D(CARLE(instances=1, height=128, width=128))
    sd = to_state_dict(env, torch_tensors=False)
    _tree_allclose(ae_params_from_torch(sd), env._wstate.params)


def test_strict_load_and_forward_parity_vs_live_reference():
    """The exported checkpoint loads strict=True into the reference RND2D and
    the reloaded torch nets reproduce our forwards."""
    import torch

    from carle.env import CARLE as RefCARLE  # reference
    from carle.mcl import RND2D as RefRND2D  # reference

    env = RND2D(CARLE(instances=1, height=256, width=256))
    sd = to_state_dict(env)

    with torch.no_grad():
        ref = RefRND2D(RefCARLE(instances=1, device="cpu"), device="cpu")
    missing, unexpected = ref.load_state_dict(sd, strict=True)
    assert not missing and not unexpected
    ref.eval()  # dropout off — compare the deterministic paths

    obs = np.random.RandomState(0).rand(2, 1, 256, 256).astype(np.float32)
    with torch.no_grad():
        ref_pred = ref.predictor(torch.from_numpy(obs)).numpy()
        ref_rand = ref.random_network(torch.from_numpy(obs)).numpy()
    ours_pred = predictor_forward(env._wstate.params, jnp.asarray(obs),
                                  None, train=False)
    ours_rand = random_forward(env._wstate.target_params, jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(ours_pred), ref_pred,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_rand), ref_rand,
                               rtol=1e-4, atol=1e-5)


def test_shell_state_dict_method_matches_reference_style():
    """``torch.save(env.state_dict(), path)`` (train_mcl.py:80-84) works on
    the shells and round-trips through torch serialization."""
    import io

    import torch

    env = RND2D(CARLE(instances=1, height=128, width=128))
    buf = io.BytesIO()
    torch.save(env.state_dict(), buf)
    buf.seek(0)
    sd = torch.load(buf, map_location="cpu")
    _tree_allclose(predictor_params_from_torch(sd), env._wstate.params)


def test_learner_state_export_from_fused_path():
    """Bare fused-path params (no shell) export as a one-wrapper checkpoint."""
    from carle_tpu.mcl.rnd import rnd2d_def

    config = EnvConfig(instances=1, height=128, width=128)
    wdef = rnd2d_def(config)
    ws = wdef.init(jax.random.PRNGKey(3))
    sd = learner_state_to_state_dict("RND2D", ws.params, ws.target_params,
                                     torch_tensors=False)
    assert "inner_env.neighborhood.weight" in sd
    _tree_allclose(predictor_params_from_torch(sd), ws.params)
    with pytest.raises(ValueError):
        learner_state_to_state_dict("SpeedDetector", ws.params)
