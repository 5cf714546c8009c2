"""Export trained carle_tpu wrapper params as reference torch checkpoints.

The forward direction (reference ``.pt`` -> our pytrees) lives in
``mcl/rnd.py`` / ``mcl/ae.py``; this module closes the loop: wrappers
trained here can be saved as ``state_dict``s the PyTorch reference loads
with ``strict=True``, so a user can take carle_tpu-trained checkpoints back
to riveSunder/carle (or submit them to tooling built against it).

Key layout replicated from the shipped artifacts
(/root/reference/evaluation/RND2D_mcl.pt, AE2D_mcl.pt — see SURVEY.md §5):
every Motivator level registers BOTH ``inner_env`` (the raw CARLE) and
``env`` (the wrapped env) as submodules, so a bare RND2D stack carries two
copies of the constant Moore kernel and an AE2D-over-RND2D stack nests the
whole inner RND2D under ``env.*``.  Sequential indices per net:

  RND2D predictor       conv1->0  conv2->5   dense->11   (mcl.py:257-279)
  RND2D random_network  conv1->0  conv2->4   dense->8    (mcl.py:281-298)
  AE2D  predictor       conv1->0  conv2->4  deconv1->8  deconv2->11
                                                         (mcl.py:445-481)

PredictionBonus/SurpriseBonus subclass AE2D upstream (mcl.py:558-728) and
share its predictor layout.  Param tensors already use torch layouts
(``nets.py`` keeps [out,in,kh,kw] convs / [in,out,kh,kw] transposed convs /
[out,in] linears), so export is key renaming plus dtype normalisation.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, Optional

import numpy as np

# Constant Moore kernel the reference registers as a conv weight
# (env.py:95-96); checkpoints capture it even though it never trains.
MOORE_KERNEL = np.array(
    [[[[1.0, 1.0, 1.0], [1.0, 0.0, 1.0], [1.0, 1.0, 1.0]]]], dtype=np.float32
)

_RND_PREDICTOR_IDX = (("conv1", 0), ("conv2", 5), ("dense", 11))
_RND_RANDOM_IDX = (("conv1", 0), ("conv2", 4), ("dense", 8))
_AE_PREDICTOR_IDX = (("conv1", 0), ("conv2", 4), ("deconv1", 8), ("deconv2", 11))


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _sequential_entries(prefix: str, params: Dict[str, Any], index_map) -> "OrderedDict[str, np.ndarray]":
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for ours, idx in index_map:
        out[f"{prefix}.{idx}.weight"] = _np(params[ours]["w"])
        out[f"{prefix}.{idx}.bias"] = _np(params[ours]["b"])
    return out


def rnd2d_entries(params: Dict[str, Any], target_params: Dict[str, Any]) -> "OrderedDict[str, np.ndarray]":
    """``predictor.*`` + ``random_network.*`` entries for an RND2D level."""
    out = _sequential_entries("predictor", params, _RND_PREDICTOR_IDX)
    out.update(_sequential_entries("random_network", target_params, _RND_RANDOM_IDX))
    return out


def ae2d_entries(params: Dict[str, Any]) -> "OrderedDict[str, np.ndarray]":
    """``predictor.*`` entries for an AE2D/Prediction/Surprise level."""
    return _sequential_entries("predictor", params, _AE_PREDICTOR_IDX)


_OWN_ENTRY_BUILDERS = {
    "RND2D": lambda ws: rnd2d_entries(ws.params, ws.target_params),
    "AE2D": lambda ws: ae2d_entries(ws.params),
    "PredictionBonus": lambda ws: ae2d_entries(ws.params),
    "SurpriseBonus": lambda ws: ae2d_entries(ws.params),
}


def _module_entries(obj: Any) -> "OrderedDict[str, np.ndarray]":
    """Recursively build the reference-shaped state_dict for a shell stack."""
    if getattr(obj, "inner_env", None) is None:  # raw CARLE level
        return OrderedDict([("neighborhood.weight", MOORE_KERNEL.copy())])
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for k, v in _module_entries(obj.inner_env).items():
        out[f"inner_env.{k}"] = v
    for k, v in _module_entries(obj.env).items():
        out[f"env.{k}"] = v
    builder = _OWN_ENTRY_BUILDERS.get(getattr(obj, "my_name", None))
    if builder is not None and getattr(obj, "_wstate", None) is not None:
        out.update(builder(obj._wstate))
    return out


def to_state_dict(wrapper: Any, torch_tensors: bool = True) -> "OrderedDict[str, Any]":
    """Reference-compatible ``state_dict`` of a shell wrapper (stack).

    ``wrapper`` is any Motivator shell (``RND2D``, ``AE2D``, ... wrapping a
    ``CARLE``); nesting follows the reference module registration so the
    result loads into the corresponding reference class with
    ``load_state_dict(..., strict=True)``.  With ``torch_tensors=True``
    (default) values are ``torch.Tensor``s ready for ``torch.save``;
    otherwise float32 numpy arrays.
    """
    sd = _module_entries(wrapper)
    if torch_tensors:
        import torch

        sd = OrderedDict((k, torch.from_numpy(v.copy())) for k, v in sd.items())
    return sd


def save_torch_checkpoint(path: str, wrapper: Any) -> None:
    """``torch.save`` a reference-loadable checkpoint of a shell stack —
    the carle_tpu spelling of train_mcl.py:80-84's checkpointing."""
    import torch

    torch.save(to_state_dict(wrapper), path)


def learner_state_to_state_dict(
    kind: str,
    params: Dict[str, Any],
    target_params: Optional[Dict[str, Any]] = None,
    torch_tensors: bool = True,
) -> "OrderedDict[str, Any]":
    """Export bare fused-path params (a ``LearnerState``'s ``params`` /
    ``target_params``) without a shell, as a single-wrapper-over-CARLE
    checkpoint.  ``kind`` is "RND2D", "AE2D", "PredictionBonus" or
    "SurpriseBonus"."""
    sd: "OrderedDict[str, np.ndarray]" = OrderedDict()
    sd["inner_env.neighborhood.weight"] = MOORE_KERNEL.copy()
    sd["env.neighborhood.weight"] = MOORE_KERNEL.copy()
    if kind == "RND2D":
        if target_params is None:
            raise ValueError("RND2D export needs target_params (random_network)")
        sd.update(rnd2d_entries(params, target_params))
    elif kind in ("AE2D", "PredictionBonus", "SurpriseBonus"):
        sd.update(ae2d_entries(params))
    else:
        raise ValueError(f"no torch checkpoint layout for wrapper kind {kind!r}")
    if torch_tensors:
        import torch

        sd = OrderedDict((k, torch.from_numpy(v.copy())) for k, v in sd.items())
    return sd
