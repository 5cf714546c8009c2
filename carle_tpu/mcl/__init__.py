"""Endogenous-reward ("mcl") wrapper system — TPU-native re-design of
reference carle/mcl.py.

Two faces, like the env:

* **functional**: each wrapper is a :class:`~carle_tpu.mcl.base.WrapperDef`
  — pure ``init`` / ``apply`` / ``on_reset`` functions over an explicit state
  pytree.  Wrappers compose into a :class:`~carle_tpu.mcl.base.WrapperStack`
  whose whole step (env transition + every bonus + online learning) is one
  jittable function, scannable with ``lax.scan`` and shardable with
  ``jax.sharding`` (parallel/).
* **class shells** mirroring the reference API: ``env = RND2D(env)`` etc.,
  stepping one wrapper stack per call with the same
  ``(obs, reward, done, info)`` signature.
"""

from .base import Motivator, StepCtx, WrapperDef, WrapperStack, default_on_reset
from .parsimony import ParsimonyBonus, parsimony_def
from .corner import CornerBonus, corner_def
from .morpho import MorphoBonus, morpho_def
from .speed import SpeedDetector, speed_def
from .puffer import PufferDetector, puffer_def
from .packed_stats import (corner_def_packed, morpho_def_packed,
                           parsimony_def_packed, puffer_def_packed,
                           speed_def_packed)
from .rnd import RND2D, rnd2d_def
from .ae import AE2D, ae2d_def
from .prediction import (
    PredictionBonus,
    SurpriseBonus,
    prediction_def,
    surprise_def,
)
from .patterns import get_glider, get_morley_puffer, get_symmetric_action
from .export import (
    learner_state_to_state_dict,
    save_torch_checkpoint,
    to_state_dict,
)

__all__ = [
    "Motivator",
    "StepCtx",
    "WrapperDef",
    "WrapperStack",
    "default_on_reset",
    "ParsimonyBonus",
    "parsimony_def",
    "CornerBonus",
    "corner_def",
    "MorphoBonus",
    "morpho_def",
    "SpeedDetector",
    "speed_def",
    "PufferDetector",
    "puffer_def",
    "speed_def_packed",
    "puffer_def_packed",
    "corner_def_packed",
    "morpho_def_packed",
    "parsimony_def_packed",
    "RND2D",
    "rnd2d_def",
    "AE2D",
    "ae2d_def",
    "PredictionBonus",
    "prediction_def",
    "SurpriseBonus",
    "surprise_def",
    "get_glider",
    "get_morley_puffer",
    "get_symmetric_action",
    "to_state_dict",
    "save_torch_checkpoint",
    "learner_state_to_state_dict",
]
