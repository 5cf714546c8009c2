"""``carle.mcl`` facade: torch-returning wrapper classes + pattern helpers.

Each class is the carle_tpu Motivator shell (full reference semantics,
reference mcl.py:29-853) with ``reset``/``step`` converted to torch tensors
at the facade boundary.  Wrappers compose exactly as in the reference
(``env = Wrapper(env)``); mixed stacks work because the base shell coerces
the inner env's reward back to a JAX array before the jitted bonus apply.

Pattern helpers return torch tensors (reference mcl.py:855-893).
"""

from __future__ import annotations

from typing import Any

from .. import mcl as _mcl
from ..mcl import patterns as _patterns
from .env import CARLE, TorchReturns, to_torch  # noqa: F401  (re-exported)


class Motivator(TorchReturns, _mcl.Motivator):
    pass


class RND2D(TorchReturns, _mcl.RND2D):
    pass


class AE2D(TorchReturns, _mcl.AE2D):
    pass


class PredictionBonus(TorchReturns, _mcl.PredictionBonus):
    pass


class SurpriseBonus(TorchReturns, _mcl.SurpriseBonus):
    pass


class MorphoBonus(TorchReturns, _mcl.MorphoBonus):
    pass


class CornerBonus(TorchReturns, _mcl.CornerBonus):
    pass


class SpeedDetector(TorchReturns, _mcl.SpeedDetector):
    pass


class PufferDetector(TorchReturns, _mcl.PufferDetector):
    pass


class ParsimonyBonus(TorchReturns, _mcl.ParsimonyBonus):
    pass


def get_glider() -> Any:
    return to_torch(_patterns.get_glider())


def get_morley_puffer() -> Any:
    return to_torch(_patterns.get_morley_puffer())


def get_symmetric_action(*args: Any, **kwargs: Any) -> Any:
    return to_torch(_patterns.get_symmetric_action(*args, **kwargs))
