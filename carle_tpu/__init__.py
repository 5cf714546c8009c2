"""carle_tpu — a TPU-native Cellular Automata Reinforcement Learning Environment.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
riveSunder/carle: vectorized Life-like CA environments with a Gym-like API,
endogenous-reward wrapper stacks with online learning, baseline agents,
training/evaluation harnesses, RLE pattern I/O, and multi-chip scaling via
``jax.sharding``.
"""

from .config import EnvConfig
from .env import CARLE, EnvState, env_step, init_state, multi_step, reset_state
from . import rules
from . import rle
from . import agents
from . import checkpoint
from . import mcl
from . import packed
from . import parallel
from . import policy
from .rollout import Rollout, RolloutCarry

__version__ = "0.1.0"

__all__ = [
    "CARLE",
    "EnvConfig",
    "EnvState",
    "Rollout",
    "RolloutCarry",
    "agents",
    "checkpoint",
    "env_step",
    "init_state",
    "mcl",
    "multi_step",
    "packed",
    "parallel",
    "policy",
    "reset_state",
    "rle",
    "rules",
]
