"""``carle.env`` facade: the CARLE shell with torch-tensor returns.

The underlying shell (carle_tpu/env.py) already accepts torch tensors as
actions; this subclass converts the OUTPUT side — ``reset``/``step`` return
torch tensors exactly like the reference env (reference env.py:134-242), so
code written against the reference (``reward.detach().cpu().numpy()`` and
friends) runs unchanged.
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np

from .. import env as _base


def to_torch(x: Any) -> Any:
    """jax/numpy -> torch (CPU); torch tensors pass through."""
    import torch

    if isinstance(x, torch.Tensor):
        return x
    import jax

    # copy: device_get can hand back read-only buffers, which
    # torch.from_numpy refuses to wrap
    return torch.from_numpy(np.array(jax.device_get(x)))


class TorchReturns:
    """Mixin converting the gym-API return side to torch tensors."""

    def reset(self) -> Any:
        return to_torch(super().reset())

    def step(self, action: Any) -> Tuple[Any, Any, Any, Any]:
        obs, reward, done, info = super().step(action)
        return to_torch(obs), to_torch(reward), to_torch(done), info


class CARLE(TorchReturns, _base.CARLE):
    """Reference-API CARLE with torch returns (see module docstring)."""
