"""``carle.agents`` facade: baseline agents with torch-tensor actions.

The reference agents are ``nn.Module``s driven as ``action = agent(obs)``
(reference agents.py:15-102, train_mcl.py:66); these facades expose the
same callable surface over the carle_tpu shells and convert the emitted
action to a torch tensor.
"""

from __future__ import annotations

from typing import Any

from .. import agents as _agents
from .env import to_torch


class _TorchForward:
    def forward(self, obs: Any) -> Any:
        return to_torch(super().forward(obs))

    def __call__(self, obs: Any) -> Any:
        return self.forward(obs)


class RandomAgent(_TorchForward, _agents.RandomAgent):
    pass


class RandomNetworkAgent(_TorchForward, _agents.RandomNetworkAgent):
    pass
