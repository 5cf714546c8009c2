"""Challenge submission API (reference evaluation/submission.py:14-51).

Participants subclass :class:`DemoAgent` and override ``forward(obs) ->
action``; the eval harness instantiates the class and optionally loads
parameters.  ``DemoAgent`` itself is the random baseline (Bernoulli(0.1)
toggles), exactly as in the reference.
"""

from __future__ import annotations

from typing import Any

from carle_tpu.agents import RandomAgent


class DemoAgent(RandomAgent):
    """Random-toggle baseline with the submission surface."""

    def load_state_dict(self, state_dict: Any) -> None:
        """Hook for parameterized submissions; the baseline has no params."""


class SubmissionAgent(DemoAgent):
    """Submission agent: must produce binary toggle actions when called
    (reference submission.py:43-51)."""

    def __init__(self, **kwargs: Any) -> None:
        super().__init__(**kwargs)
