"""``carle.train_mcl`` facade: the wrapper pre-training entry point.

The native trainer already replicates the reference loop contract
(reference train_mcl.py:15-89) with a positionally compatible signature
``train(agent_fn, instances, steps, rules, mcl)`` — reference-style agent
classes are accepted directly (their functional policy is resolved via
``._agent``), so this module just re-exports it.
"""

from __future__ import annotations

from ..train_mcl import DEFAULT_RULES, train  # noqa: F401
