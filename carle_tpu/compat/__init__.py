"""Drop-in facade for the reference ``carle`` package.

A user of riveSunder/carle can point their existing code — including the
reference repo's own unittest suite — at this framework without touching a
line of it: the facade classes return **torch tensors** from ``reset``/
``step``/``forward`` (the reference's wire types) while every computation
runs on the TPU-native JAX engines underneath.

Usage::

    import carle_tpu.compat as compat
    compat.install()                 # registers the "carle" module aliases

    from carle.env import CARLE      # now served by carle_tpu
    from carle.mcl import PredictionBonus, get_glider

``install()`` takes precedence over any real ``carle`` package on sys.path
(the alias is a sys.modules entry); ``uninstall()`` removes the aliases so
the genuine reference can be imported again (used by the parity tests).

Proof of fidelity: tests/test_compat.py runs the REFERENCE repo's own
``tests/test_env.py`` + ``tests/test_mcl.py`` against this facade in a
fresh process — they pass unmodified (reference tests/test_env.py:8-67,
tests/test_mcl.py:10-101).
"""

from __future__ import annotations

import sys

from . import agents, env, mcl, train_mcl  # noqa: F401  (carle.* submodules)


def _aliases() -> dict:
    return {
        "carle": sys.modules[__name__],
        "carle.env": env,
        "carle.mcl": mcl,
        "carle.agents": agents,
        "carle.train_mcl": train_mcl,
    }


# genuine modules displaced by install(), restored by uninstall() — a
# process that imported the real reference first (e.g. the parity tests)
# must get ITS module objects back, not re-executed copies with new class
# identities
_DISPLACED: dict = {}


def install() -> "object":
    """Register this package as the ``carle`` module (and submodules),
    stashing any genuine ``carle*`` modules already imported so
    :func:`uninstall` can restore them."""
    for name, mod in _aliases().items():
        existing = sys.modules.get(name)
        if existing is not None and existing is not mod \
                and name not in _DISPLACED:
            _DISPLACED[name] = existing
        sys.modules[name] = mod
    return sys.modules[__name__]


def uninstall() -> None:
    """Undo :func:`install`: restore any displaced genuine modules, else
    drop the alias (only entries still pointing at this facade are
    touched)."""
    for name, mod in _aliases().items():
        if sys.modules.get(name) is mod:
            displaced = _DISPLACED.pop(name, None)
            if displaced is not None:
                sys.modules[name] = displaced
            else:
                sys.modules.pop(name, None)
        else:
            _DISPLACED.pop(name, None)
