"""Baseline agents (reference carle/agents.py:15-102).

Each agent is a functional pair ``init(key) -> params`` / ``apply(params, key,
obs) -> action`` so policies drop into the fused ``lax.scan`` rollout
(rollout.py), plus a callable class shell mirroring the reference's
``nn.Module.forward(obs)`` surface for drop-in use.

Action layout: functional agents emit float 0/1 arrays shaped
[instances, 1, action_height, action_width] — rows first, matching the env's
(AH, AW) patch convention, so non-square action windows (a beyond-reference
capability) flow through the fused rollout without a silent transpose.  The
reference names its trailing dims (width, height) (agents.py:36-41, 98-101)
but only ever runs square windows, where the layouts coincide; parity tests
are unaffected.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nets


class Agent(NamedTuple):
    """A pure policy: ``init`` builds the (possibly empty) param pytree,
    ``apply(params, key, obs)`` maps a float observation [inst, 1, H, W] to a
    float 0/1 action [inst, 1, AH, AW] (rows first)."""

    init: Callable[[jax.Array], Any]
    apply: Callable[[Any, jax.Array, jax.Array], jax.Array]


def _resolve_dims(kwargs: Dict[str, Any]) -> Dict[str, int]:
    # The reference's observation_width lookup is dead due to a typo
    # ("observatoin_width", agents.py:27) — honored here as the *working*
    # spelling; both spellings are accepted.
    return dict(
        action_width=kwargs.get("action_width", 64),
        action_height=kwargs.get("action_height", 64),
        observation_width=kwargs.get(
            "observation_width", kwargs.get("observatoin_width", 256)
        ),
        observation_height=kwargs.get("observation_height", 256),
    )


# ---------------------------------------------------------------------------
# RandomAgent — Bernoulli(toggle_rate) toggles (agents.py:15-42)
# ---------------------------------------------------------------------------


def make_random_agent(
    action_width: int = 64, action_height: int = 64, toggle_rate: float = 0.1
) -> Agent:
    def init(key: jax.Array) -> Dict[str, Any]:
        return {}

    def apply(params: Any, key: jax.Array, obs: jax.Array) -> jax.Array:
        instances = obs.shape[0]
        u = jax.random.uniform(
            key, (instances, 1, action_height, action_width), dtype=jnp.float32
        )
        return (u <= toggle_rate).astype(jnp.float32)

    return Agent(init=init, apply=apply)


class RandomAgent:
    """Reference-compatible shell: ``agent(obs) -> action`` with internal RNG."""

    def __init__(self, **kwargs: Any) -> None:
        dims = _resolve_dims(kwargs)
        self.action_width = dims["action_width"]
        self.action_height = dims["action_height"]
        self.observation_width = dims["observation_width"]
        self.observation_height = dims["observation_height"]
        self.toggle_rate = kwargs.get("toggle_rate", 0.100)
        self._agent = make_random_agent(
            self.action_width, self.action_height, self.toggle_rate
        )
        self._key = jax.random.PRNGKey(kwargs.get("seed", 0))
        self.params = self._agent.init(self._key)
        self._apply = jax.jit(self._agent.apply)

    def forward(self, obs: Any) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return self._apply(self.params, sub, _as_obs(obs))

    __call__ = forward

    # torch-compat no-ops
    def eval(self) -> "RandomAgent":
        return self

    def to(self, *a: Any, **k: Any) -> "RandomAgent":
        return self

    def load_state_dict(self, state_dict: Any) -> None:
        pass


# ---------------------------------------------------------------------------
# RandomNetworkAgent — frozen random CNN policy (agents.py:45-102)
# ---------------------------------------------------------------------------


def _rna_forward(
    params: Dict[str, Any], obs: jax.Array, toggle_rate: float,
    action_width: int, action_height: int,
) -> jax.Array:
    """conv(1->F) relu pool2 conv(F->1) relu pool2 flatten linear sigmoid,
    all bias-free (agents.py:74-83); action = (output <= toggle_rate)."""
    x = nets.conv2d(obs, params["conv1"], padding=1)
    x = nets.max_pool2(jax.nn.relu(x))
    x = nets.conv2d(x, params["conv2"], padding=1)
    x = nets.max_pool2(jax.nn.relu(x))
    x = jax.nn.sigmoid(nets.linear(nets.flatten(x), params["dense"]))
    action = (x <= toggle_rate).astype(jnp.float32)
    return action.reshape(obs.shape[0], 1, action_height, action_width)


def make_random_network_agent(
    action_width: int = 64,
    action_height: int = 64,
    observation_width: int = 256,
    observation_height: int = 256,
    toggle_rate: float = 0.1,
    filter_dim: int = 4,
) -> Agent:
    dense_nodes = (observation_width // 4) * (observation_height // 4)
    output_nodes = action_width * action_height

    def init(key: jax.Array) -> Dict[str, Any]:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "conv1": nets.conv_init(k1, filter_dim, 1, 3, bias=False),
            "conv2": nets.conv_init(k2, 1, filter_dim, 3, bias=False),
            "dense": nets.linear_init(k3, output_nodes, dense_nodes, bias=False),
        }

    def apply(params: Dict[str, Any], key: jax.Array, obs: jax.Array) -> jax.Array:
        del key  # deterministic policy — frozen network
        return _rna_forward(params, obs, toggle_rate, action_width, action_height)

    return Agent(init=init, apply=apply)


class RandomNetworkAgent:
    """Reference-compatible shell over the frozen random CNN policy."""

    def __init__(self, **kwargs: Any) -> None:
        dims = _resolve_dims(kwargs)
        self.action_width = dims["action_width"]
        self.action_height = dims["action_height"]
        self.observation_width = dims["observation_width"]
        self.observation_height = dims["observation_height"]
        self.depth = 3
        self.filter_dim = 4
        self.toggle_rate = 0.1
        self._agent = make_random_network_agent(
            self.action_width,
            self.action_height,
            self.observation_width,
            self.observation_height,
            self.toggle_rate,
            self.filter_dim,
        )
        self.params = self._agent.init(jax.random.PRNGKey(kwargs.get("seed", 0)))
        self._apply = jax.jit(self._agent.apply)

    def forward(self, obs: Any) -> jax.Array:
        return self._apply(self.params, jax.random.PRNGKey(0), _as_obs(obs))

    __call__ = forward

    def eval(self) -> "RandomNetworkAgent":
        return self

    def to(self, *a: Any, **k: Any) -> "RandomNetworkAgent":
        return self

    def load_state_dict(self, state_dict: Any) -> None:
        """Reference loading surface (eval.py:33-36): accepts a torch state
        dict, a filesystem path to one (.pt), or a native .npz params file."""
        if isinstance(state_dict, str):
            if state_dict.endswith(".npz"):
                from .checkpoint import load_pytree

                self.params = load_pytree(state_dict, self.params)
                return
            import torch

            state_dict = torch.load(
                state_dict, weights_only=True, map_location="cpu"
            )
        self.load_torch_state_dict(state_dict)

    def load_torch_state_dict(self, state_dict: Dict[str, Any]) -> None:
        """Adopt weights from a reference ``network.state_dict()`` (keys
        ``network.{0,3,7}.weight`` per the Sequential indices, agents.py:74-83)."""
        import numpy as _np

        def _np_of(t: Any) -> np.ndarray:
            return _np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

        def _get(idx: int) -> Any:
            # accept both agent.state_dict() ("network.N.weight") and
            # agent.network.state_dict() ("N.weight") key styles
            for key in (f"network.{idx}.weight", f"{idx}.weight"):
                if key in state_dict:
                    return state_dict[key]
            raise KeyError(f"no weight entry for Sequential index {idx}")

        self.params = {
            "conv1": {"w": jnp.asarray(_np_of(_get(0)))},
            "conv2": {"w": jnp.asarray(_np_of(_get(3)))},
            "dense": {"w": jnp.asarray(_np_of(_get(7)))},
        }


def _as_obs(obs: Any) -> jax.Array:
    """Coerce observations (jax, numpy, or torch) to float32 [inst, 1, H, W]."""
    if hasattr(obs, "detach"):
        obs = obs.detach().cpu().numpy()
    arr = jnp.asarray(obs, dtype=jnp.float32)
    if arr.ndim == 3:
        arr = arr[:, None]
    return arr


# ---------------------------------------------------------------------------
# Seeder agents — scripted structure deployment (battery calibration)
# ---------------------------------------------------------------------------


def make_seeder_agent(
    pattern: Any,
    action_width: int = 64,
    action_height: int = 64,
) -> Agent:
    """Scripted agent that writes a KNOWN structure through the action
    window whenever the universe is empty, and otherwise lets it run.

    The reference ships structure helpers (get_glider / get_morley_puffer,
    mcl.py:855-893) and pattern RLEs but never an agent that *plays* them;
    this is the calibration oracle the challenge harness lacked — it bounds
    what the published battery pays for a policy that reliably deploys
    engineered machines (guns, puffers, fleets), anchoring learned-policy
    scores (VERDICT r4 item 5).

    ``pattern`` is a 0/1 cell array ([AH, AW], [1, AH, AW] or
    [1, 1, AH, AW] — the mcl.patterns helpers' shape) or a LIST of such
    (cycled per instance).  Empty-universe triggering makes the agent
    stateless (the Agent protocol carries no step counter): the pattern
    deploys on the battery's per-ruleset reset and re-deploys whenever the
    rule kills it.
    """
    pats = pattern if isinstance(pattern, (list, tuple)) else [pattern]
    canvases = []
    for p in pats:
        arr = np.asarray(p, dtype=np.float32).reshape(
            np.asarray(p).shape[-2:])
        if arr.shape[0] > action_height or arr.shape[1] > action_width:
            raise ValueError(
                f"pattern {arr.shape} exceeds the "
                f"{action_height}x{action_width} action window")
        canvas = np.zeros((action_height, action_width), np.float32)
        r0 = (action_height - arr.shape[0]) // 2
        c0 = (action_width - arr.shape[1]) // 2
        canvas[r0: r0 + arr.shape[0], c0: c0 + arr.shape[1]] = arr
        canvases.append(canvas)
    bank = jnp.asarray(np.stack(canvases))  # [K, AH, AW]

    def init(key: jax.Array) -> Dict[str, Any]:
        return {}

    def apply(params: Any, key: jax.Array, obs: jax.Array) -> jax.Array:
        instances = obs.shape[0]
        idx = jnp.arange(instances) % bank.shape[0]
        pat = bank[idx][:, None]  # [inst, 1, AH, AW]
        alive = jnp.any(obs > 0, axis=(1, 2, 3))
        return jnp.where(alive[:, None, None, None], 0.0, pat)

    return Agent(init=init, apply=apply)


def tile_pattern(cell_pattern: Any, copies: int, spacing: int = 4,
                 action_height: int = 64, action_width: int = 64) -> np.ndarray:
    """Tile ``copies`` of a small pattern into one action canvas (a glider
    fleet, a still-life lattice...) — row-major with ``spacing`` cells of
    clearance, centred."""
    arr = np.asarray(cell_pattern, dtype=np.float32)
    arr = arr.reshape(arr.shape[-2:])
    ph, pw = arr.shape
    per_row = max(1, (action_width + spacing) // (pw + spacing))
    rows = int(np.ceil(copies / per_row))
    h = rows * (ph + spacing) - spacing
    w = min(copies, per_row) * (pw + spacing) - spacing
    if h > action_height or w > action_width:
        raise ValueError(f"{copies} copies do not fit the window")
    canvas = np.zeros((action_height, action_width), np.float32)
    r0 = (action_height - h) // 2
    c0 = (action_width - w) // 2
    for k in range(copies):
        r = r0 + (k // per_row) * (ph + spacing)
        c = c0 + (k % per_row) * (pw + spacing)
        canvas[r: r + ph, c: c + pw] = arr
    return canvas
