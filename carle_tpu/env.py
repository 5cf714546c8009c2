"""CARLE environment — TPU-native core.

Two layers:

* a **functional core** (:class:`EnvState`, :func:`env_step`) — immutable
  pytree state and pure jittable transition function.  This is what rollouts,
  wrappers, benchmarks and the multi-chip path compose with ``lax.scan`` /
  ``shard_map``.
* a **stateful shell** (:class:`CARLE`) mirroring the reference's Gym-like
  class API (reference carle/env.py:15-242): ``reset()``,
  ``step(action) -> (obs, reward, done, info)``, rulestring setters, RLE
  pattern I/O, CSV episode logs and PNG frame export.

Behavioural contract (verified bit-exact against the PyTorch reference in
tests/test_parity.py):

* toggle actions are XOR'd into a centred action window — ANY nonzero
  value toggles, like the reference's logical_xor (env.py:150-182);
* the master reset fires iff the mean of the UNCROPPED action VALUES is
  exactly 1.0 (env.py:208-216): all-ones resets, all-2.0 only toggles, and
  a full-frame action that is all-ones just inside the window toggles
  without resetting;
* the CA update is a Moore-neighbourhood count + B/S rule lookup on a torus
  (env.py:219-227);
* the base env emits zero reward and never sets done (env.py:233-242).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rle as rle_codec
from . import rules as rules_mod
from .config import EnvConfig
from .ops.ca import ca_step_grid, ca_step_with_action


class EnvState(NamedTuple):
    """Immutable environment state (a pytree; rules are data, not trace
    constants, so rule changes never retrace jitted step functions)."""

    grid: jax.Array               # uint8 [instances, H, W]
    rule_bits: jax.Array          # int32 scalar, see rules.pack_rule_bits
    step_num: jax.Array           # int32 scalar
    steps_since_action: jax.Array # int32 scalar (kept for parity; env.py:145,200)


def init_state(config: EnvConfig, rule_bits: int = rules_mod.LIFE) -> EnvState:
    return EnvState(
        grid=jnp.zeros(config.grid_shape, dtype=jnp.uint8),
        rule_bits=jnp.asarray(rule_bits, dtype=jnp.int32),
        step_num=jnp.asarray(0, dtype=jnp.int32),
        steps_since_action=jnp.asarray(0, dtype=jnp.int32),
    )


def reset_state(state: EnvState) -> EnvState:
    """Zero the universe, keep the ruleset (reference reset, env.py:134-148)."""
    return EnvState(
        grid=jnp.zeros_like(state.grid),
        rule_bits=state.rule_bits,
        step_num=jnp.zeros_like(state.step_num),
        steps_since_action=jnp.zeros_like(state.steps_since_action),
    )


def env_step(
    state: EnvState, action: jax.Array, *, config: EnvConfig
) -> Tuple[EnvState, jax.Array]:
    """Pure transition: toggle, (maybe) master-reset, CA update.

    ``action`` is [instances, AH, AW]; NONZERO entries toggle cells (the
    reference XORs with ``logical_xor`` — env.py:182 — so 0.5 toggles just
    like 1.0; binarize here, never by dtype-casting, which would truncate
    fractional toggles to zero).  Returns (new_state, obs) with obs the
    uint8 [instances, H, W] universe.  The master reset fires on the
    reference's ``torch.mean(action) == 1.0`` check (env.py:208) computed
    over the action VALUES — it is a *batch-global* reset there too, and
    values of e.g. 2.0 everywhere toggle WITHOUT resetting.
    """
    action_bits = (action != 0).astype(jnp.uint8)

    do_reset = jnp.mean(action.astype(jnp.float32)) == 1.0
    any_action = jnp.any(action_bits != 0)

    stepped = ca_step_with_action(
        state.grid, action_bits, state.rule_bits, config
    )

    new_grid = jnp.where(do_reset, jnp.zeros_like(stepped), stepped)
    new_step = jnp.where(do_reset, 0, state.step_num + 1).astype(jnp.int32)
    new_ssa = jnp.where(
        do_reset, 0, state.steps_since_action + jnp.where(any_action, 0, 1)
    ).astype(jnp.int32)

    new_state = EnvState(
        grid=new_grid,
        rule_bits=state.rule_bits,
        step_num=new_step,
        steps_since_action=new_ssa,
    )
    return new_state, new_grid


def multi_step(
    state: EnvState, num_steps: int, *, config: EnvConfig
) -> EnvState:
    """Run ``num_steps`` action-free CA generations.

    Backend dispatch: "xla" scans the roll-sum step; "bitpack" scans the
    32-cells-per-word engine (ops/bitpack.py); "pallas" (and "auto" on TPU)
    uses the bit-packed Pallas kernel with the grid VMEM-resident across all
    generations — the 1.5e12 cell-updates/s bench path
    (ops/pallas_bitpack.py)."""
    from .ops.ca import resolve_backend

    backend = resolve_backend(config.backend)
    if config.width % 32 != 0 and backend in ("pallas", "bitpack-pallas",
                                              "bitpack"):
        # the packed engines need word-aligned widths; the XLA roll-sum
        # handles any geometry — fall back instead of asserting mid-trace
        # (this package supports the odd widths the reference crashes on)
        backend = "xla"
    if backend in ("pallas", "bitpack-pallas"):
        from .ops.bitpack import pack_grid, unpack_grid
        from .ops.pallas_bitpack import bit_multi_step_pallas

        packed = bit_multi_step_pallas(
            pack_grid(state.grid), state.rule_bits,
            jnp.asarray(num_steps, jnp.int32),
        )
        grid = unpack_grid(packed, config.width)
    elif backend == "bitpack":
        from .ops.bitpack import bit_multi_step, pack_grid, unpack_grid

        packed = bit_multi_step(pack_grid(state.grid), state.rule_bits,
                                num_steps)
        grid = unpack_grid(packed, config.width)
    else:
        def body(grid, _):
            return ca_step_grid(grid, state.rule_bits), None

        grid, _ = jax.lax.scan(body, state.grid, length=num_steps)
    return state._replace(grid=grid, step_num=state.step_num + num_steps)


# ---------------------------------------------------------------------------
# Stateful shell — reference-compatible class API
# ---------------------------------------------------------------------------


class CARLE:
    """Gym-like shell over the functional core (reference carle/env.py:15).

    Accepts the reference's keyword arguments (width, height, action_width,
    action_height, instances, logging; device selectors are accepted and
    ignored — JAX owns placement).  Attribute mutation of ``birth`` /
    ``survive`` lists is supported exactly as the reference drivers use it
    (train_mcl.py:56-57), implemented as properties that repack the rule
    bitmask in device state without retracing.
    """

    def __init__(self, **kwargs: Any) -> None:
        self.inner_env: Optional["CARLE"] = None  # wrapper protocol (mcl.py:34)
        self.config = EnvConfig(
            width=kwargs.get("width", 256),
            height=kwargs.get("height", 256),
            action_width=kwargs.get("action_width", 64),
            action_height=kwargs.get("action_height", 64),
            instances=kwargs.get("instances", 1),
            backend=kwargs.get("backend", "xla"),
        ).validate()

        # accepted-for-compat, unused (JAX owns device placement; the
        # reference's use_grad is dead code due to a typo, env.py:110)
        self.use_cuda = kwargs.get("use_cuda", False)
        self.use_grad = kwargs.get("use_grad", False)
        self.alive_rate = kwargs.get("alive_rate", 0.0)
        self.logging = kwargs.get("logging", False)

        self.allowed_rules = [str(n) for n in range(9)]
        self._birth: List[int] = [3]
        self._survive: List[int] = [2, 3]

        self.state = init_state(self.config, self._packed_bits())
        self._jit_step = jax.jit(partial(env_step, config=self.config))
        self._jit_multi = jax.jit(
            partial(multi_step, config=self.config), static_argnames=("num_steps",)
        )

        self.instance_id = str(int(time.time()))
        self.step_number = 0
        self.steps_since_action = 0
        self.log: List[List[str]] = []
        self.action: Optional[np.ndarray] = None

    # --- geometry passthroughs (reference attribute names) ----------------
    @property
    def my_device(self) -> str:
        """Reference attribute (env.py:25-37); informational here — JAX owns
        placement."""
        import jax as _jax

        return str(_jax.devices()[0])

    @property
    def width(self) -> int:
        return self.config.width

    @property
    def height(self) -> int:
        return self.config.height

    @property
    def action_width(self) -> int:
        return self.config.eff_action_width

    @property
    def action_height(self) -> int:
        return self.config.eff_action_height

    @property
    def instances(self) -> int:
        return self.config.instances

    # --- rules as mutable attributes (train_mcl.py:56-57 pattern) ---------
    def _packed_bits(self) -> int:
        return rules_mod.pack_rule_bits(self._birth, self._survive)

    def _sync_rule_bits(self) -> None:
        self.state = self.state._replace(
            rule_bits=jnp.asarray(self._packed_bits(), dtype=jnp.int32)
        )

    @property
    def birth(self) -> List[int]:
        return self._birth

    @birth.setter
    def birth(self, digits: List[int]) -> None:
        self._birth = sorted(set(int(d) for d in digits))
        self._sync_rule_bits()

    @property
    def survive(self) -> List[int]:
        return self._survive

    @survive.setter
    def survive(self, digits: List[int]) -> None:
        self._survive = sorted(set(int(d) for d in digits))
        self._sync_rule_bits()

    def birth_rule_from_string(self, my_string: str = "B3") -> None:
        self.birth = rules_mod.parse_digits(my_string)

    def survive_rule_from_string(self, my_string: str = "S23") -> None:
        self.survive = rules_mod.parse_digits(my_string)

    def rules_from_string(self, my_string: str = "B3/S23") -> None:
        b, s = rules_mod.parse_rulestring(my_string)
        self.birth = b
        self.survive = s

    # --- universe access ---------------------------------------------------
    @property
    def universe(self) -> jax.Array:
        """float32 [instances, 1, H, W] view, matching the reference tensor
        layout (env.py:136)."""
        return self.state.grid.astype(jnp.float32)[:, None, :, :]

    @universe.setter
    def universe(self, value: Any) -> None:
        arr = np.asarray(jax.device_get(value) if isinstance(value, jax.Array) else value)
        arr = arr.reshape(self.instances, self.height, self.width)
        self.state = self.state._replace(grid=jnp.asarray(arr != 0, dtype=jnp.uint8))

    def get_observation(self) -> jax.Array:
        return self.universe

    # --- gym API -------------------------------------------------------------
    def reset(self) -> jax.Array:
        self.state = reset_state(self.state)
        self.instance_id = str(int(time.time()))
        self.step_number = 0
        self.steps_since_action = 0
        self.log = []
        return self.universe

    def _coerce_action(self, action: Any) -> np.ndarray:
        """Coerce arbitrary array-likes to a raw-VALUED [inst, AH, AW] patch
        (input dtype preserved — the fractional-toggle and master-reset
        semantics depend on the un-binarized values), centre-cropping
        oversized actions like the reference (env.py:164-169)."""
        if hasattr(action, "detach"):  # torch tensor
            action = action.detach().cpu().numpy()
        arr = np.asarray(jax.device_get(action) if isinstance(action, jax.Array) else action)
        arr = np.atleast_2d(arr)
        if arr.ndim == 2:
            arr = arr[None, None]
        elif arr.ndim == 3:
            # [inst|1, H, W] (the functional core's layout): insert the
            # channel axis at position 1, NOT the front — prepending would
            # turn a batched 3-D action into [1, inst, H, W] and crash the
            # final reshape for instances > 1.
            arr = arr[:, None]
        ah, aw = self.action_height, self.action_width
        if arr.shape[2] > ah or arr.shape[3] > aw:
            # centre-crop from the action's own extent: identical to the
            # reference's universe-offset crop for full-size actions
            # (env.py:164-169, where shape==universe so the offsets agree),
            # and well-defined for any intermediate size — the reference
            # slices out of range there.
            off_r = max((arr.shape[2] - ah) // 2, 0)
            off_c = max((arr.shape[3] - aw) // 2, 0)
            arr = arr[:, :, off_r : off_r + ah, off_c : off_c + aw]
        if arr.shape[0] == 1 and self.instances > 1:
            arr = np.broadcast_to(arr, (self.instances,) + arr.shape[1:])
        assert arr.shape[2] == ah and arr.shape[3] == aw, (
            f"action window is {arr.shape[2]}x{arr.shape[3]}, expected {ah}x{aw}"
        )
        return arr.reshape(self.instances, ah, aw)

    def step(
        self, action: Any
    ) -> Tuple[jax.Array, jax.Array, jax.Array, List[Dict[str, Any]]]:
        if hasattr(action, "detach"):  # torch tensor
            action = action.detach().cpu().numpy()
        raw = np.asarray(
            jax.device_get(action) if isinstance(action, jax.Array)
            else action
        )
        patch = self._coerce_action(raw)  # raw VALUES, centre-cropped
        self.action = (patch != 0).astype(np.uint8)

        if self.logging:
            self.log_universe()

        # reference env.py:208: the master reset fires iff the mean of the
        # UNCROPPED action VALUES is exactly 1.0 — an all-ones window inside
        # a full-frame action only toggles, and 2.0-valued toggles never
        # reset.  The device predicate sees the cropped patch, so reconcile:
        # force all-ones when the raw says reset (the reset wipes the
        # universe, so the toggle values are irrelevant), and scale by 2
        # (same nonzero toggles, mean != 1) when only the crop says reset.
        raw_mean = float(np.mean(raw.astype(np.float32)))
        was_reset_pending = raw_mean == 1.0
        dev_patch = patch.astype(np.float32)
        crop_mean = float(np.mean(dev_patch))
        if was_reset_pending and crop_mean != 1.0:
            dev_patch = np.ones_like(dev_patch)
        elif crop_mean == 1.0 and not was_reset_pending:
            dev_patch = dev_patch * 2.0

        self.state, _ = self._jit_step(
            self.state, jnp.asarray(dev_patch, dtype=jnp.float32)
        )

        if was_reset_pending:
            # keep host-side bookkeeping in sync with the in-graph reset
            self.instance_id = str(int(time.time()))
            self.step_number = 0
            self.steps_since_action = 0
            self.log = []
        else:
            self.step_number += 1
            if not patch.any():
                self.steps_since_action += 1

        obs = self.universe
        reward = jnp.zeros((self.instances, 1), dtype=jnp.float32)
        done = jnp.zeros((self.instances, 1), dtype=jnp.float32)
        info: List[Dict[str, Any]] = [{} for _ in range(self.instances)]
        return obs, reward, done, info

    def multi_step(self, num_steps: int) -> jax.Array:
        """Run ``num_steps`` action-free generations as ONE fused launch
        (the packed VMEM-resident kernel on TPU) and return the observation.
        Beyond-reference convenience: the reference can only loop
        ``step(zeros)`` through Python."""
        self.state = self._jit_multi(self.state, num_steps=num_steps)
        self.step_number += num_steps
        self.steps_since_action += num_steps
        return self.universe

    def render(self) -> None:
        """ASCII render of instance 0 (reference env.py:244-258)."""
        os.system("clear")
        print("\n CA Universe")
        grid = np.asarray(jax.device_get(self.state.grid[0]))
        for row in grid:
            print("".join("o" if c else " " for c in row))
        time.sleep(0.125)

    # --- pattern / episode I/O (reference env.py:260-513) -------------------
    def get_rle(self, universe: Any, action: bool = False) -> str:
        grid = np.asarray(jax.device_get(universe) if isinstance(universe, jax.Array) else universe)
        grid = grid.reshape(grid.shape[-2], grid.shape[-1])
        return rle_codec.encode_grid(
            grid,
            self._birth,
            self._survive,
            exp_id=self.instance_id,
            step=self.step_number,
            action=action,
            torus=(self.height, self.width),
        )

    def read_rle(self, filepath: str) -> str:
        """Read an RLE file, adopt its ruleset, return the body text
        (reference read_rle, env.py:330-382 — ours parses the torus tag the
        reference crashes on).  Returning the body keeps the reference's
        ``rle_to_grid(env.read_rle(path))`` chain working (mcl.py:148-149);
        the full decoded pattern is kept on ``self._last_pattern``."""
        pattern = rle_codec.read_rle(filepath)
        self.birth = pattern.birth
        self.survive = pattern.survive
        self._last_pattern = pattern
        return pattern.body

    def rle_to_grid(self, rle_text: Any) -> np.ndarray:
        """Decode an RLE body/pattern string (or an already-parsed
        :class:`~carle_tpu.rle.RLEPattern`) to a uint8 grid (reference
        rle_to_grid, env.py:260-328; used by MorphoBonus via inner_env)."""
        if isinstance(rle_text, rle_codec.RLEPattern):
            return rle_text.grid
        pattern = rle_codec.parse_rle_text(rle_text)
        return pattern.grid

    def action_padding(self, action: Any) -> np.ndarray:
        """Zero-pad an action patch into the centred window of a full-size
        grid (the reference exposes this as an nn.ZeroPad2d attribute,
        env.py:130; SpeedDetector uses it to build its exclusion mask)."""
        arr = np.asarray(
            jax.device_get(action) if isinstance(action, jax.Array) else action
        )
        lead = arr.shape[:-2]
        arr2 = arr.reshape((-1,) + arr.shape[-2:])
        padded = np.zeros((arr2.shape[0], self.height, self.width),
                          dtype=arr.dtype)
        r0, c0 = self.config.action_row_offset, self.config.action_col_offset
        padded[:, r0 : r0 + arr2.shape[1], c0 : c0 + arr2.shape[2]] = arr2
        return padded.reshape(lead + (self.height, self.width))

    def read_csv(self, filepath: str) -> List[List[str]]:
        """Read an episode log back as (action_rle, universe_rle) pairs.
        The reference's read_csv is a stub (env.py:384-388); this one works."""
        return [list(p) for p in rle_codec.read_log(filepath)]

    def load_universe(self, filepath: str, universe_index: int = 0) -> None:
        self.read_rle(filepath)
        g = self._last_pattern.grid
        assert g.shape == (self.height, self.width), (
            f"tried to load the wrong size universe: {g.shape} vs "
            f"{(self.height, self.width)}"
        )
        grid = np.array(jax.device_get(self.state.grid))  # writable copy
        grid[universe_index] = g
        self.state = self.state._replace(grid=jnp.asarray(grid, dtype=jnp.uint8))

    def log_universe(self, universe_index: int = 0) -> None:
        rle_universe = self.get_rle(self.state.grid[universe_index])
        act = self.action if self.action is not None else np.zeros(
            (self.instances, self.action_height, self.action_width), dtype=np.uint8
        )
        rle_action = self.get_rle(act[universe_index], action=True)
        self.log.append([rle_action, rle_universe])

    def save_log(self, directory: str = "./logs") -> str:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"carle_log{self.instance_id}.csv")
        with open(path, "w") as f:
            f.write("action,universe,\n")
            for entry in self.log:
                for item in entry:
                    f.write('"' + item + '"' + ",")
                f.write("\n")
        return path

    def save_rle(self, rle: str, directory: str = "./logs") -> str:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(
            directory, f"universe{self.instance_id}_step{self.step_number}.rle"
        )
        with open(path, "w") as f:
            f.write(rle)
        return path

    def save_frame(self, directory: str = "./frames") -> str:
        from .utils.png import write_png

        os.makedirs(directory, exist_ok=True)
        path = os.path.join(
            directory, f"frame{self.instance_id}_step{self.step_number}.png"
        )
        grid = np.asarray(jax.device_get(self.state.grid[0]))
        write_png(path, (255 * grid).astype(np.uint8))
        return path

    # torch-API compat shims used by reference drivers -----------------------
    def eval(self) -> "CARLE":
        return self

    def train(self) -> "CARLE":
        return self

    def to(self, *_args: Any, **_kwargs: Any) -> "CARLE":
        return self


def _main() -> None:
    """Demo + throughput harness (reference env.py:517-573): glider rollout,
    RLE/log/frame export round-trip, then a vectorization sweep printing
    'CA updates per second with {N}x vectorization'."""
    env = CARLE(logging=True)
    env.reset()
    action = np.zeros((1, 1, 64, 64), dtype=np.float32)
    action[0, 0, 14, 16] = 1.0
    action[0, 0, 15, 16:18] = 1.0
    action[0, 0, 16, 15:18:2] = 1.0
    obs, *_ = env.step(action)
    for _ in range(2):
        obs, *_ = env.step(action * 0)

    my_rle = env.get_rle(env.state.grid[0])
    rle_path = env.save_rle(my_rle)
    env.save_frame()
    env.save_log()

    env2 = CARLE()
    env2.reset()
    env2.load_universe(rle_path)
    assert int(np.asarray(jax.device_get(env2.state.grid)).sum()) == 5

    for instances in (1, 64, 1024):
        env = CARLE(instances=instances)
        env.reset()
        zeros = np.zeros((instances, 1, 64, 64), dtype=np.float32)
        env.step(zeros)  # compile
        steps = 256
        t0 = time.time()
        for _ in range(steps):
            env.step(zeros)
        # force completion via the shared barrier (see utils/sync.py on
        # axon block_until_ready semantics)
        from .utils.sync import device_sync

        device_sync(env.state.grid)
        dt = time.time() - t0
        print(
            "{:.2f} CA updates per second with {}x vectorization".format(
                steps / dt, instances
            )
        )


if __name__ == "__main__":
    _main()
