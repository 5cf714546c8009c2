"""MorphoBonus — rewards matching target morphologies (mcl.py:107-195).

Reference recipe: each RLE pattern is padded (top=2, left=1 — ZeroPad2d
((1,1,2,1)), mcl.py:147) into a small kernel, dead cells set to -1, live
cells normalized to sum to 15, expanded into 6 symmetry variants (identity,
row-flip, col-flip, transpose and both transpose-flips, mcl.py:158-168); the
bonus is max+min of the VALID cross-correlation of the kernel bank with
``|universe - action|`` taken over all kernels and positions; reset seeds
Bernoulli(0.005) nucleation noise (mcl.py:185-195).

The reference is broken as shipped — it loads glider_1/glider_2.rle which do
not exist, its non-square kernels cannot concatenate, and the action tensor
broadcast fails against the full universe.  This build ships the glider
assets (carle_tpu/patterns/), pads every kernel onto a square ``dim x dim``
canvas so all 6 variants stack, and subtracts the *padded* action window so
the conv is well-defined.  The correlation input uses the universe BEFORE the
CA update, exactly as the reference captures it (mcl.py:172).
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import rle as rle_codec
from ..config import EnvConfig
from .base import Motivator, StepCtx, WrapperDef
from .patterns import pattern_path


def _kernel_variants(grid: np.ndarray, dim: int = 8) -> np.ndarray:
    """One pattern -> 6 symmetry-variant [dim, dim] kernels, reference
    normalization (mcl.py:144-168)."""
    canvas = np.zeros((dim, dim), dtype=np.float32)
    h = min(grid.shape[0], dim - 2)
    w = min(grid.shape[1], dim - 1)
    canvas[2 : 2 + h, 1 : 1 + w] = grid[:h, :w]

    kernel = np.where(canvas > 0, canvas, -1.0).astype(np.float32)
    ones = kernel > 0
    if ones.any():
        kernel[ones] *= 15.0 / kernel[ones].sum()

    return np.stack(
        [
            kernel,
            kernel[::-1, :],          # flip rows     (.flip(2))
            kernel[:, ::-1],          # flip cols     (.flip(3))
            kernel.T[::-1, :],        # transpose+flip rows
            kernel.T[:, ::-1],        # transpose+flip cols
            kernel.T,                 # transpose
        ]
    )


def build_kernel_bank(
    rle_paths: Sequence[str], dim: int = 8
) -> np.ndarray:
    """Stack every pattern's 6 variants into a conv bank [K, 1, dim, dim]."""
    banks: List[np.ndarray] = []
    for path in rle_paths:
        pattern = rle_codec.read_rle(path)
        banks.append(_kernel_variants(pattern.grid.astype(np.float32), dim))
    return np.concatenate(banks)[:, None]


class MorphoState(NamedTuple):
    reward_scale: jax.Array  # f32 scalar
    kernels: jax.Array       # f32 [K, 1, dim, dim]


def morpho_def(
    config: EnvConfig,
    reward_scale: float = 1.0,
    rle_paths: Sequence[str] = (),
    dim: int = 8,
    seed_rate: float = 0.005,
    **kwargs: Any,
) -> WrapperDef:
    if not rle_paths:
        rle_paths = (pattern_path("glider_1"), pattern_path("glider_2"))
    bank = build_kernel_bank(rle_paths, dim)

    def init(key: jax.Array) -> MorphoState:
        return MorphoState(
            reward_scale=jnp.asarray(reward_scale, dtype=jnp.float32),
            kernels=jnp.asarray(bank),
        )

    def apply(
        state: MorphoState, ctx: StepCtx, reward: jax.Array
    ) -> Tuple[MorphoState, jax.Array]:
        my_grid = jnp.abs(
            ctx.prev_grid.astype(jnp.float32) - ctx.action_full.astype(jnp.float32)
        )[:, None]
        response = jax.lax.conv_general_dilated(
            my_grid,
            state.kernels,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )
        my_max = jnp.max(response, axis=(1, 2, 3))[:, None]
        my_min = jnp.min(response, axis=(1, 2, 3))[:, None]
        return state, reward + state.reward_scale * (my_max + my_min)

    def on_reset(
        state: MorphoState, key: jax.Array, grid: jax.Array
    ) -> Tuple[MorphoState, jax.Array]:
        noise = jax.random.bernoulli(key, seed_rate, grid.shape)
        return state, (grid | noise.astype(jnp.uint8))

    return WrapperDef(
        name="MorphoBonus", init=init, apply=apply, on_reset=on_reset
    )


class MorphoBonus(Motivator):
    my_name = "MorphoBonus"

    def __init__(self, env: Any, **kwargs: Any) -> None:
        super().__init__(env, **kwargs)
        # attribute parity: the reference's use_grad kwarg check is dead code
        # ('"kwargs" in kwargs.keys()', mcl.py:115)
        self.use_grad = kwargs.get("use_grad", False)

    def _make_def(self, **kwargs: Any) -> WrapperDef:
        return morpho_def(self._config, **kwargs)

    def add_rle_pattern(self, rle_path: str, dim: int = 8) -> None:
        """Append a pattern's 6 variants to the kernel bank (mcl.py:144-168)."""
        extra = build_kernel_bank([rle_path], dim)
        self._wstate = self._wstate._replace(
            kernels=jnp.concatenate([self._wstate.kernels, jnp.asarray(extra)])
        )
