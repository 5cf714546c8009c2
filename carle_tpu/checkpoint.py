"""Checkpointing — param/opt pytrees to .npz, universes to .rle.

The reference checkpoints wrapper stacks with ``torch.save(state_dict())``
(train_mcl.py:80-84) and universes as RLE files (env.py:495-500).  Here:

* arbitrary pytrees (params, optimizer state, whole LearnerStates) serialize
  to a flat .npz keyed by tree path — a self-contained, dependency-free
  format that round-trips exactly;
* universes keep the RLE wire format (rle.py), interchangeable with the
  reference;
* reference .pt checkpoints remain loadable through the converters in
  mcl/rnd.py and mcl/ae.py.

Unlike the reference (no optimizer state, no resume), saving a full
LearnerState preserves Adam moments, accumulation buffers and counters, so
training resumes bit-exactly.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def _path_str(path: Any) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_pytree(path: str, tree: Any) -> str:
    """Serialize a pytree of arrays to ``path`` (.npz, flat path-keyed)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays: Dict[str, np.ndarray] = {}
    for keypath, leaf in flat:
        arrays[_path_str(keypath)] = np.asarray(jax.device_get(leaf))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)
    return path


def load_pytree(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save_pytree` into the structure (and
    dtypes) of ``like``."""
    with np.load(path) as data:
        stored = {k: data[k] for k in data.files}

    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for keypath, leaf in flat:
        key = _path_str(keypath)
        if key not in stored:
            raise KeyError(f"checkpoint {path} is missing leaf {key!r}")
        arr = stored[key]
        if arr.shape != tuple(np.shape(leaf)):
            raise ValueError(
                f"checkpoint leaf {key!r} has shape {arr.shape}, "
                f"expected {np.shape(leaf)}"
            )
        dtype = getattr(leaf, "dtype", None)
        if dtype is None:
            dtype = np.asarray(leaf).dtype
        leaves.append(jax.numpy.asarray(arr, dtype=dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), leaves
    )
