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

import json
import os
from typing import Any, Dict

import jax
import numpy as np

# Format history:
#   (absent)  round-1 files — flat path-keyed arrays, no metadata entry
#   1         adds the __checkpoint_meta__ JSON entry (this constant)
# Bump when the wire layout itself changes; pure pytree-structure evolution
# (new/renamed leaves) is handled by load_pytree(missing=...), not a bump.
FORMAT_VERSION = 1
_META_KEY = "__checkpoint_meta__"


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


def save_pytree(path: str, tree: Any, compress: bool = False) -> str:
    """Serialize a pytree of arrays to ``path`` (.npz, flat path-keyed,
    stamped with a format-version metadata entry).  ``compress`` trades
    save time for size (shipped artifacts); ``load_pytree`` reads both."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays: Dict[str, np.ndarray] = {}
    for keypath, leaf in flat:
        arrays[_path_str(keypath)] = np.asarray(jax.device_get(leaf))
    arrays[_META_KEY] = np.frombuffer(
        json.dumps({"format_version": FORMAT_VERSION}).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    (np.savez_compressed if compress else np.savez)(path, **arrays)
    return path


def checkpoint_meta(path: str) -> Dict[str, Any]:
    """Read a checkpoint's metadata entry.  Round-1 files predate the entry
    and report ``{"format_version": 0}``."""
    with np.load(path) as data:
        if _META_KEY not in data.files:
            return {"format_version": 0}
        return json.loads(bytes(data[_META_KEY]).decode())


def load_pytree(path: str, like: Any, missing: str = "error") -> Any:
    """Load a pytree saved by :func:`save_pytree` into the structure (and
    dtypes) of ``like``.

    ``missing`` governs structural drift across versions: ``"error"``
    (default) raises on any template leaf absent from the file — exact
    restores stay exact; ``"template"`` keeps the template's value for
    absent leaves, so newer code with added state fields can still load
    older checkpoints.  Extra keys in the file are always ignored (older
    code reading newer files).  Files written by a newer wire format than
    this build understands are rejected outright.
    """
    with np.load(path) as data:
        if _META_KEY in data.files:
            meta = json.loads(bytes(data[_META_KEY]).decode())
        else:
            meta = {"format_version": 0}
        if meta.get("format_version", 0) > FORMAT_VERSION:
            raise ValueError(
                f"checkpoint {path} uses wire format "
                f"{meta['format_version']}, newer than supported "
                f"{FORMAT_VERSION} — upgrade carle_tpu to read it"
            )
        stored = {k: data[k] for k in data.files if k != _META_KEY}

    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for keypath, leaf in flat:
        key = _path_str(keypath)
        if key not in stored:
            if missing == "template":
                leaves.append(leaf)
                continue
            raise KeyError(
                f"checkpoint {path} is missing leaf {key!r} "
                "(pass missing='template' to keep the in-memory value)"
            )
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
