"""Checkpoint / resume.

The reference has none (SURVEY.md §5): its only resumable state is the
temporal accumulation image + frame counter, deliberately reset on parameter
change.  Here that exact state — film accumulation, frame counter, scene
parameters, camera, and (for inverse rendering) optimizer state — serializes
to a single .npz so a render or training run resumes where it stopped.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    leaves = {}
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        key = prefix + "/".join(str(p) for p in path)
        leaves[key] = np.asarray(leaf)
    return leaves, treedef


def save(path: str, tree, meta: dict | None = None) -> None:
    """Save any pytree of arrays (+ JSON-serializable meta) atomically."""
    leaves, _ = _flatten(tree)
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp if tmp.endswith(".npz") else tmp,
        __meta__=np.frombuffer(
            json.dumps(meta or {}).encode(), dtype=np.uint8
        ),
        **leaves,
    )
    # np.savez appends .npz when missing
    actual_tmp = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual_tmp, path)


def load(path: str, like):
    """Load into the structure of ``like`` (same pytree shape); returns
    (tree, meta)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
        leaves, _ = _flatten(like)
        loaded = []
        flat, treedef = jax.tree_util.tree_flatten_with_path(like)
        for path_keys, leaf in flat:
            key = "/".join(str(p) for p in path_keys)
            if key not in data:
                raise KeyError(f"checkpoint missing leaf {key}")
            arr = data[key]
            loaded.append(jnp.asarray(arr, dtype=jnp.asarray(leaf).dtype))
        return jax.tree_util.tree_unflatten(treedef, loaded), meta
