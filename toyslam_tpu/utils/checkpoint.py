"""Checkpoint / resume for pipeline and estimator state.

The reference has no estimator checkpointing (SURVEY §5); its nearest
analogues are PCD scan persistence and trajectory/CSV artifacts. In this
framework every pipeline's state is an explicit pytree carry (``lax.scan``
state, SlidingWindow, NDT map, ESKF state), so checkpointing is exact and
trivial: snapshot the pytree to NPZ every K scans, resume by re-entering the
scan with the restored carry.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_checkpoint(path: str | Path, state) -> None:
    """Snapshot a pytree of arrays to a single .npz file."""
    arrays, _ = _flatten_with_paths(state)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str | Path, template):
    """Restore a pytree saved with :func:`save_checkpoint`.

    ``template`` supplies the structure (and device placement targets);
    values come from the file. Shapes and dtypes must match.
    """
    data = np.load(path)
    arrays, _ = _flatten_with_paths(template)
    leaves_tpl, treedef = jax.tree_util.tree_flatten(template)
    flat_paths, _ = jax.tree_util.tree_flatten_with_path(template)
    restored = []
    for (pth, leaf) in flat_paths:
        key = "/".join(str(p) for p in pth)
        val = data[key]
        if val.shape != np.shape(leaf):
            raise ValueError(
                f"checkpoint mismatch at {key}: {val.shape} vs {np.shape(leaf)}")
        restored.append(jax.numpy.asarray(val, dtype=np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, restored)
