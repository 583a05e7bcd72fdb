"""Checkpoint/resume for the inverse-rendering loop.

The reference persists nothing (SURVEY.md §5: even ``imgui.ini`` is
gitignored); the TPU framework checkpoints scene parameters + optimizer
state so long optimizations survive restarts.

Format: one ``.npz`` per checkpoint holding every array leaf of the pytree
plus a pickled treedef sidecar — dependency-free and portable (orbax is
available in the image but its API surface churns; this is 40 lines we own).
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    """Save any pytree of arrays (TrainState, Scene, SceneParams, ...)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    with open(path + ".treedef", "wb") as f:
        pickle.dump(treedef, f)


def load_pytree(path: str):
    """Load a pytree saved by ``save_pytree`` (arrays come back as numpy;
    jax converts lazily on first use)."""
    with open(path + ".treedef", "rb") as f:
        treedef = pickle.load(f)
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def latest_checkpoint(directory: str, prefix: str = "ckpt_"):
    """Path of the newest ``{prefix}{step}.npz`` in ``directory`` (or None)."""
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".npz"):
            try:
                steps.append((int(name[len(prefix) : -4]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(directory, max(steps)[1])


def save_train_state(directory: str, state, step: int) -> str:
    path = os.path.join(directory, f"ckpt_{step}.npz")
    save_pytree(path, state)
    return path


def restore_train_state(directory: str):
    """(state, step) of the newest checkpoint, or (None, 0)."""
    path = latest_checkpoint(directory)
    if path is None:
        return None, 0
    state = load_pytree(path)
    return state, int(os.path.basename(path)[5:-4])
