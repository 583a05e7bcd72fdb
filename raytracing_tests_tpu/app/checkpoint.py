"""Checkpoint/resume for the inverse-rendering loop.

The reference persists nothing (SURVEY.md §5: even ``imgui.ini`` is
gitignored); the TPU framework checkpoints scene parameters + optimizer
state so long optimizations survive restarts.

Format: one ``.npz`` per checkpoint holding every array leaf of the pytree.
The tree STRUCTURE is never serialized — restore takes a template pytree
(the freshly constructed ``TrainState``) and pours the leaves back into it.
This keeps the format dependency-free, stable across jax versions, and free
of arbitrary-code-execution hazards (no pickle: loading a checkpoint from an
untrusted directory can at worst produce wrong numbers, never run code).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    """Save any pytree of arrays (TrainState, Scene, SceneParams, ...)."""
    leaves = jax.tree_util.tree_leaves(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_pytree(path: str, template):
    """Load leaves saved by ``save_pytree`` into ``template``'s structure.

    ``template`` must be a pytree with the same leaf count as the saved one
    (e.g. a freshly built TrainState for the same scene/optimizer); leaf
    dtypes/shapes are restored from the file.  Arrays come back as numpy;
    jax converts lazily on first use.
    """
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    treedef = jax.tree_util.tree_structure(template)
    n = treedef.num_leaves
    if len(data.files) != n:
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template expects {n} "
            f"(scene/optimizer mismatch?): {path}"
        )
    leaves = [data[f"leaf_{i}"] for i in range(n)]
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


def restore_train_state(directory: str, template):
    """(state, step) of the newest checkpoint restored into ``template``'s
    structure, or (None, 0) when the directory holds no checkpoints."""
    path = latest_checkpoint(directory)
    if path is None:
        return None, 0
    state = load_pytree(path, template)
    return state, int(os.path.basename(path)[5:-4])
