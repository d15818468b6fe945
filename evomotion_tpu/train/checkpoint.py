"""Per-component checkpointing.

Reference: evo_motion_networks/include/evo_motion_networks/saver.h:14-45 —
one torch archive per module/optimizer with a file per component
(actor.th, critic_1_optimizer.th, ...). Here each component pytree is one
.npz with path-flattened keys; the same file-per-component layout is kept so
a checkpoint directory looks like the reference's save_<i>/ directories
(train.cpp:81-85).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(tree) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_component(folder: str, name: str, tree) -> None:
    """save_torch equivalent: one file per component, named like the
    reference (actor.th -> actor.npz)."""
    os.makedirs(folder, exist_ok=True)
    np.savez(os.path.join(folder, f"{name}.npz"), **_flatten(tree))


def load_component(folder: str, name: str, like):
    """load_torch equivalent: restores into the structure of `like`."""
    data = np.load(os.path.join(folder, f"{name}.npz"))
    paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path, leaf in paths:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path
        )
        arr = data[key]
        leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype).reshape(leaf.shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)
